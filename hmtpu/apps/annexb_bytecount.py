"""Annex-B byte accounting (capability parity with
source/App/utils/annexBbytecount.cpp): parse a raw bytestream, count
bytes and NAL units per NAL type.

Usage: python -m hmtpu.apps.annexb_bytecount stream.hevc
"""
from __future__ import annotations

import sys
from collections import Counter

from hmtpu.common.constants import NalUnitType
from hmtpu.io.nal import split_annexb


def count(data: bytes):
    """Returns (per-type Counter of units, per-type byte Counter,
    total NAL bytes excluding start codes)."""
    units = Counter()
    bbytes = Counter()
    total = 0
    for raw in split_annexb(data):
        t = (raw[0] >> 1) & 0x3F          # 2-byte NAL header
        units[t] += 1
        bbytes[t] += len(raw)
        total += len(raw)
    return units, bbytes, total


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 1:
        print("usage: annexb_bytecount <stream.hevc>", file=sys.stderr)
        return 2
    data = open(argv[0], "rb").read()
    units, bbytes, total = count(data)
    print(f"{'nal_type':>28} {'units':>8} {'bytes':>10}")
    for t in sorted(units):
        try:
            name = NalUnitType(t).name
        except ValueError:
            name = f"type_{t}"
        print(f"{name:>28} {units[t]:>8} {bbytes[t]:>10}")
    print(f"{'total (excl. start codes)':>28} {sum(units.values()):>8} "
          f"{total:>10}")
    print(f"file bytes: {len(data)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

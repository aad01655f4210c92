"""Decoder CLI — capability parity with TAppDecoder (decmain.cpp:50,
TAppDecTop.cpp:86): Annex-B in, YUV out in display order, per-POC
decoded-picture-hash check.

    python -m hmtpu.apps.decoder_app -b str.bin -o rec.yuv
"""
from __future__ import annotations

import sys

from hmtpu.decoder.core import Decoder
from hmtpu.io.yuv import YuvWriter


def main(argv=None) -> int:
    args = sys.argv[1:] if argv is None else argv
    bs_path, out_path, out_bd = None, None, 0
    i = 0
    while i < len(args):
        if args[i] == "-b":
            bs_path = args[i + 1]
            i += 2
        elif args[i] == "-o":
            out_path = args[i + 1]
            i += 2
        elif args[i] in ("-d", "--OutputBitDepth"):
            out_bd = int(args[i + 1])
            i += 2
        else:
            print(f"unknown argument {args[i]}", file=sys.stderr)
            return 1
    if not bs_path:
        print("usage: decoder_app -b str.bin [-o rec.yuv]",
              file=sys.stderr)
        return 1

    with open(bs_path, "rb") as f:
        data = f.read()
    pics = Decoder().decode_annexb(data)
    ok = True
    for p in sorted(pics, key=lambda p: p.poc):
        status = {True: "(OK)", False: "(***ERROR***)",
                  None: "(unk)"}[p.hash_ok]
        print(f"POC {p.poc:4d}  [{status}]")
        ok &= p.hash_ok is not False
    if out_path:
        bd = out_bd or (pics[0].frame.bit_depth if pics else 8)
        wr = YuvWriter(out_path, file_bit_depth=bd)
        for p in sorted(pics, key=lambda p: p.poc):
            wr.write_frame(p.frame)
        wr.close()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

"""Planar YUV bit-depth conversion (capability parity with
source/App/utils/convert_NtoMbit_YCbCr.cpp): read N-bit 4:2:0 planar
YUV, write M-bit, with HM's scale+round semantics.

Usage: python -m hmtpu.apps.convert_bitdepth in.yuv WxH Nbit Mbit out.yuv
"""
from __future__ import annotations

import sys

import numpy as np


def convert_plane(p: np.ndarray, n: int, m: int) -> np.ndarray:
    x = p.astype(np.int32)
    if m > n:
        x = x << (m - n)
    elif m < n:
        x = (x + (1 << (n - m - 1))) >> (n - m)
    return np.clip(x, 0, (1 << m) - 1)


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 5:
        print("usage: convert_bitdepth in.yuv WxH Nbit Mbit out.yuv",
              file=sys.stderr)
        return 2
    src, wh, nbit, mbit, dst = argv
    w, h = (int(v) for v in wh.lower().split("x"))
    n, m = int(nbit), int(mbit)
    in_t = np.uint8 if n <= 8 else np.uint16
    out_t = np.uint8 if m <= 8 else np.uint16
    sizes = (w * h, w * h // 4, w * h // 4)
    frames = 0
    with open(src, "rb") as f, open(dst, "wb") as g:
        while True:
            planes = []
            for sz in sizes:
                raw = f.read(sz * np.dtype(in_t).itemsize)
                if len(raw) < sz * np.dtype(in_t).itemsize:
                    planes = None
                    break
                planes.append(np.frombuffer(raw, in_t))
            if planes is None:
                break
            for p in planes:
                g.write(convert_plane(p, n, m).astype(out_t).tobytes())
            frames += 1
    print(f"converted {frames} frames {w}x{h} {n}bit -> {m}bit")
    return 0


if __name__ == "__main__":
    sys.exit(main())

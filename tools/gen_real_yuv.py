"""Real-texture test clip: camera motion over a real photograph.

The synthetic bench clip (gen_test_yuv) has procedural statistics; the
round-4 negative results (TS/AMP/RQT "worthless") are conditioned on
it.  This generator provides a second evidence source with NATURAL
image statistics: the only redistributable real photograph in the
image (matplotlib's sample_data/grace_hopper.jpg) viewed through a
slowly panning + zooming camera with sub-pixel motion (bilinear
resampling), plus a moving foreground patch.  Rigid motion over real
texture is not natural video, but it exercises real edges, gradients
and texture spectra that the procedural clip cannot.

    python tools/gen_real_yuv.py out.yuv [--w 416 --h 240 --frames 20]

or import synth_real_clip(w, h, n) -> [(y, u, v)] like synth_clip.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

_JPG = os.path.join(os.path.dirname(np.__file__), "..", "matplotlib",
                    "mpl-data", "sample_data", "grace_hopper.jpg")


def _photo_ycbcr():
    from PIL import Image
    img = Image.open(os.path.normpath(_JPG)).convert("YCbCr")
    a = np.asarray(img).astype(np.float64)          # (H, W, 3)
    return a[..., 0], a[..., 1], a[..., 2]


def _sample(plane, ys, xs):
    """Bilinear sample at float coords (clamped)."""
    h, w = plane.shape
    ys = np.clip(ys, 0, h - 1.001)
    xs = np.clip(xs, 0, w - 1.001)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    fy, fx = ys - y0, xs - x0
    p = (plane[y0, x0] * (1 - fy) * (1 - fx)
         + plane[y0, x0 + 1] * (1 - fy) * fx
         + plane[y0 + 1, x0] * fy * (1 - fx)
         + plane[y0 + 1, x0 + 1] * fy * fx)
    return p


def synth_real_clip(w: int, h: int, n: int):
    """[(y, u, v)] uint8-range int arrays, 4:2:0."""
    Y, Cb, Cr = _photo_ycbcr()
    ph, pw = Y.shape
    out = []
    for t in range(n):
        # slow pan + gentle zoom + sub-pixel handheld jitter
        zoom = 1.15 + 0.004 * t
        cx = pw * 0.45 + 6.3 * t + 0.7 * np.sin(t * 1.7)
        cy = ph * 0.40 + 2.1 * t + 0.5 * np.cos(t * 1.3)
        ys = cy + (np.arange(h) - h / 2)[:, None] / zoom \
            + np.zeros((1, w))
        xs = cx + (np.arange(w) - w / 2)[None, :] / zoom \
            + np.zeros((h, 1))
        y = _sample(Y, ys, xs)
        cb = _sample(Cb, ys, xs)
        cr = _sample(Cr, ys, xs)
        # moving foreground: a second (differently-scaled) crop pasted
        # over a drifting rectangle — occlusion + local motion
        fw, fh = w // 4, h // 4
        fx0 = int((w - fw) * (0.2 + 0.03 * t) % (w - fw))
        fy0 = int(h * 0.55) - (t % 8)
        fy0 = max(0, min(h - fh, fy0))
        fys = 40 + 3.0 * t + np.arange(fh)[:, None] * 1.7 \
            + np.zeros((1, fw))
        fxs = 60 + 5.0 * t + np.arange(fw)[None, :] * 1.7 \
            + np.zeros((fh, 1))
        y[fy0:fy0 + fh, fx0:fx0 + fw] = _sample(Y, fys, fxs)
        cb[fy0:fy0 + fh, fx0:fx0 + fw] = _sample(Cb, fys, fxs)
        cr[fy0:fy0 + fh, fx0:fx0 + fw] = _sample(Cr, fys, fxs)
        # 4:2:0 chroma: co-sited average downsample
        u = (cb[0::2, 0::2] + cb[0::2, 1::2] + cb[1::2, 0::2]
             + cb[1::2, 1::2]) / 4.0
        v = (cr[0::2, 0::2] + cr[0::2, 1::2] + cr[1::2, 0::2]
             + cr[1::2, 1::2]) / 4.0
        out.append((np.clip(np.round(y), 0, 255).astype(np.int32),
                    np.clip(np.round(u), 0, 255).astype(np.int32),
                    np.clip(np.round(v), 0, 255).astype(np.int32)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--w", type=int, default=416)
    ap.add_argument("--h", type=int, default=240)
    ap.add_argument("--frames", type=int, default=20)
    args = ap.parse_args()
    with open(args.out, "wb") as f:
        for y, u, v in synth_real_clip(args.w, args.h, args.frames):
            f.write(y.astype(np.uint8).tobytes())
            f.write(u.astype(np.uint8).tobytes())
            f.write(v.astype(np.uint8).tobytes())
    print(f"wrote {args.frames} frames {args.w}x{args.h} 4:2:0 ->"
          f" {args.out}")


if __name__ == "__main__":
    main()

"""Per-syntax bit audit of an encode (utils/bitaudit.py backend).

Runs the encoder with the native entropy engine disabled so every
slice goes through the Python walk, whose bins are counted by category
with the adaptive fractional-bit counter.

    python tools/bit_audit.py [--qp 32] [--frames 8] [--subpel nn]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qp", type=int, default=32)
    ap.add_argument("--frames", type=int, default=9)
    ap.add_argument("--subpel", default="nn")
    ap.add_argument("--width", type=int, default=416)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/jax_cache_hmtpu")
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from hmtpu import native
    from hmtpu.entropy import recorder
    from hmtpu.utils.bitaudit import AuditBackend

    native.available = lambda: False          # force the Python walk
    native.get_entropy_lib = lambda: None     # (both entry points)

    audits = []

    def patched(ctx):
        b = AuditBackend(ctx)
        audits.append(b)
        return b

    recorder.make_backend = patched

    from tools.gen_test_yuv import synth_clip

    from hmtpu.encoder.top import Encoder, EncoderConfig
    from hmtpu.io.yuv import Frame

    frames = [Frame(y.astype(np.int32), u.astype(np.int32),
                    v.astype(np.int32), 8)
              for y, u, v in synth_clip(args.width, args.height,
                                        args.frames, 42)]
    enc = Encoder(EncoderConfig(
        width=args.width, height=args.height, qp=args.qp, gop="ldp",
        subpel=args.subpel, search_range=64))
    enc.encode_sequence(frames)

    cats = sorted({c for a in audits for c in a.by})
    print(f"{'frame':>5} {'total':>8} | " +
          " ".join(f"{c:>9}" for c in cats))
    agg = {}
    agg_p = {}
    for i, a in enumerate(audits):
        print(f"{i:>5} {a.total():>8.0f} | " +
              " ".join(f"{a.by.get(c, 0.0):>9.0f}" for c in cats))
        for c, v in a.by.items():
            agg[c] = agg.get(c, 0.0) + v
            if i > 0:
                agg_p[c] = agg_p.get(c, 0.0) + v
    tot = sum(agg.values())
    print(f"{'all':>5} {tot:>8.0f} | " +
          " ".join(f"{agg.get(c, 0.0):>9.0f}" for c in cats))
    totp = sum(agg_p.values())
    n_p = max(len(audits) - 1, 1)
    print(f"P-avg {totp / n_p:>8.0f} | " +
          " ".join(f"{agg_p.get(c, 0.0) / n_p:>9.0f}" for c in cats))


if __name__ == "__main__":
    main()

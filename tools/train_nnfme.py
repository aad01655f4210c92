"""Train the per-QP NN-FME MLPs and export runtime weights.

JAX equivalent of the reference's offline loop (DL/Extract_data.sh ->
NN_training.ipynb -> DL/edit.sh -> hand-paste into TEncSearch.cpp:470):
extract the SSE dataset with the encoder's batched ME, train the
17->22->20->49 model, and save .npz weights that the encoder loads at
runtime (no hand-pasting step).

Usage:
  python tools/train_nnfme.py [--yuv path WxH] [--frames N]
      [--qps 22,27,32,37] [--epochs 60] [--out hmtpu/models/weights]
"""
from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--yuv", default=None,
                    help="planar 4:2:0 8-bit input; default: synthetic clip")
    ap.add_argument("--size", default="416x240")
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--qps", default="22,27,32,37")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--search-range", type=int, default=16)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "hmtpu", "models", "weights"))
    ap.add_argument("--csv-dir", default=None,
                    help="also write SSE_<qp>.csv in the reference layout")
    args = ap.parse_args(argv)

    import numpy as np

    from hmtpu.io.yuv import Frame, YuvReader
    from hmtpu.models.dataset import extract_clip, write_sse_csv
    from hmtpu.models.nnfme import save_npz
    from hmtpu.models.train import train

    w, h = (int(v) for v in args.size.split("x"))
    if args.yuv:
        rd = YuvReader(args.yuv, w, h)
        frames = [rd.read_frame() for _ in range(args.frames)]
    else:
        from tools.gen_test_yuv import synth_clip
        frames = [Frame(y.astype(np.int32), u.astype(np.int32),
                        v.astype(np.int32))
                  for y, u, v in synth_clip(w, h, args.frames)]

    os.makedirs(args.out, exist_ok=True)
    for qp in (int(q) for q in args.qps.split(",")):
        c9, hh, ww, ll = extract_clip(frames, qp, args.search_range)
        if args.csv_dir:
            os.makedirs(args.csv_dir, exist_ok=True)
            write_sse_csv(os.path.join(args.csv_dir, f"SSE_{qp}.csv"),
                          c9, hh, ww, ll)
        base = np.bincount(ll, minlength=49).max() / len(ll)
        params, vacc = train(c9, hh, ww, ll, epochs=args.epochs,
                             log_every=max(1, args.epochs // 4))
        out = os.path.join(args.out, f"qp{qp}.npz")
        save_npz(out, params)
        print(f"QP{qp}: {len(ll)} rows, majority-class {base:.3f}, "
              f"val acc {vacc:.3f} -> {out}")


if __name__ == "__main__":
    sys.exit(main())

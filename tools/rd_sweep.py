"""4-QP RD sweep + BD-rate vs the HM anchors (SURVEY §6 protocol).

    python tools/rd_sweep.py [--frames 20] [--qps 22,27,32,37]

Prints one line per QP and the luma BD-rate vs tools/anchors_20f.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def encode_qp(frames_np, qp, subpel, w, h, decision="scan",
              srange=64):
    import numpy as np

    from hmtpu.encoder.top import Encoder, EncoderConfig
    from hmtpu.io.yuv import Frame

    frames = [Frame(y.astype(np.int32), u.astype(np.int32),
                    v.astype(np.int32), 8) for y, u, v in frames_np]
    enc = Encoder(EncoderConfig(width=w, height=h, qp=qp, gop="ldp",
                                subpel=subpel, search_range=srange,
                                decision=decision))
    t0 = time.time()
    bs = enc.encode_sequence(frames)
    dt = time.time() - t0
    n = len(frames)
    kbps = len(bs) * 8 * 50.0 / n / 1000.0
    py = sum(r.psnr_y for r in enc.results) / n
    pu = sum(r.psnr_u for r in enc.results) / n
    pv = sum(r.psnr_v for r in enc.results) / n
    return dict(kbps=kbps, psnr_y=py, psnr_u=pu, psnr_v=pv,
                fps=n / dt, bitstream=bs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--qps", default="22,27,32,37")
    ap.add_argument("--subpel", default="nn")
    ap.add_argument("--decision", default="scan",
                    choices=("scan", "jacobi"))
    ap.add_argument("--srange", type=int, default=64,
                    help="search range (64 = bench + HM-anchor parity)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--clip", default="synth",
                    choices=("synth", "real"),
                    help="real = camera motion over a real photo "
                         "(tools/gen_real_yuv.py), anchors from "
                         "anchors_real_20f.json")
    ap.add_argument("--decode-check", action="store_true",
                    help="run the HM oracle decoder on each stream")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/jax_cache_hmtpu")
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from hmtpu.utils.bdrate import bd_rate

    w, h = 416, 240
    qps = [int(q) for q in args.qps.split(",")]
    if args.clip == "real":
        from tools.gen_real_yuv import synth_real_clip
        frames_np = list(synth_real_clip(w, h, args.frames))
        anchor_file = "anchors_real_20f.json"
    else:
        from tools.gen_test_yuv import synth_clip
        frames_np = list(synth_clip(w, h, args.frames, 42))
        anchor_file = "anchors_20f.json"

    anchors = json.load(open(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        anchor_file)))["ldp"]

    ours_r, ours_p = [], []
    anch_r, anch_p = [], []
    for qp in qps:
        r = encode_qp(frames_np, qp, args.subpel, w, h,
                      decision=args.decision, srange=args.srange)
        a = anchors[str(qp)]
        print(f"QP{qp}: ours {r['kbps']:8.2f} kbps  Y {r['psnr_y']:.4f}"
              f"  (HM {a['kbps']:8.2f} / {a['psnr_y']:.4f})"
              f"  ratio {r['kbps'] / a['kbps']:.2f}x"
              f"  fps {r['fps']:.2f}", flush=True)
        if args.decode_check:
            path = f"/tmp/rd_q{qp}.bin"
            open(path, "wb").write(r["bitstream"])
            rc = os.system(
                f"/tmp/hm_oracle/bin/TAppDecoderStatic -b {path}"
                f" -o /dev/null > /tmp/rd_q{qp}_dec.log 2>&1")
            ok = rc == 0 and "(OK)" in open(
                f"/tmp/rd_q{qp}_dec.log").read()
            print(f"      oracle decode: {'OK' if ok else 'FAIL'}")
        ours_r.append(r["kbps"])
        ours_p.append(r["psnr_y"])
        anch_r.append(a["kbps"])
        anch_p.append(a["psnr_y"])

    if len(qps) >= 4:
        bd = bd_rate(anch_r, anch_p, ours_r, ours_p)
        print(f"BD-rate (Y) vs HM: {bd:+.1f}%")


if __name__ == "__main__":
    main()

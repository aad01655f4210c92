"""HM anchors for the real-texture clip (tools/gen_real_yuv.py):
runs the reference encoder (the oracle build) at the 4-QP sweep on the
LDP config and records kbps + PSNR into tools/anchors_real_20f.json —
the second evidence base VERDICT r4 asked for (the TS/AMP/RQT negative
results are conditioned on the procedural clip).

    python tools/build_real_anchors.py [--frames 20]
Requires /tmp/hm_oracle/bin/TAppEncoderStatic
(bash tools/build_reference_oracle.sh).
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

ENC = "/tmp/hm_oracle/bin/TAppEncoderStatic"
CFG = "/root/reference/cfg/encoder_lowdelay_P_main.cfg"


def run_qp(yuv: str, qp: int, frames: int, w: int, h: int):
    cmd = [ENC, "-c", CFG, "-i", yuv, "-wdt", str(w), "-hgt", str(h),
           "-fr", "50", "-f", str(frames), "-q", str(qp),
           "-b", f"/tmp/real_anchor_q{qp}.hevc", "--SEIDecodedPictureHash=1"]
    t0 = time.time()
    out = subprocess.run(cmd, capture_output=True, text=True,
                         timeout=3600)
    dt = time.time() - t0
    if out.returncode != 0:
        raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])
    # summary line: "   a  <frames> <bitrate> <Y> <U> <V> ..." after
    # "SUMMARY --------"
    m = re.search(r"SUMMARY[^\n]*\n[^\n]*\n\s*\d+\s+a\s+"
                  r"([\d.]+)\s+([\d.]+)\s+([\d.]+)\s+([\d.]+)",
                  out.stdout)
    if not m:
        raise RuntimeError("summary not found:\n" + out.stdout[-2000:])
    return dict(kbps=float(m.group(1)), psnr_y=float(m.group(2)),
                psnr_u=float(m.group(3)), psnr_v=float(m.group(4)),
                fps=round(frames / dt, 4))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--w", type=int, default=416)
    ap.add_argument("--h", type=int, default=240)
    ap.add_argument("--yuv", default="/tmp/real_416.yuv")
    args = ap.parse_args()
    if not os.path.exists(args.yuv):
        from tools.gen_real_yuv import synth_real_clip
        import numpy as np
        with open(args.yuv, "wb") as f:
            for y, u, v in synth_real_clip(args.w, args.h, args.frames):
                f.write(y.astype(np.uint8).tobytes())
                f.write(u.astype(np.uint8).tobytes())
                f.write(v.astype(np.uint8).tobytes())
    res = {}
    for qp in (22, 27, 32, 37):
        res[str(qp)] = run_qp(args.yuv, qp, args.frames, args.w, args.h)
        print(qp, res[str(qp)], flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "anchors_real_20f.json")
    with open(out, "w") as f:
        json.dump({"ldp": res, "clip": "gen_real_yuv grace_hopper pan",
                   "frames": args.frames}, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()

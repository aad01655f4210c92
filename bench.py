"""Benchmark driver: encode the standard synthetic clip and report
throughput vs the measured HM-16.9 baseline (BASELINE_MEASURED.json).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}
"""
import json
import os
import sys
import time


def main():
    frames_n = int(os.environ.get("HMTPU_BENCH_FRAMES", "10"))
    qp = int(os.environ.get("HMTPU_BENCH_QP", "32"))

    import numpy as np

    from hmtpu.encoder.top import Encoder, EncoderConfig
    from hmtpu.io.yuv import Frame
    from tools.gen_test_yuv import synth_clip

    frames = [Frame(y.astype(np.int32), u.astype(np.int32),
                    v.astype(np.int32))
              for y, u, v in synth_clip(416, 240, frames_n)]

    enc = Encoder(EncoderConfig(width=416, height=240, qp=qp))
    # warmup on one frame (jit compiles)
    enc.encode_frame_au(frames[0], 0)

    enc = Encoder(EncoderConfig(width=416, height=240, qp=qp))
    t0 = time.time()
    stream = enc.encode_sequence(frames)
    dt = time.time() - t0
    fps = frames_n / dt

    base = json.load(open(os.path.join(os.path.dirname(__file__),
                                       "BASELINE_MEASURED.json")))
    hm_fps = base["configs"]["intra_main_qp32"]["fps"]

    mean_psnr = sum(r.psnr_y for r in enc.results) / len(enc.results)
    bitrate = sum(r.bits for r in enc.results) / frames_n * 50 / 1000.0

    print(json.dumps({
        "metric": "encode_fps_intra_416x240_qp32",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / hm_fps, 4),
        "psnr_y": round(mean_psnr, 3),
        "bitrate_kbps": round(bitrate, 1),
        "hm_fps": hm_fps,
    }))


if __name__ == "__main__":
    sys.exit(main())

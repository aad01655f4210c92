"""Benchmark driver: encode the headline config (BlowingBubbles-class
low-delay-P with NN-FME sub-pel, BASELINE.json north star), report
throughput vs the measured HM-16.9 baseline (BASELINE_MEASURED.json),
and run the 4-QP BD-rate sweep against the 20-frame HM anchors
(tools/anchors_20f.json, SURVEY §6 protocol).

Prints the headline JSON line IMMEDIATELY after the timed run (so a
timeout during the sweeps still leaves a parseable result), then the
same schema re-printed with the BD-rate fields filled once the sweeps
finish — a parser taking either the first or the last JSON line gets
fps + vs_baseline either way:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N,
   "bd_rate_y_pct": N, ...}
"""
import json
import os
import sys
import time


def main():
    frames_n = int(os.environ.get("HMTPU_BENCH_FRAMES", "30"))
    qp = int(os.environ.get("HMTPU_BENCH_QP", "22"))
    bd_frames = int(os.environ.get("HMTPU_BENCH_BD_FRAMES", "20"))
    # scan = BD flagship (+74% vs HM anchors, chip-measured r4);
    # jacobi = speed engine (2.08 vs 1.42 fps, +92%) — HMTPU_BENCH_DECISION
    decision = os.environ.get("HMTPU_BENCH_DECISION", "scan")
    run_sweeps = os.environ.get("HMTPU_BENCH_SWEEPS", "1") != "0"

    import jax

    # persistent XLA compile cache: one P variant per sub-pel strategy
    # (the ref stack is padded so the DPB ramp reuses it); cold ~8 min
    # each on the chip, cached runs start in seconds
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("HMTPU_JAX_CACHE",
                                     "/root/jax_cache_bench"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      5.0)

    import numpy as np

    from hmtpu.encoder.top import Encoder, EncoderConfig
    from hmtpu.io.yuv import Frame
    from tools.gen_test_yuv import synth_clip

    frames = [Frame(y.astype(np.int32), u.astype(np.int32),
                    v.astype(np.int32))
              for y, u, v in synth_clip(416, 240, frames_n)]

    # SearchRange 64 = the reference cfg's value
    # (cfg/encoder_lowdelay_P_main.cfg); the HM anchors were measured
    # with it, so the comparison runs with it too.  Overridable for
    # A/Bs (HMTPU_BENCH_SRANGE=16 was the pre-r5 bench value).
    srange = int(os.environ.get("HMTPU_BENCH_SRANGE", "64"))

    def run(n, q, subpel="nn", dec=None):
        enc = Encoder(EncoderConfig(width=416, height=240, qp=q,
                                    gop="ldp", subpel=subpel,
                                    search_range=srange,
                                    decision=dec or decision))
        t0 = time.time()
        enc.encode_sequence(frames[:n])
        return enc, time.time() - t0

    run(3, qp)                 # warmup: compile I + the single P variant
    enc, dt = run(frames_n, qp)
    fps = frames_n / dt

    base = json.load(open(os.path.join(os.path.dirname(__file__),
                                       "BASELINE_MEASURED.json")))
    hm = base["configs"][f"lowdelay_P_main_qp{qp}"]

    mean_psnr = sum(r.psnr_y for r in enc.results) / len(enc.results)
    bitrate = sum(r.bits for r in enc.results) / frames_n * 50 / 1000.0

    result = {
        "metric": f"encode_fps_ldp_nnfme_416x240_qp{qp}",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / hm["fps"], 4),
        "decision": decision,
        "search_range": srange,
        "bd_rate_y_pct": None,
        "bd_rate_y_pct_dctif": None,
        "bd_rate_y_pct_integer": None,
        "psnr_y": round(mean_psnr, 3),
        "bitrate_kbps": round(bitrate, 1),
        "hm_fps": hm["fps"],
        "hm_bitrate_kbps": hm["bitrate_kbps"],
        "hm_psnr_y": hm["psnr_y"],
    }
    # headline first — a sweep timeout must not erase the fps number
    print(json.dumps(result), flush=True)
    if not run_sweeps:
        return

    # ---- BD-rate sweep vs the 20-frame HM anchors.  A sweep failure
    # is a bench failure (it used to be silently swallowed to null).
    from hmtpu.utils.bdrate import bd_rate

    anchors = json.load(open(os.path.join(
        os.path.dirname(__file__), "tools",
        "anchors_20f.json")))["ldp"]
    ar = [anchors[str(q)]["kbps"] for q in (22, 27, 32, 37)]
    ap = [anchors[str(q)]["psnr_y"] for q in (22, 27, 32, 37)]

    def sweep(subpel):
        """4-QP BD-rate of one sub-pel strategy vs the HM anchors
        (the NN-FME A/B the reference never published)."""
        ours_r, ours_p = [], []
        for q in (22, 27, 32, 37):
            e, _ = run(bd_frames, q, subpel)
            n = len(e.results)
            ours_r.append(sum(r.bits for r in e.results)
                          / n * 50 / 1000.0)
            ours_p.append(sum(r.psnr_y for r in e.results) / n)
        return bd_rate(ar, ap, ours_r, ours_p), ours_r

    bd, nn_rates = sweep("nn")
    result["bd_rate_y_pct"] = None if bd is None else round(bd, 1)
    # per-QP bit ratios vs the anchors: the BD cubic fit swings +-5
    # points with ~0.05 dB endpoint noise on this clip; the ratios
    # are the robust quality metric for cross-round comparison
    result["bits_ratio_per_qp"] = {
        str(q): round(r / a, 3)
        for q, r, a in zip((22, 27, 32, 37), nn_rates, ar)}
    print(json.dumps(result), flush=True)
    # the speed engine's throughput on the same config (scan is the
    # BD flagship; jacobi trades ~17 BD points for ~1.5x speed)
    other = "jacobi" if decision == "scan" else "scan"
    run(3, qp, dec=other)
    _, dto = run(frames_n, qp, dec=other)
    result[f"fps_{other}"] = round(frames_n / dto, 4)
    print(json.dumps(result), flush=True)
    result["bd_rate_y_pct_dctif"] = round(sweep("dctif")[0], 1)
    print(json.dumps(result), flush=True)
    result["bd_rate_y_pct_integer"] = round(sweep("none")[0], 1)
    print(json.dumps(result), flush=True)

    # ---- all-intra throughput (VERDICT r4 #8: the AI path had no
    # perf number; HM single-core AI = BASELINE_MEASURED
    # intra_main_qp32)
    def run_ai(n, q):
        enc = Encoder(EncoderConfig(width=416, height=240, qp=q,
                                    gop="ai", subpel="none"))
        t0 = time.time()
        enc.encode_sequence(frames[:n])
        return enc, time.time() - t0

    run_ai(3, 32)
    _, dt_ai = run_ai(frames_n, 32)
    hm_ai = base["configs"].get("intra_main_qp32")
    result["fps_ai_qp32"] = round(frames_n / dt_ai, 4)
    if hm_ai:
        result["vs_hm_ai"] = round(frames_n / dt_ai / hm_ai["fps"], 4)
    print(json.dumps(result), flush=True)

    # ---- BD-rate on REAL-texture content (VERDICT r4 #9): second
    # evidence base — HM anchors from tools/build_real_anchors.py
    real_path = os.path.join(os.path.dirname(__file__), "tools",
                             "anchors_real_20f.json")
    if os.path.exists(real_path):
        from tools.gen_real_yuv import synth_real_clip
        real = json.load(open(real_path))["ldp"]
        rr = [real[str(q)]["kbps"] for q in (22, 27, 32, 37)]
        rp = [real[str(q)]["psnr_y"] for q in (22, 27, 32, 37)]
        rframes = [Frame(y, u, v)
                   for y, u, v in synth_real_clip(416, 240, bd_frames)]
        ours_r, ours_p = [], []
        for q in (22, 27, 32, 37):
            e = Encoder(EncoderConfig(width=416, height=240, qp=q,
                                      gop="ldp", subpel="nn",
                                      search_range=srange,
                                      decision=decision))
            e.encode_sequence(rframes)
            n = len(e.results)
            ours_r.append(sum(r.bits for r in e.results)
                          / n * 50 / 1000.0)
            ours_p.append(sum(r.psnr_y for r in e.results) / n)
        bd_real = bd_rate(rr, rp, ours_r, ours_p)
        result["bd_rate_y_pct_real"] = \
            None if bd_real is None else round(bd_real, 1)
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    sys.exit(main())

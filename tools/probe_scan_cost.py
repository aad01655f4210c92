"""Decompose the z-scan decision pass's per-body cost on the chip.

The 3-level scan is 72% of P-frame time (PROFILE_r04.json) across
~550 sequential cell bodies.  Each body mixes: merge/AMVP list
derivation + candidate MC + SSE screening (the "lists" part), residual
transform/quant (the "code" part) and the RDOQ trellis (the "trellis"
part).  This probe times the full device pass under three ablations to
attribute the per-body cost:

  full      — production scan (rdoq trellis on)
  deadzone  — rdoq=False (plain deadzone quant; trellis ablated)
  nocode    — _code monkeypatched to skip transform/quant entirely
              (prediction passthrough; lists+MC+scatter cost only)

Usage: python tools/probe_scan_cost.py [--qp 22] [--frames 6]
Writes one JSON line; uses the bench compile cache.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qp", type=int, default=22)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--variants", default="full,deadzone,nocode")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/jax_cache_bench")
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import numpy as np

    from hmtpu.encoder.top import Encoder, EncoderConfig
    from hmtpu.io.yuv import Frame
    from tools.gen_test_yuv import synth_clip

    w, h = 416, 240
    frames = [Frame(y.astype(np.int32), u.astype(np.int32),
                    v.astype(np.int32))
              for y, u, v in synth_clip(w, h, args.frames)]

    def run(rdoq=True):
        enc = Encoder(EncoderConfig(width=w, height=h, qp=args.qp,
                                    gop="ldp", subpel="nn",
                                    rdoq=rdoq))
        enc.encode_sequence(frames[:3])          # warm compile
        t0 = time.perf_counter()
        enc.encode_sequence(frames)
        return (time.perf_counter() - t0) / len(frames)

    out = {"qp": args.qp, "frames": args.frames,
           "device": jax.devices()[0].platform}
    variants = args.variants.split(",")
    if "full" in variants:
        out["s_full"] = round(run(True), 4)
        print("full:", out["s_full"], flush=True)
    if "deadzone" in variants:
        out["s_deadzone"] = round(run(False), 4)
        print("deadzone:", out["s_deadzone"], flush=True)
    if "nocode" in variants:
        # ablate transform/quant entirely: _code returns the
        # prediction as "recon" with zero levels/bits
        import hmtpu.encoder.pframe_dev as pd

        def _code_nop(org, pred, qp, log2, bd, lam=None, cbflat=None,
                      is_luma=True, dw=None, sdh=False, scan_sel=None,
                      use_dst=False, rdoq=True, ts=False):
            n = 1 << log2
            lev = jnp.zeros(org.shape, jnp.int32)
            sse = jnp.sum((org - pred) ** 2,
                          axis=(-1, -2)).astype(jnp.float32)
            if dw is not None:
                sse = sse * dw
            return lev, pred, sse, jnp.zeros(org.shape[:-2],
                                             jnp.float32)

        pd._code = _code_nop
        # rebuild the jitted entry so the patch is traced in
        fpp = pd.full_pframe_pass.__wrapped__.__wrapped__
        pd.full_pframe_pass = pd.python_dispatch(
            jax.jit(fpp, static_argnames=pd._FPP_STATICS),
            pd._FPP_STATICS)
        out["s_nocode"] = round(run(True), 4)
        print("nocode:", out["s_nocode"], flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

"""Per-stage throughput breakdown of the device encoder (the VERDICT-r2
measurement harness: "win the throughput back, with evidence").

Times, on the real chip (or CPU fallback), for the LDP headline config:
  - integer ME (all sizes, all refs)      [search/me.py]
  - sub-pel (NN-FME or DCT-IF)            [models/nnfme.py / ops/interp.py]
  - wavefront decision scan (levels=3)    [encoder/pframe_dev.py]
  - deblock + SAO                         [ops/deblock.py, ops/sao.py]
  - full device pass (one dispatch)       [full_pframe_pass]
  - host entropy pass                     [entropy/recorder.py + native]
  - I-frame device pass                   [encoder/iframe_dev.py]

Usage:  python tools/profile_encode.py [--qp 22] [--frames 8]
        [--trace DIR]   (writes a jax.profiler trace to DIR)

Prints one JSON dict of stage -> seconds/frame, plus derived shares.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timeit(fn, n=5, warmup=2):
    import jax
    for _ in range(warmup):
        jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / n, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qp", type=int, default=22)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--trace", default=None)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hmtpu.encoder.top import Encoder, EncoderConfig
    from hmtpu.io.yuv import Frame
    from tools.gen_test_yuv import synth_clip

    w, h, qp = 416, 240, args.qp
    frames = [Frame(y.astype(np.int32), u.astype(np.int32),
                    v.astype(np.int32))
              for y, u, v in synth_clip(w, h, args.frames)]

    res = {"device": jax.devices()[0].platform, "qp": qp}

    # ---- end-to-end split: device launch vs host finish
    cfg = EncoderConfig(width=w, height=h, qp=qp, gop="ldp", subpel="nn")
    enc = Encoder(cfg)
    enc.encode_sequence(frames[:3])      # warm all compiles
    enc = Encoder(EncoderConfig(width=w, height=h, qp=qp, gop="ldp",
                                subpel="nn"))
    t0 = time.perf_counter()
    enc.encode_sequence(frames)
    t_total = time.perf_counter() - t0
    res["e2e_fps"] = round(args.frames / t_total, 3)
    res["e2e_s_per_frame"] = round(t_total / args.frames, 4)

    # manual two-phase timing of one P frame
    launched = enc._launch_p(frames[-1], args.frames)
    st = launched["ctx"]["st"]
    jax.block_until_ready(st)

    t0 = time.perf_counter()
    l2 = enc._launch_p(frames[-2], args.frames + 1)
    jax.block_until_ready(l2["ctx"]["st"])
    res["p_device_launch_s"] = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    enc._finish_p(l2)
    res["p_host_finish_s"] = round(time.perf_counter() - t0, 4)

    # ---- stage micro-benches on the same geometry
    from hmtpu.common.constants import SliceType
    from hmtpu.encoder.pframe_dev import (
        _dev_static,
        full_pframe_pass,
        wavefront_pass,
    )
    from hmtpu.entropy.contexts import make_contexts
    from hmtpu.entropy.fracbits import ctx_bits_table
    from hmtpu.search.me import frac_refine_batch, integer_me

    rng = np.random.RandomState(0)
    org_y = jnp.asarray(frames[1].y, jnp.int32)
    org_u = jnp.asarray(frames[1].u, jnp.int32)
    org_v = jnp.asarray(frames[1].v, jnp.int32)
    refs_y = jnp.asarray(frames[0].y, jnp.int32)[None].repeat(4, 0)
    refs_u = jnp.asarray(frames[0].u, jnp.int32)[None].repeat(4, 0)
    refs_v = jnp.asarray(frames[0].v, jnp.int32)[None].repeat(4, 0)
    dev = _dev_static(w, h, 6)
    cbflat = jnp.asarray(
        ctx_bits_table(make_contexts(SliceType.P, qp)).reshape(-1))
    lam_sqrt = jnp.sqrt(jnp.float32(0.4624)
                        * jnp.power(2.0, (qp - 12) / 3.0))
    bw, bh = w // 8, h // 8
    z = jnp.zeros((bh, bw), jnp.int32)

    @jax.jit
    def me8(ref, org):
        outs = [integer_me(ref[r], org, 8, 16, lam_sqrt, z, z)
                for r in range(4)]
        return outs

    t, me_out = timeit(lambda: me8(refs_y, org_y), args.reps)
    res["me8_4ref_s"] = round(t, 4)
    (mvx, mvy), sten, sad = me_out[0]

    from hmtpu.models.nnfme import predict_offsets
    enc_nn = enc.nn_params

    @jax.jit
    def subpel_nn(sten):
        st9 = sten.reshape(-1, 9).astype(jnp.float32)
        sizes = jnp.full((bw * bh,), 8, jnp.int32)
        return predict_offsets(enc_nn, st9, sizes, sizes)

    t, _ = timeit(lambda: subpel_nn(sten), args.reps)
    res["subpel_nn_s"] = round(t, 5)

    mvq_x, mvq_y = mvx * 4, mvy * 4
    rsel = z
    ref_pocs = jnp.asarray([0, 1, 2, 3], jnp.int32)

    def wf(levels):
        def f():
            return wavefront_pass(
                org_y, org_u, org_v, refs_y, refs_u, refs_v,
                mvq_x, mvq_y, rsel, dev["lv_blk"], dev["nb_ok"],
                dev["nb_flat"], dev["sub_y"], dev["none_y"],
                dev["sub_c"], dev["none_c"], ref_pocs, jnp.int32(4),
                mv16=(z[:bh // 2, :bw // 2], z[:bh // 2, :bw // 2],
                      z[:bh // 2, :bw // 2]),
                sched16=dev["sched16"],
                mv32=(z[:(bh // 2 + 1) // 2, :(bw // 2 + 1) // 2],
                      z[:(bh // 2 + 1) // 2, :(bw // 2 + 1) // 2],
                      z[:(bh // 2 + 1) // 2, :(bw // 2 + 1) // 2]),
                sched32=dev["sched32"] if levels == 3 else None,
                qp=jnp.int32(qp), qpc=jnp.int32(qp), cbflat=cbflat,
                w=w, h=h, num_ref=4, max_merge=5, bd=8,
                levels=levels, sdh=True)
        return jax.jit(f)

    for lv in (1, 2, 3):
        fn = wf(lv)
        t, _ = timeit(fn, max(2, args.reps // 2))
        res[f"wavefront_l{lv}_s"] = round(t, 4)

    # deblock+SAO alone
    from hmtpu.ops.deblock import deblock_frame_dev
    from hmtpu.ops.sao import sao_frame_dev

    rec_y = org_y
    intra4 = jnp.zeros((h // 4, w // 4), bool)
    mv4 = jnp.stack([jnp.zeros((h // 4, w // 4), jnp.int32)] * 2)
    refpoc4 = jnp.full((2, h // 4, w // 4), -1, jnp.int32)

    @jax.jit
    def filters():
        ry, ru, rv = deblock_frame_dev(
            rec_y, org_u, org_v, intra4, intra4, mv4, mv4, refpoc4,
            jnp.int32(qp), 8)
        return sao_frame_dev(org_y, ry, org_u, ru, org_v, rv, 64,
                             jnp.float32(100.0), 8)

    t, _ = timeit(filters, args.reps)
    res["deblock_sao_s"] = round(t, 4)

    # I-frame pass
    from hmtpu.encoder.iframe_dev import iframe_full_pass
    cbf_i = jnp.asarray(
        ctx_bits_table(make_contexts(SliceType.I, qp)).reshape(-1))

    def ifp():
        return iframe_full_pass(org_y, org_u, org_v, jnp.int32(qp),
                                jnp.int32(qp), cbf_i, w=w, h=h, bd=8,
                                sdh=True)

    t, _ = timeit(ifp, max(2, args.reps // 2))
    res["iframe_pass_s"] = round(t, 4)

    if args.trace:
        from jax.profiler import trace
        fn = wf(3)
        fn()  # compiled
        with trace(args.trace):
            jax.block_until_ready(fn())
        res["trace_dir"] = args.trace

    # derived shares
    dl = res["p_device_launch_s"]
    res["share_wavefront_pct"] = round(
        100 * res["wavefront_l3_s"] / max(dl, 1e-9), 1)
    res["share_entropy_pct"] = round(
        100 * res["p_host_finish_s"]
        / max(dl + res["p_host_finish_s"], 1e-9), 1)

    # MFU accounting for the two arithmetic-dominated kernels (ops
    # counted analytically; peak from the device kind — v5e litepod
    # chip ~394 TFLOP/s bf16, but these kernels run int32 on the
    # VPU, so report against the int8-equivalent 2x MXU number AND
    # the raw op count so the number is interpretable)
    side = 2 * 16 + 1
    me_ops = 3.0 * side * side * w * h * 4          # abs/sub/add x D x pix x refs
    res["me8_gops"] = round(me_ops / 1e9, 2)
    res["me8_gops_per_s"] = round(me_ops / 1e9 / res["me8_4ref_s"], 1)
    # RDOQ-bearing residual coding: dominated by the 4-point/8-point
    # butterflies as matmuls -> MACs = 2*N^3 per NxN stage, 2 stages,
    # fwd+inv, ~3 candidate codings per block level in the pass
    n_blk = (w // 8) * (h // 8)
    tr_ops = n_blk * 3 * 2 * 2 * 2 * (8 ** 3)
    res["transform_gops_frame"] = round(tr_ops / 1e9, 3)
    dev_kind = jax.devices()[0].device_kind
    res["device_kind"] = dev_kind
    peak = 394e12 if "v5" in dev_kind.lower() else 0
    if peak:
        # achieved fraction of peak if every ME op were an MXU MAC —
        # an upper-bound-style MFU; the honest conclusion is that the
        # pass is latency/occupancy-bound, not FLOP-bound
        res["mfu_me_pct"] = round(100 * me_ops
                                  / (res["me8_4ref_s"] * peak), 3)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

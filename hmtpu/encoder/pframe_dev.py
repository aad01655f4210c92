"""Device-resident P-slice encoder: the whole per-frame mode decision
(skip / merge / AMVP inter / intra), residual coding and closed-loop
reconstruction runs on the TPU as ONE jitted pass.

Layer parity: this is the batched inversion of TEncSlice::compressSlice
-> TEncCu::xCompressCU -> TEncSearch (TEncSlice.cpp:641, TEncCu.cpp:352,
TEncSearch.cpp:3683).  Structure:

  phase 1 (batched, no neighbour deps, hoisted out of the wavefront):
    * integer ME + NN-FME/DCT-IF sub-pel for every block (search/me.py)
    * the AMVP candidate's prediction, residual transform/quant and
      reconstruction for every block
    * open-loop intra mode choice (35 modes, SATD) for every block

  phase 2 (lax.scan over static z-scan dependency levels,
           search/wavefront.py):
    * exact merge list from the committed neighbour motion field
    * per-candidate luma SSE screening, winner's full luma+chroma
      prediction + residual coding
    * exact AMVP list -> mvd/mvp_idx bits
    * exact intra reconstruction from the committed neighbour recon
    * RD choice, reconstruction scatter, motion-field commit

Only entropy coding (native C CABAC backend) stays on host, fed by the
decision tensors this pass returns.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from hmtpu.common.constants import SliceType
from hmtpu.common.motion import PicMotion
from hmtpu.common.spec_tables import chroma_qp_from_luma
from hmtpu.encoder.intra_rdo import _MODE_BITS, _satd
from hmtpu.encoder.pframe import PFrameEncoder, PuDec
from hmtpu.entropy.headers import SliceHeader
from hmtpu.io.yuv import Frame
from hmtpu.ops.interp import (
    mc_chroma_batch,
    mc_chroma_batch_refs,
    mc_luma_batch,
    mc_luma_batch_refs,
)
from hmtpu.ops.intra_pred import filter_reference_batched, predict_all_modes
from hmtpu.ops.quant import dequantize, quantize
from hmtpu.ops.transform import forward_transform, inverse_transform
from hmtpu.search.wavefront import (
    amvp_candidates_dev,
    block_schedule,
    merge_candidates_dev,
    mv_bits_dev,
    static_ref_gather,
)

INTRA_GATE = 24.0          # evaluate intra only when inter cost > gate*lam
BIG = jnp.float32(3e38)


@lru_cache(maxsize=None)
def _dev_static(w: int, h: int, log2_ctu: int):
    """Schedule + gather tables as device arrays, one upload per
    geometry for the whole encode."""
    sched = block_schedule(w, h, log2_ctu)
    sub_y, none_y = static_ref_gather(w, h, log2_ctu, 8)
    sub_c, none_c = static_ref_gather(w // 2, h // 2, log2_ctu - 1, 4)
    return dict(
        lv_blk=jnp.asarray(sched["lv_blk"]),
        nb_ok=jnp.asarray(sched["nb_ok"].reshape(-1, 5)),
        nb_flat=jnp.asarray(sched["nb_flat"].reshape(-1, 5)),
        sub_y=jnp.asarray(sub_y), none_y=jnp.asarray(none_y),
        sub_c=jnp.asarray(sub_c), none_c=jnp.asarray(none_c),
    )


def _blockify(plane, n):
    h, w = plane.shape
    return plane.reshape(h // n, n, w // n, n).swapaxes(1, 2) \
        .reshape(-1, n, n)


def _est_bits(lev):
    """Residual-rate estimate matching pframe.est_level_bits: 1 if all
    zero, else 8 + 2*nnz + 2*sum(bit_length(|l|))."""
    a = jnp.abs(lev)
    bl = jnp.where(a > 0,
                   32 - jax.lax.clz(a.astype(jnp.uint32)), 0) \
        .astype(jnp.float32)
    nnz = jnp.sum((a > 0).astype(jnp.float32), axis=(-1, -2))
    tot = 8.0 + 2.0 * nnz + 2.0 * jnp.sum(bl, axis=(-1, -2))
    return jnp.where(nnz > 0, tot, 1.0)


def _code(org, pred, qp: int, log2: int, bd: int):
    """transform -> quant -> dequant -> inverse -> clip; returns
    (lev, rec, sse, bits)."""
    n = 1 << log2
    resi = org - pred
    coef = forward_transform(resi, n, bd)
    lev = quantize(coef, qp, log2, bd, True)
    deq = dequantize(lev, qp, log2, bd)
    r = inverse_transform(deq, n, bd)
    rec = jnp.clip(pred + r, 0, (1 << bd) - 1)
    sse = jnp.sum((org - rec) ** 2, axis=(-1, -2)).astype(jnp.float32)
    return lev, rec, sse, _est_bits(lev)


@partial(jax.jit, static_argnames=("w", "h", "num_ref", "max_merge",
                                   "qp", "qpc", "bd"))
def wavefront_pass(org_y, org_u, org_v, refs_y, refs_u, refs_v,
                   mv_x, mv_y, lv_blk, nb_ok, nb_flat,
                   sub_y, none_y, sub_u, none_c, ref_pocs, cur_poc,
                   *, w: int, h: int, num_ref: int, max_merge: int,
                   qp: int, qpc: int, bd: int):
    bw, bh = w // 8, h // 8
    P = bw * bh
    lam = jnp.float32(0.57 * 2.0 ** ((qp - 12) / 3.0))
    lam_sqrt = jnp.sqrt(lam)
    mid = jnp.int32(1 << (bd - 1))
    bidx = jnp.arange(P)
    by_all, bx_all = bidx // bw, bidx % bw
    x0_all, y0_all = bx_all * 8, by_all * 8
    org_blk = _blockify(org_y, 8)
    orgu_blk = _blockify(org_u, 4)
    orgv_blk = _blockify(org_v, 4)

    # ---- phase 1a: AMVP candidate prediction + residual for all blocks
    mvxf, mvyf = mv_x.reshape(-1), mv_y.reshape(-1)
    pred_a = mc_luma_batch(refs_y[0], x0_all, y0_all, mvxf, mvyf, 8, 8, bd)
    pred_au = mc_chroma_batch(refs_u[0], bx_all * 4, by_all * 4,
                              mvxf, mvyf, 4, 4, bd)
    pred_av = mc_chroma_batch(refs_v[0], bx_all * 4, by_all * 4,
                              mvxf, mvyf, 4, 4, bd)
    lev_ay, rec_ay, d_ay, b_ay = _code(org_blk, pred_a, qp, 3, bd)
    lev_au, rec_au, d_au, b_au = _code(orgu_blk, pred_au, qpc, 2, bd)
    lev_av, rec_av, d_av, b_av = _code(orgv_blk, pred_av, qpc, 2, bd)
    dist_a = d_ay + d_au + d_av
    bits_a_lev = b_ay + b_au + b_av

    # ---- phase 1b: open-loop intra mode per block (org-pixel refs)
    oref = jnp.where(none_y[:, None], mid, org_y.reshape(-1)[sub_y])
    oref_f = filter_reference_batched(oref, 8, bd, strong=False)
    opreds = predict_all_modes(oref, oref_f, 8, True, bd)
    satd = _satd(org_blk[:, None] - opreds).astype(jnp.float32)
    imode = jnp.argmin(satd + lam_sqrt * jnp.asarray(_MODE_BITS)[None],
                       axis=1).astype(jnp.int32)

    # ---- phase 2: wavefront scan over dependency levels
    state = dict(
        rec_y=jnp.zeros(h * w, jnp.int32),
        rec_u=jnp.zeros(h * w // 4, jnp.int32),
        rec_v=jnp.zeros(h * w // 4, jnp.int32),
        dirf=jnp.zeros(P, jnp.int32),
        fmvx=jnp.zeros(P, jnp.int32),
        fmvy=jnp.zeros(P, jnp.int32),
        fref=jnp.zeros(P, jnp.int32),
        kind=jnp.zeros(P, jnp.int32),
        mi=jnp.zeros(P, jnp.int32),
        mvdx=jnp.zeros(P, jnp.int32),
        mvdy=jnp.zeros(P, jnp.int32),
        mvpi=jnp.zeros(P, jnp.int32),
        levy=jnp.zeros((P, 8, 8), jnp.int32),
        levcb=jnp.zeros((P, 4, 4), jnp.int32),
        levcr=jnp.zeros((P, 4, 4), jnp.int32),
    )

    def step(st, blk):
        valid = blk >= 0
        b = jnp.where(valid, blk, 0)
        byi, bxi = b // bw, b % bw
        x0, y0 = bxi * 8, byi * 8
        B = blk.shape[0]
        org = org_blk[b]
        orgu = orgu_blk[b]
        orgv = orgv_blk[b]

        # merge list from committed neighbour motion
        nb = nb_flat[b]                                     # (B, 5)
        nbv = nb_ok[b] & (st["dirf"][nb] > 0)
        nmx, nmy, nrf = st["fmvx"][nb], st["fmvy"][nb], st["fref"][nb]
        cmx, cmy, crf = merge_candidates_dev(nbv, nmx, nmy, nrf,
                                             num_ref, max_merge)

        # luma SSE screening over all candidates
        M = max_merge
        rep = lambda a: jnp.repeat(a, M)
        pred_l = mc_luma_batch_refs(
            refs_y, crf.reshape(-1), rep(x0), rep(y0),
            cmx.reshape(-1), cmy.reshape(-1), 8, 8, bd).reshape(B, M, 8, 8)
        sse_l = jnp.sum((org[:, None] - pred_l) ** 2, axis=(-1, -2))
        mi = jnp.argmin(sse_l, axis=1).astype(jnp.int32)     # (B,)
        w_mvx = jnp.take_along_axis(cmx, mi[:, None], 1)[:, 0]
        w_mvy = jnp.take_along_axis(cmy, mi[:, None], 1)[:, 0]
        w_ref = jnp.take_along_axis(crf, mi[:, None], 1)[:, 0]
        pred_m = jnp.take_along_axis(
            pred_l, mi[:, None, None, None], 1)[:, 0]
        pred_mu = mc_chroma_batch_refs(refs_u, w_ref, bxi * 4, byi * 4,
                                       w_mvx, w_mvy, 4, 4, bd)
        pred_mv_ = mc_chroma_batch_refs(refs_v, w_ref, bxi * 4, byi * 4,
                                        w_mvx, w_mvy, 4, 4, bd)
        msse3 = (jnp.sum((org - pred_m) ** 2, axis=(-1, -2))
                 + jnp.sum((orgu - pred_mu) ** 2, axis=(-1, -2))
                 + jnp.sum((orgv - pred_mv_) ** 2, axis=(-1, -2))
                 ).astype(jnp.float32)
        lev_my, rec_my, d_my, b_my = _code(org, pred_m, qp, 3, bd)
        lev_mu, rec_mu, d_mu, b_mu = _code(orgu, pred_mu, qpc, 2, bd)
        lev_mv_, rec_mv_, d_mv, b_mv = _code(orgv, pred_mv_, qpc, 2, bd)
        mif = mi.astype(jnp.float32)
        cost_skip = msse3 + lam * (2.0 + mif)
        cost_merge = d_my + d_mu + d_mv \
            + lam * (4.0 + mif + b_my + b_mu + b_mv)

        # AMVP: exact list -> mvd bits
        nb_refpoc = ref_pocs[jnp.clip(nrf, 0, num_ref - 1)]
        p0x, p0y, p1x, p1y = amvp_candidates_dev(
            nbv, nmx, nmy, nb_refpoc, ref_pocs[0], cur_poc)
        amx, amy = mvxf[b], mvyf[b]
        bits0 = mv_bits_dev(amx - p0x, amy - p0y)
        bits1 = mv_bits_dev(amx - p1x, amy - p1y)
        use1 = bits1 < bits0
        mvpi = use1.astype(jnp.int32)
        mvdx = jnp.where(use1, amx - p1x, amx - p0x)
        mvdy = jnp.where(use1, amy - p1y, amy - p0y)
        bits_mvd = jnp.minimum(bits0, bits1).astype(jnp.float32)
        cost_amvp = dist_a[b] + lam * (6.0 + bits_mvd + bits_a_lev[b])

        inter_best = jnp.minimum(cost_skip,
                                 jnp.minimum(cost_merge, cost_amvp))

        # intra candidate: exact reconstruction from committed recon
        iref = jnp.where(none_y[b, None], mid, st["rec_y"][sub_y[b]])
        iref_f = filter_reference_batched(iref, 8, bd, strong=False)
        ipreds = predict_all_modes(iref, iref_f, 8, True, bd)
        im = imode[b]
        ipred = jnp.take_along_axis(
            ipreds, im[:, None, None, None], 1)[:, 0]
        lev_iy, rec_iy, d_iy, b_iy = _code(org, ipred, qp, 3, bd)
        irefu = jnp.where(none_c[b, None], mid, st["rec_u"][sub_u[b]])
        irefv = jnp.where(none_c[b, None], mid, st["rec_v"][sub_u[b]])
        cpu = jnp.take_along_axis(
            predict_all_modes(irefu, irefu, 4, False, bd),
            im[:, None, None, None], 1)[:, 0]
        cpv = jnp.take_along_axis(
            predict_all_modes(irefv, irefv, 4, False, bd),
            im[:, None, None, None], 1)[:, 0]
        lev_iu, rec_iu, d_iu, b_iu = _code(orgu, cpu, qpc, 2, bd)
        lev_iv, rec_iv, d_iv, b_iv = _code(orgv, cpv, qpc, 2, bd)
        cost_intra = jnp.where(
            inter_best <= INTRA_GATE * lam, BIG,
            d_iy + d_iu + d_iv
            + lam * (8.0 + b_iy + b_iu + b_iv))

        costs = jnp.stack([cost_skip, cost_merge, cost_amvp, cost_intra],
                          axis=1)
        choice = jnp.argmin(costs, axis=1).astype(jnp.int32)
        m_zero = (b_my <= 1.0) & (b_mu <= 1.0) & (b_mv <= 1.0)
        choice = jnp.where((choice == 1) & m_zero, 0, choice)

        def pick4(s, m, a, i):
            c = choice.reshape((-1,) + (1,) * (s.ndim - 1))
            return jnp.where(c == 0, s, jnp.where(c == 1, m,
                             jnp.where(c == 2, a, i)))

        out_y = pick4(pred_m, rec_my, rec_ay[b], rec_iy)
        out_u = pick4(pred_mu, rec_mu, rec_au[b], rec_iu)
        out_v = pick4(pred_mv_, rec_mv_, rec_av[b], rec_iv)
        zero8 = jnp.zeros_like(lev_my)
        zero4 = jnp.zeros_like(lev_mu)
        o_levy = pick4(zero8, lev_my, lev_ay[b], lev_iy)
        o_levcb = pick4(zero4, lev_mu, lev_au[b], lev_iu)
        o_levcr = pick4(zero4, lev_mv_, lev_av[b], lev_iv)

        # scatters (invalid lanes -> out-of-bounds index, dropped)
        drop = jnp.where(valid, b, P)
        yy = (y0[:, None] + jnp.arange(8)[None, :])
        xx = (x0[:, None] + jnp.arange(8)[None, :])
        fl_y = yy[:, :, None] * w + xx[:, None, :]
        fl_y = jnp.where(valid[:, None, None], fl_y, h * w)
        cyy = (byi * 4)[:, None] + jnp.arange(4)[None, :]
        cxx = (bxi * 4)[:, None] + jnp.arange(4)[None, :]
        fl_c = cyy[:, :, None] * (w // 2) + cxx[:, None, :]
        fl_c = jnp.where(valid[:, None, None], fl_c, h * w // 4)

        new_mvx = pick4(w_mvx, w_mvx, amx, jnp.zeros_like(amx))
        new_mvy = pick4(w_mvy, w_mvy, amy, jnp.zeros_like(amy))
        new_ref = pick4(w_ref, w_ref, jnp.zeros_like(w_ref),
                        jnp.zeros_like(w_ref))
        new_dir = jnp.where(choice == 3, 0, 1)

        st = dict(
            rec_y=st["rec_y"].at[fl_y].set(out_y),
            rec_u=st["rec_u"].at[fl_c].set(out_u),
            rec_v=st["rec_v"].at[fl_c].set(out_v),
            dirf=st["dirf"].at[drop].set(new_dir),
            fmvx=st["fmvx"].at[drop].set(new_mvx),
            fmvy=st["fmvy"].at[drop].set(new_mvy),
            fref=st["fref"].at[drop].set(new_ref),
            kind=st["kind"].at[drop].set(choice),
            mi=st["mi"].at[drop].set(mi),
            mvdx=st["mvdx"].at[drop].set(mvdx),
            mvdy=st["mvdy"].at[drop].set(mvdy),
            mvpi=st["mvpi"].at[drop].set(mvpi),
            levy=st["levy"].at[drop].set(o_levy),
            levcb=st["levcb"].at[drop].set(o_levcb),
            levcr=st["levcr"].at[drop].set(o_levcr),
        )
        return st, None

    state, _ = jax.lax.scan(step, state, lv_blk)
    state["imode"] = imode
    return state


class PFrameDeviceEncoder(PFrameEncoder):
    """Drop-in replacement for PFrameEncoder on P slices: same analyze()
    contract, decision pass on device (entropy pass inherited)."""

    def analyze(self, frame: Frame, qp: int, refs: list[Frame],
                ref_pocs: list[int], poc: int, sh: SliceHeader,
                refs_l1=None, ref_pocs_l1=None):
        assert sh.slice_type == SliceType.P, "device path is P-only"
        sps = self.sps
        w, h = sps.pic_width, sps.pic_height
        bd = self.bd
        bw, bh = w // 8, h // 8
        qpc = chroma_qp_from_luma(qp + self.pps.cb_qp_offset)

        mvq_x, mvq_y, _, _ = self.motion_search(frame, refs[0], qp)

        dev = _dev_static(w, h, sps.log2_ctu_size)
        refs_y = jnp.asarray(np.stack([r.y for r in refs]), jnp.int32)
        refs_u = jnp.asarray(np.stack([r.u for r in refs]), jnp.int32)
        refs_v = jnp.asarray(np.stack([r.v for r in refs]), jnp.int32)

        st = wavefront_pass(
            jnp.asarray(frame.y, jnp.int32), jnp.asarray(frame.u, jnp.int32),
            jnp.asarray(frame.v, jnp.int32), refs_y, refs_u, refs_v,
            jnp.asarray(mvq_x, jnp.int32), jnp.asarray(mvq_y, jnp.int32),
            dev["lv_blk"], dev["nb_ok"], dev["nb_flat"],
            dev["sub_y"], dev["none_y"], dev["sub_c"], dev["none_c"],
            jnp.asarray(ref_pocs, jnp.int32), jnp.int32(poc),
            w=w, h=h, num_ref=len(refs), max_merge=sh.max_num_merge_cand,
            qp=qp, qpc=qpc, bd=bd)

        st = jax.device_get(st)       # one transfer for the whole pytree
        rec_y = st["rec_y"].reshape(h, w).copy()
        rec_u = st["rec_u"].reshape(h // 2, w // 2).copy()
        rec_v = st["rec_v"].reshape(h // 2, w // 2).copy()
        kind = st["kind"].reshape(bh, bw)
        mi = st["mi"].reshape(bh, bw)
        mvdx = st["mvdx"].reshape(bh, bw)
        mvdy = st["mvdy"].reshape(bh, bw)
        mvpi = st["mvpi"].reshape(bh, bw)
        fmvx = st["fmvx"].reshape(bh, bw)
        fmvy = st["fmvy"].reshape(bh, bw)
        fref = st["fref"].reshape(bh, bw)
        imode = st["imode"].reshape(bh, bw)
        levy = st["levy"].reshape(bh, bw, 8, 8)
        levcb = st["levcb"].reshape(bh, bw, 4, 4)
        levcr = st["levcr"].reshape(bh, bw, 4, 4)

        # motion field (4x4 granularity) for deblock + later frames
        field = PicMotion.create(w, h)
        rep = lambda a: np.repeat(np.repeat(a, 2, 0), 2, 1)
        inter = kind != 3
        field.inter_dir[:] = rep(inter.astype(np.int32))
        field.mv[0, ..., 0] = rep(np.where(inter, fmvx, 0))
        field.mv[0, ..., 1] = rep(np.where(inter, fmvy, 0))
        field.ref_idx[0] = rep(np.where(inter, fref, -1))

        kinds = ("skip", "merge", "amvp", "intra")
        decisions: dict[tuple, PuDec] = {}
        for byi in range(bh):
            for bxi in range(bw):
                k = int(kind[byi, bxi])
                key = (bxi * 8, byi * 8)
                if k == 0:
                    decisions[key] = PuDec(
                        "skip", merge_idx=int(mi[byi, bxi]),
                        mv=(int(fmvx[byi, bxi]), int(fmvy[byi, bxi])),
                        ref_idx=int(fref[byi, bxi]))
                elif k == 1:
                    decisions[key] = PuDec(
                        "merge", merge_idx=int(mi[byi, bxi]),
                        mv=(int(fmvx[byi, bxi]), int(fmvy[byi, bxi])),
                        ref_idx=int(fref[byi, bxi]),
                        lev_y=levy[byi, bxi], lev_cb=levcb[byi, bxi],
                        lev_cr=levcr[byi, bxi])
                elif k == 2:
                    decisions[key] = PuDec(
                        "amvp",
                        mv=(int(fmvx[byi, bxi]), int(fmvy[byi, bxi])),
                        mvd=(int(mvdx[byi, bxi]), int(mvdy[byi, bxi])),
                        mvp_idx=int(mvpi[byi, bxi]), ref_idx=0,
                        lev_y=levy[byi, bxi], lev_cb=levcb[byi, bxi],
                        lev_cr=levcr[byi, bxi])
                else:
                    decisions[key] = PuDec(
                        "intra", intra_mode=int(imode[byi, bxi]),
                        lev_y=levy[byi, bxi], lev_cb=levcb[byi, bxi],
                        lev_cr=levcr[byi, bxi])

        modes = np.where(kind == 3, imode, -1).astype(np.int32)
        skip_map = (kind == 0).astype(np.int32)
        intra_map = (kind == 3).astype(np.int32)
        recon = Frame(rec_y, rec_u, rec_v, bd)
        self._nat = dict(kind=kind, mi=mi, mvdx=mvdx, mvdy=mvdy,
                         mvpi=mvpi, refi=fref, imode=imode, levy=levy,
                         levcb=levcb, levcr=levcr)
        return recon, field, decisions, (modes, skip_map, intra_map)

    def _entropy_pass(self, qp, modes, skip_map, intra_map, decisions,
                      sh: SliceHeader, sao=None) -> bytes:
        """Whole-slice serialisation in one native call from the
        wavefront's decision tensors; Python walk as fallback."""
        from hmtpu.entropy.contexts import make_contexts
        from hmtpu.entropy.recorder import (
            encode_pslice_native,
            pack_sao_grid,
        )

        nat = getattr(self, "_nat", None)
        if nat is not None:
            sps = self.sps
            sao_packed, sl, sc = None, 0, 0
            if sao is not None:
                grid, sl, sc = sao
                sao_packed = pack_sao_grid(grid, sps.pic_width_in_ctus,
                                           sps.pic_height_in_ctus)
            geom = dict(w=sps.pic_width, h=sps.pic_height,
                        ctu=sps.ctu_size,
                        max_merge=sh.max_num_merge_cand,
                        num_ref=sh.num_ref_idx_l0,
                        sdh=int(self.pps.sign_data_hiding),
                        sao_luma=int(sl), sao_chroma=int(sc), bd=self.bd)
            ctx = make_contexts(sh.slice_type, qp)
            rbsp = encode_pslice_native(
                ctx, geom, nat["kind"], nat["mi"], nat["mvdx"],
                nat["mvdy"], nat["mvpi"], nat["refi"], nat["imode"],
                nat["levy"], nat["levcb"], nat["levcr"], sao_packed)
            if rbsp is not None:
                return rbsp
        return super()._entropy_pass(qp, modes, skip_map, intra_map,
                                     decisions, sh, sao=sao)

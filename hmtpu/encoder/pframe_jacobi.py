"""Batched Jacobi-iteration P-slice decision pass + exact syntax repair.

TPU-shaped replacement for the z-scan wavefront (pframe_dev.
wavefront_pass): the sequential dependency scan (~200 tiny lax.scan
steps per frame, each deciding a handful of blocks) becomes two
full-frame batched rounds.  Exactness of the bitstream is preserved
by construction:

  * inter reconstruction never depends on neighbour recon — only the
    merge/AMVP *lists* do.  A LITE round (SSE + syntax rates, no
    residual coding) forms a motion field from the integer-ME init;
    the FULL round re-derives lists from that field, codes residuals
    and commits.  The syntax is then REPAIRED from the FINAL field
    with the same batched derivations the writer/decoder use: a
    committed merge MV whose candidate vanished from the exact list
    is re-coded as AMVP with an exact mvd; committed AMVP CUs get
    their mvd/mvp_idx recomputed from the exact predictor list.
  * intra CUs (rare in P slices) are restricted to blocks none of
    whose reference-sample neighbour cells are intra (a final
    consistency pass demotes violators to their best inter mode), so
    their prediction reads only final inter reconstruction —
    recomputed exactly in one batched pass at the end.

Residual coding is fused into ONE `_code` batch per (CU size, plane)
— [AMVP | merge | intra] stacked on the batch axis — which keeps the
XLA graph ~3x smaller than naive per-mode instances (TPU compile
time scales with instance count of the big RDOQ subgraph).

Capability parity: TEncSlice::compressSlice -> TEncCu::xCompressCU
(TEncSlice.cpp:641, TEncCu.cpp:352) — the same mode set as
wavefront_pass (skip / merge / AMVP / intra at 8x8; skip / merge /
AMVP at 16x16/32x32 with split decisions), with HM's sequential
scan-order RD coupling approximated by the two rounds instead of
serialised.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hmtpu.ops.interp import mc_chroma_batch_refs, mc_luma_batch_refs
from hmtpu.ops.intra_pred import (
    filter_reference_batched,
    predict_all_modes,
    predict_one_mode,
)
from hmtpu.ops.ratebits import (
    cbf_chroma_bits,
    cbf_luma_bits,
    chroma_dm_bits,
    intra_mode_mpm_bits,
    merge_flag_bits,
    merge_idx_bits,
    mvd_bits,
    mvp_idx_bits,
    part_size_2nx2n_bits,
    pred_mode_bits,
    ref_idx_bits,
    skip_flag_bits,
    split_flag_bits,
)
from hmtpu.search.wavefront import (
    amvp_candidates_dev,
    merge_candidates_dev,
    scale_mv_pair_dev,
    temporal_cand_grid_dev,
)

# packed per-cell state columns (same layout as pframe_dev)
(K_KIND, K_MI, K_MVDX, K_MVDY, K_MVPI, K_DIR, K_MVX, K_MVY, K_REF,
 K_SZ, K_CBFY, K_MVX1, K_MVY1, K_REF1) = range(14)


def _unblockify(a, n, hh, ww):
    return a.reshape(hh // n, ww // n, n, n).swapaxes(1, 2) \
        .reshape(hh, ww)


def wavefront_pass_jacobi(org_y, org_u, org_v, refs_y, refs_u, refs_v,
                          mv_x, mv_y, mv_ref, nb_ok, nb_flat,
                          sub_y, none_y, sub_c, none_c,
                          ref_pocs, cur_poc,
                          mv16, sched16, mv32, sched32,
                          qp=32, qpc=32, col=None, col_poc=0,
                          cbflat=None,
                          *, w: int, h: int, num_ref: int,
                          max_merge: int, bd: int = 8,
                          qp_factor=0.57, tmvp: bool = False,
                          log2_ctu: int = 6, sdh: bool = False,
                          rdoq: bool = True, lite_rounds: int = 2,
                          full_rounds: int = 1, n_active=None):
    """P-slice (uni-pred) three-level decision, batched.  Same output
    contract as pframe_dev.wavefront_pass(levels=3)."""
    from hmtpu.encoder.intra_rdo import _MODE_BITS, _satd
    from hmtpu.encoder.pframe_dev import (
        BIG,
        INTRA_GATE,
        _blockify,
        _code,
        _intra_scan_sel,
        _root_cbf_bits,
    )

    bw, bh = w // 8, h // 8
    P = bw * bh
    M = max_merge
    code = partial(_code, rdoq=rdoq)
    lam = jnp.float32(qp_factor) \
        * jnp.power(2.0, (qp - 12) / 3.0).astype(jnp.float32)
    lam_sqrt = jnp.sqrt(lam)
    wchroma = jnp.exp2((qp - qpc).astype(jnp.float32) / 3.0)
    lam_c = lam / wchroma
    mid = jnp.int32(1 << (bd - 1))
    rep = lambda a: jnp.repeat(a, M)
    two = lambda a: jnp.concatenate([a, a])

    org_blk = _blockify(org_y, 8)
    orgu_blk = _blockify(org_u, 4)
    orgv_blk = _blockify(org_v, 4)
    refs_c = jnp.concatenate([refs_u, refs_v], axis=0)
    Ru = refs_y.shape[0]

    bidx = jnp.arange(P)
    by_all, bx_all = bidx // bw, bidx % bw
    x0_8, y0_8 = bx_all * 8, by_all * 8

    gw, gh = bw // 2, bh // 2
    P16 = gw * gh
    g_all = jnp.arange(P16)
    gy_all, gx_all = g_all // gw, g_all % gw

    qw, qh = (gw + 1) // 2, (gh + 1) // 2
    P32 = qw * qh
    q_all = jnp.arange(P32)
    qy_all, qx_all = q_all // qw, q_all % qw

    lv16_t, cells16, nb16_ok, nb16_cell = sched16
    (lv32_t, cells16_32, cells8_32, nb32_ok, nb32_cell,
     full32) = sched32

    def cbf_bits_inter(y_nz, cb_nz, cr_nz):
        b = cbf_chroma_bits(cbflat, cb_nz) \
            + cbf_chroma_bits(cbflat, cr_nz)
        return b + jnp.where(cb_nz | cr_nz,
                             cbf_luma_bits(cbflat, y_nz), 0.0)

    # ---- hoisted AMVP candidate predictions per level (MC only; the
    # residual is coded in the fused full-round batch)
    mvxf, mvyf = mv_x.reshape(-1), mv_y.reshape(-1)
    rself = mv_ref.reshape(-1)

    def amvp_pred(n, Pn, xs, ys, mx, my, rr):
        py = mc_luma_batch_refs(refs_y, rr, xs, ys, mx, my, n, n, bd)
        pc = mc_chroma_batch_refs(
            refs_c, two(rr) + jnp.concatenate(
                [jnp.zeros(Pn, jnp.int32), jnp.full(Pn, Ru,
                                                    jnp.int32)]),
            two(xs // 2), two(ys // 2), two(mx), two(my),
            n // 2, n // 2, bd)
        return py, pc[:Pn], pc[Pn:]

    pred_a8 = amvp_pred(8, P, x0_8, y0_8, mvxf, mvyf, rself)

    org16_blk = _blockify(org_y, 16)
    org16u = _blockify(org_u, 8)
    org16v = _blockify(org_v, 8)
    mv16_x, mv16_y, mv16_ref = mv16
    m16x, m16y = mv16_x.reshape(-1), mv16_y.reshape(-1)
    r16 = mv16_ref.reshape(-1)
    pred_a16 = amvp_pred(16, P16, gx_all * 16, gy_all * 16, m16x,
                         m16y, r16)

    orgp_y = jnp.pad(org_y, ((0, qh * 32 - h), (0, qw * 32 - w)),
                     mode="edge")
    orgp_u = jnp.pad(org_u, ((0, (qh * 32 - h) // 2),
                             (0, (qw * 32 - w) // 2)), mode="edge")
    orgp_v = jnp.pad(org_v, ((0, (qh * 32 - h) // 2),
                             (0, (qw * 32 - w) // 2)), mode="edge")
    org32_blk = _blockify(orgp_y, 32)
    org32u = _blockify(orgp_u, 16)
    org32v = _blockify(orgp_v, 16)
    mv32_x, mv32_y, mv32_ref = mv32
    m32x, m32y = mv32_x.reshape(-1), mv32_y.reshape(-1)
    r32 = mv32_ref.reshape(-1)
    pred_a32 = amvp_pred(32, P32, qx_all * 32, qy_all * 32, m32x,
                         m32y, r32)

    # ---- hoisted open-loop intra mode at 8x8 (org-pixel refs)
    oref = jnp.where(none_y[:, None], mid, org_y.reshape(-1)[sub_y])
    oref_f = filter_reference_batched(oref, 8, bd, strong=False)
    opreds = predict_all_modes(oref, oref_f, 8, True, bd)
    satd = _satd(org_blk[:, None] - opreds).astype(jnp.float32)
    imode = jnp.argmin(satd + lam_sqrt * jnp.asarray(_MODE_BITS)[None],
                       axis=1).astype(jnp.int32)
    ipred_o = predict_one_mode(oref, oref_f, imode, 8, True, bd)
    orefu = jnp.where(none_c[:, None], mid, org_u.reshape(-1)[sub_c])
    orefv = jnp.where(none_c[:, None], mid, org_v.reshape(-1)[sub_c])
    icp2 = predict_one_mode(jnp.concatenate([orefu, orefv]),
                            jnp.concatenate([orefu, orefv]),
                            two(imode), 4, False, bd)
    isel = _intra_scan_sel(imode)

    # ---- raw collocated candidates per level (8.5.3.2.8)
    def t_raw(n, gwo=None, gho=None):
        if not tmvp:
            return None
        return temporal_cand_grid_dev(col[0], col[1], col[2], col[3],
                                      n, w, h, log2_ctu, gw=gwo,
                                      gh=gho)

    def t_merge(traw):
        if traw is None:
            return {}
        t_ok, rx, ry, rp = traw
        tmx, tmy = scale_mv_pair_dev(rx, ry, cur_poc - ref_pocs[0],
                                     col_poc - rp)
        return dict(t_ok=t_ok, t_mvx=tmx, t_mvy=tmy)

    def t_amvp(traw, aref, nref):
        if traw is None:
            return {}
        t_ok, rx, ry, rp = traw
        tax, tay = scale_mv_pair_dev(
            rx, ry, cur_poc - ref_pocs[jnp.clip(aref, 0, nref - 1)],
            col_poc - rp)
        return dict(t_ok=t_ok, t_mvx=tax, t_mvy=tay)

    levels = {
        8: dict(n=8, Pn=P, x0=x0_8, y0=y0_8, nbc=nb_flat, nbo=nb_ok,
                traw=t_raw(8), amx=mvxf, amy=mvyf, aref=rself,
                org=org_blk, orgu=orgu_blk, orgv=orgv_blk,
                l2y=3, l2c=2, pred_a=pred_a8),
        16: dict(n=16, Pn=P16, x0=gx_all * 16, y0=gy_all * 16,
                 nbc=nb16_cell, nbo=nb16_ok, traw=t_raw(16),
                 amx=m16x, amy=m16y, aref=r16, org=org16_blk,
                 orgu=org16u, orgv=org16v, l2y=4, l2c=3,
                 pred_a=pred_a16),
        32: dict(n=32, Pn=P32, x0=qx_all * 32, y0=qy_all * 32,
                 nbc=nb32_cell, nbo=nb32_ok, traw=t_raw(32, gwo=qw,
                                                        gho=qh),
                 amx=m32x, amy=m32y, aref=r32, org=org32_blk,
                 orgu=org32u, orgv=org32v, l2y=5, l2c=4,
                 pred_a=pred_a32),
    }

    def merge_from_field(F, L, stick_bits=4.0):
        """Merge candidate list + SSE-screened winner for every CU of
        a level, lists derived from field F."""
        nbp = F[L["nbc"]]                               # (Pn, 5, 14)
        nbv = L["nbo"] & (nbp[..., K_DIR] > 0)
        cmx, cmy, crf = merge_candidates_dev(
            nbv, nbp[..., K_MVX], nbp[..., K_MVY], nbp[..., K_REF],
            num_ref, max_merge, n_active=n_active,
            **t_merge(L["traw"]))
        n, Pn = L["n"], L["Pn"]
        pred_l = mc_luma_batch_refs(
            refs_y, crf.reshape(-1), rep(L["x0"]), rep(L["y0"]),
            cmx.reshape(-1), cmy.reshape(-1), n, n, bd) \
            .reshape(Pn, M, n, n)
        sse_l = jnp.sum((L["org"][:, None] - pred_l) ** 2,
                        axis=(-1, -2))
        # rate-aware screening: higher merge indices cost extra bins
        # (TEncCu tries candidates by full RD incl. merge_idx bits;
        # pure-SSE argmin overpays at high QP)
        bits_mi = merge_idx_bits(cbflat, jnp.arange(M), max_merge)
        # hysteresis: a candidate equal to this CU's committed motion
        # in F gets a small bonus, so near-ties don't flip the motion
        # field between rounds — every flip shifts the neighbours'
        # final lists away from the lists decisions were made with,
        # and each vanished candidate costs an AMVP syntax repair
        # (the dominant high-QP bit leak of the two-round scheme)
        corner = (L["y0"] // 8) * bw + (L["x0"] // 8)
        cur = F[corner]
        stick = (cur[:, K_DIR] > 0)[:, None] \
            & (cmx == cur[:, K_MVX][:, None]) \
            & (cmy == cur[:, K_MVY][:, None]) \
            & (crf == cur[:, K_REF][:, None])
        mi = jnp.argmin(sse_l.astype(jnp.float32)
                        + lam * bits_mi[None]
                        - lam * stick_bits * stick, axis=1) \
            .astype(jnp.int32)
        g1 = lambda a: jnp.take_along_axis(a, mi[:, None], 1)[:, 0]
        w_mvx, w_mvy, w_ref = g1(cmx), g1(cmy), g1(crf)
        pred_m = jnp.take_along_axis(
            pred_l, mi[:, None, None, None], 1)[:, 0]
        return (nbv, nbp, mi, w_mvx, w_mvy, w_ref, pred_m)

    def merge_chroma(L, w_mvx, w_mvy, w_ref):
        n, Pn = L["n"], L["Pn"]
        pred_c2 = mc_chroma_batch_refs(
            refs_c, jnp.concatenate([w_ref, w_ref + Ru]),
            two(L["x0"] // 2), two(L["y0"] // 2),
            two(w_mvx), two(w_mvy), n // 2, n // 2, bd)
        return pred_c2[:Pn], pred_c2[Pn:]

    def amvp_from_field(nbv, nbp, L, amx, amy, aref):
        nb_refpoc = ref_pocs[jnp.clip(nbp[..., K_REF], 0,
                                      num_ref - 1)]
        p0x, p0y, p1x, p1y = amvp_candidates_dev(
            nbv, nbp[..., K_MVX], nbp[..., K_MVY], nb_refpoc,
            ref_pocs[jnp.clip(aref, 0, num_ref - 1)], cur_poc,
            **t_amvp(L["traw"], aref, num_ref))
        bits0 = mvd_bits(cbflat, amx - p0x, amy - p0y)
        bits1 = mvd_bits(cbflat, amx - p1x, amy - p1y)
        use1 = bits1 < bits0
        mvpi = use1.astype(jnp.int32)
        mvdx = jnp.where(use1, amx - p1x, amx - p0x)
        mvdy = jnp.where(use1, amy - p1y, amy - p0y)
        return mvpi, mvdx, mvdy, jnp.minimum(bits0, bits1)

    def ctx_inc(F, L):
        """skip/split ctx sources from the field at the CU corner."""
        cyc, cxc = (L["y0"] // 8), (L["x0"] // 8)
        corner = cyc * bw + cxc
        on_l, on_a = cxc > 0, cyc > 0
        l_blk = F[jnp.where(on_l, corner - 1, 0)]
        a_blk = F[jnp.where(on_a, corner - bw, 0)]
        inc_sk = (on_l & (l_blk[:, K_KIND] == 0)).astype(jnp.int32) \
            + (on_a & (a_blk[:, K_KIND] == 0)).astype(jnp.int32)
        return corner, on_l, on_a, l_blk, a_blk, inc_sk

    def syntax_rates(L, inc_sk, mi, mvpi, bits_mvd):
        Pn = L["Pn"]
        zb = jnp.zeros((Pn,), jnp.int32)
        b_skip1 = skip_flag_bits(cbflat, zb + 1, inc_sk)
        b_skip0 = skip_flag_bits(cbflat, zb, inc_sk)
        b_mi = merge_idx_bits(cbflat, mi, max_merge)
        b_common = b_skip0 + part_size_2nx2n_bits(cbflat)
        b_inter = b_common + pred_mode_bits(cbflat, zb)
        b_amvp_hdr = b_inter + merge_flag_bits(cbflat, zb) \
            + mvp_idx_bits(cbflat, mvpi) + bits_mvd \
            + ref_idx_bits(cbflat, L["aref"], num_ref,
                           n_active=n_active)
        b_merge_hdr = b_inter + merge_flag_bits(cbflat, zb + 1) + b_mi
        return b_skip1, b_mi, b_common, b_inter, b_amvp_hdr, \
            b_merge_hdr

    def sse3(L, pred_y, pred_u, pred_v):
        return jnp.sum((L["org"] - pred_y) ** 2, axis=(-1, -2)) \
            .astype(jnp.float32) + wchroma * (
            jnp.sum((L["orgu"] - pred_u) ** 2, axis=(-1, -2))
            + jnp.sum((L["orgv"] - pred_v) ** 2, axis=(-1, -2))
            ).astype(jnp.float32)

    def split_prices(F, d16, d32):
        l16, a16, on_l16, on_a16 = d16["split_src"]
        inc16 = (on_l16 & (l16[:, K_SZ] == 0)).astype(jnp.int32) \
            + (on_a16 & (a16[:, K_SZ] == 0)).astype(jnp.int32)
        z16 = jnp.zeros((P16,), jnp.int32)
        sp0_16 = lam * split_flag_bits(cbflat, z16, inc16)
        sp1_16 = lam * split_flag_bits(cbflat, z16 + 1, inc16)
        l32, a32, on_l32, on_a32 = d32["split_src"]
        inc32 = (on_l32 & (l32[:, K_SZ] < 2)).astype(jnp.int32) \
            + (on_a32 & (a32[:, K_SZ] < 2)).astype(jnp.int32)
        z32 = jnp.zeros((P32,), jnp.int32)
        sp0_32 = lam * split_flag_bits(cbflat, z32, inc32)
        sp1_32 = lam * split_flag_bits(cbflat, z32 + 1, inc32)
        return sp0_16, sp1_16, sp0_32, sp1_32

    def hierarchy(d8, d16, d32, F, hyst=True):
        sp0_16, sp1_16, sp0_32, sp1_32 = split_prices(F, d16, d32)
        sum8 = d8["cost"][cells16].sum(axis=1)
        cost16f = d16["cost"] + sp0_16
        cost8f = sum8 + sp1_16
        use16 = cost16f < cost8f
        best16 = jnp.where(use16, cost16f, cost8f)
        b16p = jnp.concatenate([best16, jnp.zeros((1,), jnp.float32)])
        idx16 = jnp.where(cells16_32 < 0, P16, cells16_32)
        sum16 = b16p[idx16].sum(axis=1)
        use32 = full32 & (d32["cost"] + sp0_32 < sum16 + sp1_32)
        return use16, use32

    def commit_field(d8, d16, d32, use16, use32):
        blk = d8["blk"]
        blk = blk.at[jnp.where(use16[:, None], cells16, P)].set(
            d16["blk"][:, None, :])
        blk = blk.at[jnp.where(use32[:, None], cells8_32, P)].set(
            d32["blk"][:, None, :])
        return blk

    def blk_pack(choice, mi, mvdx, mvdy, mvpi, mvx, mvy, ref, szc,
                 cbf_y, intra_dir=False):
        zi = jnp.zeros_like(choice)
        n_dir = jnp.where(choice == 3, 0, 1) if intra_dir \
            else jnp.ones_like(choice)
        return jnp.stack([choice, mi, mvdx, mvdy, mvpi, n_dir,
                          mvx, mvy, ref, jnp.full_like(choice, szc),
                          cbf_y, zi, zi, zi], axis=1)

    # ================= LITE round: SSE + syntax rates ===============
    def decide_lite(F, L, szc):
        (nbv, nbp, mi, w_mvx, w_mvy, w_ref, pred_m) = \
            merge_from_field(F, L)
        mvpi, mvdx, mvdy, bits_mvd = amvp_from_field(
            nbv, nbp, L, L["amx"], L["amy"], L["aref"])
        corner, on_l, on_a, l_blk, a_blk, inc_sk = ctx_inc(F, L)
        (b_skip1, b_mi, b_common, b_inter, b_amvp_hdr,
         b_merge_hdr) = syntax_rates(L, inc_sk, mi, mvpi, bits_mvd)
        # pre-residual SSE for both hypotheses (consistent scale)
        sse_m = jnp.sum((L["org"] - pred_m) ** 2,
                        axis=(-1, -2)).astype(jnp.float32)
        pa_y = L["pred_a"][0]
        sse_a = jnp.sum((L["org"] - pa_y) ** 2,
                        axis=(-1, -2)).astype(jnp.float32)
        cost_skip = sse_m + lam * (b_skip1 + b_mi)
        cost_amvp = sse_a + lam * b_amvp_hdr
        costs = jnp.stack([cost_skip, cost_amvp], axis=1)
        pick_a = costs[:, 1] < costs[:, 0]
        cost = jnp.min(costs, axis=1)
        mvx = jnp.where(pick_a, L["amx"], w_mvx)
        mvy = jnp.where(pick_a, L["amy"], w_mvy)
        ref = jnp.where(pick_a, L["aref"], w_ref)
        kind = jnp.where(pick_a, 2, 0).astype(jnp.int32)
        blk = blk_pack(kind, mi, mvdx, mvdy, mvpi, mvx, mvy, ref,
                       szc, jnp.zeros_like(kind))
        return dict(cost=cost, blk=blk,
                    split_src=(l_blk, a_blk, on_l, on_a))

    z = jnp.zeros((P,), jnp.int32)
    F0 = jnp.stack([z + 2, z, z, z, z, z + 1, mvxf, mvyf, rself,
                    z, z, z, z, z], axis=1)
    F1 = F0
    for rnd in range(lite_rounds):
        l8 = decide_lite(F1, levels[8], 0)
        l16 = decide_lite(F1, levels[16], 1)
        l32 = decide_lite(F1, levels[32], 2)
        l32["cost"] = jnp.where(full32, l32["cost"], BIG)
        u16_l, u32_l = hierarchy(l8, l16, l32, F1)
        F1 = commit_field(l8, l16, l32, u16_l, u32_l)

    # ================= FULL round from F1 ===========================
    def decide_full(F, L, with_intra, pen_bits=4.0):
        n, Pn = L["n"], L["Pn"]
        szc = {8: 0, 16: 1, 32: 2}[n]
        (nbv, nbp, mi, w_mvx, w_mvy, w_ref, pred_m) = \
            merge_from_field(F, L, stick_bits=pen_bits)
        pred_mu, pred_mv_ = merge_chroma(L, w_mvx, w_mvy, w_ref)
        pa_y, pa_u, pa_v = L["pred_a"]
        org, orgu, orgv = L["org"], L["orgu"], L["orgv"]
        npx = n * n
        ncb = npx // 4

        # ---- fused residual coding: [amvp | merge | intra?] in one
        # batch per plane group
        if with_intra:
            preds_y = jnp.concatenate([pa_y, pred_m, ipred_o])
            orgs_y = jnp.concatenate([org, org, org])
            sel_y = jnp.concatenate([jnp.zeros_like(isel),
                                     jnp.zeros_like(isel), isel])
            preds_c = jnp.concatenate([pa_u, pa_v, pred_mu, pred_mv_,
                                       icp2[:P], icp2[P:]])
            orgs_c = jnp.concatenate([orgu, orgv] * 3)
            zc = jnp.zeros_like(isel)
            sel_c = jnp.concatenate([zc, zc, zc, zc, isel, isel])
        else:
            preds_y = jnp.concatenate([pa_y, pred_m])
            orgs_y = jnp.concatenate([org, org])
            sel_y = None
            preds_c = jnp.concatenate([pa_u, pa_v, pred_mu, pred_mv_])
            orgs_c = jnp.concatenate([orgu, orgv, orgu, orgv])
            sel_c = None
        levY, recY, dY, bY = code(orgs_y, preds_y, qp, L["l2y"], bd,
                                  lam, cbflat, True, sdh=sdh,
                                  scan_sel=sel_y)
        levC, recC, dC, bC = code(orgs_c, preds_c, qpc, L["l2c"], bd,
                                  lam_c, cbflat, False, wchroma,
                                  sdh=sdh, scan_sel=sel_c)
        s = lambda a, i: a[i * Pn:(i + 1) * Pn]
        lev_ay, rec_ay, d_ay, b_ay = (s(x, 0) for x in
                                      (levY, recY, dY, bY))
        lev_my, rec_my, d_my, b_my = (s(x, 1) for x in
                                      (levY, recY, dY, bY))
        lev_au, rec_au, d_au, b_au = (s(x, 0) for x in
                                      (levC, recC, dC, bC))
        lev_av, rec_av, d_av, b_av = (s(x, 1) for x in
                                      (levC, recC, dC, bC))
        lev_mu, rec_mu, d_mu, b_mu = (s(x, 2) for x in
                                      (levC, recC, dC, bC))
        lev_mv_, rec_mv_, d_mv, b_mv = (s(x, 3) for x in
                                        (levC, recC, dC, bC))

        mvpi, mvdx, mvdy, bits_mvd = amvp_from_field(
            nbv, nbp, L, L["amx"], L["amy"], L["aref"])
        corner, on_l, on_a, l_blk, a_blk, inc_sk = ctx_inc(F, L)
        (b_skip1, b_mi, b_common, b_inter, b_amvp_hdr,
         b_merge_hdr) = syntax_rates(L, inc_sk, mi, mvpi, bits_mvd)

        msse3 = sse3(L, pred_m, pred_mu, pred_mv_)
        cbf_m = (jnp.any(lev_my.reshape(Pn, npx) != 0, 1),
                 jnp.any(lev_mu.reshape(Pn, ncb) != 0, 1),
                 jnp.any(lev_mv_.reshape(Pn, ncb) != 0, 1))
        cbf_a = (jnp.any(lev_ay.reshape(Pn, npx) != 0, 1),
                 jnp.any(lev_au.reshape(Pn, ncb) != 0, 1),
                 jnp.any(lev_av.reshape(Pn, ncb) != 0, 1))
        # motion-divergence penalty (same rationale as the merge
        # hysteresis): options that would CHANGE this CU's committed
        # motion destabilise the neighbours' final lists; every
        # vanished candidate costs an AMVP syntax repair (~19 bits)
        cur = F[corner]
        same_m = (cur[:, K_DIR] > 0) & (w_mvx == cur[:, K_MVX]) \
            & (w_mvy == cur[:, K_MVY]) & (w_ref == cur[:, K_REF])
        same_a = (cur[:, K_DIR] > 0) & (L["amx"] == cur[:, K_MVX]) \
            & (L["amy"] == cur[:, K_MVY]) \
            & (L["aref"] == cur[:, K_REF])
        pen_m = lam * pen_bits * (1.0 - same_m)
        pen_a = lam * pen_bits * (1.0 - same_a)
        cost_skip = msse3 + lam * (b_skip1 + b_mi) + pen_m
        cost_merge = d_my + d_mu + d_mv + lam * (
            b_merge_hdr + cbf_bits_inter(*cbf_m)
            + b_my + b_mu + b_mv) + pen_m
        cost_amvp = d_ay + d_au + d_av + lam * (
            b_amvp_hdr
            + _root_cbf_bits(cbflat, cbf_a[0], cbf_a[1], cbf_a[2],
                             cbf_bits_inter)
            + b_ay + b_au + b_av) + pen_a
        costs = [cost_skip, cost_merge, cost_amvp]

        if with_intra:
            lev_iy, rec_iy = s(levY, 2), s(recY, 2)
            d_iy, b_iy = s(dY, 2), s(bY, 2)
            lev_iu, rec_iu = s(levC, 4), s(recC, 4)
            d_iu, b_iu = s(dC, 4), s(bC, 4)
            lev_iv, rec_iv = s(levC, 5), s(recC, 5)
            d_iv, b_iv = s(dC, 5), s(bC, 5)
            nb_intra = jnp.any(
                L["nbo"] & (nbp[..., K_KIND] == 3), axis=1)
            lmode = jnp.where(on_l & (l_blk[:, K_KIND] == 3),
                              imode[jnp.where(on_l, corner - 1, 0)],
                              1)
            am_ok = on_a & ((L["y0"] & ((1 << log2_ctu) - 1)) != 0)
            amode = jnp.where(am_ok & (a_blk[:, K_KIND] == 3),
                              imode[jnp.where(on_a, corner - bw, 0)],
                              1)
            b_icbf = cbf_chroma_bits(
                cbflat, jnp.any(lev_iu.reshape(Pn, ncb) != 0, 1)) \
                + cbf_chroma_bits(
                    cbflat, jnp.any(lev_iv.reshape(Pn, ncb) != 0, 1)) \
                + cbf_luma_bits(
                    cbflat, jnp.any(lev_iy.reshape(Pn, npx) != 0, 1))
            inter_best = jnp.minimum(cost_skip,
                                     jnp.minimum(cost_merge,
                                                 cost_amvp))
            cost_intra = jnp.where(
                (inter_best <= INTRA_GATE * lam) | nb_intra, BIG,
                d_iy + d_iu + d_iv
                + lam * (b_common + pred_mode_bits(
                    cbflat, jnp.ones((Pn,), jnp.int32))
                    + intra_mode_mpm_bits(cbflat, imode, lmode,
                                          amode)
                    + chroma_dm_bits(cbflat) + b_icbf
                    + b_iy + b_iu + b_iv))
            costs.append(cost_intra)

        call = jnp.stack(costs, axis=1)
        choice = jnp.argmin(call, axis=1).astype(jnp.int32)
        m_zero = ~(cbf_m[0] | cbf_m[1] | cbf_m[2])
        choice = jnp.where((choice == 1) & m_zero, 0, choice)
        cost = jnp.min(call, axis=1)

        def pickprod(c):
            def pick(sv, m, a, i=None):
                cc = c.reshape((-1,) + (1,) * (sv.ndim - 1))
                out = jnp.where(cc == 0, sv,
                                jnp.where(cc == 1, m, a))
                if i is not None:
                    out = jnp.where(cc == 3, i, out)
                return out
            return pick

        pick = pickprod(choice)
        zeros_b = jnp.zeros((Pn,), bool)
        pk_m = jnp.concatenate([lev_my.reshape(Pn, npx),
                                lev_mu.reshape(Pn, ncb),
                                lev_mv_.reshape(Pn, ncb)], axis=1)
        pk_a = jnp.concatenate([lev_ay.reshape(Pn, npx),
                                lev_au.reshape(Pn, ncb),
                                lev_av.reshape(Pn, ncb)], axis=1)
        if with_intra:
            pk_i = jnp.concatenate([lev_iy.reshape(Pn, npx),
                                    lev_iu.reshape(Pn, ncb),
                                    lev_iv.reshape(Pn, ncb)], axis=1)
            out_y = pick(pred_m, rec_my, rec_ay, rec_iy)
            out_u = pick(pred_mu, rec_mu, rec_au, rec_iu)
            out_v = pick(pred_mv_, rec_mv_, rec_av, rec_iv)
            o_lev = pick(jnp.zeros_like(pk_m), pk_m, pk_a, pk_i)
            cbf_y = pick(zeros_b, cbf_m[0], cbf_a[0],
                         jnp.any(lev_iy.reshape(Pn, npx) != 0,
                                 1)).astype(jnp.int32)
            zi = jnp.zeros_like(choice)
            n_mvx = pick(w_mvx, w_mvx, L["amx"], zi)
            n_mvy = pick(w_mvy, w_mvy, L["amy"], zi)
            n_ref = pick(w_ref, w_ref, L["aref"], zi)
        else:
            out_y = pick(pred_m, rec_my, rec_ay)
            out_u = pick(pred_mu, rec_mu, rec_au)
            out_v = pick(pred_mv_, rec_mv_, rec_av)
            o_lev = pick(jnp.zeros_like(pk_m), pk_m, pk_a)
            cbf_y = pick(zeros_b, cbf_m[0],
                         cbf_a[0]).astype(jnp.int32)
            n_mvx = pick(w_mvx, w_mvx, L["amx"])
            n_mvy = pick(w_mvy, w_mvy, L["amy"])
            n_ref = pick(w_ref, w_ref, L["aref"])
        o_blk = blk_pack(choice, mi, mvdx, mvdy, mvpi, n_mvx, n_mvy,
                         n_ref, szc, cbf_y, intra_dir=with_intra)
        d = dict(choice=choice, cost=cost, blk=o_blk, out_y=out_y,
                 out_u=out_u, out_v=out_v, o_lev=o_lev,
                 split_src=(l_blk, a_blk, on_l, on_a))
        if with_intra:
            # inter-only fallback for intra blocks demoted by the
            # final consistency pass
            ci = jnp.argmin(call[:, :3], axis=1).astype(jnp.int32)
            ci = jnp.where((ci == 1) & m_zero, 0, ci)
            picki = pickprod(ci)
            d.update(
                blk_inter=blk_pack(
                    ci, mi, mvdx, mvdy, mvpi,
                    picki(w_mvx, w_mvx, L["amx"]),
                    picki(w_mvy, w_mvy, L["amy"]),
                    picki(w_ref, w_ref, L["aref"]), szc,
                    picki(zeros_b, cbf_m[0],
                          cbf_a[0]).astype(jnp.int32)),
                out_iy=picki(pred_m, rec_my, rec_ay),
                out_iu=picki(pred_mu, rec_mu, rec_au),
                out_iv=picki(pred_mv_, rec_mv_, rec_av),
                lev_inter=picki(jnp.zeros_like(pk_m), pk_m, pk_a))
        return d

    # full rounds: the first decides from the lite field; each further
    # round re-decides from the previous FULL field — same economics
    # both sides, so motion reaches a near-fixpoint and the final
    # lists match the lists decisions were made with (few repairs)
    # divergence penalty per round: the last round's penalty reflects
    # the true downstream cost of rewriting motion — each consumer of
    # a changed MV repairs to AMVP (~19 bits); earlier rounds stay
    # loose so the field can actually move toward the RD optimum
    F = F1
    for fr in range(full_rounds):
        pen = 16.0 if fr == full_rounds - 1 and full_rounds > 1 \
            else 4.0
        d8 = decide_full(F, levels[8], True, pen_bits=pen)
        d16 = decide_full(F, levels[16], False, pen_bits=pen)
        d32 = decide_full(F, levels[32], False, pen_bits=pen)
        d32["cost"] = jnp.where(full32, d32["cost"], BIG)
        use16, use32 = hierarchy(d8, d16, d32, F)
        F_prev = F             # pre-commit base for the flip counter
        F = commit_field(d8, d16, d32, use16, use32)
    F1 = F_prev                # diagnostics: last round's input field

    # ---- intra consistency: keep only intra blocks none of whose
    # reference-sample neighbours are themselves kept intra; others
    # fall back to their best inter mode
    intra_f = (F[:, K_KIND] == 3) & (F[:, K_SZ] == 0)
    T = intra_f
    for _ in range(3):
        T = intra_f & ~jnp.any(nb_ok & T[nb_flat], axis=1)
    keep = T & ~jnp.any(nb_ok & T[nb_flat], axis=1)
    demote = intra_f & ~keep
    F = jnp.where(demote[:, None], d8["blk_inter"], F)

    # ---- compose reconstruction + levels from the final field
    sz = F[:, K_SZ]
    out8_y = jnp.where(demote[:, None, None], d8["out_iy"],
                       d8["out_y"])
    out8_u = jnp.where(demote[:, None, None], d8["out_iu"],
                       d8["out_u"])
    out8_v = jnp.where(demote[:, None, None], d8["out_iv"],
                       d8["out_v"])
    lev8 = jnp.where(demote[:, None], d8["lev_inter"], d8["o_lev"])
    rec8y = _unblockify(out8_y, 8, h, w)
    rec8u = _unblockify(out8_u, 4, h // 2, w // 2)
    rec8v = _unblockify(out8_v, 4, h // 2, w // 2)
    rec16y = _unblockify(d16["out_y"], 16, h, w)
    rec16u = _unblockify(d16["out_u"], 8, h // 2, w // 2)
    rec16v = _unblockify(d16["out_v"], 8, h // 2, w // 2)
    rec32y = _unblockify(d32["out_y"], 32, qh * 32, qw * 32)[:h, :w]
    rec32u = _unblockify(d32["out_u"], 16, qh * 16,
                         qw * 16)[:h // 2, :w // 2]
    rec32v = _unblockify(d32["out_v"], 16, qh * 16,
                         qw * 16)[:h // 2, :w // 2]
    m16y = (sz.reshape(bh, bw) == 1).repeat(8, 0).repeat(8, 1)
    m32y = (sz.reshape(bh, bw) == 2).repeat(8, 0).repeat(8, 1)
    m16c = (sz.reshape(bh, bw) == 1).repeat(4, 0).repeat(4, 1)
    m32c = (sz.reshape(bh, bw) == 2).repeat(4, 0).repeat(4, 1)
    rec_y = jnp.where(m32y, rec32y, jnp.where(m16y, rec16y, rec8y)) \
        .reshape(-1)
    rec_u = jnp.where(m32c, rec32u, jnp.where(m16c, rec16u, rec8u)) \
        .reshape(-1)
    rec_v = jnp.where(m32c, rec32v, jnp.where(m16c, rec16v, rec8v)) \
        .reshape(-1)

    levs = lev8
    levs = levs.at[jnp.where(use16[:, None], cells16, P)].set(
        d16["o_lev"].reshape(P16, 4, 96))
    levs = levs.at[jnp.where(use32[:, None], cells8_32, P)].set(
        d32["o_lev"].reshape(P32, 16, 96))

    # ---- exact syntax repair from the final field
    def repair_level(F, L, lanes_mask, scat_cells):
        nbp = F[L["nbc"]]
        nbv = L["nbo"] & (nbp[..., K_DIR] > 0)
        cmx, cmy, crf = merge_candidates_dev(
            nbv, nbp[..., K_MVX], nbp[..., K_MVY], nbp[..., K_REF],
            num_ref, max_merge, n_active=n_active,
            **t_merge(L["traw"]))
        corner = scat_cells[:, 0]
        cur = F[corner]
        kind, mvx, mvy, ref = (cur[:, K_KIND], cur[:, K_MVX],
                               cur[:, K_MVY], cur[:, K_REF])
        hit = (cmx == mvx[:, None]) & (cmy == mvy[:, None]) \
            & (crf == ref[:, None])
        found = jnp.any(hit, axis=1)
        mi_x = jnp.argmax(hit, axis=1).astype(jnp.int32)
        mvpi, mvdx, mvdy, _ = amvp_from_field(nbv, nbp, L, mvx, mvy,
                                              ref)
        was_merge = (kind == 0) | (kind == 1)
        new_kind = jnp.where(was_merge & ~found, 2, kind)
        is_amvp = new_kind == 2
        rep_blk = cur.at[:, K_KIND].set(new_kind) \
            .at[:, K_MI].set(jnp.where(was_merge & found, mi_x,
                                       cur[:, K_MI])) \
            .at[:, K_MVDX].set(jnp.where(is_amvp, mvdx,
                                         cur[:, K_MVDX])) \
            .at[:, K_MVDY].set(jnp.where(is_amvp, mvdy,
                                         cur[:, K_MVDY])) \
            .at[:, K_MVPI].set(jnp.where(is_amvp, mvpi,
                                         cur[:, K_MVPI]))
        apply = lanes_mask & (kind < 3)
        n_rep = jnp.sum((apply & was_merge & ~found).astype(jnp.int32))
        return F.at[jnp.where(apply[:, None], scat_cells, P)].set(
            rep_blk[:, None, :]), n_rep

    flips = jnp.sum((((F[:, K_MVX] != F1[:, K_MVX])
                      | (F[:, K_MVY] != F1[:, K_MVY])
                      | (F[:, K_REF] != F1[:, K_REF]))
                     & (F[:, K_KIND] < 3)).astype(jnp.int32))
    F, r8 = repair_level(F, levels[8], F[:, K_SZ] == 0, bidx[:, None])
    F, r16 = repair_level(F, levels[16], F[cells16[:, 0], K_SZ] == 1,
                          cells16)
    c8_32 = jnp.where(cells8_32 < 0, 0, cells8_32)
    F, r32 = repair_level(F, levels[32],
                          full32 & (F[c8_32[:, 0], K_SZ] == 2), c8_32)
    dbg_repairs = jnp.stack([r8, r16, r32, flips])

    # ---- exact intra recompute for the kept blocks from the final
    # inter reconstruction (their reference neighbours are all inter)
    iref = jnp.where(none_y[:, None], mid, rec_y[sub_y])
    iref_f = filter_reference_batched(iref, 8, bd, strong=False)
    ip = predict_one_mode(iref, iref_f, imode, 8, True, bd)
    irefu = jnp.where(none_c[:, None], mid, rec_u[sub_c])
    irefv = jnp.where(none_c[:, None], mid, rec_v[sub_c])
    cp2x = predict_one_mode(jnp.concatenate([irefu, irefv]),
                            jnp.concatenate([irefu, irefv]),
                            two(imode), 4, False, bd)
    lev_iy2, rec_iy2, _, _ = code(org_blk, ip, qp, 3, bd, lam,
                                  cbflat, True, sdh=sdh,
                                  scan_sel=isel)
    levIC2, recIC2, _, _ = code(
        jnp.concatenate([orgu_blk, orgv_blk]), cp2x, qpc, 2, bd,
        lam_c, cbflat, False, wchroma, sdh=sdh, scan_sel=two(isel))
    lev_iu2, lev_iv2 = levIC2[:P], levIC2[P:]
    rec_iu2, rec_iv2 = recIC2[:P], recIC2[P:]
    lev_i96x = jnp.concatenate([lev_iy2.reshape(P, 64),
                                lev_iu2.reshape(P, 16),
                                lev_iv2.reshape(P, 16)], axis=1)
    is_intra = (F[:, K_KIND] == 3) & (F[:, K_SZ] == 0)
    drop = jnp.where(is_intra, bidx, P)
    yy = (y0_8[:, None] + jnp.arange(8)[None, :])
    xx = (x0_8[:, None] + jnp.arange(8)[None, :])
    fl_y = yy[:, :, None] * w + xx[:, None, :]
    fl_y = jnp.where(is_intra[:, None, None], fl_y, h * w)
    cyy = (by_all * 4)[:, None] + jnp.arange(4)[None, :]
    cxx = (bx_all * 4)[:, None] + jnp.arange(4)[None, :]
    fl_c = cyy[:, :, None] * (w // 2) + cxx[:, None, :]
    fl_c = jnp.where(is_intra[:, None, None], fl_c, h * w // 4)
    rec_y = rec_y.at[fl_y].set(rec_iy2)
    rec_u = rec_u.at[fl_c].set(rec_iu2)
    rec_v = rec_v.at[fl_c].set(rec_iv2)
    levs = levs.at[drop].set(lev_i96x)
    F = F.at[:, K_CBFY].set(jnp.where(
        is_intra, jnp.any(lev_iy2.reshape(P, 64) != 0,
                          axis=1).astype(jnp.int32),
        F[:, K_CBFY]))

    return dict(rec_y=rec_y, rec_u=rec_u, rec_v=rec_v, blk=F,
                levs=levs, imode=imode, dbg_repairs=dbg_repairs)

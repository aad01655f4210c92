"""Device-resident all-intra frame encoder: three-level CU decision
(8/16/32), exact closed-loop reconstruction, RDOQ and CABAC-priced
costs — the whole I-frame as ONE jitted wavefront dispatch.

Layer parity: the batched inversion of TEncCu::xCompressCU +
TEncSearch::estIntraPredLumaQT (TEncCu.cpp:352, TEncSearch.cpp:2945)
for I slices, structured like the P-frame pass (encoder/pframe_dev.py):

  phase 1 (hoisted): open-loop RMD — all 35 modes predicted from
    source-pixel reference lines per size, 8x8-Hadamard SATD + mode
    bits, keep the top-K candidates per block (the batched form of
    HM's rough mode decision list, TEncSearch.cpp:3011-3062).

  phase 2 (lax.scan over z-scan dependency levels): per 8x8 CU the K
    candidates are predicted from COMMITTED reconstruction, coded
    (RDOQ) and priced with CABAC-state tables incl. the real MPM list
    from committed neighbour modes; per 16x16 region one 16x16 intra
    CU trial overwrites the four 8x8 CUs where it wins (split-flag
    priced); likewise per 32x32.

Only entropy stays on host (encoder/intra.py walk), fed by mode8 /
depth8 / level tensors this pass returns.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from hmtpu.encoder.intra_rdo import _MODE_BITS, _satd, LeafDecision
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
    part_size_2nx2n_bits,
    split_flag_bits,
)
from hmtpu.search.wavefront import (
    block_schedule,
    block_schedule16,
    block_schedule32,
    static_ref_gather,
)

K8 = 2       # full-RD candidates per 8x8 CU
K16 = 2      # per 16x16 / 32x32 CU


@lru_cache(maxsize=None)
def _i_static(w: int, h: int, log2_ctu: int):
    """Schedules + substituted ref-gather maps for every size.

    NB: numpy only — this cache is shared across jit traces (the
    caller converts per trace), so entries must be trace-free."""
    sched = block_schedule(w, h, log2_ctu)
    out = dict(
        lv_blk=sched["lv_blk"],
        nb_ok=sched["nb_ok"].reshape(-1, 5),
        g8=list(static_ref_gather(w, h, log2_ctu, 8)),
        g4=list(static_ref_gather(w // 2, h // 2, log2_ctu - 1, 4)),
        g4l=list(static_ref_gather(w, h, log2_ctu, 4)),
        sched16=None, sched32=None,
    )
    if w % 16 == 0 and h % 16 == 0:
        s16 = block_schedule16(w, h, log2_ctu)
        out["sched16"] = (s16["lv_blk"], s16["cells"])
        out["g16"] = list(static_ref_gather(w, h, log2_ctu, 16))
        out["g8c"] = list(static_ref_gather(w // 2, h // 2,
                                            log2_ctu - 1, 8))
        if w % 32 == 0 and h % 32 == 0:
            s32 = block_schedule32(w, h, log2_ctu)
            out["sched32"] = (s32["lv_blk"], s32["cells16"],
                              s32["cells8"])
            out["g32"] = list(static_ref_gather(w, h, log2_ctu, 32))
            out["g16c"] = list(static_ref_gather(w // 2, h // 2,
                                                 log2_ctu - 1, 16))
    return out


def _blockify(plane, n):
    h, w = plane.shape
    return plane.reshape(h // n, n, w // n, n).swapaxes(1, 2) \
        .reshape(-1, n, n)


def _satd4(resi):
    """4x4 Hadamard SATD (xCalcHADs4x4 semantics, heuristic use)."""
    h4 = jnp.asarray([[1, 1, 1, 1], [1, -1, 1, -1],
                      [1, 1, -1, -1], [1, -1, -1, 1]], resi.dtype)
    had = jnp.einsum("ij,...jk,lk->...il", h4, resi, h4)
    return (jnp.sum(jnp.abs(had), axis=(-1, -2)) + 1) >> 1


def _topk_modes(org_blk, ref_u, ref_f, n, bd, lam_sqrt, k):
    """Open-loop RMD: SATD + flat mode bits, top-k modes per block."""
    preds = predict_all_modes(ref_u, ref_f, n, True, bd)
    dist = (_satd4 if n == 4 else _satd)(org_blk[:, None] - preds)
    rd = dist.astype(jnp.float32) \
        + lam_sqrt * jnp.asarray(_MODE_BITS)[None]
    _, idx = jax.lax.top_k(-rd, k)
    return idx.astype(jnp.int32)                       # (P, k)


# NB: deliberately NOT @jax.jit — traced inline by iframe_full_pass
# (see wavefront_pass: jax 0.9 nested-jit buffer-count mis-execution)
def iframe_pass(org_y, org_u, org_v, qp, qpc, cbflat,
                *, w: int, h: int, bd: int = 8, sis: bool = False,
                log2_ctu: int = 6, levels: int = 3,
                qp_factor=0.57, sdh: bool = False, ts: bool = False):
    from hmtpu.encoder.pframe_dev import _code, _code_ts_sel

    st8 = jax.tree_util.tree_map(jnp.asarray, _i_static(w, h,
                                                         log2_ctu))
    bw, bh = w // 8, h // 8
    P = bw * bh
    lam = jnp.float32(qp_factor) \
        * jnp.power(2.0, (qp - 12) / 3.0).astype(jnp.float32)
    lam_sqrt = jnp.sqrt(lam)
    wchroma = jnp.exp2((qp - qpc).astype(jnp.float32) / 3.0)
    lam_c = lam / wchroma
    mid = jnp.int32(1 << (bd - 1))
    org8 = _blockify(org_y, 8)
    org4u = _blockify(org_u, 4)
    org4v = _blockify(org_v, 4)

    # ---- phase 1: RMD top-K per size from source-pixel refs
    def rmd(plane, gmap, n, k):
        sub, none = gmap
        oref = jnp.where(none[:, None], mid, plane.reshape(-1)[sub])
        oref_f = filter_reference_batched(oref, n, bd, strong=sis)
        return _topk_modes(_blockify(plane, n), oref, oref_f, n, bd,
                           lam_sqrt, k)

    cand8 = rmd(org_y, st8["g8"], 8, K8)               # (P, K8)
    # NxN 4x4 PU candidates: open-loop top-1 mode per 4x4
    # (TEncCu.cpp:644-650 intra NxN at max depth)
    cand4 = rmd(org_y, st8["g4l"], 4, 1)[:, 0]         # (P4,)
    org4l = _blockify(org_y, 4)
    gw4 = w // 4

    state = dict(
        rec_y=jnp.zeros(h * w, jnp.int32),
        rec_u=jnp.zeros(h * w // 4, jnp.int32),
        rec_v=jnp.zeros(h * w // 4, jnp.int32),
        imode=jnp.zeros(P, jnp.int32),
        imode4=jnp.zeros((P, 4), jnp.int32),
        part=jnp.zeros(P, jnp.int32),
        cusz=jnp.zeros(P, jnp.int32),
        cbfy=jnp.zeros(P, jnp.int32),
        levs=jnp.zeros((P, 96), jnp.int32),
        tsf=jnp.zeros(P, jnp.int32),
    )

    def mpm_neighbours(st, b, bxi, byi, y0):
        bL = jnp.where(bxi > 0, b - 1, 0)
        bA = jnp.where(byi > 0, b - bw, 0)
        lm = jnp.where(bxi > 0, st["imode"][bL], 1)
        am_ok = (byi > 0) & ((y0 & ((1 << log2_ctu) - 1)) != 0)
        am = jnp.where(am_ok, st["imode"][bA], 1)
        return lm, am

    def try_modes(st, b, modes, org, orgu, orgv, gl, gc, n, log2):
        """Full RD of `modes` (B, K) intra candidates against the
        committed state; returns per-candidate parts."""
        B, K = modes.shape
        subl, nonel = gl
        subc, nonec = gc
        iref = jnp.where(nonel[b, None], mid, st["rec_y"][subl[b]])
        iref_f = filter_reference_batched(iref, n, bd, strong=sis)
        irefu = jnp.where(nonec[b, None], mid, st["rec_u"][subc[b]])
        irefv = jnp.where(nonec[b, None], mid, st["rec_v"][subc[b]])

        # one predict per candidate k (K is static): simpler layout
        # than a repeated batch — arrays are (K*B, ...) k-major
        preds, cpus, cpvs = [], [], []
        for k in range(K):
            mk = modes[:, k]
            preds.append(predict_one_mode(iref, iref_f, mk, n, True,
                                          bd))
            c2 = predict_one_mode(
                jnp.concatenate([irefu, irefv]),
                jnp.concatenate([irefu, irefv]),
                jnp.concatenate([mk, mk]), n // 2, False, bd)
            cpus.append(c2[:B])
            cpvs.append(c2[B:])
        pred = jnp.concatenate(preds)
        cpu = jnp.concatenate(cpus)
        cpv = jnp.concatenate(cpvs)
        repK = lambda a: jnp.concatenate([a] * K, axis=0)
        # mode-dependent coding scans (7.4.9.11) drive the SDH parity
        # groups: 8x8 luma and 4x4 chroma TBs only
        from hmtpu.encoder.pframe_dev import _intra_scan_sel
        msel = _intra_scan_sel(modes.T.reshape(-1))     # k-major (K*B,)
        sel_y = msel if log2 == 3 else None
        sel_c = (jnp.concatenate([msel, msel])
                 if log2 - 1 == 2 else None)
        levY, recY, dY, bY = _code(repK(org), pred, qp, log2, bd, lam,
                                   cbflat, True, sdh=sdh,
                                   scan_sel=sel_y)
        if ts and log2 == 3:
            # 4x4 chroma TBs of an 8x8 CU: transform-skip trial
            levC, recC, dC, bC, ts_c = _code_ts_sel(
                jnp.concatenate([repK(orgu), repK(orgv)]),
                jnp.concatenate([cpu, cpv]), qpc, bd, lam_c,
                cbflat, False, wchroma, sdh=sdh, scan_sel=sel_c)
        else:
            levC, recC, dC, bC = _code(
                jnp.concatenate([repK(orgu), repK(orgv)]),
                jnp.concatenate([cpu, cpv]), qpc, log2 - 1, bd, lam_c,
                cbflat, False, wchroma, sdh=sdh, scan_sel=sel_c)
            ts_c = jnp.zeros((2 * B * K,), bool)
        levU, levV = levC[:B * K], levC[B * K:]
        recU, recV = recC[:B * K], recC[B * K:]
        dU, dV = dC[:B * K], dC[B * K:]
        bU, bV = bC[:B * K], bC[B * K:]
        ncb = (n // 2) * (n // 2)
        b_cbf = cbf_chroma_bits(
            cbflat, jnp.any(levU.reshape(-1, ncb) != 0, 1)) \
            + cbf_chroma_bits(
                cbflat, jnp.any(levV.reshape(-1, ncb) != 0, 1)) \
            + cbf_luma_bits(
                cbflat, jnp.any(levY.reshape(-1, n * n) != 0, 1))
        return (pred, levY, recY, dY, bY, levU, recU, dU, bU,
                levV, recV, dV, bV, b_cbf), \
            (ts_c[:B * K], ts_c[B * K:])

    def pick_best(modes, parts, mode_bits, lam_):
        """argmin over the K candidates; returns flat pick indices
        into the k-major (K*B, ...) candidate arrays."""
        B, K = modes.shape
        (_, levY, recY, dY, bY, levU, recU, dU, bU,
         levV, recV, dV, bV, b_cbf) = parts
        cost = (dY + dU + dV).reshape(K, B).T + lam_ * (
            (bY + bU + bV + b_cbf).reshape(K, B).T + mode_bits)
        ki = jnp.argmin(cost, axis=1).astype(jnp.int32)
        pick = ki * B + jnp.arange(B)
        return ki, pick, jnp.min(cost, axis=1)

    def sub_line(vals, avail):
        """8.4.4.2.2 substitution: entry 0 <- first available forward,
        then forward fill; all-unavailable -> mid."""
        first = jnp.argmax(avail, axis=1)
        v0 = jnp.take_along_axis(vals, first[:, None], 1)[:, 0]
        v0 = jnp.where(jnp.any(avail, axis=1), v0, mid)
        out = [jnp.where(avail[:, 0], vals[:, 0], v0)]
        for e in range(1, vals.shape[1]):
            out.append(jnp.where(avail[:, e], vals[:, e], out[-1]))
        return jnp.stack(out, axis=1)

    def nxn_trial(st, b, bxi, byi, lm, am, orgu, orgv):
        """Intra NxN (four 4x4 luma PUs, TEncCu.cpp:644-650): exact
        sequential reconstruction of the 4 sub-PUs against the
        committed state, assembled from the CU's committed 33-sample
        reference line + internal sub-recons."""
        from hmtpu.encoder.pframe_dev import _intra_scan_sel
        from hmtpu.ops.ratebits import part_size_nxn_bits
        B = b.shape[0]
        sub_f = ((byi * 2)[:, None]
                 + jnp.asarray([0, 0, 1, 1])[None]) * gw4 \
            + (bxi * 2)[:, None] + jnp.asarray([0, 1, 0, 1])[None]
        m4 = cand4[sub_f]                              # (B, 4) z-order
        o4 = org4l[sub_f]                              # (B, 4, 4, 4)
        subl, nonel = st8["g8"]
        iref8 = jnp.where(nonel[b, None], mid, st["rec_y"][subl[b]])
        nbo = st8["nb_ok"][b]
        aL, aA, aAR = nbo[:, 0], nbo[:, 1], nbo[:, 2]
        aBL, aC = nbo[:, 3], nbo[:, 4]
        r4 = lambda f: jnp.repeat(f[:, None], 4, 1)
        T = jnp.ones((B, 4), bool)
        F = jnp.zeros((B, 4), bool)
        z4 = jnp.zeros((B, 4), jnp.int32)

        def pu(vals, avail, mode, org):
            line = sub_line(vals, avail)
            pred = predict_one_mode(line, line, mode, 4, True, bd)
            if ts:
                return _code_ts_sel(
                    org, pred, qp, bd, lam, cbflat, True, sdh=sdh,
                    scan_sel=_intra_scan_sel(mode), use_dst=True)
            lev, rec, d, bb = _code(
                org, pred, qp, 2, bd, lam, cbflat, True, sdh=sdh,
                scan_sel=_intra_scan_sel(mode), use_dst=True)
            return lev, rec, d, bb, jnp.zeros((org.shape[0],), bool)

        # PU0 (x, y): all references external (iref8[8:25])
        lev0, rec0, d0, bb0, tsl0 = pu(
            iref8[:, 8:25],
            jnp.concatenate([r4(aL), r4(aL), aC[:, None], r4(aA),
                             r4(aA)], axis=1), m4[:, 0], o4[:, 0])
        # PU1 (x+4, y): lower-left internal-unavailable, left = PU0's
        # right column, corner/top external
        lev1, rec1, d1, bb1, tsl1 = pu(
            jnp.concatenate([z4, rec0[:, ::-1, 3], iref8[:, 20:21],
                             iref8[:, 21:29]], axis=1),
            jnp.concatenate([F, T, aA[:, None], r4(aA), r4(aAR)],
                            axis=1), m4[:, 1], o4[:, 1])
        # PU2 (x, y+4): left external (lower then upper), top = PU0 +
        # PU1 bottom rows
        lev2, rec2, d2, bb2, tsl2 = pu(
            jnp.concatenate([iref8[:, 4:8], iref8[:, 8:12],
                             iref8[:, 12:13], rec0[:, 3, :],
                             rec1[:, 3, :]], axis=1),
            jnp.concatenate([r4(aBL), r4(aL), aL[:, None], T, T],
                            axis=1), m4[:, 2], o4[:, 2])
        # PU3 (x+4, y+4): below-left/top-right unavailable, left =
        # PU2's right column, corner = PU0[3,3], top = PU1 bottom row
        lev3, rec3, d3, bb3, tsl3 = pu(
            jnp.concatenate([z4, rec2[:, ::-1, 3],
                             rec0[:, 3, 3][:, None], rec1[:, 3, :],
                             z4], axis=1),
            jnp.concatenate([F, T, jnp.ones((B, 1), bool), T, F],
                            axis=1), m4[:, 3], o4[:, 3])

        # chroma: one 4x4 TB pair, DM mode = PU0's luma mode
        subc, nonec = st8["g4"]
        irefu = jnp.where(nonec[b, None], mid, st["rec_u"][subc[b]])
        irefv = jnp.where(nonec[b, None], mid, st["rec_v"][subc[b]])
        c2 = predict_one_mode(jnp.concatenate([irefu, irefv]),
                              jnp.concatenate([irefu, irefv]),
                              jnp.concatenate([m4[:, 0], m4[:, 0]]),
                              4, False, bd)
        selc = _intra_scan_sel(m4[:, 0])
        if ts:
            levC, recC, dC, bC, tsc = _code_ts_sel(
                jnp.concatenate([orgu, orgv]), c2, qpc, bd, lam_c,
                cbflat, False, wchroma, sdh=sdh,
                scan_sel=jnp.concatenate([selc, selc]))
        else:
            levC, recC, dC, bC = _code(
                jnp.concatenate([orgu, orgv]), c2, qpc, 2, bd, lam_c,
                cbflat, False, wchroma, sdh=sdh,
                scan_sel=jnp.concatenate([selc, selc]))
            tsc = jnp.zeros((2 * B,), bool)
        levCu, levCv = levC[:B], levC[B:]
        recCu, recCv = recC[:B], recC[B:]
        tsf_n = (tsl0.astype(jnp.int32) | (tsl1.astype(jnp.int32) << 1)
                 | (tsl2.astype(jnp.int32) << 2)
                 | (tsl3.astype(jnp.int32) << 3)
                 | (tsc[:B].astype(jnp.int32) << 4)
                 | (tsc[B:].astype(jnp.int32) << 5))

        # rate: part NxN + 4x(mode + cbf + residual) + chroma; MPM
        # pricing per PU with internal neighbour modes (approximation
        # for the decision only — the writer derives the exact lists)
        mb = intra_mode_mpm_bits(cbflat, m4[:, 0], lm, am) \
            + intra_mode_mpm_bits(cbflat, m4[:, 1], m4[:, 0], am) \
            + intra_mode_mpm_bits(cbflat, m4[:, 2], lm, m4[:, 0]) \
            + intra_mode_mpm_bits(cbflat, m4[:, 3], m4[:, 2],
                                  m4[:, 1])
        nz = [jnp.any(l.reshape(B, 16) != 0, 1)
              for l in (lev0, lev1, lev2, lev3)]
        b_cbf = sum(cbf_luma_bits(cbflat, z, trafo_depth_is0=False)
                    for z in nz) \
            + cbf_chroma_bits(cbflat,
                              jnp.any(levCu.reshape(B, 16) != 0, 1)) \
            + cbf_chroma_bits(cbflat,
                              jnp.any(levCv.reshape(B, 16) != 0, 1))
        cost = (d0 + d1 + d2 + d3 + dC[:B] + dC[B:]) + lam * (
            mb + part_size_nxn_bits(cbflat) + chroma_dm_bits(cbflat)
            + b_cbf + bb0 + bb1 + bb2 + bb3 + bC[:B] + bC[B:])
        # assemble the 8x8 products (quadrant placement)
        top = jnp.concatenate([rec0, rec1], axis=2)
        bot = jnp.concatenate([rec2, rec3], axis=2)
        rec8 = jnp.concatenate([top, bot], axis=1)
        ltop = jnp.concatenate([lev0, lev1], axis=2)
        lbot = jnp.concatenate([lev2, lev3], axis=2)
        lev8 = jnp.concatenate([ltop, lbot], axis=1)
        cbf_any = (nz[0] | nz[1] | nz[2] | nz[3]).astype(jnp.int32)
        return (cost, m4, rec8, recCu, recCv, lev8, levCu, levCv,
                cbf_any, tsf_n)

    def cell_step(st, blk, valid):
        b = jnp.where(valid, blk, 0)
        byi, bxi = b // bw, b % bw
        x0, y0 = bxi * 8, byi * 8
        B = blk.shape[0]
        modes = cand8[b]                                  # (B, K8)
        lm, am = mpm_neighbours(st, b, bxi, byi, y0)
        mb = intra_mode_mpm_bits(cbflat, modes, lm[:, None],
                                 am[:, None]) \
            + part_size_2nx2n_bits(cbflat) + chroma_dm_bits(cbflat)
        parts, (ts_u, ts_v) = try_modes(st, b, modes, org8[b],
                                        org4u[b], org4v[b],
                                        st8["g8"], st8["g4"], 8, 3)
        ki, pick, cost = pick_best(modes, parts, mb, lam)
        (_, levY, recY, _, _, levU, recU, _, _, levV, recV, _, _,
         _) = parts
        out_y = recY[pick]
        out_u = recU[pick]
        out_v = recV[pick]
        o_lev = jnp.concatenate(
            [levY[pick].reshape(B, 64), levU[pick].reshape(B, 16),
             levV[pick].reshape(B, 16)], axis=1)
        wmode = jnp.take_along_axis(modes, ki[:, None], 1)[:, 0]
        cbfy8 = jnp.any(levY[pick].reshape(B, 64) != 0,
                        axis=1).astype(jnp.int32)

        tsf2 = (ts_u[pick].astype(jnp.int32) << 4) \
            | (ts_v[pick].astype(jnp.int32) << 5)

        # ---- NxN trial against the 2Nx2N winner
        (cost_n, m4, rec8n, recCun, recCvn, lev8n, levCun, levCvn,
         cbf_n, tsf_n) = nxn_trial(st, b, bxi, byi, lm, am, org4u[b],
                                   org4v[b])
        use_n = cost_n < cost
        cost = jnp.minimum(cost, cost_n)
        w3 = lambda a, bn: jnp.where(use_n[:, None, None], bn, a)
        out_y = w3(out_y, rec8n)
        out_u = w3(out_u, recCun)
        out_v = w3(out_v, recCvn)
        o_lev = jnp.where(
            use_n[:, None],
            jnp.concatenate([lev8n.reshape(B, 64),
                             levCun.reshape(B, 16),
                             levCvn.reshape(B, 16)], axis=1), o_lev)
        wmode = jnp.where(use_n, m4[:, 0], wmode)
        cbfy8 = jnp.where(use_n, cbf_n, cbfy8)
        part_o = use_n.astype(jnp.int32)
        imode4_o = jnp.where(use_n[:, None], m4,
                             jnp.repeat(wmode[:, None], 4, 1))
        tsf_o = jnp.where(use_n, tsf_n, tsf2)

        drop = jnp.where(valid, b, P)
        yy = (y0[:, None] + jnp.arange(8)[None, :])
        xx = (x0[:, None] + jnp.arange(8)[None, :])
        fl_y = yy[:, :, None] * w + xx[:, None, :]
        fl_y = jnp.where(valid[:, None, None], fl_y, h * w)
        cyy = (byi * 4)[:, None] + jnp.arange(4)[None, :]
        cxx = (bxi * 4)[:, None] + jnp.arange(4)[None, :]
        fl_c = cyy[:, :, None] * (w // 2) + cxx[:, None, :]
        fl_c = jnp.where(valid[:, None, None], fl_c, h * w // 4)
        st = dict(
            rec_y=st["rec_y"].at[fl_y].set(out_y),
            rec_u=st["rec_u"].at[fl_c].set(out_u),
            rec_v=st["rec_v"].at[fl_c].set(out_v),
            imode=st["imode"].at[drop].set(wmode),
            imode4=st["imode4"].at[drop].set(imode4_o),
            part=st["part"].at[drop].set(part_o),
            cusz=st["cusz"].at[drop].set(0),
            cbfy=st["cbfy"].at[drop].set(cbfy8),
            levs=st["levs"].at[drop].set(o_lev),
            tsf=st["tsf"].at[drop].set(tsf_o),
        )
        return st, cost

    if levels == 1 or st8["sched16"] is None:
        def step(st, blk):
            st, _ = cell_step(st, blk, blk >= 0)
            return st, None

        state, _ = jax.lax.scan(step, state, st8["lv_blk"])
        return state

    # ---- 16 level
    gw, gh = bw // 2, bh // 2
    org16 = _blockify(org_y, 16)
    org8u = _blockify(org_u, 8)
    org8v = _blockify(org_v, 8)
    cand16 = rmd(org_y, st8["g16"], 16, K16)
    lv16, cells16 = st8["sched16"]

    def region16(st, blk16, valid):
        g = jnp.where(valid, blk16, 0)
        B = blk16.shape[0]
        c4 = cells16[g]

        def cell_body(carry, cells):
            st_, acc = carry
            st_, cc = cell_step(st_, cells, valid)
            return (st_, acc + cc), None

        (st, cost8), _ = jax.lax.scan(
            cell_body, (st, jnp.zeros((B,), jnp.float32)), c4.T)

        gyb, gxb = g // gw, g % gw
        corner = (gyb * 2) * bw + gxb * 2
        modes = cand16[g]
        lm, am = mpm_neighbours(st, corner, gxb * 2, gyb * 2, gyb * 16)
        mb = intra_mode_mpm_bits(cbflat, modes, lm[:, None],
                                 am[:, None]) + chroma_dm_bits(cbflat)
        parts, _ = try_modes(st, g, modes, org16[g], org8u[g],
                             org8v[g], st8["g16"], st8["g8c"], 16, 4)
        ki, pick, cost16 = pick_best(modes, parts, mb, lam)
        (_, levY, recY, _, _, levU, recU, _, _, levV, recV, _, _,
         _) = parts
        inc_sp = jnp.ones_like(g)  # neighbour-depth approx
        cost16 = cost16 + lam * split_flag_bits(
            cbflat, jnp.zeros_like(g), inc_sp)
        cost8 = cost8 + lam * split_flag_bits(
            cbflat, jnp.ones_like(g), inc_sp)
        use16 = valid & (cost16 < cost8)
        wmode = jnp.take_along_axis(modes, ki[:, None], 1)[:, 0]

        pack = jnp.concatenate([levY[pick].reshape(B, 256),
                                levU[pick].reshape(B, 64),
                                levV[pick].reshape(B, 64)], axis=1) \
            .reshape(B, 4, 96)
        drop4 = jnp.where(use16[:, None], c4, P)
        x0, y0 = gxb * 16, gyb * 16
        yy = (y0[:, None] + jnp.arange(16)[None, :])
        xx = (x0[:, None] + jnp.arange(16)[None, :])
        fl_y = yy[:, :, None] * w + xx[:, None, :]
        fl_y = jnp.where(use16[:, None, None], fl_y, h * w)
        cyy = (gyb * 8)[:, None] + jnp.arange(8)[None, :]
        cxx = (gxb * 8)[:, None] + jnp.arange(8)[None, :]
        fl_c = cyy[:, :, None] * (w // 2) + cxx[:, None, :]
        fl_c = jnp.where(use16[:, None, None], fl_c, h * w // 4)
        st = dict(
            rec_y=st["rec_y"].at[fl_y].set(recY[pick]),
            rec_u=st["rec_u"].at[fl_c].set(recU[pick]),
            rec_v=st["rec_v"].at[fl_c].set(recV[pick]),
            imode=st["imode"].at[drop4].set(wmode[:, None]),
            imode4=st["imode4"].at[drop4].set(
                jnp.repeat(wmode[:, None], 4, 1)[:, None, :]),
            part=st["part"].at[drop4].set(0),
            cusz=st["cusz"].at[drop4].set(1),
            cbfy=st["cbfy"].at[drop4].set(
                jnp.any(levY[pick].reshape(B, 256) != 0,
                        axis=1).astype(jnp.int32)[:, None]),
            levs=st["levs"].at[drop4].set(pack),
            tsf=st["tsf"].at[drop4].set(0),
        )
        return st, jnp.where(use16, cost16, cost8)

    if levels == 2 or st8["sched32"] is None:
        def step16(st, blk16):
            st, _ = region16(st, blk16, blk16 >= 0)
            return st, None

        state, _ = jax.lax.scan(step16, state, lv16)
        return state

    # ---- 32 level
    qw, qh = gw // 2, gh // 2
    org32 = _blockify(org_y, 32)
    org16u = _blockify(org_u, 16)
    org16v = _blockify(org_v, 16)
    cand32 = rmd(org_y, st8["g32"], 32, K16)
    lv32, cells16_32, cells8_32 = st8["sched32"]

    def step32(st, blk32):
        valid = blk32 >= 0
        g = jnp.where(valid, blk32, 0)
        B = blk32.shape[0]

        def reg_body(carry, cells):
            st_, acc = carry
            cv = valid & (cells >= 0)
            st_, cc = region16(st_, jnp.where(cv, cells, 0), cv)
            return (st_, acc + jnp.where(cv, cc, 0.0)), None

        (st, cost_sub), _ = jax.lax.scan(
            reg_body, (st, jnp.zeros((B,), jnp.float32)),
            cells16_32[g].T)

        qyb, qxb = g // qw, g % qw
        corner = (qyb * 4) * bw + qxb * 4
        modes = cand32[g]
        lm, am = mpm_neighbours(st, corner, qxb * 4, qyb * 4, qyb * 32)
        mb = intra_mode_mpm_bits(cbflat, modes, lm[:, None],
                                 am[:, None]) + chroma_dm_bits(cbflat)
        parts, _ = try_modes(st, g, modes, org32[g], org16u[g],
                             org16v[g], st8["g32"], st8["g16c"], 32,
                             5)
        ki, pick, cost32 = pick_best(modes, parts, mb, lam)
        (_, levY, recY, _, _, levU, recU, _, _, levV, recV, _, _,
         _) = parts
        inc_sp = jnp.ones_like(g)
        cost32 = cost32 + lam * split_flag_bits(
            cbflat, jnp.zeros_like(g), inc_sp)
        cost_sub = cost_sub + lam * split_flag_bits(
            cbflat, jnp.ones_like(g), inc_sp)
        use32 = valid & (cost32 < cost_sub)
        wmode = jnp.take_along_axis(modes, ki[:, None], 1)[:, 0]
        pack = jnp.concatenate([levY[pick].reshape(B, 1024),
                                levU[pick].reshape(B, 256),
                                levV[pick].reshape(B, 256)], axis=1) \
            .reshape(B, 16, 96)
        drop16 = jnp.where(use32[:, None], cells8_32[g], P)
        x0, y0 = qxb * 32, qyb * 32
        yy = (y0[:, None] + jnp.arange(32)[None, :])
        xx = (x0[:, None] + jnp.arange(32)[None, :])
        fl_y = yy[:, :, None] * w + xx[:, None, :]
        fl_y = jnp.where(use32[:, None, None], fl_y, h * w)
        cyy = (qyb * 16)[:, None] + jnp.arange(16)[None, :]
        cxx = (qxb * 16)[:, None] + jnp.arange(16)[None, :]
        fl_c = cyy[:, :, None] * (w // 2) + cxx[:, None, :]
        fl_c = jnp.where(use32[:, None, None], fl_c, h * w // 4)
        st = dict(
            rec_y=st["rec_y"].at[fl_y].set(recY[pick]),
            rec_u=st["rec_u"].at[fl_c].set(recU[pick]),
            rec_v=st["rec_v"].at[fl_c].set(recV[pick]),
            imode=st["imode"].at[drop16].set(wmode[:, None]),
            imode4=st["imode4"].at[drop16].set(
                jnp.repeat(wmode[:, None], 4, 1)[:, None, :]),
            part=st["part"].at[drop16].set(0),
            cusz=st["cusz"].at[drop16].set(2),
            cbfy=st["cbfy"].at[drop16].set(
                jnp.any(levY[pick].reshape(B, 1024) != 0,
                        axis=1).astype(jnp.int32)[:, None]),
            levs=st["levs"].at[drop16].set(pack),
            tsf=st["tsf"].at[drop16].set(0),
        )
        return st, None

    state, _ = jax.lax.scan(step32, state, lv32)
    return state


_IFP_STATICS = ("w", "h", "bd", "sis", "log2_ctu", "deblock", "sao",
                "ctu", "cb_off", "cr_off", "sdh", "ts")


def iframe_full_pass(org_y, org_u, org_v, qp, qpc, cbflat,
                     *, w: int, h: int, bd: int = 8, sis: bool = False,
                     log2_ctu: int = 6, deblock: bool = True,
                     sao: bool = True, ctu: int = 64, cb_off: int = 0,
                     cr_off: int = 0, qp_factor=0.57,
                     sdh: bool = False, ts: bool = False):
    """Decision pass + in-loop filters in one dispatch (the I-frame
    twin of full_pframe_pass)."""
    st = iframe_pass(org_y, org_u, org_v, qp, qpc, cbflat, w=w, h=h,
                     bd=bd, sis=sis, log2_ctu=log2_ctu,
                     qp_factor=qp_factor, sdh=sdh, ts=ts)
    bw, bh = w // 8, h // 8
    if deblock or sao:
        from hmtpu.ops.deblock import deblock_frame_dev
        from hmtpu.ops.sao import sao_frame_dev

        rec_y = st["rec_y"].reshape(h, w)
        rec_u = st["rec_u"].reshape(h // 2, w // 2)
        rec_v = st["rec_v"].reshape(h // 2, w // 2)
        rep4 = lambda a: jnp.repeat(jnp.repeat(
            a.reshape(bh, bw), 2, 0), 2, 1)
        intra4 = jnp.ones((h // 4, w // 4), bool)
        cbf4 = rep4(st["cbfy"] > 0)
        zeros4 = jnp.zeros((h // 4, w // 4), jnp.int32)
        mv4 = jnp.stack([zeros4, zeros4])
        refpoc4 = jnp.full((2, h // 4, w // 4), -1, jnp.int32)
        if deblock:
            cusz8 = st["cusz"].reshape(bh, bw)
            ev = jnp.arange(bw - 1)
            int_v = ((cusz8[:, :-1] == 1) & ((ev % 2) == 0)[None, :]) \
                | ((cusz8[:, :-1] == 2) & ((ev % 4) != 3)[None, :])
            eh = jnp.arange(bh - 1)
            int_h = ((cusz8[:-1, :] == 1) & ((eh % 2) == 0)[:, None]) \
                | ((cusz8[:-1, :] == 2) & ((eh % 4) != 3)[:, None])
            rec_y, rec_u, rec_v = deblock_frame_dev(
                rec_y, rec_u, rec_v, intra4, cbf4, mv4, mv4,
                refpoc4, qp, bd, cb_qp_off=cb_off, cr_qp_off=cr_off,
                int_v=int_v, int_h=int_h)
        if sao:
            lam = jnp.float32(qp_factor) \
                * jnp.power(2.0, (qp - 12) / 3.0).astype(jnp.float32)
            rec_y, rec_u, rec_v, sao_params = sao_frame_dev(
                org_y, rec_y, org_u, rec_u, org_v, rec_v, ctu, lam, bd)
            st["sao"] = sao_params.astype(jnp.int8)
        st["rec_y"] = rec_y.reshape(-1)
        st["rec_u"] = rec_u.reshape(-1)
        st["rec_v"] = rec_v.reshape(-1)
    rec_t = jnp.uint8 if bd == 8 else jnp.uint16
    small = dict(rec_y=rec_t, rec_u=rec_t, rec_v=rec_t,
                 imode=jnp.int8, imode4=jnp.int8, part=jnp.int8,
                 cusz=jnp.int8, cbfy=jnp.int8,
                 levs=jnp.int16, sao=jnp.int8, tsf=jnp.int8)
    return {k: v.astype(small[k]) for k, v in st.items()}


from hmtpu.encoder.pframe_dev import python_dispatch as _pd  # noqa: E402

iframe_full_pass = _pd(
    jax.jit(iframe_full_pass, static_argnames=_IFP_STATICS),
    _IFP_STATICS)


def unpack_iframe_state(st, w: int, h: int, log2_ctu: int):
    """Device state -> (mode8, depth8, decisions dict) in the
    IntraFrameEncoder envelope (z-order cell packing as pframe_dev)."""
    bw, bh = w // 8, h // 8
    imode = np.asarray(st["imode"]).reshape(bh, bw)
    part = np.asarray(st["part"]).reshape(bh, bw) \
        if "part" in st else np.zeros((bh, bw), np.int32)
    imode4 = np.asarray(st["imode4"]).reshape(bh, bw, 4) \
        if "imode4" in st else None
    cusz = np.asarray(st["cusz"]).reshape(bh, bw)
    levs = np.asarray(st["levs"]).reshape(bh, bw, 96)
    tsf = np.asarray(st["tsf"]).reshape(bh, bw) \
        if "tsf" in st else None
    depth8 = np.full((bh, bw), log2_ctu - 3, np.int32)
    depth8[cusz == 1] = log2_ctu - 4
    depth8[cusz == 2] = log2_ctu - 5
    decisions = {}
    for byi in range(bh):
        for bxi in range(bw):
            sz = int(cusz[byi, bxi])
            if sz == 1 and (byi % 2 or bxi % 2):
                continue
            if sz == 2 and (byi % 4 or bxi % 4):
                continue
            mode = int(imode[byi, bxi])
            if sz == 0:
                l = levs[byi, bxi]
                m4 = tuple(int(x) for x in imode4[byi, bxi]) \
                    if (imode4 is not None and part[byi, bxi]) else None
                tf = int(tsf[byi, bxi]) if tsf is not None else 0
                decisions[(bxi * 8, byi * 8)] = LeafDecision(
                    mode, 3, l[:64].reshape(8, 8),
                    l[64:80].reshape(4, 4), l[80:96].reshape(4, 4),
                    modes4=m4,
                    ts_y4=tuple((tf >> p) & 1 for p in range(4)),
                    ts_cb=(tf >> 4) & 1, ts_cr=(tf >> 5) & 1)
            elif sz == 1:
                l2 = levs[byi:byi + 2, bxi:bxi + 2].reshape(4, 96)
                flat = np.concatenate([l2[0], l2[1], l2[2], l2[3]])
                decisions[(bxi * 8, byi * 8)] = LeafDecision(
                    mode, 4, flat[:256].reshape(16, 16),
                    flat[256:320].reshape(8, 8),
                    flat[320:384].reshape(8, 8))
            else:
                zord = ((0, 0), (0, 1), (1, 0), (1, 1),
                        (0, 2), (0, 3), (1, 2), (1, 3),
                        (2, 0), (2, 1), (3, 0), (3, 1),
                        (2, 2), (2, 3), (3, 2), (3, 3))
                flat = np.concatenate(
                    [levs[byi + r, bxi + c] for r, c in zord])
                decisions[(bxi * 8, byi * 8)] = LeafDecision(
                    mode, 5, flat[:1024].reshape(32, 32),
                    flat[1024:1280].reshape(16, 16),
                    flat[1280:1536].reshape(16, 16))
    mode8 = imode.astype(np.int32)
    return mode8, depth8, decisions

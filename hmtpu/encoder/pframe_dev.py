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
from hmtpu.ops.intra_pred import (
    filter_reference_batched,
    predict_all_modes,
    predict_one_mode,
)
from hmtpu.ops.quant import dequantize_t, quantize_t
from hmtpu.ops.ratebits import (
    cbf_chroma_bits,
    cbf_luma_bits,
    merge_flag_bits,
    merge_idx_bits,
    mvd_bits,
    mvp_idx_bits,
    part_size_2nx2n_bits,
    pred_mode_bits,
    ref_idx_bits,
    rqt_root_cbf_bits,
    skip_flag_bits,
    split_flag_bits,
    tb_bits,
)
from hmtpu.ops.transform import forward_transform, inverse_transform
from hmtpu.search.wavefront import (
    amvp_candidates_dev,
    amvp_candidates_dev_b,
    block_schedule,
    block_schedule16,
    block_schedule32,
    merge_candidates_dev,
    merge_candidates_dev_b,
    mv_bits_dev,
    scale_mv_pair_dev,
    static_ref_gather,
    temporal_cand_grid_dev,
)

INTRA_GATE = 24.0          # evaluate intra only when inter cost > gate*lam
BIG = jnp.float32(3e38)

# host-side event counters (introspection for tests/diagnostics)
DBG_COUNTERS = {"cu64_merge": 0, "cu64_amvp": 0, "ldp_ts_tbs": 0}


def python_dispatch(jitfn, static_names=()):
    """Dispatch a jitted function through memoized AOT-compiled
    executables (jax.stages) instead of the PjitFunction C++ fastpath.

    Works around a jax 0.9.0 CPU mis-execution: from the second call
    of a compiled instance onward, the fastpath supplies only the
    user arguments while the loaded program also expects the closed-
    over constant buffers ("Execution supplied N buffers but compiled
    program expected M") — the first (python-path) call of the same
    instance works.  The stages.Compiled path always prepends the
    constants.  Dispatch overhead is ~1 ms per call, noise against
    these whole-frame programs."""
    cache = {}
    statics = frozenset(static_names)

    def wrapper(*args, **kwargs):
        leaves, treedef = jax.tree_util.tree_flatten((args, kwargs))
        key = (treedef, tuple(
            (x.shape, str(getattr(x, "dtype", ""))) if hasattr(x, "shape")
            else x for x in leaves))
        ex = cache.get(key)
        if ex is None:
            ex = jitfn.lower(*args, **kwargs).compile()
            cache[key] = ex
        dyn_kwargs = {k: v for k, v in kwargs.items()
                      if k not in statics}
        return ex(*args, **dyn_kwargs)

    wrapper.__wrapped__ = jitfn
    return wrapper


@lru_cache(maxsize=None)
def _dev_static(w: int, h: int, log2_ctu: int):
    """Schedule + gather tables as device arrays, one upload per
    geometry for the whole encode."""
    sched = block_schedule(w, h, log2_ctu)
    sub_y, none_y = static_ref_gather(w, h, log2_ctu, 8)
    sub_c, none_c = static_ref_gather(w // 2, h // 2, log2_ctu - 1, 4)
    sched16 = None
    sched32 = None
    if w % 16 == 0 and h % 16 == 0:
        s16 = block_schedule16(w, h, log2_ctu)
        sched16 = (jnp.asarray(s16["lv_blk"]),
                   jnp.asarray(s16["cells"]),
                   jnp.asarray(s16["nb_ok"]),
                   jnp.asarray(s16["nb_cell"]))
        s32 = block_schedule32(w, h, log2_ctu)
        sched32 = (jnp.asarray(s32["lv_blk"]),
                   jnp.asarray(s32["cells16"]),
                   jnp.asarray(s32["cells8"]),
                   jnp.asarray(s32["nb_ok"]),
                   jnp.asarray(s32["nb_cell"]),
                   jnp.asarray(s32["full32"]))
    return dict(
        lv_blk=jnp.asarray(sched["lv_blk"]),
        nb_ok=jnp.asarray(sched["nb_ok"].reshape(-1, 5)),
        nb_flat=jnp.asarray(sched["nb_flat"].reshape(-1, 5)),
        sub_y=jnp.asarray(sub_y), none_y=jnp.asarray(none_y),
        sub_c=jnp.asarray(sub_c), none_c=jnp.asarray(none_c),
        sched16=sched16, sched32=sched32,
    )


def _root_cbf_bits(cbflat, y_nz, cb_nz, cr_nz, cbf_bits_inter):
    """rqt_root_cbf + (cbf flags when coded) for an AMVP CU."""
    root = y_nz | cb_nz | cr_nz
    return rqt_root_cbf_bits(cbflat, root) + jnp.where(
        root, cbf_bits_inter(y_nz, cb_nz, cr_nz), 0.0)


def _blockify(plane, n):
    h, w = plane.shape
    return plane.reshape(h // n, n, w // n, n).swapaxes(1, 2) \
        .reshape(-1, n, n)


@lru_cache(maxsize=None)
def _scan_pos_table(log2: int) -> np.ndarray:
    """Raster index -> diagonal-scan position (for the rate model)."""
    from hmtpu.common.scan import scan_order

    so = scan_order(log2, 0).reshape(-1)
    spos = np.empty(so.size, np.int32)
    spos[so] = np.arange(so.size)
    return spos


def _intra_scan_sel(m):
    """Vectorised intra_scan_idx (7.4.9.11) for the sizes where the
    coding scan is mode-dependent (4x4/8x8 luma, 4x4 chroma):
    2=vertical for modes 6-14, 1=horizontal for 22-30, else diag."""
    return jnp.where((m >= 6) & (m <= 14), 2,
                     jnp.where((m >= 22) & (m <= 30), 1, 0)) \
        .astype(jnp.int32)


def _code(org, pred, qp, log2: int, bd: int, lam=None, cbflat=None,
          is_luma=True, dw=None, sdh: bool = False, scan_sel=None,
          use_dst: bool = False, rdoq: bool = True, ts: bool = False):
    """transform -> quant -> RDOQ-lite -> dequant -> inverse -> clip;
    returns (lev, rec, sse, bits).

    Bits are the CABAC-state-aware estimate of ops/ratebits.py (the
    batched twin of HM's FAST_BIT_EST counter) priced from harvested
    context states; 0.0 for an all-zero TB (cbf priced at CU level).
    Quantisation is the full vectorised RDOQ (ops/rdoq.py) when lam is
    given; dw is HM's chroma distortion weight applied to the returned
    SSE (chroma callers pass lam = lambda/dw per RDOQ_CHROMA_LAMBDA).
    ts=True codes the TB in transform-skip mode (4x4 only)."""
    from hmtpu.ops.transform import transform_skip_fwd, \
        transform_skip_inv
    n = 1 << log2
    resi = org - pred
    coef = transform_skip_fwd(resi, n, bd) if ts \
        else forward_transform(resi, n, bd, use_dst=use_dst)
    if lam is not None:
        from hmtpu.ops.rdoq import rdoq_tb
        lev = rdoq_tb(coef, qp, log2, bd, lam, cbflat, is_luma,
                      sdh=sdh, scan_sel=scan_sel, trellis=rdoq)
    else:
        lev = quantize_t(coef, qp, log2, bd, False)
    deq = dequantize_t(lev, qp, log2, bd)
    r = transform_skip_inv(deq, n, bd) if ts \
        else inverse_transform(deq, n, bd, use_dst=use_dst)
    rec = jnp.clip(pred + r, 0, (1 << bd) - 1)
    sse = jnp.sum((org - rec) ** 2, axis=(-1, -2)).astype(jnp.float32)
    if dw is not None:
        sse = sse * dw          # HM chroma distortion weight
    return lev, rec, sse, tb_bits(lev, cbflat, log2, is_luma, 0, sdh)


def _code_ts_sel(org, pred, qp, bd, lam, cbflat, is_luma, dw=None,
                 sdh: bool = False, scan_sel=None,
                 use_dst: bool = False, rdoq: bool = True):
    """4x4 TB coded both ways (DCT/DST vs transform-skip), per-block
    RD selection including the transform_skip_flag bit (the batched
    form of TComTrQuant::transformNxN's TS trial + RDOQTS).  Returns
    (lev, rec, sse, bits_incl_flag, use_ts)."""
    from hmtpu.ops.ratebits import ts_flag_bits
    l0, r0, d0, b0 = _code(org, pred, qp, 2, bd, lam, cbflat,
                           is_luma, dw, sdh, scan_sel, use_dst, rdoq)
    l1, r1, d1, b1 = _code(org, pred, qp, 2, bd, lam, cbflat,
                           is_luma, dw, sdh, scan_sel, use_dst, rdoq,
                           ts=True)
    B = l0.shape[0]
    nz0 = jnp.any(l0.reshape(B, 16) != 0, axis=1)
    nz1 = jnp.any(l1.reshape(B, 16) != 0, axis=1)
    f0 = ts_flag_bits(cbflat, jnp.zeros(B, jnp.int32), is_luma)
    f1 = ts_flag_bits(cbflat, jnp.ones(B, jnp.int32), is_luma)
    # the flag exists only when the TB is coded (cbf=1)
    bits0 = b0 + jnp.where(nz0, f0, 0.0)
    bits1 = b1 + jnp.where(nz1, f1, 0.0)
    use_ts = nz1 & (d1 + lam * bits1 < d0 + lam * bits0)
    pickb = lambda a, b_: jnp.where(
        use_ts.reshape((-1,) + (1,) * (a.ndim - 1)), b_, a)
    return (pickb(l0, l1), pickb(r0, r1), jnp.where(use_ts, d1, d0),
            jnp.where(use_ts, bits1, bits0), use_ts)


# NB: deliberately NOT @jax.jit — always traced inline by
# full_pframe_pass (jax 0.9 mis-executes the nested-jit form of this
# constant-heavy function: "Execution supplied N buffers but compiled
# program expected M"); __graft_entry__ wraps it explicitly.
def wavefront_pass(org_y, org_u, org_v, refs_y, refs_u, refs_v,
                   mv_x, mv_y, mv_ref, lv_blk, nb_ok, nb_flat,
                   sub_y, none_y, sub_u, none_c, ref_pocs, cur_poc,
                   mv16=None, sched16=None, mv32=None, sched32=None,
                   qp=32, qpc=32, col=None, col_poc=0, cbflat=None,
                   mv_lx=None, ref_pocs_l1=None,
                   *, w: int, h: int, num_ref: int, max_merge: int,
                   bd: int = 8,
                   qp_factor=0.57, levels: int = 1,
                   tmvp: bool = False, log2_ctu: int = 6,
                   sdh: bool = False, num_ref_l1: int = 0,
                   l0map: tuple = None, l1map: tuple = None,
                   rdoq: bool = True, n_active=None,
                   ts: bool = False):
    """B-slice mode (num_ref_l1 > 0): refs_* are the deduped union of
    both reference lists, l0map/l1map are static union indices per
    list, mv_lx/mv16[3]/mv32[3] carry the per-block AMVP list choice,
    and merge candidates run the two-list derivation
    (search/wavefront.py merge_candidates_dev_b) with bi-prediction
    via intermediate-precision hypotheses (TEncSearch motion
    compensation parity, 8.5.4.2.3.2)."""
    bw, bh = w // 8, h // 8
    P = bw * bh
    is_b = num_ref_l1 > 0
    Ru = refs_y.shape[0]
    code = partial(_code, rdoq=rdoq)
    if is_b:
        l0m = jnp.asarray(l0map, jnp.int32)
        l1m = jnp.asarray(l1map, jnp.int32)
        headroom = 14 - bd       # IF_INTERNAL_PREC - bd
        from hmtpu.ops.interp import (
            bi_average_t,
            mc_chroma_batch_refs_i,
            mc_luma_batch_refs_i,
        )
        from hmtpu.ops.ratebits import inter_dir_bits

        def apx_uni(i):
            """Approximate final samples from an intermediate-precision
            hypothesis (screening only — winners are recomputed with
            the exact final-precision filter)."""
            return jnp.clip((i + 8192 + (1 << (headroom - 1)))
                            >> headroom, 0, (1 << bd) - 1)
    lam = jnp.float32(qp_factor) \
        * jnp.power(2.0, (qp - 12) / 3.0).astype(jnp.float32)
    lam_sqrt = jnp.sqrt(lam)
    # chroma distortion weight + chroma RDOQ lambda (TEncSlice
    # setUpLambda: w = 2^((qp-qpc)/3), lambda_c = lambda/w)
    wchroma = jnp.exp2((qp - qpc).astype(jnp.float32) / 3.0)
    lam_c = lam / wchroma
    mid = jnp.int32(1 << (bd - 1))
    bidx = jnp.arange(P)
    by_all, bx_all = bidx // bw, bidx % bw
    x0_all, y0_all = bx_all * 8, by_all * 8
    org_blk = _blockify(org_y, 8)
    orgu_blk = _blockify(org_u, 4)
    orgv_blk = _blockify(org_v, 4)

    # ---- phase 1a: AMVP candidate prediction + residual for all blocks
    mvxf, mvyf = mv_x.reshape(-1), mv_y.reshape(-1)
    rself = mv_ref.reshape(-1)
    if is_b:
        lxf = mv_lx.reshape(-1)
        rsu = jnp.where(lxf == 0, l0m[jnp.clip(rself, 0, num_ref - 1)],
                        l1m[jnp.clip(rself, 0, num_ref_l1 - 1)])
    else:
        rsu = rself
    pred_a = mc_luma_batch_refs(refs_y, rsu, x0_all, y0_all,
                                mvxf, mvyf, 8, 8, bd)
    pred_au = mc_chroma_batch_refs(refs_u, rsu, bx_all * 4, by_all * 4,
                                   mvxf, mvyf, 4, 4, bd)
    pred_av = mc_chroma_batch_refs(refs_v, rsu, bx_all * 4, by_all * 4,
                                   mvxf, mvyf, 4, 4, bd)
    lev_ay, rec_ay, d_ay, b_ay = code(org_blk, pred_a, qp, 3, bd, lam,
                                       cbflat, True, sdh=sdh)
    if ts:
        levAC, recAC, dAC, bAC, tsAC = _code_ts_sel(
            jnp.concatenate([orgu_blk, orgv_blk]),
            jnp.concatenate([pred_au, pred_av]), qpc, bd, lam_c,
            cbflat, False, wchroma, sdh=sdh, rdoq=rdoq)
        lev_au, lev_av = levAC[:P], levAC[P:]
        rec_au, rec_av = recAC[:P], recAC[P:]
        d_au, d_av = dAC[:P], dAC[P:]
        b_au, b_av = bAC[:P], bAC[P:]
        ts_a = tsAC[:P].astype(jnp.int32) \
            | (tsAC[P:].astype(jnp.int32) << 1)
    else:
        lev_au, rec_au, d_au, b_au = code(orgu_blk, pred_au, qpc, 2,
                                          bd, lam_c, cbflat, False,
                                          wchroma, sdh=sdh)
        lev_av, rec_av, d_av, b_av = code(orgv_blk, pred_av, qpc, 2,
                                          bd, lam_c, cbflat, False,
                                          wchroma, sdh=sdh)
        ts_a = jnp.zeros((P,), jnp.int32)
    dist_a = d_ay + d_au + d_av
    bits_a_lev = b_ay + b_au + b_av
    cbf_a8 = (jnp.any(lev_ay.reshape(P, 64) != 0, axis=1),
              jnp.any(lev_au.reshape(P, 16) != 0, axis=1),
              jnp.any(lev_av.reshape(P, 16) != 0, axis=1))

    def cbf_bits_inter(y_nz, cb_nz, cr_nz):
        """Chroma cbf pair + luma cbf (inferred 1 when both chroma are
        zero — the native writer's inter-CU convention)."""
        b = cbf_chroma_bits(cbflat, cb_nz) + cbf_chroma_bits(cbflat,
                                                             cr_nz)
        return b + jnp.where(cb_nz | cr_nz,
                             cbf_luma_bits(cbflat, y_nz), 0.0)

    # ---- phase 1b: open-loop intra mode per block (org-pixel refs)
    oref = jnp.where(none_y[:, None], mid, org_y.reshape(-1)[sub_y])
    oref_f = filter_reference_batched(oref, 8, bd, strong=False)
    opreds = predict_all_modes(oref, oref_f, 8, True, bd)
    satd = _satd(org_blk[:, None] - opreds).astype(jnp.float32)
    imode = jnp.argmin(satd + lam_sqrt * jnp.asarray(_MODE_BITS)[None],
                       axis=1).astype(jnp.int32)

    # phase-1 products packed for single-gather access in the scan
    lev_a96 = jnp.concatenate([lev_ay.reshape(P, 64),
                               lev_au.reshape(P, 16),
                               lev_av.reshape(P, 16)], axis=1)
    refs_c = jnp.concatenate([refs_u, refs_v], axis=0)   # (2R, H/2, W/2)

    # ---- phase 1c: collocated temporal candidates (8.5.3.2.8), one
    # dense derivation per CU-grid level — position + col validity are
    # state-independent, so the scan only gathers.  Two scalings per
    # level: merge targets reference 0, AMVP the block's searched ref.
    def t_level(n, aref, gw=None, gh=None):
        t_ok, rx, ry, rp = temporal_cand_grid_dev(
            col[0], col[1], col[2], col[3], n, w, h, log2_ctu,
            gw=gw, gh=gh)
        td = col_poc - rp
        tmx, tmy = scale_mv_pair_dev(rx, ry, cur_poc - ref_pocs[0], td)
        tax, tay = scale_mv_pair_dev(rx, ry,
                                     cur_poc - ref_pocs[aref], td)
        return t_ok, tmx, tmy, tax, tay

    t8 = t_level(8, mv_ref.reshape(-1)) if tmvp else None

    # ---- phase 2: wavefront scan over dependency levels.  Per-block
    # state is packed into one (P, 14) tensor [kind, mi, mvdx, mvdy,
    # mvpi, dir, mvx, mvy, ref, size-code, luma-cbf, mvx1, mvy1, ref1]
    # and one (P, 96) level tensor so each step costs one gather + one
    # scatter per consumer.  The L1 columns stay zero for P slices.
    K_KIND, K_MI, K_MVDX, K_MVDY, K_MVPI, K_DIR, K_MVX, K_MVY, K_REF, \
        K_SZ, K_CBFY, K_MVX1, K_MVY1, K_REF1 = range(14)
    state = dict(
        rec_y=jnp.zeros(h * w, jnp.int32),
        rec_u=jnp.zeros(h * w // 4, jnp.int32),
        rec_v=jnp.zeros(h * w // 4, jnp.int32),
        blk=jnp.zeros((P, 14), jnp.int32),
        levs=jnp.zeros((P, 96), jnp.int32),
        # transform-skip flags per 8x8 cell: bit0 = cb TB, bit1 = cr
        # (4x4 chroma TBs exist only at the 8x8 CU level)
        tsf=jnp.zeros(P, jnp.int32),
    )

    def merge_b_nxn(nbv, nbp, x0, y0, n):
        """B-slice merge list + SSE screening + exact winner
        prediction for an n x n CU batch at (x0, y0): candidates via
        the two-list derivation, every hypothesis at intermediate
        precision (screening finals approximate), the winner's uni
        prediction recomputed with the exact final-precision filter
        and its bi average taken from the exact intermediates."""
        B = x0.shape[0]
        M = max_merge
        rep = lambda a: jnp.repeat(a, M)
        two = lambda a: jnp.concatenate([a, a])
        ndir = nbp[..., K_DIR]
        nmx, nmy, nrf = (nbp[..., K_MVX], nbp[..., K_MVY],
                         nbp[..., K_REF])
        nmx1, nmy1, nrf1 = (nbp[..., K_MVX1], nbp[..., K_MVY1],
                            nbp[..., K_REF1])
        (cdir, cmx, cmy, crf, cmx1, cmy1,
         crf1) = merge_candidates_dev_b(
            nbv, ndir, nmx, nmy, nrf, nmx1, nmy1, nrf1,
            ref_pocs, ref_pocs_l1, num_ref, num_ref_l1, max_merge)
        u0 = l0m[jnp.clip(crf.reshape(-1), 0, num_ref - 1)]
        u1 = l1m[jnp.clip(crf1.reshape(-1), 0, num_ref_l1 - 1)]
        i0 = mc_luma_batch_refs_i(
            refs_y, u0, rep(x0), rep(y0), cmx.reshape(-1),
            cmy.reshape(-1), n, n, bd).reshape(B, M, n, n)
        i1 = mc_luma_batch_refs_i(
            refs_y, u1, rep(x0), rep(y0), cmx1.reshape(-1),
            cmy1.reshape(-1), n, n, bd).reshape(B, M, n, n)
        bi_c = (cdir == 3)[:, :, None, None]
        uni0 = ((cdir & 1) > 0)[:, :, None, None]
        pred_l = jnp.where(
            bi_c, bi_average_t(i0, i1, bd),
            jnp.where(uni0, apx_uni(i0), apx_uni(i1)))
        return cdir, cmx, cmy, crf, cmx1, cmy1, crf1, i0, i1, pred_l

    def merge_b_winner(cands, mi, x0, y0, n):
        """Gather the winning candidate's fields and compute its exact
        luma + chroma prediction."""
        (cdir, cmx, cmy, crf, cmx1, cmy1, crf1, i0, i1, _) = cands
        two = lambda a: jnp.concatenate([a, a])
        g1 = lambda a: jnp.take_along_axis(a, mi[:, None], 1)[:, 0]
        w_dir = g1(cdir)
        w_mvx, w_mvy, w_ref = g1(cmx), g1(cmy), g1(crf)
        w_mvx1, w_mvy1, w_ref1 = g1(cmx1), g1(cmy1), g1(crf1)
        w_i0 = jnp.take_along_axis(i0, mi[:, None, None, None], 1)[:, 0]
        w_i1 = jnp.take_along_axis(i1, mi[:, None, None, None], 1)[:, 0]
        uses0 = (w_dir & 1) > 0
        uref = jnp.where(uses0, l0m[jnp.clip(w_ref, 0, num_ref - 1)],
                         l1m[jnp.clip(w_ref1, 0, num_ref_l1 - 1)])
        umx = jnp.where(uses0, w_mvx, w_mvx1)
        umy = jnp.where(uses0, w_mvy, w_mvy1)
        pred_u = mc_luma_batch_refs(refs_y, uref, x0, y0, umx, umy,
                                    n, n, bd)
        w_bi = (w_dir == 3)[:, None, None]
        pred_m = jnp.where(w_bi, bi_average_t(w_i0, w_i1, bd), pred_u)
        cxy, cyy = x0 // 2, y0 // 2
        pc_u = mc_chroma_batch_refs(
            refs_c, jnp.concatenate([uref, uref + Ru]),
            two(cxy), two(cyy), two(umx), two(umy), n // 2, n // 2, bd)
        u0w = l0m[jnp.clip(w_ref, 0, num_ref - 1)]
        u1w = l1m[jnp.clip(w_ref1, 0, num_ref_l1 - 1)]
        pc_i0 = mc_chroma_batch_refs_i(
            refs_c, jnp.concatenate([u0w, u0w + Ru]),
            two(cxy), two(cyy), two(w_mvx), two(w_mvy),
            n // 2, n // 2, bd)
        pc_i1 = mc_chroma_batch_refs_i(
            refs_c, jnp.concatenate([u1w, u1w + Ru]),
            two(cxy), two(cyy), two(w_mvx1), two(w_mvy1),
            n // 2, n // 2, bd)
        pc_bi = bi_average_t(pc_i0, pc_i1, bd)
        pred_c2 = jnp.where(two(w_dir == 3)[:, None, None], pc_bi,
                            pc_u)
        B = x0.shape[0]
        return (w_dir, w_mvx, w_mvy, w_ref, w_mvx1, w_mvy1, w_ref1,
                pred_m, pred_c2[:B], pred_c2[B:])

    def amvp_b_nxn(nbv, nbp, lxb, aref, amx, amy, depth: int):
        """B-slice AMVP list + mvd choice + signalling bits for the
        phase-1 candidate (list lxb, ref aref, MV amx/amy)."""
        ndir = nbp[..., K_DIR]
        nmx, nmy, nrf = (nbp[..., K_MVX], nbp[..., K_MVY],
                         nbp[..., K_REF])
        nmx1, nmy1, nrf1 = (nbp[..., K_MVX1], nbp[..., K_MVY1],
                            nbp[..., K_REF1])
        tpoc = jnp.where(
            lxb == 0, ref_pocs[jnp.clip(aref, 0, num_ref - 1)],
            ref_pocs_l1[jnp.clip(aref, 0, num_ref_l1 - 1)])
        nb_poc0 = ref_pocs[jnp.clip(nrf, 0, num_ref - 1)]
        nb_poc1 = ref_pocs_l1[jnp.clip(nrf1, 0, num_ref_l1 - 1)]
        p0x, p0y, p1x, p1y = amvp_candidates_dev_b(
            nbv, ndir, nmx, nmy, nb_poc0, nmx1, nmy1, nb_poc1,
            lxb, tpoc, cur_poc)
        bits0 = mvd_bits(cbflat, amx - p0x, amy - p0y)
        bits1 = mvd_bits(cbflat, amx - p1x, amy - p1y)
        use1 = bits1 < bits0
        mvpi = use1.astype(jnp.int32)
        mvdx = jnp.where(use1, amx - p1x, amx - p0x)
        mvdy = jnp.where(use1, amy - p1y, amy - p0y)
        bits_mvd = jnp.minimum(bits0, bits1)
        b_refa = jnp.where(
            lxb == 0, ref_idx_bits(cbflat, aref, num_ref),
            ref_idx_bits(cbflat, aref, num_ref_l1)) \
            + inter_dir_bits(cbflat, 1 + lxb, depth)
        return mvpi, mvdx, mvdy, bits_mvd, b_refa

    bits_mi_row_g = merge_idx_bits(cbflat, jnp.arange(max_merge),
                                   max_merge)

    def p_merge_all_rd(org, orgu, orgv, x0, y0, n: int, log2y: int,
                       cmx, cmy, crf, b_skip1, b_inter,
                       extra_y=None, extra_c=None, sel_y=None,
                       sel_c=None, ts: bool = False):
        """Full residual RD over EVERY merge candidate — the batched
        inversion of HM's per-candidate merge loop
        (TEncCu::xCheckRDCostMerge2Nx2N, TEncCu.cpp:1157): each
        candidate's luma+chroma prediction is coded through
        transform/quant/RDOQ and priced with its true cbf + TB bits,
        and the skip (no-residual) hypothesis is priced per candidate
        too; two argmins replace HM's loop.  The pre-r5 screening
        priced candidates by prediction SSE only — the winner by SSE
        is often not the winner by coded RD, which is a piece of the
        resid_y gap vs HM.  extra_*: additional TBs fused into the
        same _code batches (the 8x8 level rides its intra TBs here),
        returned coded after the merge lanes."""
        B = org.shape[0]
        M = max_merge
        F = min(2, M)            # deadzone-RD finalists per CU
        nc = n // 2
        rep = lambda a: jnp.repeat(a, M)
        two = lambda a: jnp.concatenate([a, a])
        crf_f = crf.reshape(-1)
        pred_l = mc_luma_batch_refs(
            refs_y, crf_f, rep(x0), rep(y0), cmx.reshape(-1),
            cmy.reshape(-1), n, n, bd).reshape(B, M, n, n)
        pc = mc_chroma_batch_refs(
            refs_c, jnp.concatenate([crf_f, crf_f + Ru]),
            two(rep(x0 // 2)), two(rep(y0 // 2)),
            two(cmx.reshape(-1)), two(cmy.reshape(-1)), nc, nc, bd)
        BM = B * M
        pred_cbM = pc[:BM].reshape(B, M, nc, nc)
        pred_crM = pc[BM:].reshape(B, M, nc, nc)

        # skip priced over EVERY candidate with the exact 3-plane SSE
        # (prediction only — no residual, so this is MC + reduction)
        sse3_m = jnp.sum((org[:, None] - pred_l) ** 2, (-1, -2)) \
            .astype(jnp.float32) + wchroma * (
            jnp.sum((orgu[:, None] - pred_cbM) ** 2, (-1, -2))
            + jnp.sum((orgv[:, None] - pred_crM) ** 2, (-1, -2))
            ).astype(jnp.float32)
        cost_skip_m = sse3_m + lam * (b_skip1[:, None]
                                      + bits_mi_row_g[None])
        mi_skip = jnp.argmin(cost_skip_m, 1).astype(jnp.int32)

        # merge RD in two tiers (the batched form of HM's
        # xCheckRDCostMerge2Nx2N loop, TEncCu.cpp:1157): the top-F
        # candidates by 3-plane screening are coded through DEADZONE
        # transform/quant for comparison, and only the winner is
        # recoded with the full RDOQ trellis — the trellis is ~2/3 of
        # per-step cost and the deadzone ranking almost always agrees
        screen = sse3_m + lam * bits_mi_row_g[None]
        _, fidx = jax.lax.top_k(-screen, F)          # (B, F)
        gf = lambda a: jnp.take_along_axis(a, fidx, 1)
        fmx, fmy, frf = gf(cmx), gf(cmy), gf(crf)
        pred_f = jnp.take_along_axis(
            pred_l, fidx[:, :, None, None], 1)       # (B, F, n, n)
        pred_cbF = jnp.take_along_axis(
            pred_cbM, fidx[:, :, None, None], 1)
        pred_crF = jnp.take_along_axis(
            pred_crM, fidx[:, :, None, None], 1)
        BF = B * F
        tile = lambda a: jnp.broadcast_to(
            a[:, None], (B, F) + a.shape[1:]) \
            .reshape((BF,) + a.shape[1:])
        levYd, _, dYd, bYd = _code(tile(org), pred_f.reshape(BF, n, n),
                                   qp, log2y, bd, lam, cbflat, True,
                                   sdh=sdh, rdoq=False)
        levCd, _, dCd, bCd = _code(
            jnp.concatenate([tile(orgu), tile(orgv)]),
            jnp.concatenate([pred_cbF.reshape(BF, nc, nc),
                             pred_crF.reshape(BF, nc, nc)]),
            qpc, log2y - 1, bd, lam_c, cbflat, False, wchroma,
            sdh=sdh, rdoq=False)
        nzYd = jnp.any(levYd.reshape(B, F, -1) != 0, -1)
        nzCbd = jnp.any(levCd[:BF].reshape(B, F, -1) != 0, -1)
        nzCrd = jnp.any(levCd[BF:].reshape(B, F, -1) != 0, -1)
        bits_mi_f = jnp.take_along_axis(
            jnp.broadcast_to(bits_mi_row_g[None], (B, M)), fidx, 1)
        cost_f = (dYd.reshape(B, F) + dCd[:BF].reshape(B, F)
                  + dCd[BF:].reshape(B, F)) + lam * (
            bits_mi_f + cbf_bits_inter(nzYd, nzCbd, nzCrd)
            + bYd.reshape(B, F) + bCd[:BF].reshape(B, F)
            + bCd[BF:].reshape(B, F))
        fi_merge = jnp.argmin(cost_f, 1).astype(jnp.int32)
        g1 = lambda a, fi: jnp.take_along_axis(a, fi[:, None], 1)[:, 0]
        gt = lambda a, fi: jnp.take_along_axis(
            a, fi[:, None, None, None], 1)[:, 0]
        w_pred = gt(pred_f, fi_merge)
        w_pcb = gt(pred_cbF, fi_merge)
        w_pcr = gt(pred_crF, fi_merge)

        # winner recoded with the RDOQ trellis; the intra extras ride
        # the same batches (they need trellis coding anyway)
        orgs_y = org
        preds_y = w_pred
        sely = None
        if extra_y is not None:
            orgs_y = jnp.concatenate([org, org])
            preds_y = jnp.concatenate([w_pred, extra_y])
            sely = jnp.concatenate([jnp.zeros((B,), jnp.int32), sel_y])
        levY, recY, dY, bY = code(orgs_y, preds_y, qp, log2y, bd, lam,
                                  cbflat, True, sdh=sdh, scan_sel=sely)
        orgs_c = jnp.concatenate([orgu, orgv])
        preds_c = jnp.concatenate([w_pcb, w_pcr])
        selc = None
        if extra_c is not None:
            orgs_c = jnp.concatenate([orgs_c,
                                      jnp.concatenate([orgu, orgv])])
            preds_c = jnp.concatenate([preds_c, extra_c])
            selc = jnp.concatenate([jnp.zeros((2 * B,), jnp.int32),
                                    sel_c])
        if ts and log2y == 3:
            # 4x4 chroma TBs: transform-skip trial per TB, flag bit
            # priced in (TComTrQuant.cpp:1460 TS branch — the LDP
            # anchor cfg has TransformSkip 1)
            levC, recC, dC, bC, ts_c = _code_ts_sel(
                orgs_c, preds_c, qpc, bd, lam_c, cbflat, False,
                wchroma, sdh=sdh, scan_sel=selc, rdoq=rdoq)
        else:
            levC, recC, dC, bC = code(orgs_c, preds_c, qpc, log2y - 1,
                                      bd, lam_c, cbflat, False,
                                      wchroma, sdh=sdh, scan_sel=selc)
            ts_c = jnp.zeros((orgs_c.shape[0],), bool)
        lev_my, rec_my, d_my, b_my = (levY[:B], recY[:B], dY[:B],
                                      bY[:B])
        lev_mu, rec_mu = levC[:B], recC[:B]
        lev_mv, rec_mv = levC[B:2 * B], recC[B:2 * B]
        d_mu, b_mu = dC[:B], bC[:B]
        d_mv, b_mv = dC[B:2 * B], bC[B:2 * B]
        y_nz = jnp.any(lev_my.reshape(B, -1) != 0, -1)
        cb_nz = jnp.any(lev_mu.reshape(B, -1) != 0, -1)
        cr_nz = jnp.any(lev_mv.reshape(B, -1) != 0, -1)
        mrg_hdr = b_inter + merge_flag_bits(
            cbflat, jnp.ones((B,), jnp.int32)) + g1(bits_mi_f, fi_merge)
        cost_merge = d_my + d_mu + d_mv + lam * (
            mrg_hdr + cbf_bits_inter(y_nz, cb_nz, cr_nz)
            + b_my + b_mu + b_mv)
        # an all-zero-residual merge IS skip with one extra flag;
        # the skip hypothesis covers it
        cost_merge = jnp.where(y_nz | cb_nz | cr_nz, cost_merge, BIG)
        return dict(
            cost_skip=jnp.min(cost_skip_m, 1),
            cost_merge=cost_merge,
            mi_skip=mi_skip, mi_merge=g1(fidx, fi_merge),
            sk_mvx=g1(cmx, mi_skip), sk_mvy=g1(cmy, mi_skip),
            sk_ref=g1(crf, mi_skip),
            mg_mvx=g1(fmx, fi_merge), mg_mvy=g1(fmy, fi_merge),
            mg_ref=g1(frf, fi_merge),
            pred_sk_y=gt(pred_l, mi_skip),
            pred_sk_u=gt(pred_cbM, mi_skip),
            pred_sk_v=gt(pred_crM, mi_skip),
            lev_my=lev_my, rec_my=rec_my,
            lev_mu=lev_mu, rec_mu=rec_mu,
            lev_mv=lev_mv, rec_mv=rec_mv,
            cbf_m=(y_nz, cb_nz, cr_nz),
            ts_cb=ts_c[:B].astype(jnp.int32),
            ts_cr=ts_c[B:2 * B].astype(jnp.int32),
            ts_extra=ts_c[2 * B:].astype(jnp.int32),
            extra=(levY[B:], recY[B:], dY[B:], bY[B:],
                   levC[2 * B:], recC[2 * B:], dC[2 * B:],
                   bC[2 * B:]))

    def cell_step(st, blk, valid):
        """Decide one batch of 8x8 CUs against the committed state;
        returns (new state, chosen RD cost per lane)."""
        b = jnp.where(valid, blk, 0)
        byi, bxi = b // bw, b % bw
        x0, y0 = bxi * 8, byi * 8
        B = blk.shape[0]
        org = org_blk[b]
        orgu = orgu_blk[b]
        orgv = orgv_blk[b]

        # merge list from committed neighbour motion (one packed gather)
        nb = nb_flat[b]                                     # (B, 5)
        nbp = st["blk"][nb]                                 # (B, 5, 14)
        nbv = nb_ok[b] & (nbp[..., K_DIR] > 0)
        nmx, nmy, nrf = nbp[..., K_MVX], nbp[..., K_MVY], nbp[..., K_REF]
        M = max_merge
        rep = lambda a: jnp.repeat(a, M)
        two = lambda a: jnp.concatenate([a, a])
        bits_mi_row = merge_idx_bits(cbflat, jnp.arange(M), max_merge)

        # CU mode syntax priced from the committed neighbour state
        # (cu_skip_flag ctx 9.3.4.2.2 = left/above skip); derived up
        # front — the per-candidate costs need the prices
        bL = jnp.where(bxi > 0, b - 1, 0)
        bA = jnp.where(byi > 0, b - bw, 0)
        l_k = st["blk"][bL, K_KIND]
        a_k = st["blk"][bA, K_KIND]
        inc_sk = ((bxi > 0) & (l_k == 0)).astype(jnp.int32) \
            + ((byi > 0) & (a_k == 0)).astype(jnp.int32)
        b_skip1 = skip_flag_bits(cbflat, jnp.ones_like(b), inc_sk)
        b_skip0 = skip_flag_bits(cbflat, jnp.zeros_like(b), inc_sk)
        b_common = b_skip0 + part_size_2nx2n_bits(cbflat)
        b_inter = b_common + pred_mode_bits(cbflat, jnp.zeros_like(b))

        # intra prediction: exact, from committed recon (early — the
        # intra TBs ride the P path's fused merge _code batches)
        iref = jnp.where(none_y[b, None], mid, st["rec_y"][sub_y[b]])
        iref_f = filter_reference_batched(iref, 8, bd, strong=False)
        im = imode[b]
        ipred = predict_one_mode(iref, iref_f, im, 8, True, bd)
        irefu = jnp.where(none_c[b, None], mid, st["rec_u"][sub_u[b]])
        irefv = jnp.where(none_c[b, None], mid, st["rec_v"][sub_u[b]])
        cp2 = predict_one_mode(jnp.concatenate([irefu, irefv]),
                               jnp.concatenate([irefu, irefv]),
                               two(im), 4, False, bd)
        cpu, cpv = cp2[:B], cp2[B:]
        isel = _intra_scan_sel(im)
        z_b = jnp.zeros_like(isel)

        if is_b:
            cands = merge_b_nxn(nbv, nbp, x0, y0, 8)
            sse_l = jnp.sum((org[:, None] - cands[-1]) ** 2,
                            axis=(-1, -2))
            mi = jnp.argmin(sse_l.astype(jnp.float32)
                            + lam * bits_mi_row[None],
                            axis=1).astype(jnp.int32)
            (w_dir, w_mvx, w_mvy, w_ref, w_mvx1, w_mvy1, w_ref1,
             pred_m, pred_mu, pred_mv_) = merge_b_winner(
                cands, mi, x0, y0, 8)
            msse3 = jnp.sum((org - pred_m) ** 2, axis=(-1, -2)) \
                .astype(jnp.float32) + wchroma * (
                jnp.sum((orgu - pred_mu) ** 2, axis=(-1, -2))
                + jnp.sum((orgv - pred_mv_) ** 2, axis=(-1, -2))
                ).astype(jnp.float32)
            # fused residual coding of the screened winner + intra
            levY2, recY2, dY2, bY2 = code(
                two(org), jnp.concatenate([pred_m, ipred]), qp, 3, bd,
                lam, cbflat, True, sdh=sdh,
                scan_sel=jnp.concatenate([z_b, isel]))
            lev_my, lev_iy = levY2[:B], levY2[B:]
            rec_my, rec_iy = recY2[:B], recY2[B:]
            d_my, d_iy = dY2[:B], dY2[B:]
            b_my, b_iy = bY2[:B], bY2[B:]
            orgC4 = jnp.concatenate([orgu, orgv, orgu, orgv])
            predC4 = jnp.concatenate([pred_mu, pred_mv_, cpu, cpv])
            levC4, recC4, dC4, bC4 = code(
                orgC4, predC4, qpc, 2, bd, lam_c, cbflat, False,
                wchroma, sdh=sdh,
                scan_sel=jnp.concatenate([z_b, z_b, isel, isel]))
            lev_mu, lev_mv_, lev_iu, lev_iv = jnp.split(levC4, 4)
            rec_mu, rec_mv_, rec_iu, rec_iv = jnp.split(recC4, 4)
            d_mu, d_mv, d_iu, d_iv = jnp.split(dC4, 4)
            b_mu, b_mv, b_iu, b_iv = jnp.split(bC4, 4)
            cbf_m = (jnp.any(lev_my.reshape(B, 64) != 0, 1),
                     jnp.any(lev_mu.reshape(B, 16) != 0, 1),
                     jnp.any(lev_mv_.reshape(B, 16) != 0, 1))
            b_mi = merge_idx_bits(cbflat, mi, max_merge)
            cost_skip = msse3 + lam * (b_skip1 + b_mi)
            cost_merge = d_my + d_mu + d_mv + lam * (
                b_inter + merge_flag_bits(cbflat, jnp.ones_like(b))
                + b_mi + cbf_bits_inter(*cbf_m) + b_my + b_mu + b_mv)
            mi_sk = mi_mg = mi
            pred_sk_y, pred_sk_u, pred_sk_v = pred_m, pred_mu, pred_mv_
        else:
            tkw = {} if t8 is None else dict(
                t_ok=t8[0][b], t_mvx=t8[1][b], t_mvy=t8[2][b])
            cmx, cmy, crf = merge_candidates_dev(nbv, nmx, nmy, nrf,
                                                 num_ref, max_merge,
                                                 n_active=n_active,
                                                 **tkw)
            mrd = p_merge_all_rd(
                org, orgu, orgv, x0, y0, 8, 3, cmx, cmy, crf,
                b_skip1, b_inter,
                extra_y=ipred, extra_c=jnp.concatenate([cpu, cpv]),
                sel_y=isel, sel_c=jnp.concatenate([isel, isel]),
                ts=ts)
            cost_skip, cost_merge = mrd["cost_skip"], mrd["cost_merge"]
            mi_sk, mi_mg = mrd["mi_skip"], mrd["mi_merge"]
            lev_my, rec_my = mrd["lev_my"], mrd["rec_my"]
            lev_mu, rec_mu = mrd["lev_mu"], mrd["rec_mu"]
            lev_mv_, rec_mv_ = mrd["lev_mv"], mrd["rec_mv"]
            cbf_m = mrd["cbf_m"]
            pred_sk_y, pred_sk_u, pred_sk_v = (
                mrd["pred_sk_y"], mrd["pred_sk_u"], mrd["pred_sk_v"])
            (lev_iy, rec_iy, d_iy, b_iy, levC2, recC2, dC2,
             bC2) = mrd["extra"]
            lev_iu, lev_iv = levC2[:B], levC2[B:]
            rec_iu, rec_iv = recC2[:B], recC2[B:]
            d_iu, d_iv = dC2[:B], dC2[B:]
            b_iu, b_iv = bC2[:B], bC2[B:]

        # AMVP: exact list (per-block target ref) -> true mvd bits
        aref = rself[b]
        amx, amy = mvxf[b], mvyf[b]
        if is_b:
            lxb = lxf[b]
            mvpi, mvdx, mvdy, bits_mvd, b_refa = amvp_b_nxn(
                nbv, nbp, lxb, aref, amx, amy, log2_ctu - 3)
        else:
            nb_refpoc = ref_pocs[jnp.clip(nrf, 0, num_ref - 1)]
            takw = {} if t8 is None else dict(
                t_ok=t8[0][b], t_mvx=t8[3][b], t_mvy=t8[4][b])
            p0x, p0y, p1x, p1y = amvp_candidates_dev(
                nbv, nmx, nmy, nb_refpoc, ref_pocs[aref], cur_poc,
                **takw)
            bits0 = mvd_bits(cbflat, amx - p0x, amy - p0y)
            bits1 = mvd_bits(cbflat, amx - p1x, amy - p1y)
            use1 = bits1 < bits0
            mvpi = use1.astype(jnp.int32)
            mvdx = jnp.where(use1, amx - p1x, amx - p0x)
            mvdy = jnp.where(use1, amy - p1y, amy - p0y)
            bits_mvd = jnp.minimum(bits0, bits1)
            b_refa = ref_idx_bits(cbflat, aref, num_ref,
                                  n_active=n_active)

        cost_amvp = dist_a[b] + lam * (
            b_inter + merge_flag_bits(cbflat, jnp.zeros_like(b))
            + mvp_idx_bits(cbflat, mvpi) + bits_mvd
            + b_refa
            + _root_cbf_bits(cbflat, cbf_a8[0][b], cbf_a8[1][b],
                             cbf_a8[2][b], cbf_bits_inter)
            + bits_a_lev[b])

        inter_best = jnp.minimum(cost_skip,
                                 jnp.minimum(cost_merge, cost_amvp))
        from hmtpu.ops.ratebits import chroma_dm_bits, \
            intra_mode_mpm_bits
        lmode = jnp.where((bxi > 0) & (l_k == 3), imode[bL], 1)
        am_ok = (byi > 0) & ((y0 & ((1 << log2_ctu) - 1)) != 0)
        amode = jnp.where(am_ok & (a_k == 3), imode[bA], 1)
        b_icbf = cbf_chroma_bits(
            cbflat, jnp.any(lev_iu.reshape(B, 16) != 0, 1)) \
            + cbf_chroma_bits(
                cbflat, jnp.any(lev_iv.reshape(B, 16) != 0, 1)) \
            + cbf_luma_bits(
                cbflat, jnp.any(lev_iy.reshape(B, 64) != 0, 1))
        cost_intra = jnp.where(
            inter_best <= INTRA_GATE * lam, BIG,
            d_iy + d_iu + d_iv
            + lam * (b_common + pred_mode_bits(cbflat, jnp.ones_like(b))
                     + intra_mode_mpm_bits(cbflat, im, lmode, amode)
                     + chroma_dm_bits(cbflat) + b_icbf
                     + b_iy + b_iu + b_iv))

        costs = jnp.stack([cost_skip, cost_merge, cost_amvp, cost_intra],
                          axis=1)
        choice = jnp.argmin(costs, axis=1).astype(jnp.int32)
        m_zero = ~(cbf_m[0] | cbf_m[1] | cbf_m[2])
        choice = jnp.where((choice == 1) & m_zero, 0, choice)
        mi = jnp.where(choice == 0, mi_sk, mi_mg)

        def pick4(s, m, a, i):
            c = choice.reshape((-1,) + (1,) * (s.ndim - 1))
            return jnp.where(c == 0, s, jnp.where(c == 1, m,
                             jnp.where(c == 2, a, i)))

        out_y = pick4(pred_sk_y, rec_my, rec_ay[b], rec_iy)
        out_u = pick4(pred_sk_u, rec_mu, rec_au[b], rec_iu)
        out_v = pick4(pred_sk_v, rec_mv_, rec_av[b], rec_iv)
        f96 = lambda a8, c4a, c4b: jnp.concatenate(
            [a8.reshape(B, 64), c4a.reshape(B, 16), c4b.reshape(B, 16)],
            axis=1)
        o_lev = pick4(jnp.zeros((B, 96), jnp.int32),
                      f96(lev_my, lev_mu, lev_mv_), lev_a96[b],
                      f96(lev_iy, lev_iu, lev_iv))

        if is_b:
            uses0a = lxb == 0
            new_mvx = pick4(w_mvx, w_mvx,
                            jnp.where(uses0a, amx, 0),
                            jnp.zeros_like(amx))
            new_mvy = pick4(w_mvy, w_mvy,
                            jnp.where(uses0a, amy, 0),
                            jnp.zeros_like(amy))
            new_ref = pick4(w_ref, w_ref,
                            jnp.where(uses0a, aref, 0),
                            jnp.zeros_like(w_ref))
            new_mvx1 = pick4(w_mvx1, w_mvx1,
                             jnp.where(uses0a, 0, amx),
                             jnp.zeros_like(amx))
            new_mvy1 = pick4(w_mvy1, w_mvy1,
                             jnp.where(uses0a, 0, amy),
                             jnp.zeros_like(amy))
            new_ref1 = pick4(w_ref1, w_ref1,
                             jnp.where(uses0a, 0, aref),
                             jnp.zeros_like(w_ref))
            new_dir = pick4(w_dir, w_dir, 1 + lxb,
                            jnp.zeros_like(w_dir))
        else:
            new_mvx = pick4(mrd["sk_mvx"], mrd["mg_mvx"], amx,
                            jnp.zeros_like(amx))
            new_mvy = pick4(mrd["sk_mvy"], mrd["mg_mvy"], amy,
                            jnp.zeros_like(amy))
            new_ref = pick4(mrd["sk_ref"], mrd["mg_ref"], aref,
                            jnp.zeros_like(aref))
            new_mvx1 = jnp.zeros_like(new_mvx)
            new_mvy1 = jnp.zeros_like(new_mvx)
            new_ref1 = jnp.zeros_like(new_mvx)
            new_dir = jnp.where(choice == 3, 0, 1)
        zero_b = jnp.zeros((B,), bool)
        cbf_y = pick4(zero_b,
                      cbf_m[0],
                      jnp.any(lev_ay[b].reshape(B, 64) != 0, axis=1),
                      jnp.any(lev_iy.reshape(B, 64) != 0, axis=1)) \
            .astype(jnp.int32)
        zi_b = jnp.zeros((B,), jnp.int32)
        if is_b:
            o_tsf = zi_b
        else:
            mrg_ts = mrd["ts_cb"] | (mrd["ts_cr"] << 1)
            intra_ts = mrd["ts_extra"][:B] \
                | (mrd["ts_extra"][B:] << 1)
            o_tsf = pick4(zi_b, mrg_ts, ts_a[b], intra_ts)
        o_blk = jnp.stack([choice, mi, mvdx, mvdy, mvpi,
                           new_dir, new_mvx, new_mvy, new_ref,
                           jnp.zeros_like(choice), cbf_y,
                           new_mvx1, new_mvy1, new_ref1], axis=1)

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

        st = dict(
            rec_y=st["rec_y"].at[fl_y].set(out_y),
            rec_u=st["rec_u"].at[fl_c].set(out_u),
            rec_v=st["rec_v"].at[fl_c].set(out_v),
            blk=st["blk"].at[drop].set(o_blk),
            levs=st["levs"].at[drop].set(o_lev),
            tsf=st["tsf"].at[drop].set(o_tsf),
        )
        cost = jnp.min(costs, axis=1)
        # split-syntax overhead a lone 8x8 CU pays inside a split 16
        return st, cost

    def step(st, blk):
        st, _ = cell_step(st, blk, blk >= 0)
        return st, None

    if levels == 1:
        state, _ = jax.lax.scan(step, state, lv_blk)
        state["imode"] = imode
        return state

    # ---- two-level scan: per 16x16 region, decide ONE 16x16 inter CU
    # (skip / merge / AMVP, 16x16 TU) against the four 8x8 CUs.  The
    # CU16 candidates read only state OUTSIDE the region, so the 8x8
    # trial commits first and is overwritten where CU16 wins — the
    # TPU-shaped form of TEncCu's depth-recursive compare
    # (TEncCu.cpp:352).
    gw, gh = bw // 2, bh // 2
    P16 = gw * gh
    if is_b:
        mv16_x, mv16_y, mv16_ref, mv16_lx = mv16
        lx16f = mv16_lx.reshape(-1)
    else:
        mv16_x, mv16_y, mv16_ref = mv16
    t16 = t_level(16, mv16_ref.reshape(-1)) if tmvp else None
    lv16, cells16, nb16_ok, nb16_cell = sched16
    g_all = jnp.arange(P16)
    gy_all, gx_all = g_all // gw, g_all % gw
    org16_blk = _blockify(org_y, 16)
    org16u = _blockify(org_u, 8)
    org16v = _blockify(org_v, 8)

    # hoisted CU16 AMVP prediction + residual
    m16x, m16y = mv16_x.reshape(-1), mv16_y.reshape(-1)
    r16 = mv16_ref.reshape(-1)
    if is_b:
        r16u = jnp.where(lx16f == 0,
                         l0m[jnp.clip(r16, 0, num_ref - 1)],
                         l1m[jnp.clip(r16, 0, num_ref_l1 - 1)])
    else:
        r16u = r16
    pred16a = mc_luma_batch_refs(refs_y, r16u, gx_all * 16,
                                 gy_all * 16, m16x, m16y, 16, 16, bd)
    pred16au = mc_chroma_batch_refs(refs_u, r16u, gx_all * 8,
                                    gy_all * 8, m16x, m16y, 8, 8, bd)
    pred16av = mc_chroma_batch_refs(refs_v, r16u, gx_all * 8,
                                    gy_all * 8, m16x, m16y, 8, 8, bd)
    lev16ay, rec16ay, d16ay, b16ay = code(org16_blk, pred16a, qp, 4,
                                           bd, lam, cbflat, True,
                                           sdh=sdh)
    lev16au, rec16au, d16au, b16au = code(org16u, pred16au, qpc, 3,
                                           bd, lam_c, cbflat, False,
                                           wchroma, sdh=sdh)
    lev16av, rec16av, d16av, b16av = code(org16v, pred16av, qpc, 3,
                                           bd, lam_c, cbflat, False,
                                           wchroma, sdh=sdh)
    dist_a16 = d16ay + d16au + d16av
    bits_a16 = b16ay + b16au + b16av
    cbf_a16 = (jnp.any(lev16ay.reshape(P16, 256) != 0, axis=1),
               jnp.any(lev16au.reshape(P16, 64) != 0, axis=1),
               jnp.any(lev16av.reshape(P16, 64) != 0, axis=1))
    lev16_a384 = jnp.concatenate([lev16ay.reshape(P16, 256),
                                  lev16au.reshape(P16, 64),
                                  lev16av.reshape(P16, 64)], axis=1)

    def region16(st, blk16, valid):
        """Decide one batch of 16x16 regions: four 8x8 CUs inside the
        scan, then one 16x16 inter CU trial that overwrites where it
        wins.  Returns (state, chosen RD cost per lane)."""
        g = jnp.where(valid, blk16, 0)
        B = blk16.shape[0]
        c4 = cells16[g]                                   # (B, 4)

        # z-order cell loop as a scan: one compiled cell_step body
        # instead of four inlined copies (compile-time control)
        def cell_body(carry, cells):
            st_, acc = carry
            st_, cc = cell_step(st_, cells, valid)
            return (st_, acc + cc), None

        (st, cost8), _ = jax.lax.scan(
            cell_body, (st, jnp.zeros((B,), jnp.float32)), c4.T)

        gyb, gxb = g // gw, g % gw
        x0, y0 = gxb * 16, gyb * 16
        org = org16_blk[g]
        orgu = org16u[g]
        orgv = org16v[g]

        nb = nb16_cell[g]
        nbp = st["blk"][nb]
        nbv = nb16_ok[g] & (nbp[..., K_DIR] > 0)
        nmx, nmy, nrf = nbp[..., K_MVX], nbp[..., K_MVY], nbp[..., K_REF]
        M = max_merge
        rep = lambda a: jnp.repeat(a, M)
        two = lambda a: jnp.concatenate([a, a])
        bits_mi_row = merge_idx_bits(cbflat, jnp.arange(M), max_merge)

        # skip/split ctx from the committed state OUTSIDE the region
        # (left/above corners are untouched by the in-region cells)
        corner = (gyb * 2) * bw + gxb * 2
        cL = jnp.where(gxb > 0, corner - 1, 0)
        cA = jnp.where(gyb > 0, corner - bw, 0)
        l_blk = st["blk"][cL]
        a_blk = st["blk"][cA]
        inc_sk = ((gxb > 0) & (l_blk[:, K_KIND] == 0)) \
            .astype(jnp.int32) \
            + ((gyb > 0) & (a_blk[:, K_KIND] == 0)).astype(jnp.int32)
        b_skip1 = skip_flag_bits(cbflat, jnp.ones_like(g), inc_sk)
        b_skip0 = skip_flag_bits(cbflat, jnp.zeros_like(g), inc_sk)
        b_inter = b_skip0 + part_size_2nx2n_bits(cbflat) \
            + pred_mode_bits(cbflat, jnp.zeros_like(g))

        if is_b:
            cands = merge_b_nxn(nbv, nbp, x0, y0, 16)
            sse_l = jnp.sum((org[:, None] - cands[-1]) ** 2,
                            axis=(-1, -2))
            mi = jnp.argmin(sse_l.astype(jnp.float32)
                            + lam * bits_mi_row[None],
                            axis=1).astype(jnp.int32)
            (w_dir, w_mvx, w_mvy, w_ref, w_mvx1, w_mvy1, w_ref1,
             pred_m, pred_mu, pred_mv_) = merge_b_winner(
                cands, mi, x0, y0, 16)
            msse3 = jnp.sum((org - pred_m) ** 2, axis=(-1, -2)) \
                .astype(jnp.float32) + wchroma * (
                jnp.sum((orgu - pred_mu) ** 2, axis=(-1, -2))
                + jnp.sum((orgv - pred_mv_) ** 2, axis=(-1, -2))
                ).astype(jnp.float32)
            lev_my, rec_my, d_my, b_my = code(org, pred_m, qp, 4, bd,
                                              lam, cbflat, True,
                                              sdh=sdh)
            levC2, recC2, dC2, bC2 = code(
                jnp.concatenate([orgu, orgv]),
                jnp.concatenate([pred_mu, pred_mv_]), qpc, 3, bd,
                lam_c, cbflat, False, wchroma, sdh=sdh)
            lev_mu, lev_mv_ = levC2[:B], levC2[B:]
            rec_mu, rec_mv_ = recC2[:B], recC2[B:]
            d_mu, d_mv = dC2[:B], dC2[B:]
            b_mu, b_mv = bC2[:B], bC2[B:]
            cbf_m = (jnp.any(lev_my.reshape(B, 256) != 0, 1),
                     jnp.any(lev_mu.reshape(B, 64) != 0, 1),
                     jnp.any(lev_mv_.reshape(B, 64) != 0, 1))
            b_mi = merge_idx_bits(cbflat, mi, max_merge)
            cost_skip = msse3 + lam * (b_skip1 + b_mi)
            cost_merge = d_my + d_mu + d_mv + lam * (
                b_inter + merge_flag_bits(cbflat, jnp.ones_like(g))
                + b_mi + cbf_bits_inter(*cbf_m) + b_my + b_mu + b_mv)
            mi_sk = mi_mg = mi
            pred_sk_y, pred_sk_u, pred_sk_v = pred_m, pred_mu, pred_mv_
        else:
            tkw = {} if t16 is None else dict(
                t_ok=t16[0][g], t_mvx=t16[1][g], t_mvy=t16[2][g])
            cmx, cmy, crf = merge_candidates_dev(nbv, nmx, nmy, nrf,
                                                 num_ref, max_merge,
                                                 n_active=n_active,
                                                 **tkw)
            mrd = p_merge_all_rd(org, orgu, orgv, x0, y0, 16, 4,
                                 cmx, cmy, crf, b_skip1, b_inter)
            cost_skip, cost_merge = mrd["cost_skip"], mrd["cost_merge"]
            mi_sk, mi_mg = mrd["mi_skip"], mrd["mi_merge"]
            lev_my, rec_my = mrd["lev_my"], mrd["rec_my"]
            lev_mu, rec_mu = mrd["lev_mu"], mrd["rec_mu"]
            lev_mv_, rec_mv_ = mrd["lev_mv"], mrd["rec_mv"]
            cbf_m = mrd["cbf_m"]
            pred_sk_y, pred_sk_u, pred_sk_v = (
                mrd["pred_sk_y"], mrd["pred_sk_u"], mrd["pred_sk_v"])

        aref = r16[g]
        amx, amy = m16x[g], m16y[g]
        if is_b:
            lx16b = lx16f[g]
            mvpi, mvdx, mvdy, bits_mvd, b_refa16 = amvp_b_nxn(
                nbv, nbp, lx16b, aref, amx, amy, log2_ctu - 4)
        else:
            nb_refpoc = ref_pocs[jnp.clip(nrf, 0, num_ref - 1)]
            takw = {} if t16 is None else dict(
                t_ok=t16[0][g], t_mvx=t16[3][g], t_mvy=t16[4][g])
            p0x, p0y, p1x, p1y = amvp_candidates_dev(
                nbv, nmx, nmy, nb_refpoc, ref_pocs[aref], cur_poc,
                **takw)
            bits0 = mvd_bits(cbflat, amx - p0x, amy - p0y)
            bits1 = mvd_bits(cbflat, amx - p1x, amy - p1y)
            use1 = bits1 < bits0
            mvpi = use1.astype(jnp.int32)
            mvdx = jnp.where(use1, amx - p1x, amx - p0x)
            mvdy = jnp.where(use1, amy - p1y, amy - p0y)
            bits_mvd = jnp.minimum(bits0, bits1)
            b_refa16 = ref_idx_bits(cbflat, aref, num_ref,
                                    n_active=n_active)

        cost_amvp = dist_a16[g] + lam * (
            b_inter + merge_flag_bits(cbflat, jnp.zeros_like(g))
            + mvp_idx_bits(cbflat, mvpi) + bits_mvd
            + b_refa16
            + _root_cbf_bits(cbflat, cbf_a16[0][g], cbf_a16[1][g],
                             cbf_a16[2][g], cbf_bits_inter)
            + bits_a16[g])
        costs = jnp.stack([cost_skip, cost_merge, cost_amvp], axis=1)
        c16 = jnp.argmin(costs, axis=1).astype(jnp.int32)
        m_zero = ~(cbf_m[0] | cbf_m[1] | cbf_m[2])
        c16 = jnp.where((c16 == 1) & m_zero, 0, c16)
        mi = jnp.where(c16 == 0, mi_sk, mi_mg)
        cost16 = jnp.min(costs, axis=1)
        # split_cu_flag at the 16 depth: the 4x8x8 path pays split=1,
        # the single CU split=0 (9.3.4.2.2 ctx from neighbour depths)
        inc_sp = ((gxb > 0) & (l_blk[:, K_SZ] == 0)).astype(jnp.int32) \
            + ((gyb > 0) & (a_blk[:, K_SZ] == 0)).astype(jnp.int32)
        sp0 = lam * split_flag_bits(cbflat, jnp.zeros_like(g), inc_sp)
        sp1 = lam * split_flag_bits(cbflat, jnp.ones_like(g), inc_sp)
        cost16 = cost16 + sp0
        cost8 = cost8 + sp1
        use16 = valid & (cost16 < cost8)

        def pick3(s, m, a):
            c = c16.reshape((-1,) + (1,) * (s.ndim - 1))
            return jnp.where(c == 0, s, jnp.where(c == 1, m, a))

        out_y = pick3(pred_sk_y, rec_my, rec16ay[g])
        out_u = pick3(pred_sk_u, rec_mu, rec16au[g])
        out_v = pick3(pred_sk_v, rec_mv_, rec16av[g])
        pack = jnp.concatenate([lev_my.reshape(B, 256),
                                lev_mu.reshape(B, 64),
                                lev_mv_.reshape(B, 64)], axis=1)
        o_lev = pick3(jnp.zeros((B, 384), jnp.int32), pack,
                      lev16_a384[g]).reshape(B, 4, 96)
        if is_b:
            u0a = lx16b == 0
            n_mvx = pick3(w_mvx, w_mvx, jnp.where(u0a, amx, 0))
            n_mvy = pick3(w_mvy, w_mvy, jnp.where(u0a, amy, 0))
            n_ref = pick3(w_ref, w_ref, jnp.where(u0a, aref, 0))
            n_mvx1 = pick3(w_mvx1, w_mvx1, jnp.where(u0a, 0, amx))
            n_mvy1 = pick3(w_mvy1, w_mvy1, jnp.where(u0a, 0, amy))
            n_ref1 = pick3(w_ref1, w_ref1, jnp.where(u0a, 0, aref))
            n_dir = pick3(w_dir, w_dir, 1 + lx16b)
        else:
            n_mvx = pick3(mrd["sk_mvx"], mrd["mg_mvx"], amx)
            n_mvy = pick3(mrd["sk_mvy"], mrd["mg_mvy"], amy)
            n_ref = pick3(mrd["sk_ref"], mrd["mg_ref"], aref)
            n_mvx1 = jnp.zeros_like(n_mvx)
            n_mvy1 = jnp.zeros_like(n_mvx)
            n_ref1 = jnp.zeros_like(n_mvx)
            n_dir = jnp.ones_like(c16)
        cbf16b = pick3(jnp.zeros((B,), bool),
                       cbf_m[0],
                       jnp.any(lev16ay[g].reshape(B, 256) != 0, axis=1)
                       ).astype(jnp.int32)
        o_blk = jnp.stack([c16, mi, mvdx, mvdy, mvpi,
                           n_dir, n_mvx, n_mvy, n_ref,
                           jnp.ones_like(c16), cbf16b,
                           n_mvx1, n_mvy1, n_ref1], axis=1)

        drop4 = jnp.where(use16[:, None], c4, P)
        yy = (y0[:, None] + jnp.arange(16)[None, :])
        xx = (x0[:, None] + jnp.arange(16)[None, :])
        fl_y = yy[:, :, None] * w + xx[:, None, :]
        fl_y = jnp.where(use16[:, None, None], fl_y, h * w)
        cyy = (gyb * 8)[:, None] + jnp.arange(8)[None, :]
        cxx = (gxb * 8)[:, None] + jnp.arange(8)[None, :]
        fl_c = cyy[:, :, None] * (w // 2) + cxx[:, None, :]
        fl_c = jnp.where(use16[:, None, None], fl_c, h * w // 4)

        st = dict(
            rec_y=st["rec_y"].at[fl_y].set(out_y),
            rec_u=st["rec_u"].at[fl_c].set(out_u),
            rec_v=st["rec_v"].at[fl_c].set(out_v),
            blk=st["blk"].at[drop4].set(o_blk[:, None, :]),
            levs=st["levs"].at[drop4].set(o_lev),
            tsf=st["tsf"].at[drop4].set(0),   # chroma TBs are 8x8
        )
        return st, jnp.where(use16, cost16, cost8)

    if levels == 2:
        def step16(st, blk16):
            st, _ = region16(st, blk16, blk16 >= 0)
            return st, None

        state, _ = jax.lax.scan(step16, state, lv16)
        state["imode"] = imode
        return state

    # ---- three-level scan: per 32x32 region, four 16x16 regions (each
    # deciding 16x16-vs-4x8x8 inside), then ONE 32x32 inter CU trial
    # (skip / merge / AMVP, 32x32 TU) that overwrites where it wins.
    # CU32 candidates read only state OUTSIDE the region, so the sub
    # decision commits first — same inversion as the 16 level.
    lv32, cells16_32, cells8_32, nb32_ok, nb32_cell, full32 = sched32
    qw = (gw + 1) // 2
    qh = (gh + 1) // 2
    P32 = qw * qh
    if is_b:
        mv32_x, mv32_y, mv32_ref, mv32_lx = mv32
        lx32f = mv32_lx.reshape(-1)
    else:
        mv32_x, mv32_y, mv32_ref = mv32
    t32 = t_level(32, mv32_ref.reshape(-1), gw=qw, gh=qh) \
        if tmvp else None
    orgp_y = jnp.pad(org_y, ((0, qh * 32 - h), (0, qw * 32 - w)),
                     mode="edge")
    orgp_u = jnp.pad(org_u, ((0, (qh * 32 - h) // 2),
                             (0, (qw * 32 - w) // 2)), mode="edge")
    orgp_v = jnp.pad(org_v, ((0, (qh * 32 - h) // 2),
                             (0, (qw * 32 - w) // 2)), mode="edge")
    org32_blk = _blockify(orgp_y, 32)
    org32u = _blockify(orgp_u, 16)
    org32v = _blockify(orgp_v, 16)
    q_all = jnp.arange(P32)
    qy_all, qx_all = q_all // qw, q_all % qw

    # hoisted CU32 AMVP prediction + residual
    m32x, m32y = mv32_x.reshape(-1), mv32_y.reshape(-1)
    r32 = mv32_ref.reshape(-1)
    if is_b:
        r32u = jnp.where(lx32f == 0,
                         l0m[jnp.clip(r32, 0, num_ref - 1)],
                         l1m[jnp.clip(r32, 0, num_ref_l1 - 1)])
    else:
        r32u = r32
    pred32a = mc_luma_batch_refs(refs_y, r32u, qx_all * 32,
                                 qy_all * 32, m32x, m32y, 32, 32, bd)
    pred32au = mc_chroma_batch_refs(refs_u, r32u, qx_all * 16,
                                    qy_all * 16, m32x, m32y, 16, 16, bd)
    pred32av = mc_chroma_batch_refs(refs_v, r32u, qx_all * 16,
                                    qy_all * 16, m32x, m32y, 16, 16, bd)
    lev32ay, rec32ay, d32ay, b32ay = code(org32_blk, pred32a, qp, 5,
                                           bd, lam, cbflat, True,
                                           sdh=sdh)
    lev32au, rec32au, d32au, b32au = code(org32u, pred32au, qpc, 4,
                                           bd, lam_c, cbflat, False,
                                           wchroma, sdh=sdh)
    lev32av, rec32av, d32av, b32av = code(org32v, pred32av, qpc, 4,
                                           bd, lam_c, cbflat, False,
                                           wchroma, sdh=sdh)
    dist_a32 = d32ay + d32au + d32av
    bits_a32 = b32ay + b32au + b32av
    cbf_a32 = (jnp.any(lev32ay.reshape(P32, 1024) != 0, axis=1),
               jnp.any(lev32au.reshape(P32, 256) != 0, axis=1),
               jnp.any(lev32av.reshape(P32, 256) != 0, axis=1))
    lev32_a1536 = jnp.concatenate([lev32ay.reshape(P32, 1024),
                                   lev32au.reshape(P32, 256),
                                   lev32av.reshape(P32, 256)], axis=1)

    def step32(st, blk32):
        valid = blk32 >= 0
        g = jnp.where(valid, blk32, 0)
        B = blk32.shape[0]
        c16b = cells16_32[g]                              # (B, 4)

        def reg_body(carry, cells):
            st_, acc = carry
            cv = valid & (cells >= 0)
            st_, cc = region16(st_, jnp.where(cv, cells, 0), cv)
            return (st_, acc + jnp.where(cv, cc, 0.0)), None

        (st, cost_sub), _ = jax.lax.scan(
            reg_body, (st, jnp.zeros((B,), jnp.float32)), c16b.T)

        can32 = valid & full32[g]
        qyb, qxb = g // qw, g % qw
        x0, y0 = qxb * 32, qyb * 32
        org = org32_blk[g]
        orgu = org32u[g]
        orgv = org32v[g]

        nb = nb32_cell[g]
        nbp = st["blk"][nb]
        nbv = nb32_ok[g] & (nbp[..., K_DIR] > 0)
        nmx, nmy, nrf = nbp[..., K_MVX], nbp[..., K_MVY], nbp[..., K_REF]
        M = max_merge
        rep = lambda a: jnp.repeat(a, M)
        two = lambda a: jnp.concatenate([a, a])
        bits_mi_row = merge_idx_bits(cbflat, jnp.arange(M), max_merge)

        # skip/split ctx from the committed state OUTSIDE the region
        corner = (qyb * 4) * bw + qxb * 4
        cL = jnp.where(qxb > 0, corner - 1, 0)
        cA = jnp.where(qyb > 0, corner - bw, 0)
        l_blk = st["blk"][cL]
        a_blk = st["blk"][cA]
        inc_sk = ((qxb > 0) & (l_blk[:, K_KIND] == 0)) \
            .astype(jnp.int32) \
            + ((qyb > 0) & (a_blk[:, K_KIND] == 0)).astype(jnp.int32)
        b_skip1 = skip_flag_bits(cbflat, jnp.ones_like(g), inc_sk)
        b_skip0 = skip_flag_bits(cbflat, jnp.zeros_like(g), inc_sk)
        b_inter = b_skip0 + part_size_2nx2n_bits(cbflat) \
            + pred_mode_bits(cbflat, jnp.zeros_like(g))

        if is_b:
            cands = merge_b_nxn(nbv, nbp, x0, y0, 32)
            sse_l = jnp.sum((org[:, None] - cands[-1]) ** 2,
                            axis=(-1, -2))
            mi = jnp.argmin(sse_l.astype(jnp.float32)
                            + lam * bits_mi_row[None],
                            axis=1).astype(jnp.int32)
            (w_dir, w_mvx, w_mvy, w_ref, w_mvx1, w_mvy1, w_ref1,
             pred_m, pred_mu, pred_mv_) = merge_b_winner(
                cands, mi, x0, y0, 32)
            msse3 = jnp.sum((org - pred_m) ** 2, axis=(-1, -2)) \
                .astype(jnp.float32) + wchroma * (
                jnp.sum((orgu - pred_mu) ** 2, axis=(-1, -2))
                + jnp.sum((orgv - pred_mv_) ** 2, axis=(-1, -2))
                ).astype(jnp.float32)
            lev_my, rec_my, d_my, b_my = code(org, pred_m, qp, 5, bd,
                                              lam, cbflat, True,
                                              sdh=sdh)
            levC2, recC2, dC2, bC2 = code(
                jnp.concatenate([orgu, orgv]),
                jnp.concatenate([pred_mu, pred_mv_]), qpc, 4, bd,
                lam_c, cbflat, False, wchroma, sdh=sdh)
            lev_mu, lev_mv_ = levC2[:B], levC2[B:]
            rec_mu, rec_mv_ = recC2[:B], recC2[B:]
            d_mu, d_mv = dC2[:B], dC2[B:]
            b_mu, b_mv = bC2[:B], bC2[B:]
            cbf_m = (jnp.any(lev_my.reshape(B, 1024) != 0, 1),
                     jnp.any(lev_mu.reshape(B, 256) != 0, 1),
                     jnp.any(lev_mv_.reshape(B, 256) != 0, 1))
            b_mi = merge_idx_bits(cbflat, mi, max_merge)
            cost_skip = msse3 + lam * (b_skip1 + b_mi)
            cost_merge = d_my + d_mu + d_mv + lam * (
                b_inter + merge_flag_bits(cbflat, jnp.ones_like(g))
                + b_mi + cbf_bits_inter(*cbf_m) + b_my + b_mu + b_mv)
            mi_sk = mi_mg = mi
            pred_sk_y, pred_sk_u, pred_sk_v = pred_m, pred_mu, pred_mv_
        else:
            tkw = {} if t32 is None else dict(
                t_ok=t32[0][g], t_mvx=t32[1][g], t_mvy=t32[2][g])
            cmx, cmy, crf = merge_candidates_dev(nbv, nmx, nmy, nrf,
                                                 num_ref, max_merge,
                                                 n_active=n_active,
                                                 **tkw)
            mrd = p_merge_all_rd(org, orgu, orgv, x0, y0, 32, 5,
                                 cmx, cmy, crf, b_skip1, b_inter)
            cost_skip, cost_merge = mrd["cost_skip"], mrd["cost_merge"]
            mi_sk, mi_mg = mrd["mi_skip"], mrd["mi_merge"]
            lev_my, rec_my = mrd["lev_my"], mrd["rec_my"]
            lev_mu, rec_mu = mrd["lev_mu"], mrd["rec_mu"]
            lev_mv_, rec_mv_ = mrd["lev_mv"], mrd["rec_mv"]
            cbf_m = mrd["cbf_m"]
            pred_sk_y, pred_sk_u, pred_sk_v = (
                mrd["pred_sk_y"], mrd["pred_sk_u"], mrd["pred_sk_v"])

        aref = r32[g]
        amx, amy = m32x[g], m32y[g]
        if is_b:
            lx32b = lx32f[g]
            mvpi, mvdx, mvdy, bits_mvd, b_refa32 = amvp_b_nxn(
                nbv, nbp, lx32b, aref, amx, amy, log2_ctu - 5)
        else:
            nb_refpoc = ref_pocs[jnp.clip(nrf, 0, num_ref - 1)]
            takw = {} if t32 is None else dict(
                t_ok=t32[0][g], t_mvx=t32[3][g], t_mvy=t32[4][g])
            p0x, p0y, p1x, p1y = amvp_candidates_dev(
                nbv, nmx, nmy, nb_refpoc, ref_pocs[aref], cur_poc,
                **takw)
            bits0 = mvd_bits(cbflat, amx - p0x, amy - p0y)
            bits1 = mvd_bits(cbflat, amx - p1x, amy - p1y)
            use1 = bits1 < bits0
            mvpi = use1.astype(jnp.int32)
            mvdx = jnp.where(use1, amx - p1x, amx - p0x)
            mvdy = jnp.where(use1, amy - p1y, amy - p0y)
            bits_mvd = jnp.minimum(bits0, bits1)
            b_refa32 = ref_idx_bits(cbflat, aref, num_ref,
                                    n_active=n_active)

        cost_amvp = dist_a32[g] + lam * (
            b_inter + merge_flag_bits(cbflat, jnp.zeros_like(g))
            + mvp_idx_bits(cbflat, mvpi) + bits_mvd
            + b_refa32
            + _root_cbf_bits(cbflat, cbf_a32[0][g], cbf_a32[1][g],
                             cbf_a32[2][g], cbf_bits_inter)
            + bits_a32[g])
        costs = jnp.stack([cost_skip, cost_merge, cost_amvp], axis=1)
        c32 = jnp.argmin(costs, axis=1).astype(jnp.int32)
        m_zero = ~(cbf_m[0] | cbf_m[1] | cbf_m[2])
        c32 = jnp.where((c32 == 1) & m_zero, 0, c32)
        mi = jnp.where(c32 == 0, mi_sk, mi_mg)
        cost32 = jnp.min(costs, axis=1)
        # split_cu_flag at the 32 depth
        inc_sp = ((qxb > 0) & (l_blk[:, K_SZ] < 2)).astype(jnp.int32) \
            + ((qyb > 0) & (a_blk[:, K_SZ] < 2)).astype(jnp.int32)
        sp0 = lam * split_flag_bits(cbflat, jnp.zeros_like(g), inc_sp)
        sp1 = lam * split_flag_bits(cbflat, jnp.ones_like(g), inc_sp)
        cost32 = cost32 + sp0
        cost_sub = cost_sub + sp1
        use32 = can32 & (cost32 < cost_sub)

        def pick3(s, m, a):
            c = c32.reshape((-1,) + (1,) * (s.ndim - 1))
            return jnp.where(c == 0, s, jnp.where(c == 1, m, a))

        out_y = pick3(pred_sk_y, rec_my, rec32ay[g])
        out_u = pick3(pred_sk_u, rec_mu, rec32au[g])
        out_v = pick3(pred_sk_v, rec_mv_, rec32av[g])
        pack = jnp.concatenate([lev_my.reshape(B, 1024),
                                lev_mu.reshape(B, 256),
                                lev_mv_.reshape(B, 256)], axis=1)
        o_lev = pick3(jnp.zeros((B, 1536), jnp.int32), pack,
                      lev32_a1536[g]).reshape(B, 16, 96)
        if is_b:
            u0a = lx32b == 0
            n_mvx = pick3(w_mvx, w_mvx, jnp.where(u0a, amx, 0))
            n_mvy = pick3(w_mvy, w_mvy, jnp.where(u0a, amy, 0))
            n_ref = pick3(w_ref, w_ref, jnp.where(u0a, aref, 0))
            n_mvx1 = pick3(w_mvx1, w_mvx1, jnp.where(u0a, 0, amx))
            n_mvy1 = pick3(w_mvy1, w_mvy1, jnp.where(u0a, 0, amy))
            n_ref1 = pick3(w_ref1, w_ref1, jnp.where(u0a, 0, aref))
            n_dir = pick3(w_dir, w_dir, 1 + lx32b)
        else:
            n_mvx = pick3(mrd["sk_mvx"], mrd["mg_mvx"], amx)
            n_mvy = pick3(mrd["sk_mvy"], mrd["mg_mvy"], amy)
            n_ref = pick3(mrd["sk_ref"], mrd["mg_ref"], aref)
            n_mvx1 = jnp.zeros_like(n_mvx)
            n_mvy1 = jnp.zeros_like(n_mvx)
            n_ref1 = jnp.zeros_like(n_mvx)
            n_dir = jnp.ones_like(c32)
        cbf32b = pick3(jnp.zeros((B,), bool),
                       cbf_m[0],
                       jnp.any(lev32ay[g].reshape(B, 1024) != 0, axis=1)
                       ).astype(jnp.int32)
        o_blk = jnp.stack([c32, mi, mvdx, mvdy, mvpi,
                           n_dir, n_mvx, n_mvy, n_ref,
                           jnp.full_like(c32, 2), cbf32b,
                           n_mvx1, n_mvy1, n_ref1], axis=1)

        drop16 = jnp.where(use32[:, None], cells8_32[g], P)
        yy = (y0[:, None] + jnp.arange(32)[None, :])
        xx = (x0[:, None] + jnp.arange(32)[None, :])
        fl_y = yy[:, :, None] * w + xx[:, None, :]
        fl_y = jnp.where(use32[:, None, None], fl_y, h * w)
        cyy = (qyb * 16)[:, None] + jnp.arange(16)[None, :]
        cxx = (qxb * 16)[:, None] + jnp.arange(16)[None, :]
        fl_c = cyy[:, :, None] * (w // 2) + cxx[:, None, :]
        fl_c = jnp.where(use32[:, None, None], fl_c, h * w // 4)

        st = dict(
            rec_y=st["rec_y"].at[fl_y].set(out_y),
            rec_u=st["rec_u"].at[fl_c].set(out_u),
            rec_v=st["rec_v"].at[fl_c].set(out_v),
            blk=st["blk"].at[drop16].set(o_blk[:, None, :]),
            levs=st["levs"].at[drop16].set(o_lev),
            tsf=st["tsf"].at[drop16].set(0),  # chroma TBs 16x16
        )
        return st, None

    state, _ = jax.lax.scan(step32, state, lv32)
    state["imode"] = imode
    return state


_FPP_STATICS = ("w", "h", "num_ref", "max_merge", "bd", "srange",
                "subpel", "deblock", "sao", "ctu", "cb_off", "cr_off",
                "tmvp", "sdh", "num_ref_l1", "l0map", "l1map", "rdoq",
                "decision", "ts")


def full_pframe_pass(org_y, org_u, org_v, refs_y, refs_u, refs_v, nn,
                     lv_blk, nb_ok, nb_flat, sub_y, none_y, sub_c,
                     none_c, sched16, sched32, ref_pocs, cur_poc,
                     qp=32, qpc=32, col=None, col_poc=0, cbflat=None,
                     ref_pocs_l1=None, n_active=None,
                     *, w: int, h: int,
                     num_ref: int, max_merge: int,
                     bd: int, srange: int, subpel: str,
                     deblock: bool = False, sao: bool = False,
                     ctu: int = 64, cb_off: int = 0, cr_off: int = 0,
                     qp_factor=0.57, tmvp: bool = False,
                     sdh: bool = False, num_ref_l1: int = 0,
                     l0map: tuple = None, l1map: tuple = None,
                     rdoq: bool = True, decision: str = "scan",
                     ts: bool = False):
    """ME + sub-pel + wavefront decision + in-loop filters in ONE
    dispatch, with compact output dtypes (spec coefficient range is
    int16; recon fits the bit depth) to minimise the device->host
    transfer.

    B slices (num_ref_l1 > 0): refs_* hold the deduped union of both
    lists, l0map/l1map are the per-list union indices, and the
    integer-ME stage searches every reference of both lists, keeping
    the best (list, ref, MV) triple per block for the AMVP candidate
    (TEncSearch::predInterSearch's per-list loop; bi candidates enter
    through the merge list).

    P slices pad the L0 reference stack to a FIXED num_ref (the DPB
    ramp otherwise mints one compiled variant per active-ref count);
    `n_active` is the traced real count — padded refs are masked out
    of ME selection, so decisions never reference them."""
    from hmtpu.search.me import frac_refine_batch, integer_me, \
        satd_batch

    bw, bh = w // 8, h // 8
    is_b = num_ref_l1 > 0
    if n_active is None:
        n_active = jnp.int32(num_ref)

    def nn_gate(refs_p, uidx, xs, ys, org_blocks, int_x, int_y,
                nn_qx, nn_qy, n):
        """RD gate for the NN sub-pel MV (the reference overrides the
        fractional MV unconditionally, TEncSearch.cpp:4586-4590, which
        loses whenever the 49-class argmax misses; HM's own
        xPatternRefinement always keeps the best-cost point incl. the
        integer centre, TEncSearch.cpp:1591).  Keep the NN offset only
        when its SATD beats the integer MV's."""
        pred_nn = mc_luma_batch_refs(refs_p, uidx, xs, ys, nn_qx,
                                     nn_qy, n, n, bd)
        pred_i = mc_luma_batch_refs(refs_p, uidx, xs, ys, int_x * 4,
                                    int_y * 4, n, n, bd)
        better = satd_batch(org_blocks, pred_nn, n) \
            < satd_batch(org_blocks, pred_i, n)
        return (jnp.where(better, nn_qx, int_x * 4),
                jnp.where(better, nn_qy, int_y * 4))
    lam_sqrt = jnp.sqrt(jnp.float32(qp_factor)
                        * jnp.power(2.0, (qp - 12) / 3.0)
                        .astype(jnp.float32))
    zeros = jnp.zeros((bh, bw), jnp.int32)

    _ref_lists = [(0, r, u) for r, u in enumerate(
        l0map if is_b else tuple(range(num_ref)))]
    if is_b:
        _ref_lists += [(1, r, u) for r, u in enumerate(l1map)]

    def _pick_best_ref(entries, meta):
        """argmin over the per-(list, ref) candidates of one level."""
        sel = jnp.argmin(jnp.stack([e[2] for e in entries]),
                         axis=0).astype(jnp.int32)
        mvsel = jnp.take_along_axis(
            jnp.stack([e[0] for e in entries]), sel[None, None], 0)[0]
        sten = jnp.take_along_axis(
            jnp.stack([e[1] for e in entries]),
            sel[None, :, :, None, None], 0)[0]
        lx_tab = jnp.asarray([m[0] for m in meta], jnp.int32)
        r_tab = jnp.asarray([m[1] for m in meta], jnp.int32)
        return (mvsel[0], mvsel[1], r_tab[sel], lx_tab[sel], sten)

    def _ref_cost(sad, lx, r):
        """SAD + ref-idx signalling bits; padded (inactive) L0 refs
        never win."""
        nr = num_ref if lx == 0 else num_ref_l1
        refbits = 0.0 if nr == 1 else float(1 + min(r, nr - 2))
        cost = sad.astype(jnp.float32) + lam_sqrt * refbits
        if lx == 0:
            cost = cost + jnp.where(jnp.int32(r) < n_active, 0.0, BIG)
        return cost

    def me_all_levels(qh: int, qw: int):
        """Integer ME over every active reference at all three CU
        sizes, ONE shared 8x8 SAD volume per reference
        (search/me.py integer_me_levels).  Returns
        {n: (mvx, mvy, ref-within-list, lx, stencil)}."""
        from hmtpu.search.me import integer_me_levels
        acc = {8: [], 16: [], 32: []}
        meta = []
        for lx, r, u in _ref_lists:
            lev = integer_me_levels(refs_y[u], org_y, srange, lam_sqrt,
                                    qh, qw)
            for n, ((mx, my), sten, sad) in lev.items():
                acc[n].append((jnp.stack([mx, my]), sten,
                               _ref_cost(sad, lx, r)))
            meta.append((lx, r))
        return {n: _pick_best_ref(entries, meta)
                for n, entries in acc.items()}

    def me_level8():
        """Single-level fallback for geometries without a 16-grid."""
        z = jnp.zeros((h // 8, w // 8), jnp.int32)
        entries, meta = [], []
        for lx, r, u in _ref_lists:
            (mx, my), sten, sad = integer_me(refs_y[u], org_y, 8,
                                             srange, lam_sqrt, z, z)
            entries.append((jnp.stack([mx, my]), sten,
                            _ref_cost(sad, lx, r)))
            meta.append((lx, r))
        return _pick_best_ref(entries, meta)

    # multi-reference integer ME: full-window search against EVERY
    # active reference (HM searches all refs in predInterSearch), best
    # reference per block by motion cost + ref-idx signalling bits
    two_level = (w % 16 == 0) and (h % 16 == 0) and sched16 is not None
    three_level = two_level and sched32 is not None
    if two_level:
        qw0, qh0 = (bw // 2 + 1) // 2, (bh // 2 + 1) // 2
        me_out = me_all_levels(qh0, qw0)
        mvx, mvy, rsel, lxsel, stencil = me_out[8]
    else:
        mvx, mvy, rsel, lxsel, stencil = me_level8()

    # coherence pass: trade per-block SAD optimality for a mergeable
    # motion field (the economics large inter CUs give HM)
    if not is_b:
        from hmtpu.search.me import regularize_mv_field
        mvx, mvy, rsel = regularize_mv_field(refs_y, org_y, mvx, mvy,
                                             rsel, lam_sqrt, iters=3)

    def union_idx(rr, ll):
        """(ref-within-list, list) -> index into the union ref stack."""
        if not is_b:
            return rr
        return jnp.where(
            ll == 0,
            jnp.asarray(l0map, jnp.int32)[
                jnp.clip(rr, 0, num_ref - 1)],
            jnp.asarray(l1map, jnp.int32)[
                jnp.clip(rr, 0, num_ref_l1 - 1)])

    if subpel == "nn":
        from hmtpu.models.nnfme import predict_offsets
        st9 = stencil.reshape(-1, 9).astype(jnp.float32)
        sizes = jnp.full((bw * bh,), 8, jnp.int32)
        _, offs = predict_offsets(nn, st9, sizes, sizes)
        ys0, xs0 = jnp.mgrid[0:bh, 0:bw] * 8
        gx, gy = nn_gate(
            refs_y, union_idx(rsel, lxsel).reshape(-1),
            xs0.reshape(-1), ys0.reshape(-1), _blockify(org_y, 8),
            mvx.reshape(-1), mvy.reshape(-1),
            mvx.reshape(-1) * 4 + offs[:, 0],
            mvy.reshape(-1) * 4 + offs[:, 1], 8)
        mvq_x, mvq_y = gx.reshape(bh, bw), gy.reshape(bh, bw)
    elif subpel == "dctif":
        ys0, xs0 = jnp.mgrid[0:bh, 0:bw] * 8
        qx, qy = frac_refine_batch(
            refs_y, xs0.reshape(-1), ys0.reshape(-1),
            _blockify(org_y, 8), mvx.reshape(-1), mvy.reshape(-1), 8,
            bd, ridx=union_idx(rsel, lxsel).reshape(-1))
        mvq_x, mvq_y = qx.reshape(bh, bw), qy.reshape(bh, bw)
    else:
        mvq_x, mvq_y = mvx * 4, mvy * 4

    # 16x16 ME for the two-level CU decision (dims permitting)
    mv16 = None
    if two_level:
        m16x_i, m16y_i, r16, lx16, s16 = me_out[16]
        if subpel == "nn":
            from hmtpu.models.nnfme import predict_offsets
            st9 = s16.reshape(-1, 9).astype(jnp.float32)
            sizes16 = jnp.full(((bh // 2) * (bw // 2),), 16, jnp.int32)
            _, offs16 = predict_offsets(nn, st9, sizes16, sizes16)
            ys0, xs0 = jnp.mgrid[0:bh // 2, 0:bw // 2] * 16
            gx, gy = nn_gate(
                refs_y, union_idx(r16, lx16).reshape(-1),
                xs0.reshape(-1), ys0.reshape(-1),
                _blockify(org_y, 16),
                m16x_i.reshape(-1), m16y_i.reshape(-1),
                m16x_i.reshape(-1) * 4 + offs16[:, 0],
                m16y_i.reshape(-1) * 4 + offs16[:, 1], 16)
            mv16q_x = gx.reshape(bh // 2, bw // 2)
            mv16q_y = gy.reshape(bh // 2, bw // 2)
        elif subpel == "dctif":
            ys0, xs0 = jnp.mgrid[0:bh // 2, 0:bw // 2] * 16
            qx, qy = frac_refine_batch(
                refs_y, xs0.reshape(-1), ys0.reshape(-1),
                _blockify(org_y, 16), m16x_i.reshape(-1),
                m16y_i.reshape(-1), 16, bd,
                ridx=union_idx(r16, lx16).reshape(-1))
            mv16q_x = qx.reshape(bh // 2, bw // 2)
            mv16q_y = qy.reshape(bh // 2, bw // 2)
        else:
            mv16q_x, mv16q_y = m16x_i * 4, m16y_i * 4
        mv16 = (mv16q_x, mv16q_y, r16, lx16) if is_b \
            else (mv16q_x, mv16q_y, r16)

    # 32x32 ME for the third CU level (SAD sums zero-padded in the
    # ceil-grid strip; those lanes never become CUs — full32 masks
    # them in the scan.  MC reads refs_y directly: its coordinate
    # clamping IS edge replication, so no padded ref stack is needed)
    mv32 = None
    if three_level:
        qw, qh = qw0, qh0
        orgp = jnp.pad(org_y, ((0, qh * 32 - h), (0, qw * 32 - w)),
                       mode="edge")
        refs_p = refs_y
        m32x_i, m32y_i, r32, lx32, s32 = me_out[32]
        if subpel == "nn":
            from hmtpu.models.nnfme import predict_offsets
            st9 = s32.reshape(-1, 9).astype(jnp.float32)
            sizes32 = jnp.full((qh * qw,), 32, jnp.int32)
            _, offs32 = predict_offsets(nn, st9, sizes32, sizes32)
            ys0, xs0 = jnp.mgrid[0:qh, 0:qw] * 32
            gx, gy = nn_gate(
                refs_p, union_idx(r32, lx32).reshape(-1),
                xs0.reshape(-1), ys0.reshape(-1), _blockify(orgp, 32),
                m32x_i.reshape(-1), m32y_i.reshape(-1),
                m32x_i.reshape(-1) * 4 + offs32[:, 0],
                m32y_i.reshape(-1) * 4 + offs32[:, 1], 32)
            mv32q_x = gx.reshape(qh, qw)
            mv32q_y = gy.reshape(qh, qw)
        elif subpel == "dctif":
            ys0, xs0 = jnp.mgrid[0:qh, 0:qw] * 32
            qx, qy = frac_refine_batch(
                refs_p, xs0.reshape(-1), ys0.reshape(-1),
                _blockify(orgp, 32), m32x_i.reshape(-1),
                m32y_i.reshape(-1), 32, bd,
                ridx=union_idx(r32, lx32).reshape(-1))
            mv32q_x = qx.reshape(qh, qw)
            mv32q_y = qy.reshape(qh, qw)
        else:
            mv32q_x, mv32q_y = m32x_i * 4, m32y_i * 4
        mv32 = (mv32q_x, mv32q_y, r32, lx32) if is_b \
            else (mv32q_x, mv32q_y, r32)

    levels = 3 if three_level else (2 if two_level else 1)
    if decision == "jacobi" and not is_b and three_level:
        from hmtpu.encoder.pframe_jacobi import wavefront_pass_jacobi
        st = wavefront_pass_jacobi(
            org_y, org_u, org_v, refs_y, refs_u, refs_v,
            mvq_x, mvq_y, rsel, nb_ok, nb_flat,
            sub_y, none_y, sub_c, none_c, ref_pocs, cur_poc,
            mv16, sched16, mv32, sched32, qp=qp, qpc=qpc,
            col=col, col_poc=col_poc, cbflat=cbflat,
            w=w, h=h, num_ref=num_ref, max_merge=max_merge, bd=bd,
            qp_factor=qp_factor, tmvp=tmvp,
            log2_ctu=ctu.bit_length() - 1, sdh=sdh, rdoq=rdoq,
            n_active=n_active)
    else:
        st = wavefront_pass(org_y, org_u, org_v, refs_y, refs_u,
                            refs_v,
                            mvq_x, mvq_y, rsel, lv_blk, nb_ok, nb_flat,
                            sub_y, none_y, sub_c, none_c, ref_pocs,
                            cur_poc,
                            mv16=mv16, sched16=sched16, mv32=mv32,
                            sched32=sched32, qp=qp,
                            qpc=qpc, col=col, col_poc=col_poc,
                            cbflat=cbflat,
                            mv_lx=lxsel if is_b else None,
                            ref_pocs_l1=ref_pocs_l1,
                            w=w, h=h, num_ref=num_ref,
                            max_merge=max_merge,
                            bd=bd, qp_factor=qp_factor,
                            levels=levels, tmvp=tmvp,
                            log2_ctu=ctu.bit_length() - 1, sdh=sdh,
                            num_ref_l1=num_ref_l1, l0map=l0map,
                            l1map=l1map, rdoq=rdoq,
                            n_active=None if is_b else n_active,
                            ts=ts and not is_b)

    if "tsf" not in st:
        # jacobi never trials TS; the writer still emits zero flags
        st["tsf"] = jnp.zeros(bw * bh, jnp.int32)

    # ---- in-loop filters, still on device (8.7.2 deblock, 8.7.3 SAO)
    if deblock or sao:
        from hmtpu.ops.deblock import deblock_frame_dev
        from hmtpu.ops.sao import sao_frame_dev

        rec_y = st["rec_y"].reshape(h, w)
        rec_u = st["rec_u"].reshape(h // 2, w // 2)
        rec_v = st["rec_v"].reshape(h // 2, w // 2)
        blk = st["blk"]
        rep4 = lambda a: jnp.repeat(jnp.repeat(
            a.reshape(bh, bw), 2, 0), 2, 1)
        dirf = blk[:, 5]
        intra4 = rep4(dirf == 0)
        # 8.7.2.4: the cbf condition counts LUMA coefficients only; the
        # scan commits each CU's luma cbf to every covered 8x8 cell.
        cbf4 = rep4(blk[:, 10] > 0)
        u0f, u1f = (dirf & 1) > 0, (dirf & 2) > 0
        mv_x4 = jnp.stack([rep4(jnp.where(u0f, blk[:, 6], 0)),
                           rep4(jnp.where(u1f, blk[:, 11], 0))])
        mv_y4 = jnp.stack([rep4(jnp.where(u0f, blk[:, 7], 0)),
                           rep4(jnp.where(u1f, blk[:, 12], 0))])
        rp0 = rep4(jnp.where(
            u0f, ref_pocs[jnp.clip(blk[:, 8], 0, num_ref - 1)], -1))
        if num_ref_l1 > 0:
            rp1 = rep4(jnp.where(
                u1f, ref_pocs_l1[jnp.clip(blk[:, 13], 0,
                                          num_ref_l1 - 1)], -1))
        else:
            rp1 = jnp.full((h // 4, w // 4), -1, jnp.int32)
        refpoc4 = jnp.stack([rp0, rp1])
        if deblock:
            # 8-pel edges interior to a 16x16 / 32x32 CU/TU are not
            # boundaries (CUs are size-aligned, so the cell column/row
            # parity identifies interior edges)
            cusz8 = blk[:, 9].reshape(bh, bw)
            ev = jnp.arange(bw - 1)
            int_v = ((cusz8[:, :-1] == 1) & ((ev % 2) == 0)[None, :]) \
                | ((cusz8[:, :-1] == 2) & ((ev % 4) != 3)[None, :])
            eh = jnp.arange(bh - 1)
            int_h = ((cusz8[:-1, :] == 1) & ((eh % 2) == 0)[:, None]) \
                | ((cusz8[:-1, :] == 2) & ((eh % 4) != 3)[:, None])
            rec_y, rec_u, rec_v = deblock_frame_dev(
                rec_y, rec_u, rec_v, intra4, cbf4, mv_x4, mv_y4,
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
                 blk=jnp.int16, levs=jnp.int16, imode=jnp.int8,
                 sao=jnp.int8, dbg_repairs=jnp.int32, tsf=jnp.int8)
    dev_planes = (st["rec_y"].reshape(h, w),
                  st["rec_u"].reshape(h // 2, w // 2),
                  st["rec_v"].reshape(h // 2, w // 2))
    return {k: v.astype(small[k]) for k, v in st.items()}, dev_planes


full_pframe_pass = python_dispatch(
    jax.jit(full_pframe_pass, static_argnames=_FPP_STATICS),
    _FPP_STATICS)


class PFrameDeviceEncoder(PFrameEncoder):
    """Drop-in replacement for PFrameEncoder on P slices: same analyze()
    contract, decision pass on device (entropy pass inherited)."""

    def __init__(self, *a, qp_factor: float = 0.57, tmvp: bool = True,
                 ctx_states=None, rdoq: bool = True,
                 decision: str = "scan", pad_refs: int = 0, **kw):
        super().__init__(*a, **kw)
        self.qp_factor = qp_factor
        self.tmvp = tmvp
        self.rdoq = rdoq
        self.decision = decision
        # pad the P-slice L0 stack to this many refs (0 = no padding)
        # so the DPB ramp reuses one compiled variant
        self.pad_refs = pad_refs
        # context states pricing the decision pass (harvested from a
        # previous frame's real entropy coding, or None -> slice init)
        self.ctx_states = ctx_states
        self.final_ctx = None

    def launch(self, frame: Frame, qp: int, refs: list[Frame],
               ref_pocs: list[int], poc: int, sh: SliceHeader,
               refs_l1=None, ref_pocs_l1=None):
        """Dispatch the frame's device pass; returns an opaque context
        for finish().  Reference frames carrying a `.dev` attribute
        (device plane triple from a previous launch) are used in place
        without re-upload — the DPB stays device-resident.

        For B slices the two lists are deduped by POC into one union
        stack; l0map/l1map are static per-list indices into it (the
        handful of RA GOP list shapes each compile once)."""
        sps = self.sps
        w, h = sps.pic_width, sps.pic_height
        bd = self.bd
        qpc = chroma_qp_from_luma(qp + self.pps.cb_qp_offset)
        dev = _dev_static(w, h, sps.log2_ctu_size)
        is_b = sh.slice_type == SliceType.B and ref_pocs_l1

        def plane(r, i, host):
            d = getattr(r, "dev", None)
            return d[i] if d is not None else jnp.asarray(host, jnp.int32)

        if is_b:
            union_pocs, union_refs = [], []
            for p, r in zip(list(ref_pocs) + list(ref_pocs_l1),
                            list(refs) + list(refs_l1)):
                if p not in union_pocs:
                    union_pocs.append(p)
                    union_refs.append(r)
            l0map = tuple(union_pocs.index(p) for p in ref_pocs)
            l1map = tuple(union_pocs.index(p) for p in ref_pocs_l1)
            num_ref_l1 = len(ref_pocs_l1)
            pocs_l1 = jnp.asarray(ref_pocs_l1, jnp.int32)
        else:
            union_refs = list(refs)
            l0map = l1map = None
            num_ref_l1 = 0
            pocs_l1 = None
        n_active = len(refs)
        ref_pocs = list(ref_pocs)
        if not is_b and self.pad_refs > n_active:
            union_refs += [union_refs[-1]] * (self.pad_refs - n_active)
            ref_pocs += [ref_pocs[-1]] * (self.pad_refs - n_active)
        refs_y = jnp.stack([plane(r, 0, r.y) for r in union_refs])
        refs_u = jnp.stack([plane(r, 1, r.u) for r in union_refs])
        refs_v = jnp.stack([plane(r, 2, r.v) for r in union_refs])

        deblock_on = not self.pps.deblocking_filter_disabled
        sao_on = bool(sps.sao_enabled)
        # collocated motion for TMVP: the device tensors attached to
        # reference 0 by its own launch (8.5.3.2.8; col pic is
        # RefPicList0[collocated_ref_idx=0]).  Absent for an IDR col
        # pic — all-intra, so the candidate never exists anyway.
        col_in = getattr(refs[0], "dev_col", None) \
            if self.tmvp and sh.temporal_mvp and not is_b else None
        use_tmvp = self.tmvp and sh.temporal_mvp and not is_b
        if col_in is not None:
            col_arrays, col_poc = col_in
        elif use_tmvp:
            # IDR collocated picture (all-intra): synthesize an empty
            # motion field so the first P frame shares the tmvp=True
            # compiled variant — the candidate never fires (ok=False),
            # identical to HM's unavailable-col derivation
            bw0, bh0 = w // 8, h // 8
            z = jnp.zeros((bh0, bw0), jnp.int32)
            col_arrays, col_poc = (z, z, z.astype(bool), z), 0
        else:
            col_arrays, col_poc = None, 0
        from hmtpu.entropy.contexts import make_contexts
        from hmtpu.entropy.fracbits import ctx_bits_table
        ctx0 = self.ctx_states if self.ctx_states is not None \
            else make_contexts(sh.slice_type, qp)
        cbflat = jnp.asarray(ctx_bits_table(ctx0).reshape(-1))
        st, dev_planes = full_pframe_pass(
            jnp.asarray(frame.y, jnp.int32), jnp.asarray(frame.u, jnp.int32),
            jnp.asarray(frame.v, jnp.int32), refs_y, refs_u, refs_v,
            self.nn_params,
            dev["lv_blk"], dev["nb_ok"], dev["nb_flat"],
            dev["sub_y"], dev["none_y"], dev["sub_c"], dev["none_c"],
            dev["sched16"], dev["sched32"],
            jnp.asarray(ref_pocs, jnp.int32), jnp.int32(poc),
            jnp.int32(qp), jnp.int32(qpc),
            col_arrays, jnp.int32(col_poc), cbflat, pocs_l1,
            jnp.int32(n_active),
            w=w, h=h,
            num_ref=len(refs) if is_b else len(union_refs),
            max_merge=sh.max_num_merge_cand,
            bd=bd, srange=self.search_range,
            subpel=self.subpel, deblock=deblock_on, sao=sao_on,
            ctu=sps.ctu_size, cb_off=self.pps.cb_qp_offset,
            # traced (device scalar): distinct per-GOP-position lambda
            # factors must not fan out into separate compiled variants
            cr_off=self.pps.cr_qp_offset,
            qp_factor=jnp.float32(self.qp_factor),
            tmvp=use_tmvp, sdh=bool(self.pps.sign_data_hiding),
            num_ref_l1=num_ref_l1, l0map=l0map, l1map=l1map,
            rdoq=self.rdoq, decision=self.decision,
            ts=bool(self.pps.transform_skip_enabled))
        # this frame's motion on the 8x8 grid, kept on device as the
        # NEXT frame's collocated field (the 16x16 compression is the
        # reader's index rounding); L0 motion (col pic convention)
        bw, bh = w // 8, h // 8
        blk = st["blk"].astype(jnp.int32)
        col_out = ((blk[:, 6].reshape(bh, bw),
                    blk[:, 7].reshape(bh, bw),
                    ((blk[:, 5] & 1) > 0).reshape(bh, bw),
                    jnp.asarray(ref_pocs, jnp.int32)[
                        jnp.clip(blk[:, 8], 0, len(refs) - 1)]
                    .reshape(bh, bw)), poc)
        return dict(st=st, dev=dev_planes, sao_on=sao_on,
                    deblock_on=deblock_on, ref_pocs=list(ref_pocs),
                    poc=poc, num_ref=len(refs),
                    max_merge=sh.max_num_merge_cand,
                    col_out=col_out, col_ref=refs[0],
                    tmvp=use_tmvp,
                    ref_pocs_l1=list(ref_pocs_l1 or []) if is_b
                    else [],
                    num_ref_l1=num_ref_l1)

    def analyze(self, frame: Frame, qp: int, refs: list[Frame],
                ref_pocs: list[int], poc: int, sh: SliceHeader,
                refs_l1=None, ref_pocs_l1=None):
        return self.finish(self.launch(frame, qp, refs, ref_pocs, poc,
                                       sh, refs_l1, ref_pocs_l1))

    def finish(self, ctx):
        """Pull the decision tensors and build the host-side outputs."""
        sps = self.sps
        w, h = sps.pic_width, sps.pic_height
        bd = self.bd
        bw, bh = w // 8, h // 8
        sao_on = ctx["sao_on"]

        st = jax.device_get(ctx["st"])  # one transfer, whole pytree
        st = {k: v.astype(np.int32) for k, v in st.items()}
        # in-loop filters already ran on device; tell the top level
        self.post_done = ctx["deblock_on"] or sao_on
        self._sao_packed = st["sao"].reshape(-1, 21) if sao_on else None
        rec_y = st["rec_y"].reshape(h, w)
        rec_u = st["rec_u"].reshape(h // 2, w // 2)
        rec_v = st["rec_v"].reshape(h // 2, w // 2)
        blk = st["blk"].reshape(bh, bw, 14)
        kind, mi, mvdx, mvdy, mvpi = (blk[..., k] for k in range(5))
        fdir = blk[..., 5]
        fmvx, fmvy, fref = blk[..., 6], blk[..., 7], blk[..., 8]
        fmvx1, fmvy1, fref1 = (blk[..., 11], blk[..., 12],
                               blk[..., 13])
        cusz = blk[..., 9]
        is_b = ctx["num_ref_l1"] > 0
        imode = st["imode"].reshape(bh, bw)
        tsf = st.get("tsf")
        tsf = tsf.reshape(bh, bw) if tsf is not None \
            else np.zeros((bh, bw), np.int32)
        ts_cb, ts_cr = (tsf & 1), ((tsf >> 1) & 1)
        DBG_COUNTERS["ldp_ts_tbs"] += int(ts_cb.sum() + ts_cr.sum())
        levs = st["levs"].reshape(bh, bw, 96)
        levy = levs[..., :64].reshape(bh, bw, 8, 8)
        levcb = levs[..., 64:80].reshape(bh, bw, 4, 4)
        levcr = levs[..., 80:96].reshape(bh, bw, 4, 4)
        # unpack 16x16-CU level tensors (z-order cell packing)
        gw, gh = bw // 2, bh // 2
        lev16y = np.zeros((gh, gw, 16, 16), np.int32)
        lev16cb = np.zeros((gh, gw, 8, 8), np.int32)
        lev16cr = np.zeros((gh, gw, 8, 8), np.int32)
        if gw and gh:
            l2 = levs[:gh * 2, :gw * 2].reshape(gh, 2, gw, 2, 96) \
                .transpose(0, 2, 1, 3, 4)
            flat = np.concatenate(
                [l2[:, :, 0, 0], l2[:, :, 0, 1],
                 l2[:, :, 1, 0], l2[:, :, 1, 1]], axis=-1)  # (gh,gw,384)
            lev16y = flat[..., :256].reshape(gh, gw, 16, 16)
            lev16cb = flat[..., 256:320].reshape(gh, gw, 8, 8)
            lev16cr = flat[..., 320:384].reshape(gh, gw, 8, 8)
        # unpack 32x32-CU level tensors (z-order over the 16 cells)
        qw, qh = bw // 4, bh // 4
        lev32y = np.zeros((qh, qw, 32, 32), np.int32)
        lev32cb = np.zeros((qh, qw, 16, 16), np.int32)
        lev32cr = np.zeros((qh, qw, 16, 16), np.int32)
        if qw and qh:
            l4 = levs[:qh * 4, :qw * 4].reshape(qh, 4, qw, 4, 96) \
                .transpose(0, 2, 1, 3, 4)              # (qh,qw,4r,4c,96)
            zord = ((0, 0), (0, 1), (1, 0), (1, 1),
                    (0, 2), (0, 3), (1, 2), (1, 3),
                    (2, 0), (2, 1), (3, 0), (3, 1),
                    (2, 2), (2, 3), (3, 2), (3, 3))
            flat4 = np.concatenate([l4[:, :, r, c] for r, c in zord],
                                   axis=-1)            # (qh,qw,1536)
            lev32y = flat4[..., :1024].reshape(qh, qw, 32, 32)
            lev32cb = flat4[..., 1024:1280].reshape(qh, qw, 16, 16)
            lev32cr = flat4[..., 1280:1536].reshape(qh, qw, 16, 16)

        # motion field (4x4 granularity) for deblock + later frames
        field = PicMotion.create(w, h)
        rep = lambda a: np.repeat(np.repeat(a, 2, 0), 2, 1)
        u0m, u1m = (fdir & 1) > 0, (fdir & 2) > 0
        field.inter_dir[:] = rep(fdir)
        field.mv[0, ..., 0] = rep(np.where(u0m, fmvx, 0))
        field.mv[0, ..., 1] = rep(np.where(u0m, fmvy, 0))
        field.ref_idx[0] = rep(np.where(u0m, fref, -1))
        if is_b:
            field.mv[1, ..., 0] = rep(np.where(u1m, fmvx1, 0))
            field.mv[1, ..., 1] = rep(np.where(u1m, fmvy1, 0))
            field.ref_idx[1] = rep(np.where(u1m, fref1, -1))

        # ---- skip-region collapse: merge uniform all-skip regions into
        # one large skip CU.  A pure entropy-level transform — same-MV
        # MC is identical at any block size, so the reconstruction and
        # the motion field are untouched; only split/skip syntax and
        # the CU-level merge index change.
        depth8 = np.full((bh, bw), sps.log2_ctu_size - 3,
                         dtype=np.int32)
        depth8[cusz == 1] = sps.log2_ctu_size - 4
        depth8[cusz == 2] = sps.log2_ctu_size - 5
        from hmtpu.common.motion import MotionCtx, merge_candidates
        col_np = getattr(ctx["col_ref"], "col_np", None) \
            if ctx["tmvp"] else None
        mctx = MotionCtx(field, w, h, sps.log2_ctu_size,
                         ctx["ref_pocs"], ctx["ref_pocs_l1"],
                         cur_poc=ctx["poc"], col=col_np)
        max_merge = ctx["max_merge"]
        num_ref = ctx["num_ref"]
        num_ref_l1 = ctx["num_ref_l1"]

        def collapse(x0, y0, log2):
            size = 1 << log2
            cy, cx = y0 // 8, x0 // 8
            if log2 == 4 and cusz[cy, cx] >= 1:
                return                      # already a 16x16+ CU
            if log2 == 5 and cusz[cy, cx] == 2:
                return                      # already a 32x32 CU
            if x0 + size <= w and y0 + size <= h and log2 > 3:
                nc = size // 8
                ks = kind[cy:cy + nc, cx:cx + nc]
                if (ks == 0).all():
                    uni = lambda a: (a[cy:cy + nc, cx:cx + nc]
                                     == a[cy, cx]).all()
                    if uni(fmvx) and uni(fmvy) and uni(fref) \
                            and uni(fdir) and uni(fmvx1) \
                            and uni(fmvy1) and uni(fref1):
                        wdir = int(fdir[cy, cx])
                        want = ((int(fmvx[cy, cx]), int(fmvy[cy, cx])),
                                (int(fmvx1[cy, cx]),
                                 int(fmvy1[cy, cx])))
                        wref = (int(fref[cy, cx]), int(fref1[cy, cx]))
                        cands = merge_candidates(mctx, x0, y0, size,
                                                 size, max_merge,
                                                 num_ref, is_b,
                                                 num_ref_l1)
                        for ci, c in enumerate(cands):
                            if c.inter_dir != wdir:
                                continue
                            if (wdir & 1) and (c.mv[0] != want[0]
                                               or c.ref_idx[0]
                                               != wref[0]):
                                continue
                            if (wdir & 2) and (c.mv[1] != want[1]
                                               or c.ref_idx[1]
                                               != wref[1]):
                                continue
                            depth8[cy:cy + nc, cx:cx + nc] = \
                                sps.log2_ctu_size - log2
                            mi[cy, cx] = ci
                            return
            if log2 > 3:
                half = size >> 1
                for dy, dx in ((0, 0), (0, half), (half, 0),
                               (half, half)):
                    if x0 + dx < w and y0 + dy < h:
                        collapse(x0 + dx, y0 + dy, log2 - 1)

        ctu_sz = sps.ctu_size
        for cty in range(0, h, ctu_sz):
            for ctxx in range(0, w, ctu_sz):
                collapse(ctxx, cty, sps.log2_ctu_size)

        def quadrant_clean(cy, cx):
            """A 32x32 quadrant (corner cell cy,cx) is representable as
            one 32x32 TB of a 64 CU: either it IS a committed 32x32 CU
            (its lev32 block is the TB) or it carries no coefficients
            at all (TB cbf 0)."""
            if cusz[cy, cx] == 2:
                return True
            for dy in range(4):
                for dx in range(4):
                    yy, xx = cy + dy, cx + dx
                    if cusz[yy, xx] == 0:
                        if levy[yy, xx].any() or levcb[yy, xx].any() \
                                or levcr[yy, xx].any():
                            return False
                    elif dy % 2 == 0 and dx % 2 == 0:   # 16-CU corner
                        gy, gx = yy // 2, xx // 2
                        if lev16y[gy, gx].any() \
                                or lev16cb[gy, gx].any() \
                                or lev16cr[gy, gx].any():
                            return False
            return True

        def collapse64_residual(x0, y0):
            """Re-signal a uniform-motion inter CTU as ONE 64x64 CU
            with four 32x32 TBs (transform_tree split inferred,
            7.3.8.8) — a pure entropy-level transform: the quadrant
            coefficients and the motion field are unchanged, so the
            reconstruction (and deblock) are untouched.  This is the
            depth-0 form of HM's large-CU economics
            (TEncCu.cpp:352 depth-0 xCompressCU) that the 3-level
            decision scan cannot reach."""
            if is_b or x0 + 64 > w or y0 + 64 > h:
                return
            cy, cx = y0 // 8, x0 // 8
            ks = kind[cy:cy + 8, cx:cx + 8]
            if (ks == 0).all() or (ks >= 3).any():
                return                    # all-skip handled above
            uni = lambda a: (a[cy:cy + 8, cx:cx + 8] == a[cy, cx]).all()
            if not (uni(fdir) and uni(fmvx) and uni(fmvy)
                    and uni(fref)) or fdir[cy, cx] != 1:
                return
            for qy in (0, 4):
                for qx in (0, 4):
                    if not quadrant_clean(cy + qy, cx + qx):
                        return
            mvq = (int(fmvx[cy, cx]), int(fmvy[cy, cx]))
            refq = int(fref[cy, cx])
            cands = merge_candidates(mctx, x0, y0, 64, 64, max_merge,
                                     num_ref, False, 0)
            sig = None
            for ci, c in enumerate(cands):
                if c.inter_dir == 1 and c.mv[0] == mvq \
                        and c.ref_idx[0] == refq:
                    sig = ("merge", ci)
                    break
            if sig is None:
                # AMVP fallback pays mvd bits; only profitable when
                # the children were paying them too
                if not (ks == 2).any():
                    return
                from hmtpu.common.motion import amvp_candidates
                amvp = amvp_candidates(mctx, x0, y0, 64, 64, 0, refq)
                bl = lambda v: abs(v).bit_length()
                costs = [2 * bl(mvq[0] - p[0]) + 2 * bl(mvq[1] - p[1])
                         for p in amvp]
                pi = 0 if costs[0] <= costs[1] else 1
                sig = ("amvp", pi, mvq[0] - amvp[pi][0],
                       mvq[1] - amvp[pi][1])
            # quadrants that are not committed 32x32 CUs carry no
            # coefficients (checked above) but their lev32 unpack is
            # another CU size's data — zero them so the writers read
            # true all-zero TBs
            for qy in (0, 4):
                for qx in (0, 4):
                    if cusz[cy + qy, cx + qx] != 2:
                        q = ((cy + qy) // 4, (cx + qx) // 4)
                        lev32y[q][:] = 0
                        lev32cb[q][:] = 0
                        lev32cr[q][:] = 0
            depth8[cy:cy + 8, cx:cx + 8] = sps.log2_ctu_size - 6
            cusz[cy:cy + 8, cx:cx + 8] = 3
            if sig[0] == "merge":
                kind[cy:cy + 8, cx:cx + 8] = 1
                mi[cy, cx] = sig[1]
                DBG_COUNTERS["cu64_merge"] += 1
            else:
                kind[cy:cy + 8, cx:cx + 8] = 2
                mvpi[cy, cx] = sig[1]
                mvdx[cy, cx] = sig[2]
                mvdy[cy, cx] = sig[3]
                DBG_COUNTERS["cu64_amvp"] += 1

        if sps.ctu_size == 64:
            for cty in range(0, h, 64):
                for ctxx in range(0, w, 64):
                    collapse64_residual(ctxx, cty)
        self._depth8 = depth8

        def b_kw(byi, bxi, k):
            """Extra PuDec fields for B slices: inter_pred_idc and the
            L1 motion/mvd (the writer gates each list on inter_dir)."""
            if not is_b:
                return {}
            d = int(fdir[byi, bxi])
            kw = dict(inter_dir=d)
            if d & 2:
                kw["mv_l1"] = (int(fmvx1[byi, bxi]),
                               int(fmvy1[byi, bxi]))
                kw["ref_idx_l1"] = int(fref1[byi, bxi])
                if k == 2:          # AMVP on list 1
                    kw["mvd_l1"] = (int(mvdx[byi, bxi]),
                                    int(mvdy[byi, bxi]))
                    kw["mvp_idx_l1"] = int(mvpi[byi, bxi])
            return kw

        decisions: dict[tuple, PuDec] = {}
        for byi in range(bh):
            for bxi in range(bw):
                k = int(kind[byi, bxi])
                key = (bxi * 8, byi * 8)
                if cusz[byi, bxi] == 3:
                    if byi % 8 or bxi % 8:
                        continue        # covered by the 64x64 CU
                    qyi, qxi = byi // 4, bxi // 4
                    ly64 = np.zeros((64, 64), np.int32)
                    lcb64 = np.zeros((32, 32), np.int32)
                    lcr64 = np.zeros((32, 32), np.int32)
                    for oy in (0, 1):
                        for ox in (0, 1):
                            ly64[oy * 32:oy * 32 + 32,
                                 ox * 32:ox * 32 + 32] = \
                                lev32y[qyi + oy, qxi + ox]
                            lcb64[oy * 16:oy * 16 + 16,
                                  ox * 16:ox * 16 + 16] = \
                                lev32cb[qyi + oy, qxi + ox]
                            lcr64[oy * 16:oy * 16 + 16,
                                  ox * 16:ox * 16 + 16] = \
                                lev32cr[qyi + oy, qxi + ox]
                    common = dict(
                        log2=6,
                        mv=(int(fmvx[byi, bxi]), int(fmvy[byi, bxi])),
                        ref_idx=int(fref[byi, bxi]),
                        lev_y=ly64, lev_cb=lcb64, lev_cr=lcr64)
                    if k == 1:
                        decisions[key] = PuDec(
                            "merge", merge_idx=int(mi[byi, bxi]),
                            **common)
                    else:
                        decisions[key] = PuDec(
                            "amvp",
                            mvd=(int(mvdx[byi, bxi]),
                                 int(mvdy[byi, bxi])),
                            mvp_idx=int(mvpi[byi, bxi]), **common)
                    continue
                if cusz[byi, bxi] == 2:
                    if byi % 4 or bxi % 4:
                        continue            # covered by the 32x32 CU
                    qyi, qxi = byi // 4, bxi // 4
                    common = dict(
                        log2=5,
                        mv=(int(fmvx[byi, bxi]), int(fmvy[byi, bxi])),
                        ref_idx=int(fref[byi, bxi]),
                        **b_kw(byi, bxi, k))
                    if k == 0:
                        decisions[key] = PuDec(
                            "skip", merge_idx=int(mi[byi, bxi]),
                            **common)
                    elif k == 1:
                        decisions[key] = PuDec(
                            "merge", merge_idx=int(mi[byi, bxi]),
                            lev_y=lev32y[qyi, qxi],
                            lev_cb=lev32cb[qyi, qxi],
                            lev_cr=lev32cr[qyi, qxi], **common)
                    else:
                        decisions[key] = PuDec(
                            "amvp",
                            mvd=(int(mvdx[byi, bxi]),
                                 int(mvdy[byi, bxi])),
                            mvp_idx=int(mvpi[byi, bxi]),
                            lev_y=lev32y[qyi, qxi],
                            lev_cb=lev32cb[qyi, qxi],
                            lev_cr=lev32cr[qyi, qxi], **common)
                    continue
                if cusz[byi, bxi]:
                    if byi % 2 or bxi % 2:
                        continue            # covered by the 16x16 CU
                    gyi, gxi = byi // 2, bxi // 2
                    if k == 0:
                        decisions[key] = PuDec(
                            "skip", log2=4, merge_idx=int(mi[byi, bxi]),
                            mv=(int(fmvx[byi, bxi]),
                                int(fmvy[byi, bxi])),
                            ref_idx=int(fref[byi, bxi]),
                            **b_kw(byi, bxi, k))
                    elif k == 1:
                        decisions[key] = PuDec(
                            "merge", log2=4,
                            merge_idx=int(mi[byi, bxi]),
                            mv=(int(fmvx[byi, bxi]),
                                int(fmvy[byi, bxi])),
                            ref_idx=int(fref[byi, bxi]),
                            lev_y=lev16y[gyi, gxi],
                            lev_cb=lev16cb[gyi, gxi],
                            lev_cr=lev16cr[gyi, gxi],
                            **b_kw(byi, bxi, k))
                    else:
                        decisions[key] = PuDec(
                            "amvp", log2=4,
                            mv=(int(fmvx[byi, bxi]),
                                int(fmvy[byi, bxi])),
                            mvd=(int(mvdx[byi, bxi]),
                                 int(mvdy[byi, bxi])),
                            mvp_idx=int(mvpi[byi, bxi]),
                            ref_idx=int(fref[byi, bxi]),
                            lev_y=lev16y[gyi, gxi],
                            lev_cb=lev16cb[gyi, gxi],
                            lev_cr=lev16cr[gyi, gxi],
                            **b_kw(byi, bxi, k))
                    continue
                if k == 0:
                    decisions[key] = PuDec(
                        "skip", merge_idx=int(mi[byi, bxi]),
                        mv=(int(fmvx[byi, bxi]), int(fmvy[byi, bxi])),
                        ref_idx=int(fref[byi, bxi]),
                        **b_kw(byi, bxi, k))
                elif k == 1:
                    decisions[key] = PuDec(
                        "merge", merge_idx=int(mi[byi, bxi]),
                        mv=(int(fmvx[byi, bxi]), int(fmvy[byi, bxi])),
                        ref_idx=int(fref[byi, bxi]),
                        lev_y=levy[byi, bxi], lev_cb=levcb[byi, bxi],
                        lev_cr=levcr[byi, bxi],
                        ts_cb=int(ts_cb[byi, bxi]),
                        ts_cr=int(ts_cr[byi, bxi]),
                        **b_kw(byi, bxi, k))
                elif k == 2:
                    decisions[key] = PuDec(
                        "amvp",
                        mv=(int(fmvx[byi, bxi]), int(fmvy[byi, bxi])),
                        mvd=(int(mvdx[byi, bxi]), int(mvdy[byi, bxi])),
                        mvp_idx=int(mvpi[byi, bxi]),
                        ref_idx=int(fref[byi, bxi]),
                        lev_y=levy[byi, bxi], lev_cb=levcb[byi, bxi],
                        lev_cr=levcr[byi, bxi],
                        ts_cb=int(ts_cb[byi, bxi]),
                        ts_cr=int(ts_cr[byi, bxi]),
                        **b_kw(byi, bxi, k))
                else:
                    decisions[key] = PuDec(
                        "intra", intra_mode=int(imode[byi, bxi]),
                        lev_y=levy[byi, bxi], lev_cb=levcb[byi, bxi],
                        lev_cr=levcr[byi, bxi],
                        ts_cb=int(ts_cb[byi, bxi]),
                        ts_cr=int(ts_cr[byi, bxi]))

        modes = np.where(kind == 3, imode, -1).astype(np.int32)
        skip_map = (kind == 0).astype(np.int32)
        intra_map = (kind == 3).astype(np.int32)
        recon = Frame(rec_y, rec_u, rec_v, bd)
        recon.dev = ctx["dev"]        # device-resident DPB planes
        # host copy of this frame's motion for the NEXT frame's host
        # passes (collapse + decoder-parity candidate derivation)
        recon.col_np = dict(
            mvx=fmvx, mvy=fmvy, ok=(fdir & 1) > 0,
            refpoc=np.asarray(ctx["ref_pocs"], np.int32)[
                np.clip(fref, 0, ctx["num_ref"] - 1)],
            poc=ctx["poc"])
        # the native whole-slice walk speaks P syntax only so far; B
        # slices fall back to the Python writer in _entropy_pass
        self._nat = None if is_b else dict(
            kind=kind, mi=mi, mvdx=mvdx, mvdy=mvdy,
            mvpi=mvpi, refi=fref, imode=imode, levy=levy,
            levcb=levcb, levcr=levcr, lev16y=lev16y,
            lev16cb=lev16cb, lev16cr=lev16cr,
            lev32y=lev32y, lev32cb=lev32cb,
            lev32cr=lev32cr, tsf=tsf)
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

        from hmtpu.entropy import cabac as _cabac
        nat = getattr(self, "_nat", None)
        if _cabac.TRACE is not None:
            nat = None          # symbol trace rides the Python walk

        if isinstance(sao, tuple) and len(sao) == 2 \
                and sao[0] == "packed":
            from hmtpu import native
            if nat is None or not native.available():
                from hmtpu.ops.sao import grid_from_packed
                ny = self.sps.pic_height_in_ctus
                nx = self.sps.pic_width_in_ctus
                sao = (grid_from_packed(sao[1].reshape(ny, nx, 3, 7)),
                       True, True)

        if nat is not None:
            sps = self.sps
            sao_packed, sl, sc = None, 0, 0
            if isinstance(sao, tuple) and sao[0] == "packed":
                sao_packed, sl, sc = sao[1], 1, 1
            elif sao is not None:
                grid, sl, sc = sao
                sao_packed = pack_sao_grid(grid, sps.pic_width_in_ctus,
                                           sps.pic_height_in_ctus)
            wpp = int(self.pps.entropy_coding_sync_enabled)
            geom = dict(w=sps.pic_width, h=sps.pic_height,
                        ctu=sps.ctu_size,
                        max_merge=sh.max_num_merge_cand,
                        num_ref=sh.num_ref_idx_l0,
                        sdh=int(self.pps.sign_data_hiding),
                        sao_luma=int(sl), sao_chroma=int(sc), bd=self.bd,
                        wpp=wpp,
                        ts=int(self.pps.transform_skip_enabled))
            ctx = make_contexts(sh.slice_type, qp)
            res = encode_pslice_native(
                ctx, geom, nat["kind"], nat["mi"], nat["mvdx"],
                nat["mvdy"], nat["mvpi"], nat["refi"], nat["imode"],
                nat["levy"], nat["levcb"], nat["levcr"],
                nat["lev16y"], nat["lev16cb"], nat["lev16cr"],
                nat["lev32y"], nat["lev32cb"], nat["lev32cr"],
                self._depth8, sao_packed, tsf=nat.get("tsf"))
            if res is not None:
                rbsp, bounds = res
                if wpp:
                    from hmtpu.entropy.recorder import \
                        entry_point_sizes
                    sh.entry_point_offsets = entry_point_sizes(rbsp,
                                                               bounds)
                # the native engine adapts ctx in place: harvest the
                # post-frame states to price the NEXT frame's RDO
                self.final_ctx = ctx
                return rbsp
        return super()._entropy_pass(qp, modes, skip_map, intra_map,
                                     decisions, sh, sao=sao,
                                     depth8=getattr(self, "_depth8",
                                                    None))

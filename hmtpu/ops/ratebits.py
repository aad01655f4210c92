"""Device-side CABAC-aware rate estimation for the RDO decision pass.

The wavefront kernels need the *price in bits* of every candidate's
syntax without running the serial CABAC engine.  HM solves this with a
fractional-bit counter twin of the arithmetic coder
(TEncBinCoderCABACCounter.cpp:69-144, enabled by FAST_BIT_EST); the
TPU-shaped equivalent built here:

  * `tb_bits`  — batched, exact-bin-identity reproduction of the
    residual_coding() syntax (7.3.8.11, TEncSbac::codeCoeffNxN
    TEncSbac.cpp:1181): last-position prefix, coded_sub_block_flag,
    sig_coeff_flag with the full 9.3.4.2.5 context derivation,
    greater1/greater2 with the c1/ctx-set state machine, sign bits
    (with SDH), and Golomb-Rice remainders with in-group Rice
    adaptation.  Every context-coded bin is priced by a gather from a
    flat (NUM_CTX*2,) fractional-bit table (entropy/fracbits.py) built
    from real (harvested) context states, so the estimate tracks the
    adaptive coder to within its probability drift.

  * small helpers pricing the inter/intra CU mode syntax (skip flag,
    merge flag/index, pred mode, part size, ref idx, MVD, MVP index,
    cbf / rqt_root_cbf) the same way.

All functions are shape-static and batched over a leading axis, so
they fuse into the wavefront scan.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from hmtpu.common.scan import SCAN_VER, cg_scan_order, scan_order
from hmtpu.entropy.contexts import OFF
from hmtpu.entropy.residual import (
    _group_idx,
    _last_ctx_params,
    _min_in_group,
    _sig_ctx_full,
)

_C1FLAG_NUMBER = 8


# ---------------------------------------------------------------------------
# static tables per (log2, scan_idx, is_luma)

@lru_cache(maxsize=None)
def _tb_tables(log2: int, scan_idx: int, is_luma: bool):
    size = 1 << log2
    npos = size * size
    cg_w = max(size >> 2, 1)
    ncg = cg_w * cg_w
    scans = scan_order(log2, scan_idx).reshape(-1)     # scan pos -> raster
    cgo = cg_scan_order(log2, scan_idx)                # cg scan -> cg raster
    cg_scan_of_raster = np.empty(ncg, np.int32)
    cg_scan_of_raster[cgo] = np.arange(ncg)

    # scan index of the raster-right / raster-below CG (ncg = padding)
    right = np.full(ncg, ncg, np.int32)
    below = np.full(ncg, ncg, np.int32)
    for ci in range(ncg):
        r = int(cgo[ci])
        x, y = r % cg_w, r // cg_w
        if x + 1 < cg_w:
            right[ci] = cg_scan_of_raster[r + 1]
        if y + 1 < cg_w:
            below[ci] = cg_scan_of_raster[r + cg_w]

    # sig_coeff_flag context per (patt, scan position)
    sig_tab = np.zeros((4, npos), np.int32)
    for patt in range(4):
        for sp in range(npos):
            sig_tab[patt, sp] = _sig_ctx_full(
                patt, int(scans[sp]), size, log2, scan_idx, is_luma)

    # last-position prefix: per coordinate value, counts over the 15
    # local LAST contexts split by bin value, plus the EP suffix length
    goff, gshift = _last_ctx_params(log2, is_luma)
    cmax = (log2 << 1) - 1
    w_cnt = np.zeros((size, 15, 2), np.float32)
    ep_cnt = np.zeros(size, np.float32)
    for c in range(size):
        g = _group_idx(c)
        for b in range(g):
            w_cnt[c, goff + (b >> gshift), 1] += 1
        if g < cmax:
            w_cnt[c, goff + (g >> gshift), 0] += 1
        if g > 3:
            ep_cnt[c] = (g >> 1) - 1

    # last coordinate per scan position (after the VER swap)
    lx = scans % size
    ly = scans // size
    if scan_idx == SCAN_VER:
        lx, ly = ly, lx

    # NB: plain numpy (not device arrays) — this cache is shared across
    # jit traces, so entries must be trace-free constants
    return dict(
        size=size, npos=npos, ncg=ncg,
        scans=scans,
        right=right, below=below,
        sig_tab=sig_tab,
        w_cnt=w_cnt, ep_cnt=ep_cnt,
        last_x=lx.astype(np.int32),
        last_y=ly.astype(np.int32),
        ctx_x=OFF["LAST_X" if is_luma else "LAST_X_C"],
        ctx_y=OFF["LAST_Y" if is_luma else "LAST_Y_C"],
        sig_cg_base=OFF["SIG_CG_FLAG"] + (0 if is_luma else 2),
        one_base=OFF["ONE_FLAG"] + (0 if is_luma else 16),
        abs_base=OFF["ABS_FLAG"] + (0 if is_luma else 4),
    )


def _floor_log2(x):
    """floor(log2(x)) for x >= 1 (int32)."""
    return 31 - jax.lax.clz(jnp.maximum(x, 1).astype(jnp.int32))


def prev_processed_flag(proc, flags):
    """flags[j*] per CG where j* is the NEAREST index j > i with
    proc[j] (False when none) — the vectorised form of the
    descending-ci carry loop: the coder processes CGs last-to-first,
    so "previously processed CG" means the next higher coded index.
    An unrolled per-CG loop costs ~3 ops x ncg (192 HLO ops per
    32x32 TB); this suffix-min form costs ~8 total."""
    ncg = proc.shape[-1]
    idxs = jnp.arange(ncg)
    cand = jnp.where(proc, idxs, ncg)
    suf = jnp.flip(jax.lax.cummin(jnp.flip(cand, -1),
                                  axis=cand.ndim - 1), -1)
    nxt = jnp.concatenate(
        [suf[..., 1:], jnp.full(suf.shape[:-1] + (1,), ncg)], axis=-1)
    has = nxt < ncg
    g = jnp.take_along_axis(flags, jnp.minimum(nxt, ncg - 1), axis=-1)
    return has & g


def _remainder_ep_bits(sym, rice):
    """EP bit count of xWriteCoefRemainExGolomb(sym, rice)."""
    small = sym < (3 << rice)
    b_small = (sym >> rice) + 1 + rice
    t = sym - (3 << rice)
    ln = _floor_log2(t + (1 << rice))
    b_big = 4 + 2 * ln - rice
    return jnp.where(small, b_small, b_big).astype(jnp.float32)


def ep_eg1_bits(u):
    """EP bit count of k=1 exp-Golomb (MVD remainder binarisation)."""
    pre = _floor_log2((u >> 1) + 1)
    return (2 * pre + 2).astype(jnp.float32)


# ---------------------------------------------------------------------------
# the TB estimator

def tb_bits(lev, cbflat, log2: int, is_luma: bool,
            scan_idx: int = 0, sdh: bool = False):
    """Fractional-bit cost of residual_coding() for a batch of TBs.

    lev: (..., size, size) int32 raster levels; cbflat: (NUM_CTX*2,)
    float32 with cbflat[2*ctx+v] = bits of coding v in ctx.  Returns
    (...,) float32; 0.0 for all-zero TBs (the caller prices cbf).
    """
    t = _tb_tables(log2, scan_idx, is_luma)
    npos, ncg = t["npos"], t["ncg"]
    lead = lev.shape[:-2]
    flat = lev.reshape(lead + (npos,))
    sl = jnp.take(flat, t["scans"], axis=-1)           # scan-ordered
    a = jnp.abs(sl)
    sig = a > 0

    pos_idx = jnp.arange(npos)
    last_pos = jnp.max(jnp.where(sig, pos_idx, -1), axis=-1)   # (...,)
    any_sig = last_pos >= 0
    last_cg = last_pos >> 4

    acg = a.reshape(lead + (ncg, 16))
    scg = acg > 0
    cg_sig = jnp.any(scg, axis=-1)                     # (..., ncg)
    ci_idx = jnp.arange(ncg)

    def gcb(ctx_idx, val):
        """Gather bits for (ctx index array, bin value array)."""
        return cbflat[ctx_idx * 2 + val.astype(jnp.int32)]

    # ---- last-position prefix
    lx = jnp.asarray(t["last_x"])[jnp.maximum(last_pos, 0)]
    ly = jnp.asarray(t["last_y"])[jnp.maximum(last_pos, 0)]
    cb_x = jax.lax.dynamic_slice_in_dim(cbflat, t["ctx_x"] * 2, 30) \
        .reshape(15, 2)
    cb_y = jax.lax.dynamic_slice_in_dim(cbflat, t["ctx_y"] * 2, 30) \
        .reshape(15, 2)
    w_cnt = jnp.asarray(t["w_cnt"])
    ep_cnt = jnp.asarray(t["ep_cnt"])
    wx = w_cnt[lx]                                     # (..., 15, 2)
    wy = w_cnt[ly]
    bits = jnp.sum(wx * cb_x, axis=(-1, -2)) \
        + jnp.sum(wy * cb_y, axis=(-1, -2)) \
        + ep_cnt[lx] + ep_cnt[ly]

    # ---- coded_sub_block_flag (CGs strictly between 0 and last)
    pad = jnp.zeros(lead + (1,), bool)
    cg_sig_p = jnp.concatenate([cg_sig, pad], axis=-1)
    r_sig = jnp.take(cg_sig_p, t["right"], axis=-1)
    b_sig = jnp.take(cg_sig_p, t["below"], axis=-1)
    csbf_ctx = t["sig_cg_base"] + (r_sig | b_sig).astype(jnp.int32)
    csbf_mask = (ci_idx > 0) & (ci_idx < last_cg[..., None])
    bits = bits + jnp.sum(
        jnp.where(csbf_mask, gcb(csbf_ctx, cg_sig), 0.0), axis=-1)

    # ---- sig_coeff_flag
    cg_coded = cg_sig | (ci_idx == 0)
    patt = r_sig.astype(jnp.int32) + 2 * b_sig.astype(jnp.int32)
    sig_ctx = jnp.asarray(t["sig_tab"])[
        patt.repeat(16, axis=-1).reshape(lead + (npos,)), pos_idx]
    # DC bin inferred when an explicitly-coded CG has its only
    # significance at position 0
    rest_zero = ~jnp.any(scg[..., 1:], axis=-1)        # (..., ncg)
    dc_skip_cg = (ci_idx > 0) & (ci_idx < last_cg[..., None]) \
        & cg_sig & rest_zero
    in_cg = pos_idx >> 4
    p_in = pos_idx & 15
    sig_mask = (pos_idx < last_pos[..., None]) \
        & jnp.take(cg_coded, in_cg, axis=-1) \
        & ~((p_in == 0) & jnp.take(dc_skip_cg, in_cg, axis=-1))
    bits = bits + jnp.sum(
        jnp.where(sig_mask, gcb(sig_ctx, sig), 0.0), axis=-1)

    # ---- ranks within CG (descending scan order)
    rank = jnp.flip(jnp.cumsum(jnp.flip(scg, -1), axis=-1), -1) - \
        scg.astype(jnp.int32)                          # exclusive suffix sum

    # greater1: c1 state machine
    g1 = acg > 1
    sig_grp = scg & (rank < _C1FLAG_NUMBER)
    g1c = g1 & sig_grp
    anyprev_g1 = (jnp.flip(jnp.cumsum(jnp.flip(
        g1c.astype(jnp.int32), -1), axis=-1), -1)
        - g1c.astype(jnp.int32)) > 0                   # excl suffix any
    c1 = jnp.where(anyprev_g1, 0, jnp.minimum(1 + rank, 3))
    g1any = jnp.any(g1c, axis=-1)                      # (..., ncg)

    # ctx_set: +2 for non-DC luma CG, +1 if the previously *processed
    # coded* CG ended with c1 == 0 (had a greater1)
    proc = cg_coded & (ci_idx <= last_cg[..., None])
    ctx_set = prev_processed_flag(proc, g1any).astype(jnp.int32)
    if is_luma:
        ctx_set = ctx_set + jnp.where(ci_idx > 0, 2, 0)

    one_ctx = t["one_base"] + ctx_set[..., None] * 4 + c1
    bits = bits + jnp.sum(
        jnp.where(sig_grp, gcb(one_ctx, g1), 0.0), axis=(-1, -2))

    # greater2: one bin per CG with a coded greater1
    minrank = jnp.min(jnp.where(g1c, rank, 99), axis=-1)
    g2val = jnp.any(g1c & (acg > 2) & (rank == minrank[..., None]),
                    axis=-1)
    abs_ctx = t["abs_base"] + ctx_set
    bits = bits + jnp.sum(
        jnp.where(g1any, gcb(abs_ctx, g2val), 0.0), axis=-1)

    # ---- signs (EP, minus one when hidden)
    n_cg = jnp.sum(scg, axis=-1)                       # (..., ncg)
    maxp = jnp.max(jnp.where(scg, jnp.arange(16), -1), axis=-1)
    minp = jnp.min(jnp.where(scg, jnp.arange(16), 99), axis=-1)
    hide = jnp.zeros(lead + (ncg,), bool)
    if sdh:
        hide = (maxp - minp) > 3
    bits = bits + jnp.sum(
        jnp.where(n_cg > 0, n_cg - hide.astype(jnp.int32), 0),
        axis=-1).astype(jnp.float32)

    # ---- remainders: escape base, then 16-step Rice adaptation
    anyprev_ge2 = (jnp.flip(jnp.cumsum(jnp.flip(
        (scg & (acg >= 2)).astype(jnp.int32), -1), axis=-1), -1)
        - (scg & (acg >= 2)).astype(jnp.int32)) > 0
    base = jnp.where(rank < _C1FLAG_NUMBER,
                     jnp.where(anyprev_ge2, 2, 3), 1)
    coded_rem = scg & (a.reshape(lead + (ncg, 16)) >= base)
    sym = jnp.maximum(acg - base, 0)

    rice = jnp.zeros(lead + (ncg,), jnp.int32)
    rice_at = []
    for p in range(15, -1, -1):
        rice_at.append(rice)
        c = coded_rem[..., p]
        bump = c & (acg[..., p] > (3 << rice))
        rice = jnp.where(bump, jnp.minimum(rice + 1, 4), rice)
    rice_pos = jnp.stack(rice_at[::-1], axis=-1)       # (..., ncg, 16)
    bits = bits + jnp.sum(
        jnp.where(coded_rem, _remainder_ep_bits(sym, rice_pos), 0.0),
        axis=(-1, -2))

    return jnp.where(any_sig, bits, 0.0)


# ---------------------------------------------------------------------------
# CU mode-syntax pricing (P-slice envelope of the native slice writer)

def _g(cbflat, ctx, val):
    return cbflat[2 * ctx + val.astype(jnp.int32)]


def _gc(cbflat, ctx: int, val):
    return cbflat[2 * ctx + val.astype(jnp.int32)]


def ts_flag_bits(cbflat, val, is_luma: bool):
    """transform_skip_flag (7.3.8.11; one ctx luma, one chroma)."""
    return _gc(cbflat, OFF["TRANSFORMSKIP_FLAG"]
               + (0 if is_luma else 1), val)


def skip_flag_bits(cbflat, val, ctx_inc):
    """cu_skip_flag; ctx_inc = left_skip + above_skip (9.3.4.2.2)."""
    return _g(cbflat, OFF["SKIP_FLAG"] + ctx_inc, val)


def split_flag_bits(cbflat, val, depth_ctx):
    return _g(cbflat, OFF["SPLIT_FLAG"] + depth_ctx, val)


def merge_idx_bits(cbflat, mi, max_merge: int):
    """merge_idx truncated unary: first bin ctx, rest EP."""
    b = _gc(cbflat, OFF["MERGE_IDX"], mi > 0)
    if max_merge > 1:
        ep = jnp.where(mi > 0,
                       (mi - 1) + (mi < max_merge - 1).astype(jnp.int32),
                       0).astype(jnp.float32)
        b = b + ep
    return b


def merge_flag_bits(cbflat, val):
    return _gc(cbflat, OFF["MERGE_FLAG"], val)


def pred_mode_bits(cbflat, is_intra):
    return _gc(cbflat, OFF["PRED_MODE"], is_intra)


def part_size_2nx2n_bits(cbflat):
    return cbflat[2 * OFF["PART_SIZE"] + 1]


def part_size_nxn_bits(cbflat):
    """part_mode = NxN at the minimum CU size (bin 0 on the same ctx)."""
    return cbflat[2 * OFF["PART_SIZE"] + 0]


def mvp_idx_bits(cbflat, idx):
    return _gc(cbflat, OFF["MVP_IDX"], idx)


def rqt_root_cbf_bits(cbflat, val):
    return _gc(cbflat, OFF["QT_ROOT_CBF"], val)


def cbf_luma_bits(cbflat, val, trafo_depth_is0=True):
    return _g(cbflat, OFF["QT_CBF_LUMA"] + (1 if trafo_depth_is0 else 0),
              val)


def cbf_chroma_bits(cbflat, val, trafo_depth=0):
    return _g(cbflat, OFF["QT_CBF_CHROMA"] + trafo_depth, val)


def chroma_dm_bits(cbflat):
    """intra_chroma_pred_mode = DM (single 0 ctx bin)."""
    return cbflat[2 * OFF["CHROMA_PRED_MODE"] + 0]


def intra_mode_mpm_bits(cbflat, mode, lm, am):
    """prev_intra_luma_pred_flag + mpm_idx / rem_intra_luma_pred_mode
    pricing with the 8.4.2 candidate list from neighbour modes."""
    eq = lm == am
    lt2 = lm < 2
    m0 = jnp.where(eq & lt2, 0, lm)
    m1 = jnp.where(eq, jnp.where(lt2, 1, 2 + ((lm + 29) % 32)), am)
    m2_eq = jnp.where(lt2, 26, 2 + ((lm - 1) % 32))
    m2_ne = jnp.where((lm != 0) & (am != 0), 0,
                      jnp.where((lm != 1) & (am != 1), 1, 26))
    m2 = jnp.where(eq, m2_eq, m2_ne)
    in0, in1, in2 = mode == m0, mode == m1, mode == m2
    inmpm = in0 | in1 | in2
    idx_gt0 = ~in0
    b_in = _gc(cbflat, OFF["INTRA_PRED_MODE"],
               jnp.ones_like(mode)) + 1.0 + idx_gt0.astype(jnp.float32)
    b_out = _gc(cbflat, OFF["INTRA_PRED_MODE"],
                jnp.zeros_like(mode)) + 5.0
    return jnp.where(inmpm, b_in, b_out)


def ref_idx_bits(cbflat, r, num_ref: int, n_active=None):
    """ref_idx_l0 truncated unary, cMax=num_ref-1; two ctx bins + EP.

    n_active (traced scalar, optional): the real active-ref count when
    the static num_ref is a padded upper bound (the P-slice ref-stack
    padding) — the writer/decoder code with cMax = n_active-1, so the
    pricing must follow it."""
    if num_ref <= 1:
        return jnp.zeros(jnp.shape(r), jnp.float32)
    if n_active is None:
        cmax = num_ref - 1
        b = _gc(cbflat, OFF["REF_PIC"], r > 0)
        if cmax >= 2:
            b = b + jnp.where(r > 0,
                              _gc(cbflat, OFF["REF_PIC"] + 1, r > 1),
                              0.0)
            # bins 2.. are EP: one per step, terminator unless at cMax
            ep = jnp.maximum(jnp.minimum(r, cmax) - 2, 0) \
                + ((r >= 2) & (r < cmax)).astype(jnp.int32)
            b = b + ep.astype(jnp.float32)
        return b
    cmax = jnp.maximum(n_active - 1, 0)
    b = jnp.where(cmax >= 1, _gc(cbflat, OFF["REF_PIC"], r > 0), 0.0)
    b = b + jnp.where((r > 0) & (cmax >= 2),
                      _gc(cbflat, OFF["REF_PIC"] + 1, r > 1), 0.0)
    ep = jnp.maximum(jnp.minimum(r, cmax) - 2, 0) \
        + ((r >= 2) & (r < cmax)).astype(jnp.int32)
    return b + jnp.where(cmax >= 2, ep.astype(jnp.float32), 0.0)


def inter_dir_bits(cbflat, inter_dir, depth: int):
    """inter_pred_idc (9.3.3.7): bin0 ctx = CtDepth, bin1 ctx 4 when
    not BI (the 2Nx2N form — the 12-sample single-bin case never
    occurs here)."""
    bi = inter_dir == 3
    b = _g(cbflat, OFF["INTER_DIR"] + depth, bi)
    return b + jnp.where(
        bi, 0.0, _gc(cbflat, OFF["INTER_DIR"] + 4, inter_dir == 2))


def mvd_bits(cbflat, mvdx, mvdy):
    """Both components of mvd_coding (7.3.8.9): two ctx bins, EG1
    remainder, EP sign."""
    total = jnp.zeros(jnp.shape(mvdx), jnp.float32)
    for v in (mvdx, mvdy):
        av = jnp.abs(v)
        total = total + _gc(cbflat, OFF["MVD"], av > 0)
        total = total + jnp.where(
            av > 0, _gc(cbflat, OFF["MVD"] + 1, av > 1), 0.0)
        total = total + jnp.where(av > 1, ep_eg1_bits(av - 2), 0.0)
        total = total + (av > 0).astype(jnp.float32)    # sign
    return total

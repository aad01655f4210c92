"""Rate-distortion optimized quantization, batched (capability parity
with TComTrQuant::xRateDistOptQuant, TComTrQuant.cpp:2129-2450).

HM's RDOQ is a per-coefficient trellis walked in scan order with three
coupled decisions; this is the tensorised equivalent, organised as
three vectorised stages over (batch, nCG, 16) tensors:

  1. per-coefficient level choice over {maxAbs, maxAbs-1, 0} with
     CABAC-priced level rates (sig flag, greater1/2, Golomb-Rice
     remainder with the in-group Rice adaptation estimated on the
     rounded levels) against exact coefficient-domain distortion
     (the error scale collapses to 2^-2*(15-bd-log2) of pixel SSE);
  2. coefficient-group zeroing against the coded_sub_block_flag rate
     (TComTrQuant.cpp:2404 d64BaseCost accounting);
  3. last-position optimisation: prefix/suffix cost scan choosing the
     best last significant coefficient, including the all-zero block
     (TComTrQuant.cpp:2457 ciBestLastIdxP1 loop).

Context identities (sig ctx table, ctx-set, CSBF neighbour flags) are
derived from the rounded-level significance map — the batched stand-in
for HM's progressive derivation, which tracks it closely because stage
1 rarely changes significance of the large coefficients that drive the
patterns.  Sign-data-hiding parity is enforced by a final cheapest-
adjustment pass (the xQuant SDH branch, TComTrQuant.cpp:1015).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hmtpu.ops.quant import (
    COEFF_MAX,
    QUANT_SHIFT,
    _QUANT_SCALES,
    transform_shift,
)
from hmtpu.ops.ratebits import _remainder_ep_bits, _tb_tables, tb_bits

_C1FLAG = 8


def rdoq_tb(coef, qp, log2: int, bd: int, lam, cbflat, is_luma: bool,
            scan_idx: int = 0, sdh: bool = False, scan_sel=None,
            trellis: bool = True):
    """coef: (..., n, n) int32 transform coefficients; returns levels
    (..., n, n) int32.  qp/lam may be traced scalars.

    scan_sel: optional (...,) int32 per-TB coding-scan id (0 diag /
    1 hor / 2 ver) when the real scan is data-dependent (mode-
    dependent intra scans, 7.4.9.11).  Only the SDH parity stage needs
    the true scan — CG membership is the same 4x4 sub-blocks for all
    three scans, so rate estimation on `scan_idx` stays a valid
    approximation while first/last-significant ranks must follow the
    coding scan for the decoder's sign inference to match.

    trellis=False skips the RD level search (stages 1-3 + exact-rate
    guard) and emits plain deadzone quantisation — the RDOQ=0 config
    path (TComTrQuant::xQuant non-RDOQ branch) — while still running
    the SDH parity stage so sign hiding stays decodable."""
    t = _tb_tables(log2, scan_idx, is_luma)
    npos, ncg = t["npos"], t["ncg"]
    lead = coef.shape[:-2]
    scans = jnp.asarray(t["scans"])
    sc = jnp.take(coef.reshape(lead + (npos,)), scans, axis=-1)
    g = lead + (ncg, 16)
    sgn = jnp.sign(sc).reshape(g)
    a = jnp.abs(sc).reshape(g)

    # ---- quant scaling (integer path of xQuant, round-half start)
    qpp = qp + 6 * (bd - 8)
    per, rem = qpp // 6, qpp % 6
    qbits = QUANT_SHIFT + per + transform_shift(log2, bd)
    scale = jnp.asarray(_QUANT_SCALES, jnp.int32)[rem]
    maxabs = jnp.minimum((a * scale + (1 << (qbits - 1))) >> qbits,
                         COEFF_MAX).astype(jnp.int32)

    # distortion of coding |level| l: (a - l*2^qbits/scale)^2 scaled to
    # pixel SSE by 2^-2*(15-bd-log2)
    inv = jnp.exp2(qbits.astype(jnp.float32)) / scale.astype(jnp.float32)
    cscale = np.float32(2.0 ** (-2 * (15 - bd - log2)))
    af = a.astype(jnp.float32)

    def dist(l):
        d = af - l.astype(jnp.float32) * inv
        return d * d * cscale

    inv_scan = np.empty(npos, np.int64)
    inv_scan[np.asarray(t["scans"])] = np.arange(npos)
    inv_scan = jnp.asarray(inv_scan)
    size = 1 << log2

    def to_raster(l):
        s = (l.reshape(lead + (npos,))
             * jnp.where(sgn.reshape(lead + (npos,)) < 0, -1, 1))
        return jnp.take(s, inv_scan, axis=-1).reshape(
            lead + (size, size)).astype(jnp.int32)

    def sdh_stage(lev):
        """Sign data hiding parity (xQuant SDH branch): cheapest ±1
        adjustment whenever the hidden-sign parity is violated."""
        if scan_sel is None:
            ranks = jnp.arange(16)
        else:
            from hmtpu.common.scan import _SCANS
            base = _SCANS[scan_idx](4, 4)
            ptab = np.empty((3, 16), np.int32)
            for s in range(3):
                rk = {p: i for i, p in enumerate(_SCANS[s](4, 4))}
                ptab[s] = [rk[p] for p in base]
            # within-CG rank under the coding scan of the coefficient
            # at static-scan rank j; broadcast over CGs
            ranks = jnp.asarray(ptab)[scan_sel][..., None, :]
        nz = lev != 0
        maxp = jnp.max(jnp.where(nz, ranks, -1), axis=-1)
        minp = jnp.min(jnp.where(nz, ranks, 99), axis=-1)
        hide = (maxp - minp) > 3
        first_mask = nz & (ranks == minp[..., None])
        first_neg = jnp.sum(
            jnp.where(first_mask, (sgn < 0).astype(jnp.int32), 0),
            axis=-1)
        asum = jnp.sum(lev, axis=-1)
        bad = hide & ((asum & 1) != first_neg)
        d_now = dist(lev)
        d_inc = dist(lev + 1) - d_now
        d_dec = jnp.where(lev > 1, dist(lev - 1) - d_now, jnp.inf)
        in_span = (ranks >= minp[..., None]) \
            & (ranks <= maxp[..., None])
        d_inc = jnp.where(in_span & (lev < COEFF_MAX), d_inc, jnp.inf)
        d_dec = jnp.where(in_span, d_dec, jnp.inf)
        dd = jnp.minimum(d_inc, d_dec)
        pick = jnp.argmin(dd, axis=-1)
        use_inc = jnp.take_along_axis(
            d_inc, pick[..., None], -1)[..., 0] <= jnp.take_along_axis(
            d_dec, pick[..., None], -1)[..., 0]
        delta = jnp.where(use_inc, 1, -1)
        onehot = jax.nn.one_hot(pick, 16, dtype=jnp.int32)
        return lev + onehot * (delta * bad.astype(jnp.int32))[..., None]

    add_dz = jnp.int32(85) << (qbits - 9)
    fb = jnp.minimum((a * scale + add_dz) >> qbits,
                     COEFF_MAX).astype(jnp.int32)
    if not trellis:
        lev = sdh_stage(fb) if sdh else fb
        return to_raster(lev).reshape(coef.shape)

    scg = maxabs > 0
    cg_sig = jnp.any(scg, axis=-1)
    ci_idx = jnp.arange(ncg)
    pos_idx = jnp.arange(npos)

    def gcb(ctx_idx, val):
        return cbflat[ctx_idx * 2 + val.astype(jnp.int32)]

    # ---- context identities from the rounded significance map
    pad = jnp.zeros(lead + (1,), bool)
    cg_sig_p = jnp.concatenate([cg_sig, pad], axis=-1)
    r_sig = jnp.take(cg_sig_p, jnp.asarray(t["right"]), axis=-1)
    b_sig = jnp.take(cg_sig_p, jnp.asarray(t["below"]), axis=-1)
    patt = r_sig.astype(jnp.int32) + 2 * b_sig.astype(jnp.int32)
    sig_ctx = jnp.asarray(t["sig_tab"])[
        patt.repeat(16, axis=-1).reshape(lead + (npos,)),
        pos_idx].reshape(g)
    sig_b0 = gcb(sig_ctx, jnp.zeros_like(sig_ctx))
    sig_b1 = gcb(sig_ctx, jnp.ones_like(sig_ctx))

    # rank among rounded-sig coeffs (descending scan within CG)
    rank = jnp.flip(jnp.cumsum(jnp.flip(scg, -1), axis=-1), -1) \
        - scg.astype(jnp.int32)
    from hmtpu.ops.ratebits import prev_processed_flag
    g1c = (maxabs > 1) & scg & (rank < _C1FLAG)
    g1any = jnp.any(g1c, axis=-1)
    proc = cg_sig | (ci_idx == 0)
    proc = proc | jnp.zeros(lead + (ncg,), bool)       # broadcast lead
    ctx_set = prev_processed_flag(proc, g1any).astype(jnp.int32)
    if is_luma:
        ctx_set = ctx_set + jnp.where(ci_idx > 0, 2, 0)
    # c1 from the rounded-level g1 pattern (the ratebits state machine
    # evaluated on maxAbs as proxy for the final levels)
    anyprev_g1 = (jnp.flip(jnp.cumsum(jnp.flip(
        g1c.astype(jnp.int32), -1), axis=-1), -1)
        - g1c.astype(jnp.int32)) > 0
    c1 = jnp.where(anyprev_g1, 0, jnp.minimum(1 + rank, 3))
    one_ctx = t["one_base"] + ctx_set[..., None] * 4 + c1
    abs_ctx = (t["abs_base"] + ctx_set)[..., None].repeat(16, -1)

    # escape base + Rice estimate per position (16-step adaptation on
    # the rounded levels, mirroring the coder's in-group rule)
    minr = jnp.min(jnp.where((maxabs >= 2) & scg, rank, 99), axis=-1)
    has_g2 = rank == minr[..., None]
    base = jnp.where(rank < _C1FLAG, jnp.where(has_g2, 3, 2), 1)
    rice = jnp.zeros(lead + (ncg,), jnp.int32)
    rice_at = []
    for p in range(15, -1, -1):
        rice_at.append(rice)
        c = scg[..., p] & (maxabs[..., p] >= base[..., p])
        bump = c & (maxabs[..., p] > (3 << rice))
        rice = jnp.where(bump, jnp.minimum(rice + 1, 4), rice)
    rice_pos = jnp.stack(rice_at[::-1], axis=-1)        # (..., ncg, 16)

    def level_rate(l):
        """Bits of coding |level|=l (>0), excluding the sig flag."""
        g1 = l > 1
        r = jnp.where(rank < _C1FLAG, gcb(one_ctx, g1), 0.0)
        r = r + jnp.where(has_g2 & g1 & (rank < _C1FLAG),
                          gcb(abs_ctx, l > 2), 0.0)
        esc = l >= base
        sym = jnp.maximum(l - base, 0)
        r = r + jnp.where(esc, _remainder_ep_bits(sym, rice_pos), 0.0)
        return r + 1.0                                   # sign EP

    # ---- stage 1: level choice
    d0 = dist(jnp.zeros_like(maxabs))
    cand2 = jnp.maximum(maxabs - 1, 0)
    lamf = lam

    def cost_nz(l):
        return dist(l) + lamf * (level_rate(l) + sig_b1)

    c_max = cost_nz(maxabs)
    c_dec = jnp.where(cand2 > 0, cost_nz(cand2), jnp.inf)
    c_zero = d0 + lamf * sig_b0
    lev = jnp.where(scg & (c_dec < c_max) & (c_dec < c_zero), cand2,
                    jnp.where(scg & (c_zero <= c_max), 0, maxabs))
    chosen_cost = jnp.where(
        scg, jnp.minimum(c_max, jnp.minimum(c_dec, c_zero)), d0)

    # ---- stage 2: CG zeroing
    levflat = lev.reshape(lead + (npos,))
    last_pos_r = jnp.max(jnp.where(levflat > 0, pos_idx, -1), axis=-1)
    last_cg_r = last_pos_r >> 4
    csbf_ctx = t["sig_cg_base"] + (r_sig | b_sig).astype(jnp.int32)
    cg_cost_coded = jnp.sum(chosen_cost, axis=-1) \
        + lamf * gcb(csbf_ctx, jnp.ones_like(csbf_ctx))
    cg_cost_zero = jnp.sum(d0, axis=-1) \
        + lamf * gcb(csbf_ctx, jnp.zeros_like(csbf_ctx))
    can_zero = (ci_idx > 0) & (ci_idx < last_cg_r[..., None])
    zero_cg = can_zero & (cg_cost_zero < cg_cost_coded)
    lev = jnp.where(zero_cg[..., None], 0, lev)
    chosen_cost = jnp.where(zero_cg[..., None], d0, chosen_cost)

    # ---- stage 3: best last position (sig flag refunded, last-pos
    # prefix paid, suffix zeroed), vs the all-zero block
    levf = lev.reshape(lead + (npos,))
    costf = chosen_cost.reshape(lead + (npos,))
    d0f = d0.reshape(lead + (npos,))
    prefix = jnp.cumsum(costf, axis=-1) - costf
    suffix0 = jnp.flip(jnp.cumsum(jnp.flip(d0f, -1), -1), -1) - d0f
    cb_x = jax.lax.dynamic_slice_in_dim(cbflat, t["ctx_x"] * 2, 30) \
        .reshape(15, 2)
    cb_y = jax.lax.dynamic_slice_in_dim(cbflat, t["ctx_y"] * 2, 30) \
        .reshape(15, 2)
    lxb = jnp.sum(jnp.asarray(t["w_cnt"]) * cb_x, axis=(-1, -2)) \
        + jnp.asarray(t["ep_cnt"])
    lyb = jnp.sum(jnp.asarray(t["w_cnt"]) * cb_y, axis=(-1, -2)) \
        + jnp.asarray(t["ep_cnt"])
    last_bits = lxb[jnp.asarray(t["last_x"])] \
        + lyb[jnp.asarray(t["last_y"])]
    cost_as_last = prefix + (costf - lamf * sig_b1.reshape(
        lead + (npos,))) + suffix0 + lamf * last_bits
    cost_as_last = jnp.where(levf > 0, cost_as_last, jnp.inf)
    all_zero_cost = jnp.sum(d0f, axis=-1)
    best_last = jnp.argmin(cost_as_last, axis=-1)
    best_cost = jnp.min(cost_as_last, axis=-1)
    use_zero = all_zero_cost <= best_cost
    keep = pos_idx <= best_last[..., None]
    levf = jnp.where(use_zero[..., None] | ~keep, 0, levf)
    lev = levf.reshape(g)

    # ---- exact-rate guard: the stages above price contexts from the
    # rounded-significance approximation, which can occasionally make a
    # globally bad call (CG zeroing / last-pos move) on one block.
    # Re-price the RDOQ result and the plain deadzone quantisation with
    # the exact tb_bits estimator and keep the per-block winner, so
    # RDOQ is never worse than not running it.
    def exact_rd(l):
        d = jnp.sum(dist(l), axis=(-1, -2))
        b = tb_bits(to_raster(l), cbflat, log2, is_luma, scan_idx)
        nz = jnp.any(l != 0, axis=(-1, -2))
        return d + lamf * (b + nz.astype(jnp.float32))

    use_fb = exact_rd(fb) < exact_rd(lev)
    lev = jnp.where(use_fb[..., None, None], fb, lev)

    if sdh:
        lev = sdh_stage(lev)
    return to_raster(lev).reshape(coef.shape)

"""Batched integer motion estimation + fractional refinement.

TPU-native replacement for the reference's sequential TZ search
(TEncSearch::xTZSearch TEncSearch.cpp:4737 and the SAD kernels of
TComRdCost.cpp:359-581): instead of one PU walking a diamond pattern,
every aligned block in the frame evaluates the full +-R integer window
in one jitted pass (scan over displacements, whole-plane abs-diff,
block-reduce).  The 8-neighbour cost stencil around the best integer MV
— the NN-FME input the reference collects via xTZ8PointSquareSearch
(TEncSearch.cpp:5037-5050) — falls out of the same SAD volume for free.

Fractional refinement offers the two reference strategies:
  * nn    — the fork's NN-FME: per-QP MLP maps the 9-cost stencil +
            PU size to one of 49 quarter-pel offsets (TEncSearch.cpp:85)
  * dctif — HM's half-then-quarter 8-point SATD refinement
            (xPatternSearchFracDIF TEncSearch.cpp:5232), batched over
            all blocks x 9 candidate positions per round.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("bsize", "srange"))
def integer_me_sad_volume(ref, org, bsize: int, srange: int):
    """SAD of every aligned bsize x bsize block against every integer
    displacement in [-srange, srange]^2.

    ref, org: (H, W) int32 planes (H, W multiples of bsize).
    Returns (D, By, Bx) int32 where D = (2*srange+1)^2, row-major over
    (dy, dx).  Out-of-picture reference taps use edge replication
    (identical to HM's margin padding semantics, TComPicYuv).

    One lax.scan step per dy with ALL dx evaluated as one batched
    abs-diff + block-reduce (2r+1 device steps instead of (2r+1)^2 —
    the sequential-step count is what bounds ME latency on the chip,
    and the batched form is what makes SearchRange 64, the reference
    cfg's value, affordable).  Samples are 16-bit inside the kernel
    (|diff| of <=10-bit pixels fits), summed in int32."""
    h, w = ref.shape
    r = srange
    side = 2 * r + 1
    padded = jnp.pad(ref, r, mode="edge").astype(jnp.int16)
    org16 = org.astype(jnp.int16)
    col_idx = jnp.arange(side)[:, None] + jnp.arange(w)[None, :]

    def one_dy(_, dy):
        rows = jax.lax.dynamic_slice(padded, (dy, 0), (h, w + 2 * r))
        win = rows[:, col_idx]                    # (h, side, w)
        ad = jnp.abs(org16[:, None, :] - win).astype(jnp.int32)
        s = ad.reshape(h // bsize, bsize, side, w // bsize, bsize) \
            .sum((1, 4))                          # (bh, side, bw)
        return _, s.swapaxes(0, 1)

    _, vol = jax.lax.scan(one_dy, None, jnp.arange(side))
    return vol.reshape(side * side, h // bsize, w // bsize)


def _bits_of(v):
    """Signed Exp-Golomb MV-component bit length (capability of
    TComRdCost::xGetComponentBits): length of code number
    (v<=0 ? -2v+1 : 2v)."""
    code = jnp.where(v <= 0, ((-v) << 1) + 1, v << 1).astype(jnp.uint32)
    ln = (31 - jax.lax.clz(code)).astype(jnp.int32)
    return 2 * ln + 1


def _volume_best(vol, srange: int, lambda_sqrt, pred_mv_x, pred_mv_y):
    """argmin + 3x3 stencil extraction over a (D, By, Bx) SAD volume
    (the tail of integer ME, shared by every block size)."""
    r = srange
    side = 2 * r + 1
    d = jnp.arange(side * side)
    dy = (d // side - r).astype(jnp.int32)
    dx = (d % side - r).astype(jnp.int32)

    mvq_x = (dx * 4)[:, None, None] - pred_mv_x[None]
    mvq_y = (dy * 4)[:, None, None] - pred_mv_y[None]
    mvcost = (_bits_of(mvq_x) + _bits_of(mvq_y)).astype(jnp.float32) \
        * lambda_sqrt
    cost = vol.astype(jnp.float32) + mvcost
    by, bx = vol.shape[1], vol.shape[2]
    best = jnp.argmin(cost.reshape(side * side, -1), axis=0).reshape(by, bx)
    best_dy = best // side
    best_dx = best % side

    # 3x3 stencil around the best (clamped at the window edge, matching
    # the reference probing only inside the padded search area)
    oy = jnp.clip(best_dy[..., None, None]
                  + jnp.arange(-1, 2)[None, None, :, None], 0, side - 1)
    ox = jnp.clip(best_dx[..., None, None]
                  + jnp.arange(-1, 2)[None, None, None, :], 0, side - 1)
    flat = oy * side + ox                                    # (By,Bx,3,3)
    volt = vol.transpose(1, 2, 0)
    iy = jnp.arange(by)[:, None, None, None]
    ix = jnp.arange(bx)[None, :, None, None]
    stencil = volt[iy, ix, flat]
    best_sad = volt[jnp.arange(by)[:, None], jnp.arange(bx)[None, :], best]
    return (best_dx - r, best_dy - r), stencil, best_sad


@partial(jax.jit, static_argnames=("bsize", "srange"))
def integer_me(ref, org, bsize: int, srange: int, lambda_sqrt,
               pred_mv_x, pred_mv_y):
    """Full-window integer ME for every aligned block.

    pred_mv_*: (By, Bx) int32 predictor in quarter-pel units (motion
    cost term only; the search is exhaustive so no start point).
    Returns ((mvx, mvy) full-pel best MVs, (By, Bx, 3, 3) SAD stencil
    around the best MV, best SAD)."""
    vol = integer_me_sad_volume(ref, org, bsize, srange)   # (D, By, Bx)
    return _volume_best(vol, srange, lambda_sqrt, pred_mv_x, pred_mv_y)


@partial(jax.jit, static_argnames=("srange", "qh", "qw"))
def integer_me_levels(ref, org, srange: int, lambda_sqrt,
                      qh: int, qw: int):
    """Integer ME for the 8/16/32 CU levels from ONE shared 8x8 SAD
    volume per reference: a 16x16 (32x32) block's SAD at a
    displacement is exactly the sum of its 8x8 cells' SADs, so the
    (2r+1)^2-point search is paid once instead of three times
    (the reference re-walks TZ search per PU size,
    TEncSearch.cpp:4439; the shared volume is the batched inversion).

    qh/qw: padded 32-grid dims (ceil of the 16-grid halves); lanes in
    the padding aggregate zero-padded sums — they can never become CUs
    (block_schedule32 full32 masks them).

    Returns {8: ((mvx, mvy), stencil, sad), 16: ..., 32: ...}."""
    bh, bw = org.shape[0] // 8, org.shape[1] // 8
    gh, gw = bh // 2, bw // 2
    d = (2 * srange + 1) ** 2
    vol8 = integer_me_sad_volume(ref, org, 8, srange)
    vol16 = vol8.reshape(d, gh, 2, gw, 2).sum((2, 4))
    pad32 = ((0, 0), (0, qh * 2 - gh), (0, qw * 2 - gw))
    vol32 = jnp.pad(vol16, pad32).reshape(d, qh, 2, qw, 2).sum((2, 4))
    z8 = jnp.zeros((bh, bw), jnp.int32)
    z16 = jnp.zeros((gh, gw), jnp.int32)
    z32 = jnp.zeros((qh, qw), jnp.int32)
    return {
        8: _volume_best(vol8, srange, lambda_sqrt, z8, z8),
        16: _volume_best(vol16, srange, lambda_sqrt, z16, z16),
        32: _volume_best(vol32, srange, lambda_sqrt, z32, z32),
    }


def hadamard_matrix(n: int) -> np.ndarray:
    h = np.array([[1]], dtype=np.int64)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


@partial(jax.jit, static_argnames=("bsize",))
def satd_batch(a, b, bsize: int):
    """HM-style 8x8 Hadamard SATD over batched blocks
    (TComRdCost::xCalcHADs8x8 normalisation: (sum+2)>>2), summed over
    the 8x8 tiles of each block."""
    h8 = jnp.asarray(hadamard_matrix(8), jnp.int32)
    d = (a - b).astype(jnp.int32)
    nb = bsize // 8
    B = d.shape[0]
    d = d.reshape(B, nb, 8, nb, 8).transpose(0, 1, 3, 2, 4)
    t = jnp.einsum("ik,bnmkj->bnmij", h8, d)
    t = jnp.einsum("bnmik,kj->bnmij", t, h8)
    s = jnp.abs(t).sum((-1, -2))
    return ((s + 2) >> 2).sum((1, 2))


_FRAC_OFFS = np.array([(0, 0), (0, -1), (0, 1), (-1, 0), (1, 0),
                       (-1, -1), (-1, 1), (1, -1), (1, 1)], np.int32)


def _block_sad_int(refs, ridx, mvx, mvy, org_blk, bw, bh):
    """SAD of every 8x8 block against (integer-pel mvx, mvy) into its
    selected reference.  mv in full pel; shapes (bh, bw)."""
    r, hh, ww = refs.shape
    # per-block gather: absolute sample coords
    y0 = jnp.arange(bh)[:, None] * 8
    x0 = jnp.arange(bw)[None, :] * 8
    yy = jnp.clip(y0[:, :, None, None] + mvy[:, :, None, None]
                  + jnp.arange(8)[None, None, :, None], 0, hh - 1)
    xx = jnp.clip(x0[:, :, None, None] + mvx[:, :, None, None]
                  + jnp.arange(8)[None, None, None, :], 0, ww - 1)
    pred = refs[ridx[:, :, None, None], yy, xx]
    return jnp.abs(org_blk.reshape(bh, bw, 8, 8) - pred) \
        .sum(axis=(-1, -2)).astype(jnp.float32)


def regularize_mv_field(refs, org_y, mvx, mvy, ridx, lam_sqrt,
                        iters: int = 3):
    """Motion-field coherence pass (TPU-batched analogue of what HM's
    large-CU merge economics produce): each block re-picks its
    (mv, ref) among {self, 4 neighbours, zero} minimising
    SAD + lambda_sqrt * signalling-bits, where a candidate equal to a
    neighbour costs ~2 bits (future merge/skip) and a differing one
    pays its mvd bits.  Jacobi iterations, fully parallel.

    mv in full pel (bh, bw); returns the same shapes."""
    bh, bw = mvx.shape
    org_blk = org_y.reshape(bh, 8, bw, 8).swapaxes(1, 2)

    def shift(a, dy, dx):
        return jnp.roll(a, (dy, dx), (0, 1))

    for _ in range(iters):
        nbs = [(shift(mvx, dy, dx), shift(mvy, dy, dx),
                shift(ridx, dy, dx))
               for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0))]
        cands = [(mvx, mvy, ridx)] + nbs \
            + [(jnp.zeros_like(mvx), jnp.zeros_like(mvy),
                jnp.zeros_like(ridx))]
        costs = []
        for cx, cy, cr in cands:
            sad = _block_sad_int(refs, cr, cx, cy, org_blk, bw, bh)
            # merge economics: equal to any current neighbour -> ~2
            # bits, else approximate mvd bits vs the left neighbour
            eq = jnp.zeros(mvx.shape, bool)
            for nx, ny, nr in nbs:
                eq |= (cx == nx) & (cy == ny) & (cr == nr)
            mvd = mv_bits_dev_f(cx - nbs[1][0], cy - nbs[1][1])
            bits = jnp.where(eq, 2.0, mvd + 1.0)
            costs.append(sad + lam_sqrt * bits)
        costs = jnp.stack(costs)
        best = jnp.argmin(costs, axis=0)
        mvx = jnp.take_along_axis(
            jnp.stack([c[0] for c in cands]), best[None], 0)[0]
        mvy = jnp.take_along_axis(
            jnp.stack([c[1] for c in cands]), best[None], 0)[0]
        ridx = jnp.take_along_axis(
            jnp.stack([c[2] for c in cands]), best[None], 0)[0]
    return mvx, mvy, ridx


def mv_bits_dev_f(vx, vy):
    """Full-pel mvd bit estimate (quarter-pel scaled)."""
    def bl(v):
        a = jnp.abs(v * 4).astype(jnp.uint32)
        return jnp.where(a > 0, 32 - jax.lax.clz(a), 0).astype(jnp.int32)

    return (2 * bl(vx) + 2 * bl(vy) + 2).astype(jnp.float32)


@partial(jax.jit, static_argnames=("bsize", "bd"))
def frac_refine_batch(ref, xs0, ys0, org_blocks, int_mvx, int_mvy,
                      bsize: int, bd: int = 8, ridx=None):
    """HM-shaped two-stage fractional refinement, batched: 9 half-pel
    candidates around the integer MV, then 9 quarter-pel candidates
    around the half-pel winner; SATD metric (xPatternSearchFracDIF
    semantics, TEncSearch.cpp:5232-5268).  Returns quarter-pel MVs.

    `ref` is one (H, W) plane, or a (R, H, W) stack with per-block
    `ridx` when each block refines against its own reference."""
    from hmtpu.ops.interp import mc_luma_batch, mc_luma_batch_refs

    offs = jnp.asarray(_FRAC_OFFS)

    def mc(cx, cy):
        if ridx is None:
            return mc_luma_batch(ref, xs0, ys0, cx, cy, bsize, bsize, bd)
        return mc_luma_batch_refs(ref, ridx, xs0, ys0, cx, cy,
                                  bsize, bsize, bd)

    def stage(mv, step):
        mvq_x, mvq_y = mv
        costs = []
        for k in range(9):
            cx = mvq_x + offs[k, 1] * step
            cy = mvq_y + offs[k, 0] * step
            pred = mc(cx, cy)
            costs.append(satd_batch(org_blocks, pred, bsize))
        costs = jnp.stack(costs, axis=1)                      # (B, 9)
        best = jnp.argmin(costs, axis=1)
        return (mvq_x + offs[best, 1] * step,
                mvq_y + offs[best, 0] * step)

    mv = (int_mvx * 4, int_mvy * 4)
    mv = stage(mv, 2)
    mv = stage(mv, 1)
    return mv

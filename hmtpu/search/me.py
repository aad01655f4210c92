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
    (identical to HM's margin padding semantics, TComPicYuv)."""
    h, w = ref.shape
    r = srange
    side = 2 * r + 1
    padded = jnp.pad(ref, r, mode="edge")

    def one_disp(_, idx):
        dy, dx = idx // side, idx % side
        win = jax.lax.dynamic_slice(padded, (dy, dx), (h, w))
        ad = jnp.abs(org - win)
        s = ad.reshape(h // bsize, bsize, w // bsize, bsize).sum((1, 3))
        return _, s

    _, vol = jax.lax.scan(one_disp, None, jnp.arange(side * side))
    return vol


def _bits_of(v):
    """Signed Exp-Golomb MV-component bit length (capability of
    TComRdCost::xGetComponentBits): length of code number
    (v<=0 ? -2v+1 : 2v)."""
    code = jnp.where(v <= 0, ((-v) << 1) + 1, v << 1).astype(jnp.uint32)
    ln = (31 - jax.lax.clz(code)).astype(jnp.int32)
    return 2 * ln + 1


@partial(jax.jit, static_argnames=("bsize", "srange"))
def integer_me(ref, org, bsize: int, srange: int, lambda_sqrt,
               pred_mv_x, pred_mv_y):
    """Full-window integer ME for every aligned block.

    pred_mv_*: (By, Bx) int32 predictor in quarter-pel units (motion
    cost term only; the search is exhaustive so no start point).
    Returns ((mvx, mvy) full-pel best MVs, (By, Bx, 3, 3) SAD stencil
    around the best MV, best SAD)."""
    r = srange
    side = 2 * r + 1
    vol = integer_me_sad_volume(ref, org, bsize, srange)   # (D, By, Bx)
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


@partial(jax.jit, static_argnames=("bsize", "bd"))
def frac_refine_batch(ref, xs0, ys0, org_blocks, int_mvx, int_mvy,
                      bsize: int, bd: int = 8):
    """HM-shaped two-stage fractional refinement, batched: 9 half-pel
    candidates around the integer MV, then 9 quarter-pel candidates
    around the half-pel winner; SATD metric (xPatternSearchFracDIF
    semantics, TEncSearch.cpp:5232-5268).  Returns quarter-pel MVs."""
    from hmtpu.ops.interp import mc_luma_batch

    offs = jnp.asarray(_FRAC_OFFS)

    def stage(mv, step):
        mvq_x, mvq_y = mv
        costs = []
        for k in range(9):
            cx = mvq_x + offs[k, 1] * step
            cy = mvq_y + offs[k, 0] * step
            pred = mc_luma_batch(ref, xs0, ys0, cx, cy, bsize, bsize, bd)
            costs.append(satd_batch(org_blocks, pred, bsize))
        costs = jnp.stack(costs, axis=1)                      # (B, 9)
        best = jnp.argmin(costs, axis=1)
        return (mvq_x + offs[best, 1] * step,
                mvq_y + offs[best, 0] * step)

    mv = (int_mvx * 4, int_mvy * 4)
    mv = stage(mv, 2)
    mv = stage(mv, 1)
    return mv

"""Batched intra prediction: all 35 HEVC modes for a batch of NxN blocks
in one fused device op.

TPU-first design (replaces the reference's per-block scalar loops in
TComPrediction.cpp:229/390/731): for each block size we precompute
constant gather-index and interpolation-weight tables covering every
angular mode, including the inverse-angle projections of 8.4.4.2.6.
Prediction for the whole mode population is then a single gather + lerp
over the (filtered, unfiltered) reference pair — ideal VPU shape, no
data-dependent control flow.  DC/planar and the luma boundary filters
are small vectorised fix-ups.

The reference-sample layout matches ops/intra_ref.py (length 4N+1,
bottom-left -> top-right).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from hmtpu.ops.intra_ref import ANGLES, INV_ANGLES, should_filter


@lru_cache(maxsize=None)
def _angular_tables(n: int):
    """idx (33,N,N) into the 4N+1 ref line, fact (33,N,N) weights."""
    idx0 = np.zeros((33, n, n), dtype=np.int32)
    idx1 = np.zeros((33, n, n), dtype=np.int32)
    fact = np.zeros((33, n, n), dtype=np.int32)
    for mi, a in enumerate(ANGLES):
        mode = mi + 2
        a = int(a)
        inv = INV_ANGLES.get(a, 0)

        def map_t(t: int) -> int:
            if mode >= 18:
                if t >= 0:
                    return 2 * n + t
                return 2 * n - ((t * inv + 128) >> 8)
            if t >= 0:
                return 2 * n - t
            return 2 * n + ((t * inv + 128) >> 8)

        for y in range(n):
            for x in range(n):
                # main-axis coordinate: rows for >=18, cols for <18
                major, minor = (y, x) if mode >= 18 else (x, y)
                ii = ((major + 1) * a) >> 5
                ff = ((major + 1) * a) & 31
                t = minor + ii + 1
                idx0[mi, y, x] = map_t(t)
                # second tap goes through the same projection map; the
                # only clamp case is t+1 == 2N+1, where the weight is 0
                idx1[mi, y, x] = map_t(min(t + 1, 2 * n))
                fact[mi, y, x] = ff
    return idx0, idx1, fact


@lru_cache(maxsize=None)
def _mode_uses_filtered(n: int, is_luma: bool) -> np.ndarray:
    return np.array([should_filter(m, n, is_luma) for m in range(35)],
                    dtype=bool)


@partial(jax.jit, static_argnames=("n", "is_luma", "bit_depth"))
def predict_all_modes(ref_unfilt: jax.Array, ref_filt: jax.Array, n: int,
                      is_luma: bool = True, bit_depth: int = 8) -> jax.Array:
    """(B, 4N+1) x2 -> (B, 35, N, N) predictions for every intra mode."""
    b = ref_unfilt.shape[0]
    idx0, idx1, fact = _angular_tables(n)
    use_filt = _mode_uses_filtered(n, is_luma)

    # stack refs -> (B, 2, 4N+1); source 0 = unfiltered, 1 = filtered
    refs = jnp.stack([ref_unfilt, ref_filt], axis=1)
    line = 4 * n + 1
    src = use_filt[2:].astype(np.int32)[:, None, None]  # per angular mode
    flat0 = jnp.asarray(idx0 + src * line)
    flat1 = jnp.asarray(idx1 + src * line)
    fact_j = jnp.asarray(fact)
    flat_refs = refs.reshape(b, 2 * line)
    r0 = jnp.take(flat_refs, flat0.reshape(-1), axis=-1).reshape(b, 33, n, n)
    r1 = jnp.take(flat_refs, flat1.reshape(-1), axis=-1).reshape(b, 33, n, n)
    angular = ((32 - fact_j) * r0 + fact_j * r1 + 16) >> 5

    # helpers to slice the ref line
    def left(r, y):  # p[-1][y]; y may be an array
        return jnp.take(r, 2 * n - 1 - y, axis=-1)

    def top(r, x):  # p[x][-1]
        return jnp.take(r, 2 * n + 1 + x, axis=-1)

    ys = np.arange(n)
    xs = np.arange(n)

    # ---- planar (8.4.4.2.4) — filtered ref when the size filters
    pref = ref_filt if use_filt[0] else ref_unfilt
    log2n = int(n).bit_length() - 1
    l_col = left(pref, ys)[:, :, None]            # (B, N, 1)
    t_row = top(pref, xs)[:, None, :]             # (B, 1, N)
    top_n = top(pref, np.array(n))[:, None, None]
    left_n = left(pref, np.array(n))[:, None, None]
    wx = jnp.asarray((n - 1 - xs))[None, None, :]
    wy = jnp.asarray((n - 1 - ys))[None, :, None]
    planar = ((wx * l_col + (xs + 1)[None, None, :] * top_n
               + wy * t_row + (ys + 1)[None, :, None] * left_n
               + n) >> (log2n + 1))

    # ---- DC (8.4.4.2.5) — always unfiltered
    uref = ref_unfilt
    dc = (jnp.sum(top(uref, xs), axis=-1) + jnp.sum(left(uref, ys), axis=-1)
          + n) >> (log2n + 1)
    dcb = dc[:, None, None]
    dc_pred = jnp.broadcast_to(dcb, (b, n, n))
    if is_luma and n < 32:
        row0 = (top(uref, xs) + 3 * dcb[:, :, 0] + 2) >> 2
        col0 = (left(uref, ys) + 3 * dcb[:, :, 0] + 2) >> 2
        corner = (left(uref, np.array(0)) + 2 * dc
                  + top(uref, np.array(0)) + 2) >> 2
        dc_pred = dc_pred.at[:, 0, :].set(row0)
        dc_pred = dc_pred.at[:, :, 0].set(col0)
        dc_pred = dc_pred.at[:, 0, 0].set(corner)

    # ---- boundary filters for modes 10 (hor) and 26 (ver), luma, N<32
    if is_luma and n < 32:
        maxv = (1 << bit_depth) - 1
        corner_u = left(uref, np.array(-1))[:, None]
        # mode 26 (angular index 24): first column
        m26 = angular[:, 24]
        col = jnp.clip(top(uref, np.array(0))[:, None]
                       + ((left(uref, ys) - corner_u) >> 1), 0, maxv)
        m26 = m26.at[:, :, 0].set(col)
        angular = angular.at[:, 24].set(m26)
        # mode 10 (angular index 8): first row
        m10 = angular[:, 8]
        row = jnp.clip(left(uref, np.array(0))[:, None]
                       + ((top(uref, xs) - corner_u) >> 1), 0, maxv)
        m10 = m10.at[:, 0, :].set(row)
        angular = angular.at[:, 8].set(m10)

    return jnp.concatenate(
        [planar[:, None], dc_pred[:, None], angular], axis=1
    ).astype(jnp.int32)


@partial(jax.jit, static_argnames=("n", "is_luma", "bit_depth"))
def predict_one_mode(ref_unfilt: jax.Array, ref_filt: jax.Array,
                     mode: jax.Array, n: int, is_luma: bool = True,
                     bit_depth: int = 8) -> jax.Array:
    """(B, 4N+1) x2 refs + (B,) mode -> (B, N, N): each block predicted
    with its own mode.  Same tables/arithmetic as predict_all_modes but
    gathering only the chosen mode's taps — the cheap inner-loop form
    for the wavefront scan, where the mode is already decided."""
    b = ref_unfilt.shape[0]
    idx0, idx1, fact = _angular_tables(n)
    use_filt = _mode_uses_filtered(n, is_luma)
    line = 4 * n + 1
    refs = jnp.stack([ref_unfilt, ref_filt], axis=1).reshape(b, 2 * line)

    am = jnp.clip(mode - 2, 0, 32)
    src = jnp.asarray(use_filt.astype(np.int32))[mode]       # (B,)
    f0 = jnp.asarray(idx0)[am] + (src * line)[:, None, None]
    f1 = jnp.asarray(idx1)[am] + (src * line)[:, None, None]
    ff = jnp.asarray(fact)[am]
    r0 = jnp.take_along_axis(refs, f0.reshape(b, -1), axis=1) \
        .reshape(b, n, n)
    r1 = jnp.take_along_axis(refs, f1.reshape(b, -1), axis=1) \
        .reshape(b, n, n)
    out = ((32 - ff) * r0 + ff * r1 + 16) >> 5

    def left(r, y):
        return jnp.take(r, 2 * n - 1 - y, axis=-1)

    def top(r, x):
        return jnp.take(r, 2 * n + 1 + x, axis=-1)

    ys = np.arange(n)
    xs = np.arange(n)
    uref = ref_unfilt

    if is_luma and n < 32:
        maxv = (1 << bit_depth) - 1
        corner_u = left(uref, np.array(-1))[:, None]
        col = jnp.clip(top(uref, np.array(0))[:, None]
                       + ((left(uref, ys) - corner_u) >> 1), 0, maxv)
        out = jnp.where((mode == 26)[:, None, None],
                        out.at[:, :, 0].set(col), out)
        row = jnp.clip(left(uref, np.array(0))[:, None]
                       + ((top(uref, xs) - corner_u) >> 1), 0, maxv)
        out = jnp.where((mode == 10)[:, None, None],
                        out.at[:, 0, :].set(row), out)

    # planar
    pref = ref_filt if use_filt[0] else ref_unfilt
    log2n = int(n).bit_length() - 1
    l_col = left(pref, ys)[:, :, None]
    t_row = top(pref, xs)[:, None, :]
    top_n = top(pref, np.array(n))[:, None, None]
    left_n = left(pref, np.array(n))[:, None, None]
    wx = jnp.asarray(n - 1 - xs)[None, None, :]
    wy = jnp.asarray(n - 1 - ys)[None, :, None]
    planar = ((wx * l_col + (xs + 1)[None, None, :] * top_n
               + wy * t_row + (ys + 1)[None, :, None] * left_n
               + n) >> (log2n + 1))
    out = jnp.where((mode == 0)[:, None, None], planar, out)

    # DC
    dc = (jnp.sum(top(uref, xs), axis=-1)
          + jnp.sum(left(uref, ys), axis=-1) + n) >> (log2n + 1)
    dcb = dc[:, None, None]
    dc_pred = jnp.broadcast_to(dcb, (b, n, n))
    if is_luma and n < 32:
        row0 = (top(uref, xs) + 3 * dcb[:, :, 0] + 2) >> 2
        col0 = (left(uref, ys) + 3 * dcb[:, :, 0] + 2) >> 2
        corner = (left(uref, np.array(0)) + 2 * dc
                  + top(uref, np.array(0)) + 2) >> 2
        dc_pred = dc_pred.at[:, 0, :].set(row0)
        dc_pred = dc_pred.at[:, :, 0].set(col0)
        dc_pred = dc_pred.at[:, 0, 0].set(corner)
    out = jnp.where((mode == 1)[:, None, None], dc_pred, out)
    return out.astype(jnp.int32)


# ---------------------------------------------------------------------------
# batched reference-line filtering (8.4.4.2.3)

@partial(jax.jit, static_argnames=("n", "bit_depth", "strong"))
def filter_reference_batched(ref: jax.Array, n: int, bit_depth: int = 8,
                             strong: bool = True) -> jax.Array:
    """(B, 4N+1) -> (B, 4N+1) smoothed reference lines; applies the
    strong bilinear filter per-block when eligible (N==32 only)."""
    smoothed = ref.at[:, 1:-1].set(
        (ref[:, :-2] + 2 * ref[:, 1:-1] + ref[:, 2:] + 2) >> 2
    )
    if not (strong and n == 32):
        return smoothed
    thr = 1 << (bit_depth - 5)
    corner = ref[:, 2 * n]
    topmid = ref[:, 2 * n + 1 + (n - 1)]
    topend = ref[:, 4 * n]
    leftmid = ref[:, 2 * n - 1 - (n - 1)]
    leftend = ref[:, 0]
    bi = (jnp.abs(corner + topend - 2 * topmid) < thr) & \
         (jnp.abs(corner + leftend - 2 * leftmid) < thr)
    ys = np.arange(2 * n - 1)
    li = 2 * n - 1 - ys
    lvals = ((63 - ys)[None] * corner[:, None]
             + (ys + 1)[None] * leftend[:, None] + 32) >> 6
    tvals = ((63 - ys)[None] * corner[:, None]
             + (ys + 1)[None] * topend[:, None] + 32) >> 6
    bilin = ref
    bilin = bilin.at[:, li].set(lvals)
    bilin = bilin.at[:, 2 * n + 1 + ys].set(tvals)
    return jnp.where(bi[:, None], bilin, smoothed)


# ---------------------------------------------------------------------------
# numpy twin for the host sequential pass (same tables, same arithmetic)

def predict_mode_np(ref_unfilt: np.ndarray, ref_filt: np.ndarray,
                    n: int, mode: int, is_luma: bool = True,
                    bit_depth: int = 8) -> np.ndarray:
    """(4N+1,) x2 -> (N, N) prediction for one mode — the fast
    closed-loop-reconstruction twin of predict_all_modes_np (identical
    tables/arithmetic, 1 mode instead of 35)."""
    use_filt = _mode_uses_filtered(n, is_luma)
    refs = np.stack([ref_unfilt, ref_filt]).astype(np.int64)

    def left(r, y):
        return r[2 * n - 1 - y]

    def top(r, x):
        return r[2 * n + 1 + x]

    ys = np.arange(n)
    xs = np.arange(n)
    uref = refs[0]
    log2n = int(n).bit_length() - 1

    if mode == 0:                                   # planar
        pref = refs[1] if use_filt[0] else refs[0]
        out = ((n - 1 - xs)[None, :] * left(pref, ys)[:, None]
               + (xs + 1)[None, :] * top(pref, np.array(n))
               + (n - 1 - ys)[:, None] * top(pref, xs)[None, :]
               + (ys + 1)[:, None] * left(pref, np.array(n))
               + n) >> (log2n + 1)
        return out.astype(np.int32)

    if mode == 1:                                   # DC
        dc = (top(uref, xs).sum() + left(uref, ys).sum()
              + n) >> (log2n + 1)
        out = np.full((n, n), dc, dtype=np.int64)
        if is_luma and n < 32:
            out[0, :] = (top(uref, xs) + 3 * dc + 2) >> 2
            out[:, 0] = (left(uref, ys) + 3 * dc + 2) >> 2
            out[0, 0] = (left(uref, np.array(0)) + 2 * dc
                         + top(uref, np.array(0)) + 2) >> 2
        return out.astype(np.int32)

    idx0, idx1, fact = _angular_tables(n)
    mi = mode - 2
    r = refs[int(use_filt[mode])]
    out = ((32 - fact[mi]) * r[idx0[mi]] + fact[mi] * r[idx1[mi]]
           + 16) >> 5
    if is_luma and n < 32 and mode in (10, 26):
        maxv = (1 << bit_depth) - 1
        corner = left(uref, np.array(-1))
        if mode == 26:
            out[:, 0] = np.clip(top(uref, np.array(0))
                                + ((left(uref, ys) - corner) >> 1),
                                0, maxv)
        else:
            out[0, :] = np.clip(left(uref, np.array(0))
                                + ((top(uref, xs) - corner) >> 1),
                                0, maxv)
    return out.astype(np.int32)


def predict_all_modes_np(ref_unfilt: np.ndarray, ref_filt: np.ndarray,
                         n: int, is_luma: bool = True,
                         bit_depth: int = 8) -> np.ndarray:
    """(4N+1,) x2 -> (35, N, N) predictions for a single block."""
    idx0, idx1, fact = _angular_tables(n)
    use_filt = _mode_uses_filtered(n, is_luma)
    refs = np.stack([ref_unfilt, ref_filt]).astype(np.int64)

    def left(r, y):
        return r[2 * n - 1 - y]

    def top(r, x):
        return r[2 * n + 1 + x]

    ys = np.arange(n)
    xs = np.arange(n)
    out = np.zeros((35, n, n), dtype=np.int64)

    # angular: one fused gather over all 33 modes (same layout as the
    # device path: source-selected flat indices into [unfilt|filt])
    line = 4 * n + 1
    src = use_filt[2:].astype(np.int64)[:, None, None]
    flat = refs.reshape(-1)
    r0 = flat[idx0 + src * line]
    r1 = flat[idx1 + src * line]
    out[2:] = ((32 - fact) * r0 + fact * r1 + 16) >> 5

    # planar
    pref = refs[1] if use_filt[0] else refs[0]
    log2n = int(n).bit_length() - 1
    l_col = left(pref, ys)[:, None]
    t_row = top(pref, xs)[None, :]
    out[0] = ((n - 1 - xs)[None, :] * l_col + (xs + 1)[None, :] * top(pref, np.array(n))
              + (n - 1 - ys)[:, None] * t_row + (ys + 1)[:, None] * left(pref, np.array(n))
              + n) >> (log2n + 1)

    # DC
    uref = refs[0]
    dc = (top(uref, xs).sum() + left(uref, ys).sum() + n) >> (log2n + 1)
    out[1] = dc
    if is_luma and n < 32:
        out[1, 0, :] = (top(uref, xs) + 3 * dc + 2) >> 2
        out[1, :, 0] = (left(uref, ys) + 3 * dc + 2) >> 2
        out[1, 0, 0] = (left(uref, np.array(0)) + 2 * dc
                        + top(uref, np.array(0)) + 2) >> 2
        maxv = (1 << bit_depth) - 1
        corner = left(uref, np.array(-1))
        out[26, :, 0] = np.clip(top(uref, np.array(0))
                                + ((left(uref, ys) - corner) >> 1), 0, maxv)
        out[10, 0, :] = np.clip(left(uref, np.array(0))
                                + ((top(uref, xs) - corner) >> 1), 0, maxv)
    return out.astype(np.int32)

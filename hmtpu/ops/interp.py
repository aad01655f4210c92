"""Fractional-sample interpolation (DCT-IF) for motion compensation.

Capability parity with the reference's TComInterpolationFilter
(TComInterpolationFilter.cpp:57-75 coefficient tables, :173 templated
filter, :274-396 hor/ver drivers), re-designed for batched evaluation:
the numpy path is the scalar correctness reference; `mc_luma`/`mc_chroma`
operate on whole batches of blocks so the TPU sees one big gather +
two tensor contractions per fractional phase instead of HM's per-PU
scalar loops.

Precision model (H.265 8.5.4.2.2.1): two separable passes over an
internal 14-bit signed domain.  For bit depth B:
  headroom = 14 - B
  hor pass (not last):  t = (sum_i c_i*s_i - (8192 << (B-8))) >> (B-8)
  ver pass (last):      r = clip((sum_i c_i*t_i + (1<<11) + (8192<<6)) >> 12)
  single pass (first&last): r = clip((sum_i c_i*s_i + 32) >> 6)
Reference pictures are edge-replicated (HM pads by margin copy,
TComPicYuv); a per-tap clamped gather reproduces that exactly.
"""
from __future__ import annotations

import numpy as np

# Luma 8-tap DCT-IF, quarter-pel phases 0..3 (H.265 Table 8-11).
LUMA_FILTERS = np.array([
    [0, 0, 0, 64, 0, 0, 0, 0],
    [-1, 4, -10, 58, 17, -5, 1, 0],
    [-1, 4, -11, 40, 40, -11, 4, -1],
    [0, 1, -5, 17, 58, -10, 4, -1],
], dtype=np.int32)

# Chroma 4-tap DCT-IF, eighth-pel phases 0..7 (H.265 Table 8-12).
CHROMA_FILTERS = np.array([
    [0, 64, 0, 0],
    [-2, 58, 10, -2],
    [-4, 54, 16, -2],
    [-6, 46, 28, -4],
    [-4, 36, 36, -4],
    [-4, 28, 46, -6],
    [-2, 16, 54, -4],
    [-2, 10, 58, -2],
], dtype=np.int32)

NTAPS_LUMA = 8
NTAPS_CHROMA = 4
IF_FILTER_PREC = 6
IF_INTERNAL_PREC = 14
IF_INTERNAL_OFFS = 1 << (IF_INTERNAL_PREC - 1)


def _gather_clamped(plane: np.ndarray, ys: np.ndarray,
                    xs: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    return plane[np.clip(ys, 0, h - 1)[..., :, None],
                 np.clip(xs, 0, w - 1)[..., None, :]]


def _mc_block_np(plane: np.ndarray, x0: int, y0: int, nw: int, nh: int,
                 fx: int, fy: int, filters: np.ndarray, ntaps: int,
                 bd: int, is_last: bool = True) -> np.ndarray:
    """One block at integer position (x0, y0) with fractional phase
    (fx, fy).  Scalar reference implementation (separable two-pass)."""
    half = ntaps // 2 - 1
    headroom = IF_INTERNAL_PREC - bd
    maxv = (1 << bd) - 1

    def last_stage(acc, first):
        if is_last and first:
            return np.clip((acc + 32) >> IF_FILTER_PREC, 0, maxv)
        if is_last:
            shift = IF_FILTER_PREC + headroom
            off = (1 << (shift - 1)) + (IF_INTERNAL_OFFS << IF_FILTER_PREC)
            return np.clip((acc + off) >> shift, 0, maxv)
        if first:
            shift = bd - 8
            return (acc - (IF_INTERNAL_OFFS << shift)) >> shift
        return acc >> IF_FILTER_PREC  # not-first-not-last (unused in MC)

    if fx == 0 and fy == 0:
        blk = _gather_clamped(plane, y0 + np.arange(nh), x0 + np.arange(nw))
        if is_last:
            return blk.astype(np.int32)
        shift = headroom
        return (blk.astype(np.int32) << shift) - (IF_INTERNAL_OFFS)

    def conv_axis(patch, f, axis, out_len):
        """8/4-tap FIR along one axis via shifted-slice accumulation
        (faster than windowed einsum on small MC blocks)."""
        acc = None
        for k in range(ntaps):
            c = int(f[k])
            if c == 0:
                continue
            sl = (patch[k:k + out_len] if axis == 0
                  else patch[:, k:k + out_len])
            acc = c * sl if acc is None else acc + c * sl
        return acc

    h, w = plane.shape
    if fy == 0:
        patch = _gather_clamped(plane, y0 + np.arange(nh),
                                x0 - half + np.arange(nw + ntaps - 1)
                                ).astype(np.int32)
        acc = conv_axis(patch, filters[fx], 1, nw)
        return last_stage(acc, True).astype(np.int32)
    if fx == 0:
        patch = _gather_clamped(plane,
                                y0 - half + np.arange(nh + ntaps - 1),
                                x0 + np.arange(nw)).astype(np.int32)
        acc = conv_axis(patch, filters[fy], 0, nh)
        return last_stage(acc, True).astype(np.int32)
    # two passes: horizontal (first) over nh + ntaps - 1 rows, vertical
    patch = _gather_clamped(plane,
                            y0 - half + np.arange(nh + ntaps - 1),
                            x0 - half + np.arange(nw + ntaps - 1)
                            ).astype(np.int32)
    acc = conv_axis(patch, filters[fx], 1, nw)
    shift1 = bd - 8
    tmp = (acc - (IF_INTERNAL_OFFS << shift1)) >> shift1      # 14-bit
    acc2 = conv_axis(tmp, filters[fy], 0, nh)
    return last_stage(acc2, False).astype(np.int32)


def mc_luma_np(plane: np.ndarray, x0: int, y0: int, nw: int, nh: int,
               mv_x_q: int, mv_y_q: int, bd: int = 8) -> np.ndarray:
    """Motion-compensated luma block; MV in quarter-pel units."""
    ix, fx = (x0 + (mv_x_q >> 2)), mv_x_q & 3
    iy, fy = (y0 + (mv_y_q >> 2)), mv_y_q & 3
    return _mc_block_np(plane, ix, iy, nw, nh, fx, fy,
                        LUMA_FILTERS, NTAPS_LUMA, bd)


def mc_chroma_np(plane: np.ndarray, x0: int, y0: int, nw: int, nh: int,
                 mv_x_q: int, mv_y_q: int, bd: int = 8) -> np.ndarray:
    """Motion-compensated chroma block (4:2:0); the luma quarter-pel MV
    becomes eighth-pel in chroma coordinates (spec 8.5.4.2.1)."""
    ix, fx = (x0 + (mv_x_q >> 3)), mv_x_q & 7
    iy, fy = (y0 + (mv_y_q >> 3)), mv_y_q & 7
    return _mc_block_np(plane, ix, iy, nw, nh, fx, fy,
                        CHROMA_FILTERS, NTAPS_CHROMA, bd)


# --------------------------------------------------------------------------
# bi-prediction: both hypotheses kept at IF_INTERNAL_PREC, then averaged
# (TComYuv::addAvg / spec 8.5.4.2.3.2 weighted sample prediction default)

def mc_luma_np_i(plane, x0, y0, nw, nh, mv_x_q, mv_y_q, bd=8):
    """Luma MC at intermediate (14-bit, offset-centred) precision."""
    ix, fx = (x0 + (mv_x_q >> 2)), mv_x_q & 3
    iy, fy = (y0 + (mv_y_q >> 2)), mv_y_q & 3
    return _mc_block_np(plane, ix, iy, nw, nh, fx, fy,
                        LUMA_FILTERS, NTAPS_LUMA, bd, is_last=False)


def mc_chroma_np_i(plane, x0, y0, nw, nh, mv_x_q, mv_y_q, bd=8):
    ix, fx = (x0 + (mv_x_q >> 3)), mv_x_q & 7
    iy, fy = (y0 + (mv_y_q >> 3)), mv_y_q & 7
    return _mc_block_np(plane, ix, iy, nw, nh, fx, fy,
                        CHROMA_FILTERS, NTAPS_CHROMA, bd, is_last=False)


def bi_average(p0: np.ndarray, p1: np.ndarray, bd: int = 8) -> np.ndarray:
    """Average two intermediate-precision hypotheses to output samples."""
    shift = IF_INTERNAL_PREC + 1 - bd
    off = (1 << (shift - 1)) + 2 * IF_INTERNAL_OFFS
    return np.clip((p0.astype(np.int64) + p1 + off) >> shift,
                   0, (1 << bd) - 1).astype(np.int32)


# --------------------------------------------------------------------------
# Batched JAX path: MC for B blocks of one shared size in one call.

def _mc_batch_jax(plane, xs0, ys0, fxs, fys, n_w, n_h, filters, ntaps, bd,
                  ridx=None):
    import jax.numpy as jnp

    half = ntaps // 2 - 1
    headroom = IF_INTERNAL_PREC - bd
    maxv = (1 << bd) - 1
    h, w = plane.shape[-2:]
    filt = jnp.asarray(filters)

    # gather an (nh + ntaps - 1) x (nw + ntaps - 1) patch per block
    py = ys0[:, None] + jnp.arange(-half, n_h + ntaps - 1 - half)[None, :]
    px = xs0[:, None] + jnp.arange(-half, n_w + ntaps - 1 - half)[None, :]
    cy = jnp.clip(py, 0, h - 1)[:, :, None]
    cx = jnp.clip(px, 0, w - 1)[:, None, :]
    if plane.ndim == 3:
        # stacked reference planes (R, H, W) with a per-block index
        patch = plane[ridx[:, None, None], cy, cx].astype(jnp.int32)
    else:
        patch = plane[cy, cx].astype(jnp.int32)

    cx = filt[fxs]                                  # (B, ntaps)
    cy = filt[fys]
    # horizontal: windows over axis 2
    hw = jnp.stack([patch[:, :, k:k + n_w] for k in range(ntaps)], axis=-1)
    acc = (hw * cx[:, None, None, :]).sum(-1)
    shift1 = bd - 8
    both = (fxs != 0) & (fys != 0)
    tmp = jnp.where(both[:, None, None],
                    (acc - (IF_INTERNAL_OFFS << shift1)) >> shift1, acc)
    # vertical: windows over axis 1 (rows half .. half+n_h when fy==0)
    vw = jnp.stack([tmp[:, k:k + n_h, :] for k in range(ntaps)], axis=-1)
    acc2 = (vw * cy[:, None, None, :]).sum(-1)

    single_h = (fys == 0) & (fxs != 0)              # hor-only: row band, +32>>6
    single_v = (fxs == 0) & (fys != 0)
    copy = (fxs == 0) & (fys == 0)

    shift2 = IF_FILTER_PREC + headroom
    off2 = (1 << (shift2 - 1)) + (IF_INTERNAL_OFFS << IF_FILTER_PREC)
    res_both = (acc2 + off2) >> shift2
    # fx==0: the hor pass used phase-0 (x64), so acc2 = 64 * sum(cy*s);
    # (64*(S+32))>>12 == (S+32)>>6 exactly
    res_single_v = (acc2 + (32 << IF_FILTER_PREC)) >> (2 * IF_FILTER_PREC)
    # hor-only: take acc rows [half, half+n_h)
    res_single_h = (acc[:, half:half + n_h, :] + 32) >> IF_FILTER_PREC
    res_copy = patch[:, half:half + n_h, half:half + n_w]

    out = jnp.where(copy[:, None, None], res_copy,
          jnp.where(single_h[:, None, None], res_single_h,
          jnp.where(single_v[:, None, None], res_single_v, res_both)))
    return jnp.clip(out, 0, maxv)


def _mc_batch_jax_i(plane, xs0, ys0, fxs, fys, n_w, n_h, filters,
                    ntaps, bd, ridx=None):
    """Batched MC at intermediate (IF_INTERNAL_PREC, offset-centred)
    precision — the per-hypothesis half of bi-prediction (8.5.4.2.3.2).
    Mirrors _mc_batch_jax's gather/FIR structure with _mc_block_np's
    is_last=False scaling rules."""
    import jax.numpy as jnp

    half = ntaps // 2 - 1
    headroom = IF_INTERNAL_PREC - bd
    h, w = plane.shape[-2:]
    filt = jnp.asarray(filters)

    py = ys0[:, None] + jnp.arange(-half, n_h + ntaps - 1 - half)[None, :]
    px = xs0[:, None] + jnp.arange(-half, n_w + ntaps - 1 - half)[None, :]
    cy = jnp.clip(py, 0, h - 1)[:, :, None]
    cx = jnp.clip(px, 0, w - 1)[:, None, :]
    if plane.ndim == 3:
        patch = plane[ridx[:, None, None], cy, cx].astype(jnp.int32)
    else:
        patch = plane[cy, cx].astype(jnp.int32)

    cx = filt[fxs]
    cy = filt[fys]
    hw = jnp.stack([patch[:, :, k:k + n_w] for k in range(ntaps)],
                   axis=-1)
    acc = (hw * cx[:, None, None, :]).sum(-1)
    shift1 = bd - 8
    both = (fxs != 0) & (fys != 0)
    tmp = jnp.where(both[:, None, None],
                    (acc - (IF_INTERNAL_OFFS << shift1)) >> shift1, acc)
    vw = jnp.stack([tmp[:, k:k + n_h, :] for k in range(ntaps)],
                   axis=-1)
    acc2 = (vw * cy[:, None, None, :]).sum(-1)

    single_h = (fys == 0) & (fxs != 0)
    single_v = (fxs == 0) & (fys != 0)
    copy = (fxs == 0) & (fys == 0)

    # two-pass: second stage is a plain >> IF_FILTER_PREC
    res_both = acc2 >> IF_FILTER_PREC
    # ver-only: hor pass was phase-0 (x64) -> recover conv then scale
    conv_v = acc2 >> IF_FILTER_PREC
    res_single_v = (conv_v - (IF_INTERNAL_OFFS << shift1)) >> shift1
    res_single_h = (acc[:, half:half + n_h, :]
                    - (IF_INTERNAL_OFFS << shift1)) >> shift1
    res_copy = (patch[:, half:half + n_h, half:half + n_w]
                << headroom) - IF_INTERNAL_OFFS

    return jnp.where(copy[:, None, None], res_copy,
           jnp.where(single_h[:, None, None], res_single_h,
           jnp.where(single_v[:, None, None], res_single_v, res_both)))


def mc_luma_batch_refs_i(refs, ridx, xs0, ys0, mvx_q, mvy_q, n_w, n_h,
                         bd=8):
    return _mc_batch_jax_i(refs, xs0 + (mvx_q >> 2), ys0 + (mvy_q >> 2),
                           mvx_q & 3, mvy_q & 3, n_w, n_h,
                           LUMA_FILTERS, NTAPS_LUMA, bd, ridx=ridx)


def mc_chroma_batch_refs_i(refs, ridx, xs0, ys0, mvx_q, mvy_q, n_w,
                           n_h, bd=8):
    return _mc_batch_jax_i(refs, xs0 + (mvx_q >> 3), ys0 + (mvy_q >> 3),
                           mvx_q & 7, mvy_q & 7, n_w, n_h,
                           CHROMA_FILTERS, NTAPS_CHROMA, bd, ridx=ridx)


def bi_average_t(p0, p1, bd: int = 8):
    """Device twin of bi_average (TComYuv::addAvg)."""
    import jax.numpy as jnp

    shift = IF_INTERNAL_PREC + 1 - bd
    off = (1 << (shift - 1)) + 2 * IF_INTERNAL_OFFS
    return jnp.clip((p0 + p1 + off) >> shift, 0, (1 << bd) - 1)


def mc_luma_batch(plane, xs0, ys0, mvx_q, mvy_q, n_w, n_h, bd=8):
    """Batched luma MC: B blocks (same n_w x n_h) with per-block integer
    position and quarter-pel MV.  jit-friendly (static shapes)."""
    return _mc_batch_jax(plane, xs0 + (mvx_q >> 2), ys0 + (mvy_q >> 2),
                         mvx_q & 3, mvy_q & 3, n_w, n_h,
                         LUMA_FILTERS, NTAPS_LUMA, bd)


def mc_chroma_batch(plane, xs0, ys0, mvx_q, mvy_q, n_w, n_h, bd=8):
    return _mc_batch_jax(plane, xs0 + (mvx_q >> 3), ys0 + (mvy_q >> 3),
                         mvx_q & 7, mvy_q & 7, n_w, n_h,
                         CHROMA_FILTERS, NTAPS_CHROMA, bd)


def mc_luma_batch_refs(refs, ridx, xs0, ys0, mvx_q, mvy_q, n_w, n_h, bd=8):
    """Batched luma MC over stacked reference planes (R, H, W): each
    block selects its reference with ridx (B,)."""
    return _mc_batch_jax(refs, xs0 + (mvx_q >> 2), ys0 + (mvy_q >> 2),
                         mvx_q & 3, mvy_q & 3, n_w, n_h,
                         LUMA_FILTERS, NTAPS_LUMA, bd, ridx=ridx)


def mc_chroma_batch_refs(refs, ridx, xs0, ys0, mvx_q, mvy_q, n_w, n_h, bd=8):
    return _mc_batch_jax(refs, xs0 + (mvx_q >> 3), ys0 + (mvy_q >> 3),
                         mvx_q & 7, mvy_q & 7, n_w, n_h,
                         CHROMA_FILTERS, NTAPS_CHROMA, bd, ridx=ridx)

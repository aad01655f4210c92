"""Core transform: batched integer DCT/DST (H.265 8.6.4) and their
inverses, bit-exact with the reference's partialButterfly* kernels
(TComTrQuant.cpp:388+, xT :1952) — a partial butterfly is just a
factored matmul with identical rounding points, so we run the whole
thing as two batched matrix multiplies per pass, which is exactly the
shape the MXU wants.

All arithmetic is int32 with arithmetic right shifts; intermediate
clipping follows the spec's 16-bit dynamic range.  Shapes are static
per transform size; the encoder batches all TUs of one size together.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hmtpu.common import spec_tables as st

MAX_TR_DYNAMIC_RANGE = 15
TRANSFORM_MATRIX_SHIFT = 6
COEFF_MIN = -(1 << 15)
COEFF_MAX = (1 << 15) - 1


def _matrices(size: int, use_dst: bool):
    m = st.DST4 if (use_dst and size == 4) else st.DCT[size]
    return jnp.asarray(m, dtype=jnp.int32)


def _rshift_round(x, shift: int):
    return (x + (1 << (shift - 1))) >> shift if shift > 0 else x << (-shift)


@partial(jax.jit, static_argnames=("size", "bit_depth", "use_dst"))
def forward_transform(residual: jax.Array, size: int, bit_depth: int = 8,
                      use_dst: bool = False) -> jax.Array:
    """residual: (..., size, size) int32 -> coefficients, same shape.

    Two-stage integer transform: rows first (shift1), then columns
    (shift2), matching xT/partialButterfly rounding exactly.
    """
    t = _matrices(size, use_dst)
    log2 = int(size).bit_length() - 1
    shift1 = log2 + bit_depth + TRANSFORM_MATRIX_SHIFT - MAX_TR_DYNAMIC_RANGE
    shift2 = log2 + TRANSFORM_MATRIX_SHIFT
    # stage 1 (horizontal): tmp[i, j] = sum_k T[i, k] * res[j, k]
    tmp = jnp.einsum("ik,...jk->...ij", t, residual)
    tmp = _rshift_round(tmp, shift1)
    # stage 2 (vertical): coeff[i, j] = sum_k T[i, k] * tmp[j, k]
    coeff = jnp.einsum("ik,...jk->...ij", t, tmp)
    return _rshift_round(coeff, shift2)


@partial(jax.jit, static_argnames=("size", "bit_depth", "use_dst"))
def inverse_transform(coeff: jax.Array, size: int, bit_depth: int = 8,
                      use_dst: bool = False) -> jax.Array:
    """coefficients -> residual, spec 8.6.4.2 rounding/clipping."""
    t = _matrices(size, use_dst)
    shift1 = TRANSFORM_MATRIX_SHIFT + 1  # 7
    shift2 = (TRANSFORM_MATRIX_SHIFT + MAX_TR_DYNAMIC_RANGE - 1) - bit_depth
    # int32 is sufficient: |sum| <= N * 90 * 2^15 < 2^31 for N <= 32.
    # NB einsum patterns chosen for fast XLA lowering; tensordot/matmul
    # int paths compile pathologically slowly on CPU.
    # stage 1 (columns): tmp[i, j] = sum_k T[k, i] * coeff[k, j]
    tmp = jnp.einsum("ki,...kj->...ij", t, coeff)
    tmp = jnp.clip(_rshift_round(tmp, shift1), COEFF_MIN, COEFF_MAX)
    # stage 2 (rows): r[i, j] = sum_k tmp[i, k] * T[k, j]
    res = jnp.einsum("...ik,kj->...ij", tmp, t)
    return jnp.clip(_rshift_round(res, shift2), COEFF_MIN, COEFF_MAX)


# ---------------------------------------------------------------------------
# transform skip (8.6.4.2 transform_skip_flag branch; encoder twin of
# TComTrQuant xTransformSkip / xITransformSkip): the "transform" is a
# pure shift to the coefficient scale, quant/dequant are unchanged.

def ts_shift(size: int, bit_depth: int) -> int:
    return MAX_TR_DYNAMIC_RANGE - bit_depth - (size.bit_length() - 1)


def transform_skip_fwd(residual, size: int, bit_depth: int = 8):
    """residual -> coefficient-scale values (Main profile: 4x4 only)."""
    return residual << ts_shift(size, bit_depth)


def transform_skip_inv(coeff, size: int, bit_depth: int = 8):
    """dequantised coefficients -> residual: r = d << (5 + log2 nTbS)
    (bit-depth independent, = 7 for the Main-profile 4x4 case), then
    the common bdShift rounding stage (spec 8.6.4.2)."""
    bd_shift = 20 - bit_depth
    r = coeff << (5 + (size.bit_length() - 1))
    out = (r + (1 << (bd_shift - 1))) >> bd_shift
    return out.clip(COEFF_MIN, COEFF_MAX)


# ---------------------------------------------------------------------------
# scalar numpy reference (test oracle only)

def forward_transform_ref(residual: np.ndarray, bit_depth: int = 8,
                          use_dst: bool = False) -> np.ndarray:
    size = residual.shape[-1]
    t = (st.DST4 if (use_dst and size == 4) else st.DCT[size]).astype(np.int64)
    log2 = size.bit_length() - 1
    shift1 = log2 + bit_depth + TRANSFORM_MATRIX_SHIFT - MAX_TR_DYNAMIC_RANGE
    shift2 = log2 + TRANSFORM_MATRIX_SHIFT
    tmp = np.empty((size, size), dtype=np.int64)
    for i in range(size):
        for j in range(size):
            s = int(np.dot(t[i], residual[j]))
            tmp[i, j] = (s + (1 << (shift1 - 1))) >> shift1
    out = np.empty((size, size), dtype=np.int64)
    for i in range(size):
        for j in range(size):
            s = int(np.dot(t[i], tmp[j]))
            out[i, j] = (s + (1 << (shift2 - 1))) >> shift2
    return out.astype(np.int32)


def inverse_transform_ref(coeff: np.ndarray, bit_depth: int = 8,
                          use_dst: bool = False) -> np.ndarray:
    size = coeff.shape[-1]
    t = (st.DST4 if (use_dst and size == 4) else st.DCT[size]).astype(np.int64)
    shift1 = 7
    shift2 = 20 - bit_depth
    # mirror of xITr (TComTrQuant.cpp:346-375): tmp = clip(T' * coeff),
    # block = tmp * T
    tmp = np.empty((size, size), dtype=np.int64)
    for i in range(size):
        for j in range(size):
            s = int(np.dot(t[:, i], coeff[:, j].astype(np.int64)))
            v = (s + (1 << (shift1 - 1))) >> shift1
            tmp[i, j] = min(max(v, COEFF_MIN), COEFF_MAX)
    out = np.empty((size, size), dtype=np.int64)
    for i in range(size):
        for j in range(size):
            s = int(np.dot(t[:, j], tmp[i]))
            v = (s + (1 << (shift2 - 1))) >> shift2
            out[i, j] = min(max(v, COEFF_MIN), COEFF_MAX)
    return out.astype(np.int32)


# ---------------------------------------------------------------------------
# vectorised numpy twins (host sequential passes; exact same arithmetic)

def forward_np(residual: np.ndarray, bit_depth: int = 8,
               use_dst: bool = False) -> np.ndarray:
    """(B, N, N) int -> coefficients, identical to forward_transform."""
    size = residual.shape[-1]
    t = (st.DST4 if (use_dst and size == 4) else st.DCT[size]).astype(np.int64)
    log2 = size.bit_length() - 1
    shift1 = log2 + bit_depth + TRANSFORM_MATRIX_SHIFT - MAX_TR_DYNAMIC_RANGE
    shift2 = log2 + TRANSFORM_MATRIX_SHIFT
    tmp = np.einsum("ik,...jk->...ij", t, residual.astype(np.int64))
    tmp = (tmp + (1 << (shift1 - 1))) >> shift1
    out = np.einsum("ik,...jk->...ij", t, tmp)
    return ((out + (1 << (shift2 - 1))) >> shift2).astype(np.int32)


def inverse_np(coeff: np.ndarray, bit_depth: int = 8,
               use_dst: bool = False) -> np.ndarray:
    """(B, N, N) int -> residual, identical to inverse_transform."""
    size = coeff.shape[-1]
    t = (st.DST4 if (use_dst and size == 4) else st.DCT[size]).astype(np.int64)
    shift1 = TRANSFORM_MATRIX_SHIFT + 1
    shift2 = (TRANSFORM_MATRIX_SHIFT + MAX_TR_DYNAMIC_RANGE - 1) - bit_depth
    tmp = np.einsum("ki,...kj->...ij", t, coeff.astype(np.int64))
    tmp = np.clip((tmp + (1 << (shift1 - 1))) >> shift1, COEFF_MIN, COEFF_MAX)
    out = np.einsum("...ik,kj->...ij", tmp, t)
    out = (out + (1 << (shift2 - 1))) >> shift2
    return np.clip(out, COEFF_MIN, COEFF_MAX).astype(np.int32)

"""Scalar quantisation / inverse quantisation (H.265 8.6.3), bit-exact
with the reference's TComTrQuant::xQuant (:1126) / xDeQuant paths with
flat (default) scaling lists.

Batched over TU stacks: all shapes (..., N, N) int32.  RDOQ lives in
ops/rdoq.py; this module is the plain-quant path and the dequant used by
both encoder reconstruction and the decoder oracle.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hmtpu.common import spec_tables as st

QUANT_SHIFT = 14
IQUANT_SHIFT = 6
MAX_TR_DYNAMIC_RANGE = 15
COEFF_MIN = -(1 << 15)
COEFF_MAX = (1 << 15) - 1

_QUANT_SCALES = tuple(int(x) for x in st.QUANT_SCALES)
_INV_QUANT_SCALES = tuple(int(x) for x in st.INV_QUANT_SCALES)


def transform_shift(log2_size: int, bit_depth: int) -> int:
    return MAX_TR_DYNAMIC_RANGE - bit_depth - log2_size


@partial(jax.jit, static_argnames=("qp", "log2_size", "bit_depth", "is_intra"))
def quantize(coeff: jax.Array, qp: int, log2_size: int, bit_depth: int = 8,
             is_intra: bool = True) -> jax.Array:
    """Forward quant with HM's deadzone offsets (171/512 intra, 85/512
    inter).  coeff int32 (..., N, N) -> levels int32.  qp is the
    signalled QP; the bit-depth offset Qp' = qp + 6*(bd-8) (8.6.1) is
    applied here."""
    qp = qp + 6 * (bit_depth - 8)
    per, rem = qp // 6, qp % 6
    qbits = QUANT_SHIFT + per + transform_shift(log2_size, bit_depth)
    add = (171 if is_intra else 85) << (qbits - 9)
    scale = _QUANT_SCALES[rem]
    # int32 safe: |coeff| <= 2^15, scale < 2^15 -> product < 2^30
    mag = (jnp.abs(coeff) * scale + add) >> qbits
    mag = jnp.minimum(mag, COEFF_MAX).astype(jnp.int32)
    return jnp.where(coeff < 0, -mag, mag)


@partial(jax.jit, static_argnames=("qp", "log2_size", "bit_depth"))
def dequantize(level: jax.Array, qp: int, log2_size: int,
               bit_depth: int = 8) -> jax.Array:
    """Inverse quant (flat scaling list), spec 8.6.3 clip to 16-bit;
    applies the bit-depth QP offset (8.6.1)."""
    qp = qp + 6 * (bit_depth - 8)
    per, rem = qp // 6, qp % 6
    shift = IQUANT_SHIFT - transform_shift(log2_size, bit_depth)
    base = _INV_QUANT_SCALES[rem]
    # factor the <<per out of the rounding shift so int32 never
    # overflows: (lv*g<<per + 1<<(s-1)) >> s  ==  see cases below
    prod = level * base  # |lv| <= 2^15, g <= 72 -> < 2^22
    if shift > per:
        s = shift - per
        out = (prod + (1 << (s - 1))) >> s
    else:
        # bits shifted out are zero; pre-clamp keeps int32 while
        # preserving the final 16-bit clip
        out = jnp.clip(prod, -(1 << 26), 1 << 26) << (per - shift)
    return jnp.clip(out, COEFF_MIN, COEFF_MAX).astype(jnp.int32)


# traced-QP variants: identical arithmetic with qp as a device scalar,
# so one compiled kernel serves every QP (rate control / per-frame GOP
# offsets without recompilation)

@partial(jax.jit, static_argnames=("log2_size", "bit_depth", "is_intra"))
def quantize_t(coeff: jax.Array, qp: jax.Array, log2_size: int,
               bit_depth: int = 8, is_intra: bool = True) -> jax.Array:
    qp = qp + 6 * (bit_depth - 8)
    per, rem = qp // 6, qp % 6
    qbits = QUANT_SHIFT + per + transform_shift(log2_size, bit_depth)
    add = (171 if is_intra else 85) << (qbits - 9)
    scale = jnp.asarray(_QUANT_SCALES, jnp.int32)[rem]
    mag = (jnp.abs(coeff) * scale + add) >> qbits
    mag = jnp.minimum(mag, COEFF_MAX).astype(jnp.int32)
    return jnp.where(coeff < 0, -mag, mag)


@partial(jax.jit, static_argnames=("log2_size", "bit_depth"))
def dequantize_t(level: jax.Array, qp: jax.Array, log2_size: int,
                 bit_depth: int = 8) -> jax.Array:
    qp = qp + 6 * (bit_depth - 8)
    per, rem = qp // 6, qp % 6
    shift = IQUANT_SHIFT - transform_shift(log2_size, bit_depth)
    base = jnp.asarray(_INV_QUANT_SCALES, jnp.int32)[rem]
    prod = level * base
    s = shift - per
    sa = jnp.maximum(s, 1)
    right = (prod + (1 << (sa - 1))) >> sa
    left = jnp.clip(prod, -(1 << 26), 1 << 26) << jnp.maximum(-s, 0)
    out = jnp.where(s > 0, right, left)
    return jnp.clip(out, COEFF_MIN, COEFF_MAX).astype(jnp.int32)


def sdh_fix_np(lev: np.ndarray, log2_size: int,
               scan_idx: int = 0) -> np.ndarray:
    """Enforce the sign-data-hiding parity invariant on quantised
    levels (xQuant SDH branch, TComTrQuant.cpp:1015, simplified): for
    every CG whose sig-coeff span exceeds 3, the parity of the absolute
    sum must equal the sign of the first (lowest-scan) coefficient.
    Adjusts one in-span coefficient by +/-1, preferring the smallest
    magnitude change."""
    from hmtpu.common.scan import scan_order

    out = lev.copy()
    flat = out.reshape(-1)
    scans = scan_order(log2_size, scan_idx).reshape(-1)
    sl = flat[scans]
    for ci in range(sl.size // 16):
        cg = sl[ci * 16:(ci + 1) * 16]
        nz = np.nonzero(cg)[0]
        if nz.size == 0 or nz.max() - nz.min() <= 3:
            continue
        want = 1 if cg[nz.min()] < 0 else 0
        if (np.abs(cg).sum() & 1) == want:
            continue
        # cheapest fix: decrement a |v|>1 coeff, else increment the
        # largest-|v| coeff (keeps first/last nonzero)
        cand = [p for p in nz if abs(cg[p]) > 1]
        if cand:
            p = cand[0]
            cg[p] -= np.sign(cg[p])
        else:
            p = int(nz[0])
            cg[p] += np.sign(cg[p])
        sl[ci * 16:(ci + 1) * 16] = cg
    flat[scans] = sl
    return out


# ---------------------------------------------------------------------------
# scalar references (test oracle only)

def quantize_ref(coeff: np.ndarray, qp: int, log2_size: int,
                 bit_depth: int = 8, is_intra: bool = True) -> np.ndarray:
    qp = qp + 6 * (bit_depth - 8)
    per, rem = qp // 6, qp % 6
    qbits = QUANT_SHIFT + per + transform_shift(log2_size, bit_depth)
    add = (171 if is_intra else 85) << (qbits - 9)
    out = np.empty_like(coeff)
    it = np.nditer(coeff, flags=["multi_index"])
    for c in it:
        c = int(c)
        mag = (abs(c) * _QUANT_SCALES[rem] + add) >> qbits
        mag = min(mag, COEFF_MAX)
        out[it.multi_index] = -mag if c < 0 else mag
    return out


def dequantize_ref(level: np.ndarray, qp: int, log2_size: int,
                   bit_depth: int = 8) -> np.ndarray:
    qp = qp + 6 * (bit_depth - 8)
    per, rem = qp // 6, qp % 6
    shift = IQUANT_SHIFT - transform_shift(log2_size, bit_depth)
    scale = _INV_QUANT_SCALES[rem] << per
    out = np.empty_like(level)
    it = np.nditer(level, flags=["multi_index"])
    for lv in it:
        v = int(lv) * scale
        v = ((v + (1 << (shift - 1))) >> shift) if shift > 0 else (v << -shift)
        out[it.multi_index] = min(max(v, COEFF_MIN), COEFF_MAX)
    return out


# ---------------------------------------------------------------------------
# vectorised numpy twins (host sequential passes; exact same arithmetic)

def quantize_np(coeff: np.ndarray, qp: int, log2_size: int,
                bit_depth: int = 8, is_intra: bool = True) -> np.ndarray:
    qp = qp + 6 * (bit_depth - 8)
    per, rem = qp // 6, qp % 6
    qbits = QUANT_SHIFT + per + transform_shift(log2_size, bit_depth)
    add = (171 if is_intra else 85) << (qbits - 9)
    mag = (np.abs(coeff).astype(np.int64) * _QUANT_SCALES[rem] + add) >> qbits
    mag = np.minimum(mag, COEFF_MAX)
    return np.where(coeff < 0, -mag, mag).astype(np.int32)


def dequantize_np(level: np.ndarray, qp: int, log2_size: int,
                  bit_depth: int = 8) -> np.ndarray:
    qp = qp + 6 * (bit_depth - 8)
    per, rem = qp // 6, qp % 6
    shift = IQUANT_SHIFT - transform_shift(log2_size, bit_depth)
    scale = _INV_QUANT_SCALES[rem] << per
    out = (level.astype(np.int64) * scale + (1 << (shift - 1))) >> shift
    return np.clip(out, COEFF_MIN, COEFF_MAX).astype(np.int32)

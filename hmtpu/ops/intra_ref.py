"""Scalar reference implementation of HEVC intra prediction
(H.265 8.4.4.2.*), used as the unit-test oracle for the batched device
kernels in ops/intra_pred.py and by the decoder oracle.

Conventions: all planes are numpy [row, col] = [y, x].  The neighbour
reference samples of an NxN block are carried as a single 1-D array
`ref` of length 4N+1 laid out bottom-left -> top-right:

    ref[0 .. 2N-1]  = left column bottom-to-top  = p[-1][2N-1 .. 0]
    ref[2N]         = corner                     = p[-1][-1]
    ref[2N+1..4N]   = top row left-to-right      = p[0 .. 2N-1][-1]

Parity: TComPrediction.cpp:229 (xPredIntraAng), :731 (planar),
TComPattern.cpp (reference assembly / substitution / filtering).
"""
from __future__ import annotations

import numpy as np

# intraPredAngle, modes 2..34 (H.265 Table 8-5)
ANGLES = np.array([32, 26, 21, 17, 13, 9, 5, 2, 0, -2, -5, -9, -13, -17,
                   -21, -26, -32, -26, -21, -17, -13, -9, -5, -2, 0, 2, 5,
                   9, 13, 17, 21, 26, 32], dtype=np.int32)
# invAngle for angles -2..-32 (Table 8-6), indexed by mode 11..25
INV_ANGLES = {-2: -4096, -5: -1638, -9: -910, -13: -630, -17: -482,
              -21: -390, -26: -315, -32: -256}


def angle_of(mode: int) -> int:
    return int(ANGLES[mode - 2])


def inv_angle_of(mode: int) -> int:
    return INV_ANGLES[angle_of(mode)]


# -- ref array helpers ------------------------------------------------------

def ref_left(ref: np.ndarray, n: int, y: int) -> int:
    """p[-1][y], y in [-1, 2N-1] (y==-1 is the corner)."""
    return int(ref[2 * n - 1 - y])


def ref_top(ref: np.ndarray, n: int, x: int) -> int:
    """p[x][-1], x in [-1, 2N-1]."""
    return int(ref[2 * n + 1 + x])


def substitute_unavailable(raw: np.ndarray, avail: np.ndarray,
                           bit_depth: int = 8) -> np.ndarray:
    """Reference sample substitution (8.4.4.2.2) over the 4N+1 layout:
    scan from index 0 upward, each unavailable sample copies its
    predecessor; index 0 itself takes the first available sample."""
    n4 = len(raw)
    out = raw.astype(np.int32).copy()
    if not avail.any():
        out[:] = 1 << (bit_depth - 1)
        return out
    if not avail[0]:
        out[0] = out[np.argmax(avail)]
    # forward-fill: each unavailable sample copies its predecessor
    av = avail.copy()
    av[0] = True
    idx = np.maximum.accumulate(np.where(av, np.arange(n4), 0))
    return out[idx]


def filter_reference(ref: np.ndarray, n: int, bit_depth: int = 8,
                     strong_smoothing: bool = False) -> np.ndarray:
    """[1 2 1]/4 smoothing (8.4.4.2.3); optional strong (bi-linear)
    filter for 32x32."""
    out = ref.astype(np.int32).copy()
    ln = len(ref)
    if strong_smoothing and n == 32:
        thr = 1 << (bit_depth - 5)
        corner = ref_left(ref, n, -1)
        topmid = ref_top(ref, n, n - 1)
        topend = ref_top(ref, n, 2 * n - 1)
        leftmid = ref_left(ref, n, n - 1)
        leftend = ref_left(ref, n, 2 * n - 1)
        bi_hor = abs(corner + topend - 2 * topmid) < thr
        bi_ver = abs(corner + leftend - 2 * leftmid) < thr
        if bi_hor and bi_ver:
            # bottom-left..corner..top-right bilinear interpolation
            # (8.4.4.2.3: pF[-1][y] = ((63-y)*p[-1][-1]+(y+1)*p[-1][63]+32)>>6)
            for y in range(2 * n - 1):
                out[2 * n - 1 - y] = ((63 - y) * corner +
                                      (y + 1) * leftend + 32) >> 6
            out[2 * n] = corner
            for x in range(2 * n - 1):
                out[2 * n + 1 + x] = ((63 - x) * corner +
                                      (x + 1) * topend + 32) >> 6
            out[0] = leftend
            out[4 * n] = topend
            return out
    out[1:-1] = (ref[:-2].astype(np.int32) + 2 * ref[1:-1] + ref[2:] + 2) >> 2
    return out


def should_filter(mode: int, n: int, is_luma: bool) -> bool:
    """Filtering decision of 8.4.4.2.3 (planar filters via the
    minDist test since min(|0-26|,|0-10|)=10 exceeds every threshold)."""
    if not is_luma:
        return False
    if mode == 1:  # DC
        return False
    if n == 4:
        return False
    min_dist = min(abs(mode - 26), abs(mode - 10))
    thres = {8: 7, 16: 1, 32: 0}[n]
    return min_dist > thres


def clip1(v: int, bit_depth: int) -> int:
    return max(0, min((1 << bit_depth) - 1, v))


# -- prediction modes -------------------------------------------------------

def predict_planar(ref: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros((n, n), dtype=np.int32)
    log2n = n.bit_length() - 1
    top_n = ref_top(ref, n, n)        # p[N][-1]
    left_n = ref_left(ref, n, n)      # p[-1][N]
    for y in range(n):
        for x in range(n):
            out[y, x] = ((n - 1 - x) * ref_left(ref, n, y)
                         + (x + 1) * top_n
                         + (n - 1 - y) * ref_top(ref, n, x)
                         + (y + 1) * left_n + n) >> (log2n + 1)
    return out


def predict_dc(ref: np.ndarray, n: int, is_luma: bool,
               bit_depth: int = 8) -> np.ndarray:
    s = sum(ref_top(ref, n, x) for x in range(n)) + \
        sum(ref_left(ref, n, y) for y in range(n))
    dc = (s + n) >> (n.bit_length())
    out = np.full((n, n), dc, dtype=np.int32)
    if is_luma and n < 32:
        out[0, 0] = (ref_left(ref, n, 0) + 2 * dc + ref_top(ref, n, 0) + 2) >> 2
        for x in range(1, n):
            out[0, x] = (ref_top(ref, n, x) + 3 * dc + 2) >> 2
        for y in range(1, n):
            out[y, 0] = (ref_left(ref, n, y) + 3 * dc + 2) >> 2
    return out


def predict_angular(ref: np.ndarray, n: int, mode: int, is_luma: bool,
                    bit_depth: int = 8,
                    boundary_filter: bool = True) -> np.ndarray:
    a = angle_of(mode)
    out = np.zeros((n, n), dtype=np.int32)
    if mode >= 18:
        # main reference = top row; refm[t] for t in [-N..2N]
        refm = {}
        for t in range(0, 2 * n + 1):
            refm[t] = ref_top(ref, n, t - 1)
        if a < 0:
            tmin = (n * a) >> 5
            if tmin < -1:  # 8.4.4.2.6 extension condition
                inv = inv_angle_of(mode)
                for t in range(-1, tmin - 1, -1):
                    refm[t] = ref_left(ref, n, -1 + ((t * inv + 128) >> 8))
        for y in range(n):
            idx = ((y + 1) * a) >> 5
            fact = ((y + 1) * a) & 31
            for x in range(n):
                r0 = refm[x + idx + 1]
                r1 = refm.get(x + idx + 2, r0)
                out[y, x] = ((32 - fact) * r0 + fact * r1 + 16) >> 5
        if mode == 26 and is_luma and n < 32 and boundary_filter:
            c = ref_left(ref, n, -1)
            for y in range(n):
                out[y, 0] = clip1(ref_top(ref, n, 0)
                                  + ((ref_left(ref, n, y) - c) >> 1), bit_depth)
    else:
        refm = {}
        for t in range(0, 2 * n + 1):
            refm[t] = ref_left(ref, n, t - 1)
        if a < 0:
            tmin = (n * a) >> 5
            if tmin < -1:
                inv = inv_angle_of(mode)
                for t in range(-1, tmin - 1, -1):
                    refm[t] = ref_top(ref, n, -1 + ((t * inv + 128) >> 8))
        for x in range(n):
            idx = ((x + 1) * a) >> 5
            fact = ((x + 1) * a) & 31
            for y in range(n):
                r0 = refm[y + idx + 1]
                r1 = refm.get(y + idx + 2, r0)
                out[y, x] = ((32 - fact) * r0 + fact * r1 + 16) >> 5
        if mode == 10 and is_luma and n < 32 and boundary_filter:
            c = ref_left(ref, n, -1)
            for x in range(n):
                out[0, x] = clip1(ref_left(ref, n, 0)
                                  + ((ref_top(ref, n, x) - c) >> 1), bit_depth)
    return out


def predict_mode_ref(ref_filtered: np.ndarray, ref_unfiltered: np.ndarray,
                     n: int, mode: int, is_luma: bool,
                     bit_depth: int = 8) -> np.ndarray:
    """Predict one mode, choosing filtered/unfiltered ref per spec."""
    use_filt = should_filter(mode, n, is_luma)
    ref = ref_filtered if use_filt else ref_unfiltered
    if mode == 0:
        return predict_planar(ref, n)
    if mode == 1:
        return predict_dc(ref_unfiltered, n, is_luma, bit_depth)
    return predict_angular(ref, n, mode, is_luma, bit_depth)

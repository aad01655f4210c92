"""Variable-CU-size intra RDO engine — the TPU-first inversion of HM's
depth-first recursive search (TEncCu.cpp:352 xCompressCU,
TEncSearch.cpp:2945 estIntraPredLumaQT).

Instead of recursing per CTU, the whole picture is evaluated
breadth-first as three dense grids (8/16/32 CUs).  Pass A runs entirely
on device: for every position of every size, all 35 intra modes are
predicted in one batched op, scored with 8x8-Hadamard SATD, and the
winner gets a full transform/quant/reconstruct RD cost.  The CU
quadtree is then chosen bottom-up on host by per-node argmin (the
breadth-first replacement for HM's xCompressCU recursion), and a cheap
closed-loop pass reconstructs the chosen leaves with spec-exact
reference availability so the bitstream decodes bit-exactly.

The open-loop decision pass references *source* pixels (decisions
only); the reconstruction pass references decoded neighbours exactly as
TComPattern/TComPrediction do, so encoder recon == decoder recon.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from hmtpu.common.geometry import ref_availability
from hmtpu.ops.intra_pred import (
    filter_reference_batched,
    predict_all_modes,
    predict_mode_np,
)
from hmtpu.ops.intra_ref import filter_reference, substitute_unavailable
from hmtpu.ops.quant import dequantize, dequantize_np, quantize, quantize_np
from hmtpu.ops.transform import (
    forward_np,
    forward_transform,
    inverse_np,
    inverse_transform,
)

SIZES = (8, 16, 32)


@dataclass
class LeafDecision:
    """One chosen intra CU (leaf of the coding quadtree).

    modes4: for an 8x8 CU with part NxN, the four 4x4 PU luma modes
    in z-order (lev_y then holds the four 4x4 TBs in their quadrant
    positions); None = part 2Nx2N."""
    mode: int
    log2: int
    lev_y: np.ndarray
    lev_cb: np.ndarray
    lev_cr: np.ndarray
    modes4: tuple | None = None
    # transform_skip_flag per 4x4 TB (Main profile TS scope): four
    # NxN luma PU flags in z-order + the 4x4 chroma TB pair of an
    # 8x8 CU; all zero unless the PPS enables transform skip
    ts_y4: tuple = (0, 0, 0, 0)
    ts_cb: int = 0
    ts_cr: int = 0


# ---------------------------------------------------------------------------
# pass A — batched open-loop cost per size (device)

@lru_cache(maxsize=None)
def _hadamard8() -> np.ndarray:
    h = np.array([[1]])
    for _ in range(3):
        h = np.block([[h, h], [h, -h]])
    return h


def _satd(resi: jnp.ndarray) -> jnp.ndarray:
    """(..., N, N) -> (...,) 8x8-Hadamard SATD (HM TComRdCost.cpp:303
    xCalcHADs8x8 semantics: per-tile (sum|coef| + 2) >> 2)."""
    n = resi.shape[-1]
    t = n // 8
    h8 = jnp.asarray(_hadamard8(), dtype=resi.dtype)
    r = resi.reshape(resi.shape[:-2] + (t, 8, t, 8))
    r = jnp.swapaxes(r, -3, -2)                      # (..., t, t, 8, 8)
    had = jnp.einsum("ij,...jk,lk->...il", h8, r, h8)
    per_tile = (jnp.sum(jnp.abs(had), axis=(-1, -2)) + 2) >> 2
    return jnp.sum(per_tile, axis=(-1, -2))


def _est_level_bits(lev: jnp.ndarray, log2n: int) -> jnp.ndarray:
    """(..., N, N) int levels -> (...,) approximate coded bits (stands in
    for the CABAC counter TEncBinCoderCABACCounter.cpp during search)."""
    a = jnp.abs(lev).astype(jnp.float32)
    nz = a > 0
    per = jnp.where(nz, 2.0 * jnp.log2(a + 1.0) + 1.0, 0.0)
    n_nz = jnp.sum(nz, axis=(-1, -2))
    last = jnp.where(n_nz > 0, 2.0 * log2n + 2.0, 0.0)
    return jnp.sum(per, axis=(-1, -2)) + last + 1.0   # +1 ~ cbf flag


def _blockify(plane: jnp.ndarray, n: int) -> jnp.ndarray:
    """(H, W) -> (H//n * W//n, n, n) raster-ordered blocks."""
    hh, ww = plane.shape
    b = plane.reshape(hh // n, n, ww // n, n)
    return jnp.swapaxes(b, 1, 2).reshape(-1, n, n)


@lru_cache(maxsize=None)
def _ref_gather_idx(h: int, w: int, n: int) -> np.ndarray:
    """Flat clamped gather indices (P, 4N+1) building every block's
    reference line from the source plane (open-loop pass only; the
    closed-loop pass uses spec availability)."""
    pys, pxs = np.meshgrid(np.arange(0, h, n), np.arange(0, w, n),
                           indexing="ij")
    pys = pys.reshape(-1, 1)
    pxs = pxs.reshape(-1, 1)
    k = np.arange(4 * n + 1)
    # layout of ops/intra_ref.py: [left col bottom..top, corner, top row]
    ry = np.empty((1, 4 * n + 1), dtype=np.int64)
    rx = np.empty((1, 4 * n + 1), dtype=np.int64)
    j = 2 * n - 1 - k[: 2 * n]
    ry[0, : 2 * n] = j
    rx[0, : 2 * n] = -1
    ry[0, 2 * n] = -1
    rx[0, 2 * n] = -1
    ry[0, 2 * n + 1:] = -1
    rx[0, 2 * n + 1:] = np.arange(2 * n)
    yy = np.clip(pys + ry, 0, h - 1)
    xx = np.clip(pxs + rx, 0, w - 1)
    return (yy * w + xx).astype(np.int32)


# RMD mode-bit estimate: flat cost with the HM-style cheap-mode bias.
_MODE_BITS = np.full(35, 5.0, dtype=np.float32)
_MODE_BITS[0] = _MODE_BITS[1] = 2.5
_MODE_BITS[10] = _MODE_BITS[26] = 3.5


@partial(jax.jit,
         static_argnames=("n", "qp", "qpc", "bd", "sis"))
def _size_pass(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
               n: int, qp: int, qpc: int, bd: int, sis: bool,
               lam: float, lam_sqrt: float):
    """All positions of one CU size: best mode + open-loop RD cost.

    Returns (best_mode (P,), cost (P,)) with P = (H//n)*(W//n) raster.
    """
    h, w = y.shape
    log2 = int(n).bit_length() - 1

    # ---- luma: refs, all-mode prediction, SATD mode decision
    idx = jnp.asarray(_ref_gather_idx(h, w, n))
    ref_u = jnp.take(y.reshape(-1), idx, axis=0)
    ref_f = filter_reference_batched(ref_u, n, bd, strong=sis)
    preds = predict_all_modes(ref_u, ref_f, n, True, bd)      # (P,35,n,n)
    org = _blockify(y, n)
    satd = _satd(org[:, None] - preds).astype(jnp.float32)
    rd = satd + lam_sqrt * jnp.asarray(_MODE_BITS)[None]
    best = jnp.argmin(rd, axis=1)                             # (P,)
    pred = jnp.take_along_axis(
        preds, best[:, None, None, None], axis=1)[:, 0]

    # ---- luma full RD for the winner
    resi = org - pred
    coef = forward_transform(resi, n, bd)
    lev = quantize(coef, qp, log2, bd, True)
    deq = dequantize(lev, qp, log2, bd)
    r = inverse_transform(deq, n, bd)
    maxv = (1 << bd) - 1
    rec = jnp.clip(pred + r, 0, maxv)
    d_y = jnp.sum((org - rec).astype(jnp.float32) ** 2, axis=(-1, -2))
    b_y = _est_level_bits(lev, log2)

    # ---- chroma (DM mode), half resolution
    cn, clog2 = n // 2, log2 - 1
    cidx = jnp.asarray(_ref_gather_idx(h // 2, w // 2, cn))
    d_c = jnp.zeros_like(d_y)
    b_c = jnp.zeros_like(b_y)
    for plane in (u, v):
        cref = jnp.take(plane.reshape(-1), cidx, axis=0)
        cpreds = predict_all_modes(cref, cref, cn, False, bd)
        cpred = jnp.take_along_axis(
            cpreds, best[:, None, None, None], axis=1)[:, 0]
        corg = _blockify(plane, cn)
        cresi = corg - cpred
        ccoef = forward_transform(cresi, cn, bd)
        clev = quantize(ccoef, qpc, clog2, bd, True)
        cdeq = dequantize(clev, qpc, clog2, bd)
        cr = inverse_transform(cdeq, cn, bd)
        crec = jnp.clip(cpred + cr, 0, maxv)
        d_c += jnp.sum((corg - crec).astype(jnp.float32) ** 2,
                       axis=(-1, -2))
        b_c += _est_level_bits(clev, clog2)

    hdr_bits = 9.0 if n == 8 else 8.0     # part/mode/chroma/cbf flags
    cost = d_y + d_c + lam * (b_y + b_c + hdr_bits)
    return best.astype(jnp.int32), cost


def openloop_costs(frame_y: np.ndarray, frame_u: np.ndarray,
                   frame_v: np.ndarray, qp: int, qpc: int, bd: int,
                   sis: bool, lam: float):
    """Run pass A for every size; returns {n: (mode_grid, cost_grid)}."""
    h, w = frame_y.shape
    yj = jnp.asarray(frame_y, dtype=jnp.int32)
    uj = jnp.asarray(frame_u, dtype=jnp.int32)
    vj = jnp.asarray(frame_v, dtype=jnp.int32)
    out = {}
    for n in SIZES:
        if h < n or w < n:
            continue
        # evaluate the full-block grid; partial edges are handled by
        # the tree selection falling back to smaller sizes
        hh, ww = (h // n) * n, (w // n) * n
        mode, cost = _size_pass(yj[:hh, :ww], uj[:hh // 2, :ww // 2],
                                vj[:hh // 2, :ww // 2], n, qp, qpc, bd,
                                sis, float(lam), float(np.sqrt(lam)))
        out[n] = (np.asarray(mode).reshape(h // n, w // n),
                  np.asarray(cost).reshape(h // n, w // n))
    return out


# ---------------------------------------------------------------------------
# tree selection — bottom-up per-node argmin (host)

def select_tree(costs: dict, lam: float, w: int, h: int, ctu: int,
                log2_ctu: int):
    """Choose the CU quadtree.  Returns (leaves, depth8, mode8) where
    leaves is {(x, y): (log2, mode)} and depth8/mode8 are per-8x8-cell
    maps (coding-tree depth relative to the CTU, chosen luma mode)."""
    w8, h8 = w // 8, h // 8
    depth8 = np.zeros((h8, w8), dtype=np.int32)
    mode8 = np.full((h8, w8), -1, dtype=np.int32)
    leaves: dict[tuple[int, int], tuple[int, int]] = {}
    split_bits = 1.0

    def best(x: int, y: int, log2: int):
        size = 1 << log2
        inside = x + size <= w and y + size <= h
        leaf_cost = np.inf
        if inside and size in costs:
            _, cgrid = costs[size]
            leaf_cost = float(cgrid[y // size, x // size])
        split_cost = np.inf
        plan = None
        if log2 > 3:
            half = size >> 1
            acc = lam * split_bits
            plan = []
            for dy, dx in ((0, 0), (0, half), (half, 0), (half, half)):
                if x + dx < w and y + dy < h:
                    c, p = best(x + dx, y + dy, log2 - 1)
                    acc += c
                    plan.append(p)
            split_cost = acc
        if leaf_cost <= split_cost:
            return leaf_cost, ("leaf", x, y, log2)
        return split_cost, ("split", plan)

    def emit(node, depth: int):
        if node[0] == "leaf":
            _, x, y, log2 = node
            size = 1 << log2
            mgrid, _ = costs[size]
            mode = int(mgrid[y // size, x // size])
            leaves[(x, y)] = (log2, mode)
            s8 = size // 8
            depth8[y // 8:y // 8 + s8, x // 8:x // 8 + s8] = depth
            mode8[y // 8:y // 8 + s8, x // 8:x // 8 + s8] = mode
        else:
            for child in node[1]:
                emit(child, depth + 1)

    for cty in range(0, h, ctu):
        for ctx in range(0, w, ctu):
            _, plan = best(ctx, cty, log2_ctu)
            emit(plan, 0)
    return leaves, depth8, mode8


# ---------------------------------------------------------------------------
# pass B — closed-loop reconstruction of the chosen leaves (spec-exact)

def reconstruct(frame_y, frame_u, frame_v, leaves, qp: int, qpc: int,
                bd: int, sis: bool, w: int, h: int, ctu: int,
                log2_ctu: int, sdh: bool = False):
    """Reconstruct the picture in CTU-raster/z-scan order with exact
    decoder availability.  Returns (rec_y, rec_u, rec_v, decisions)."""
    maxv = (1 << bd) - 1
    rec_y = np.zeros((h, w), dtype=np.int32)
    rec_u = np.zeros((h // 2, w // 2), dtype=np.int32)
    rec_v = np.zeros((h // 2, w // 2), dtype=np.int32)
    decisions: dict[tuple[int, int], LeafDecision] = {}

    from hmtpu.encoder.intra import gather_ref_line

    def do_leaf(x: int, y: int, log2: int, mode: int):
        n = 1 << log2
        org = frame_y[y:y + n, x:x + n].astype(np.int32)
        avail = ref_availability(x, y, n, w, h, log2_ctu)
        raw = gather_ref_line(rec_y, x, y, n)
        ref_u_line = substitute_unavailable(raw, avail, bd)
        ref_f_line = filter_reference(ref_u_line, n, bd, sis)
        pred = predict_mode_np(ref_u_line, ref_f_line, n, mode, True, bd)
        coef = forward_np((org - pred)[None], bd)[0]
        lev = quantize_np(coef, qp, log2, bd, True)
        if sdh and lev.any():
            from hmtpu.common.scan import intra_scan_idx
            from hmtpu.ops.quant import sdh_fix_np
            lev = sdh_fix_np(lev, log2, intra_scan_idx(mode, log2, True))
        if lev.any():
            r = inverse_np(dequantize_np(lev, qp, log2, bd)[None], bd)[0]
        else:
            r = 0
        rec_y[y:y + n, x:x + n] = np.clip(pred + r, 0, maxv)

        cx, cy, cn, clog2 = x // 2, y // 2, n // 2, log2 - 1
        lev_c = []
        for porg, prec in ((frame_u, rec_u), (frame_v, rec_v)):
            corg = porg[cy:cy + cn, cx:cx + cn].astype(np.int32)
            avail_c = ref_availability(cx, cy, cn, w // 2, h // 2,
                                       log2_ctu - 1)
            raw_c = gather_ref_line(prec, cx, cy, cn)
            ref_c = substitute_unavailable(raw_c, avail_c, bd)
            pred_c = predict_mode_np(ref_c, ref_c, cn, mode, False, bd)
            coef_c = forward_np((corg - pred_c)[None], bd)[0]
            lv = quantize_np(coef_c, qpc, clog2, bd, True)
            if sdh and lv.any():
                from hmtpu.common.scan import intra_scan_idx
                from hmtpu.ops.quant import sdh_fix_np
                lv = sdh_fix_np(lv, clog2,
                                intra_scan_idx(mode, clog2, False))
            if lv.any():
                rc = inverse_np(dequantize_np(lv, qpc, clog2, bd)[None],
                                bd)[0]
            else:
                rc = 0
            prec[cy:cy + cn, cx:cx + cn] = np.clip(pred_c + rc, 0, maxv)
            lev_c.append(lv)
        decisions[(x, y)] = LeafDecision(mode, log2, lev, lev_c[0],
                                         lev_c[1])

    def zscan(x0: int, y0: int, log2: int):
        if (x0, y0) in leaves and leaves[(x0, y0)][0] == log2:
            do_leaf(x0, y0, log2, leaves[(x0, y0)][1])
            return
        half = 1 << (log2 - 1)
        for dy, dx in ((0, 0), (0, half), (half, 0), (half, half)):
            if x0 + dx < w and y0 + dy < h:
                zscan(x0 + dx, y0 + dy, log2 - 1)

    for cty in range(0, h, ctu):
        for ctx in range(0, w, ctu):
            zscan(ctx, cty, log2_ctu)
    return rec_y, rec_u, rec_v, decisions


def leaf_id_map(depth8: np.ndarray, log2_ctu: int) -> np.ndarray:
    """Per-8x8-cell unique leaf id (origin cell index) from the depth
    map — feeds the deblocking TU/CU edge mask."""
    h8, w8 = depth8.shape
    ii, jj = np.meshgrid(np.arange(h8), np.arange(w8), indexing="ij")
    s8 = ((1 << log2_ctu) >> depth8) // 8          # leaf size in cells
    oi = (ii // s8) * s8
    oj = (jj // s8) * s8
    return (oi * w8 + oj).astype(np.int32)

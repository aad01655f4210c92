"""In-loop deblocking filter (H.265 8.7.2).

Capability parity with the reference's TComLoopFilter
(TComLoopFilter.cpp:130 loopFilterPic, :557 xEdgeFilterLuma, :676
xEdgeFilterChroma), re-designed batched: boundary strengths for every
4-sample edge segment of the picture are derived as dense tensor ops
from per-4x4 metadata, then all vertical edges are filtered in one
vectorized pass followed by all horizontal edges (the spec's two-stage
order).  numpy is the bit-exact host path; the wavefront device
pipeline reuses the same arithmetic in jit form.

The picture is filtered on the 8x8 luma grid; chroma (4:2:0) on the
8x8 chroma-sample grid, BS==2 (intra) edges only.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from hmtpu.common.spec_tables import chroma_qp_from_luma

# Table 8-12: beta' (Q 0..51) and tC' (Q 0..53)
BETA_TABLE = np.array(
    [0] * 16 + [6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 20, 22,
                24, 26, 28, 30, 32, 34, 36, 38, 40, 42, 44, 46, 48, 50,
                52, 54, 56, 58, 60, 62, 64], dtype=np.int32)
TC_TABLE = np.array(
    [0] * 18 + [1] * 9 + [2] * 4 + [3] * 4 + [4] * 3 + [5] * 2 + [6] * 2
    + [7, 8, 9, 10, 11, 13, 14, 16, 18, 20, 22, 24], dtype=np.int32)
assert BETA_TABLE.size == 52 and TC_TABLE.size == 54


@dataclass
class DeblockMeta:
    """Per-4x4-block coding metadata the BS derivation needs
    (8.7.2.4); mv/ref arrays carry both reference lists."""
    intra: np.ndarray       # (H/4, W/4) bool: block is intra-coded
    cbf: np.ndarray         # (H/4, W/4) bool: TU has nonzero luma coeffs
    mv_x: np.ndarray        # (2, H/4, W/4) int32 quarter-pel
    mv_y: np.ndarray
    ref_poc: np.ndarray     # (2, H/4, W/4) int32; -1 when list unused
    # CU/TU/PU boundary masks on the 8-pel grid (8.7.2.2 edgeFlags);
    # None = every 8-grid edge is a boundary (uniform 8x8 CUs)
    edge_v: np.ndarray | None = None    # (H/8, W/8 - 1) bool
    edge_h: np.ndarray | None = None    # (H/8 - 1, W/8) bool


def _motion_bs(pmx, pmy, pr, qmx, qmy, qr) -> np.ndarray:
    """Vectorized 8.7.2.4 motion-difference test between inter blocks.
    Inputs shaped (2, ...) over the two lists; -1 ref = unused."""
    big = 1 << 20
    pu0, pu1 = pr[0] >= 0, pr[1] >= 0
    qu0, qu1 = qr[0] >= 0, qr[1] >= 0
    cnt_p = pu0.astype(np.int32) + pu1
    cnt_q = qu0.astype(np.int32) + qu1
    # sorted reference-picture pair (single-MV: lo == hi == the ref)
    p_lo = np.minimum(np.where(pu0, pr[0], big), np.where(pu1, pr[1], big))
    p_hi = np.maximum(np.where(pu0, pr[0], -big),
                      np.where(pu1, pr[1], -big))
    q_lo = np.minimum(np.where(qu0, qr[0], big), np.where(qu1, qr[1], big))
    q_hi = np.maximum(np.where(qu0, qr[0], -big),
                      np.where(qu1, qr[1], -big))
    diff_set = (cnt_p != cnt_q) | (p_lo != q_lo) | (p_hi != q_hi)

    def far(ax, ay, bx, by):
        return (np.abs(ax - bx) >= 4) | (np.abs(ay - by) >= 4)

    # single MV each: compare the used vectors
    pux = np.where(pu0, pmx[0], pmx[1])
    puy = np.where(pu0, pmy[0], pmy[1])
    qux = np.where(qu0, qmx[0], qmx[1])
    quy = np.where(qu0, qmy[0], qmy[1])
    far_single = far(pux, puy, qux, quy)

    # two MVs each, two distinct refs: match vectors by ref picture
    p_is_lo = np.where(pu0 & (pr[0] == p_lo), True, False)
    q_is_lo = np.where(qu0 & (qr[0] == q_lo), True, False)
    plx = np.where(p_is_lo, pmx[0], pmx[1])
    ply = np.where(p_is_lo, pmy[0], pmy[1])
    phx = np.where(p_is_lo, pmx[1], pmx[0])
    phy = np.where(p_is_lo, pmy[1], pmy[0])
    qlx = np.where(q_is_lo, qmx[0], qmx[1])
    qly = np.where(q_is_lo, qmy[0], qmy[1])
    qhx = np.where(q_is_lo, qmx[1], qmx[0])
    qhy = np.where(q_is_lo, qmy[1], qmy[0])
    far_matched = far(plx, ply, qlx, qly) | far(phx, phy, qhx, qhy)

    # two MVs each, both referencing the same picture: BS 1 only if
    # both pairings exceed the threshold
    far_same = (far(pmx[0], pmy[0], qmx[0], qmy[0])
                | far(pmx[1], pmy[1], qmx[1], qmy[1])) \
        & (far(pmx[0], pmy[0], qmx[1], qmy[1])
           | far(pmx[1], pmy[1], qmx[0], qmy[0]))

    both_two = (cnt_p == 2) & (cnt_q == 2)
    mv_far = np.where(both_two,
                      np.where(p_lo == p_hi, far_same, far_matched),
                      far_single)
    return diff_set | mv_far


def boundary_strengths(meta: DeblockMeta, vertical: bool) -> np.ndarray:
    """BS for every 4-sample segment on the 8-pel grid.

    Returns (H/4, W/8) for vertical edges (edge x = 8*j, segment rows
    of 4) or (H/8, W/4) for horizontal edges."""
    if vertical:
        sel_p, sel_q = np.s_[..., :, 1::2], np.s_[..., :, 2::2]
    else:
        sel_p, sel_q = np.s_[..., 1::2, :], np.s_[..., 2::2, :]
    qi = meta.intra[sel_q]
    pi = meta.intra[sel_p]
    pc = meta.cbf[sel_p]
    qc = meta.cbf[sel_q]
    pmx, qmx = meta.mv_x[sel_p], meta.mv_x[sel_q]
    pmy, qmy = meta.mv_y[sel_p], meta.mv_y[sel_q]
    pr, qr = meta.ref_poc[sel_p], meta.ref_poc[sel_q]
    # p: blocks left of/above internal edges 8,16,... ; q: right/below.
    sh = qi.shape
    pi = pi[: sh[0], : sh[1]]
    pc = pc[: sh[0], : sh[1]]
    pmx = pmx[:, : sh[0], : sh[1]]
    pmy = pmy[:, : sh[0], : sh[1]]
    pr = pr[:, : sh[0], : sh[1]]

    bs = np.zeros(sh, dtype=np.int32)
    any_intra = pi | qi
    bs[any_intra] = 2
    cond1 = pc | qc | _motion_bs(pmx, pmy, pr, qmx, qmy, qr)
    bs[~any_intra & cond1] = 1

    # mask out 8-grid positions that are not CU/TU/PU boundaries
    edge = meta.edge_v if vertical else meta.edge_h
    if edge is not None:
        # edge is per-8x8 cell; BS segments are 4 samples -> repeat 2x
        # along the segment axis
        e = np.repeat(edge, 2, axis=0 if vertical else 1)
        bs *= e[: bs.shape[0], : bs.shape[1]]
    return bs


def _clip1(x, maxv):
    return np.clip(x, 0, maxv)


def _filter_luma_edges(plane: np.ndarray, bs: np.ndarray, qp: int,
                       bd: int, beta_off: int, tc_off: int,
                       vertical: bool) -> None:
    """Filter all internal luma edges of one direction in place.

    bs: (n_seg_rows, n_edges) for vertical; transposed handling makes
    horizontal identical by operating on plane.T."""
    pl = plane if vertical else plane.T
    # in transposed (horizontal) space segments run along x, edges
    # along y -> (n_seg, n_edge) needs the transpose of bs_h
    bsv = bs if vertical else bs.T
    # segments: rows of 4 at y = 4*i, edges at x = 8*(j+1)
    sy, ex = np.nonzero(bsv > 0)
    if sy.size == 0:
        return
    ys = sy * 4                     # segment top row
    xs = (ex + 1) * 8               # edge column
    tc_q = np.clip(qp + 2 * (bsv[sy, ex] - 1) + (tc_off << 1), 0, 53)
    b_q = np.clip(qp + (beta_off << 1), 0, 51)
    beta = int(BETA_TABLE[b_q]) << (bd - 8)
    tc = (TC_TABLE[tc_q] << (bd - 8)).astype(np.int32)
    maxv = (1 << bd) - 1

    # gather p3..p0,q0..q3 for the 4 lines of each segment: (S, 4, 8)
    rows = ys[:, None] + np.arange(4)[None, :]
    cols = xs[:, None] + np.arange(-4, 4)[None, :]
    seg = pl[rows[:, :, None], cols[:, None, :]].astype(np.int32)
    p3, p2, p1, p0 = seg[:, :, 0], seg[:, :, 1], seg[:, :, 2], seg[:, :, 3]
    q0, q1, q2, q3 = seg[:, :, 4], seg[:, :, 5], seg[:, :, 6], seg[:, :, 7]

    dp = np.abs(p2 - 2 * p1 + p0)              # (S, 4)
    dq = np.abs(q2 - 2 * q1 + q0)
    dp03 = dp[:, 0] + dp[:, 3]
    dq03 = dq[:, 0] + dq[:, 3]
    d = dp03 + dq03
    on = d < beta
    if not on.any():
        return

    # strong/weak decision from lines 0 and 3 (8.7.2.5.3)
    def dsam(i):
        return ((2 * (dp[:, i] + dq[:, i]) < (beta >> 2))
                & (np.abs(p3[:, i] - p0[:, i])
                   + np.abs(q0[:, i] - q3[:, i]) < (beta >> 3))
                & (np.abs(p0[:, i] - q0[:, i]) < ((5 * tc + 1) >> 1)))

    strong = on & dsam(0) & dsam(3)
    weak = on & ~strong

    tc4 = tc[:, None]
    out = seg.copy()

    # ---- strong filter (3 taps each side)
    s = strong
    if s.any():
        t2 = 2 * tc4[s]
        out[s, :, 3] = np.clip((p2[s] + 2 * p1[s] + 2 * p0[s] + 2 * q0[s]
                                + q1[s] + 4) >> 3, p0[s] - t2, p0[s] + t2)
        out[s, :, 2] = np.clip((p2[s] + p1[s] + p0[s] + q0[s] + 2) >> 2,
                               p1[s] - t2, p1[s] + t2)
        out[s, :, 1] = np.clip((2 * p3[s] + 3 * p2[s] + p1[s] + p0[s]
                                + q0[s] + 4) >> 3, p2[s] - t2, p2[s] + t2)
        out[s, :, 4] = np.clip((q2[s] + 2 * q1[s] + 2 * q0[s] + 2 * p0[s]
                                + p1[s] + 4) >> 3, q0[s] - t2, q0[s] + t2)
        out[s, :, 5] = np.clip((q2[s] + q1[s] + q0[s] + p0[s] + 2) >> 2,
                               q1[s] - t2, q1[s] + t2)
        out[s, :, 6] = np.clip((2 * q3[s] + 3 * q2[s] + q1[s] + q0[s]
                                + p0[s] + 4) >> 3, q2[s] - t2, q2[s] + t2)

    # ---- weak filter
    wmask = weak
    if wmask.any():
        delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
        do_line = wmask[:, None] & (np.abs(delta) < 10 * tc4)
        dcl = np.clip(delta, -tc4, tc4)
        np0 = _clip1(p0 + dcl, maxv)
        nq0 = _clip1(q0 - dcl, maxv)
        out[:, :, 3] = np.where(do_line, np0, out[:, :, 3])
        out[:, :, 4] = np.where(do_line, nq0, out[:, :, 4])
        side_thresh = (beta + (beta >> 1)) >> 3
        tc2 = tc4 >> 1
        filt_p = (dp03 < side_thresh)[:, None] & do_line
        filt_q = (dq03 < side_thresh)[:, None] & do_line
        dp1 = np.clip((((p2 + p0 + 1) >> 1) - p1 + dcl) >> 1, -tc2, tc2)
        dq1 = np.clip((((q2 + q0 + 1) >> 1) - q1 - dcl) >> 1, -tc2, tc2)
        out[:, :, 2] = np.where(filt_p, _clip1(p1 + dp1, maxv),
                                out[:, :, 2])
        out[:, :, 5] = np.where(filt_q, _clip1(q1 + dq1, maxv),
                                out[:, :, 5])

    pl[rows[:, :, None], cols[:, None, :]] = out


def _filter_chroma_edges(plane: np.ndarray, bs2: np.ndarray, qp_c: int,
                         bd: int, tc_off: int, vertical: bool) -> None:
    """Chroma deblock: BS==2 edges on the chroma 8-grid, one sample
    each side (8.7.2.5.5).  bs2: bool (n_seg, n_edge) at 4-chroma-
    sample segment granularity."""
    pl = plane if vertical else plane.T
    sy, ex = np.nonzero(bs2)
    if sy.size == 0:
        return
    ys = sy * 4
    xs = (ex + 1) * 8
    q_idx = int(np.clip(qp_c + 2 + (tc_off << 1), 0, 53))
    tc = int(TC_TABLE[q_idx]) << (bd - 8)
    maxv = (1 << bd) - 1

    rows = ys[:, None] + np.arange(4)[None, :]
    cols = xs[:, None] + np.arange(-2, 2)[None, :]
    seg = pl[rows[:, :, None], cols[:, None, :]].astype(np.int32)
    p1, p0, q0, q1 = seg[:, :, 0], seg[:, :, 1], seg[:, :, 2], seg[:, :, 3]
    delta = np.clip((((q0 - p0) << 2) + p1 - q1 + 4) >> 3, -tc, tc)
    seg[:, :, 1] = _clip1(p0 + delta, maxv)
    seg[:, :, 2] = _clip1(q0 - delta, maxv)
    pl[rows[:, :, None], cols[:, None, :]] = seg


def deblock_frame(rec_y: np.ndarray, rec_u: np.ndarray,
                  rec_v: np.ndarray, meta: DeblockMeta, qp: int,
                  bd: int = 8, beta_off: int = 0, tc_off: int = 0,
                  cb_qp_off: int = 0, cr_qp_off: int = 0) -> None:
    """In-place deblock of one picture: all vertical edges, then all
    horizontal edges (8.7.2.2/8.7.2.3 ordering)."""
    bs_v = boundary_strengths(meta, vertical=True)
    _filter_luma_edges(rec_y, bs_v, qp, bd, beta_off, tc_off, True)
    bs_h = boundary_strengths(meta, vertical=False)
    # horizontal pass operates on the transposed plane: segments are
    # columns of 4, edges are rows — (n_edges, n_segs) -> transpose
    _filter_luma_edges(rec_y, bs_h, qp, bd, beta_off, tc_off, False)

    # chroma: edges on the 16-luma grid, BS==2 only; segment = 4 chroma
    # samples = 8 luma = 2 luma BS segments
    for off, plane in ((cb_qp_off, rec_u), (cr_qp_off, rec_v)):
        qp_c = chroma_qp_from_luma(qp + off)
        v2 = (bs_v[0::2, 1::2] == 2)    # 8-luma rows x 16-luma cols
        h2 = (bs_h[1::2, 0::2] == 2)
        _filter_chroma_edges(plane, v2, qp_c, bd, tc_off, True)
        _filter_chroma_edges(plane, h2.T, qp_c, bd, tc_off, False)


# ---------------------------------------------------------------------------
# Device (jnp) twin: dense, gather-free.  Vertical-edge patches
# (columns 8k+4 .. 8k+11 around the edge at 8(k+1)) tile the plane, so
# the whole pass is reshape + masked elementwise math — ideal VPU
# shape.  Bit-exact vs the numpy path (tests/test_deblock.py).

def _luma_edges_dev(pl, bs, qp: int, bd: int, beta_off: int,
                    tc_off: int):
    """Filter all internal vertical luma edges of `pl` (H, W) given BS
    (H/4, W/8) and return the filtered plane.  Call on the transposed
    plane with transposed BS for horizontal edges."""
    import jax.numpy as jnp

    h, w = pl.shape
    ne = w // 8 - 1                    # internal edges
    ns = h // 4
    bsv = bs[:, :ne]
    tc_q = jnp.clip(qp + 2 * (bsv - 1) + (tc_off << 1), 0, 53)
    b_q = jnp.clip(qp + (beta_off << 1), 0, 51)
    beta = jnp.asarray(BETA_TABLE)[b_q] << (bd - 8)
    tc = (jnp.asarray(TC_TABLE)[tc_q] << (bd - 8)).astype(jnp.int32)
    tc = tc[:, :, None]                # (ns, ne, 1) per line broadcast
    maxv = (1 << bd) - 1

    # (ns, 4, ne, 8) -> (ns, ne, 4, 8) patches around each edge
    seg0 = pl[:, 4:4 + ne * 8].reshape(ns, 4, ne, 8).transpose(0, 2, 1, 3)
    seg = seg0.astype(jnp.int32)
    p3, p2, p1, p0 = (seg[..., i] for i in range(4))
    q0, q1, q2, q3 = (seg[..., i] for i in range(4, 8))

    dp = jnp.abs(p2 - 2 * p1 + p0)               # (ns, ne, 4)
    dq = jnp.abs(q2 - 2 * q1 + q0)
    dp03 = dp[..., 0] + dp[..., 3]
    dq03 = dq[..., 0] + dq[..., 3]
    d = dp03 + dq03
    on = (d < beta) & (bsv > 0)

    def dsam(i):
        return ((2 * (dp[..., i] + dq[..., i]) < (beta >> 2))
                & (jnp.abs(p3[..., i] - p0[..., i])
                   + jnp.abs(q0[..., i] - q3[..., i]) < (beta >> 3))
                & (jnp.abs(p0[..., i] - q0[..., i])
                   < ((5 * tc[..., 0] + 1) >> 1)))

    strong = (on & dsam(0) & dsam(3))[..., None]  # (ns, ne, 1)
    weak = on[..., None] & ~strong

    t2 = 2 * tc
    sp0 = jnp.clip((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                   p0 - t2, p0 + t2)
    sp1 = jnp.clip((p2 + p1 + p0 + q0 + 2) >> 2, p1 - t2, p1 + t2)
    sp2 = jnp.clip((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3,
                   p2 - t2, p2 + t2)
    sq0 = jnp.clip((q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                   q0 - t2, q0 + t2)
    sq1 = jnp.clip((q2 + q1 + q0 + p0 + 2) >> 2, q1 - t2, q1 + t2)
    sq2 = jnp.clip((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3,
                   q2 - t2, q2 + t2)

    delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    do_line = weak & (jnp.abs(delta) < 10 * tc)
    dcl = jnp.clip(delta, -tc, tc)
    wp0 = jnp.clip(p0 + dcl, 0, maxv)
    wq0 = jnp.clip(q0 - dcl, 0, maxv)
    side = (beta + (beta >> 1)) >> 3
    tch = tc >> 1
    filt_p = (dp03 < side)[..., None] & do_line
    filt_q = (dq03 < side)[..., None] & do_line
    dp1 = jnp.clip((((p2 + p0 + 1) >> 1) - p1 + dcl) >> 1, -tch, tch)
    dq1 = jnp.clip((((q2 + q0 + 1) >> 1) - q1 - dcl) >> 1, -tch, tch)

    o_p2 = jnp.where(strong, sp2, p2)
    o_p1 = jnp.where(strong, sp1,
                     jnp.where(filt_p, jnp.clip(p1 + dp1, 0, maxv), p1))
    o_p0 = jnp.where(strong, sp0, jnp.where(do_line, wp0, p0))
    o_q0 = jnp.where(strong, sq0, jnp.where(do_line, wq0, q0))
    o_q1 = jnp.where(strong, sq1,
                     jnp.where(filt_q, jnp.clip(q1 + dq1, 0, maxv), q1))
    o_q2 = jnp.where(strong, sq2, q2)

    out = jnp.stack([p3, o_p2, o_p1, o_p0, o_q0, o_q1, o_q2, q3],
                    axis=-1)
    mid = out.transpose(0, 2, 1, 3).reshape(ns * 4, ne * 8)
    return jnp.concatenate([pl[:, :4], mid, pl[:, 4 + ne * 8:]], axis=1)


def _chroma_edges_dev(pl, bs2, qp_c: int, bd: int, tc_off: int):
    """Chroma vertical edges: bs2 bool (H/4, W/8) on the chroma 8-grid;
    returns the filtered plane.  Transpose for horizontal."""
    import jax.numpy as jnp

    h, w = pl.shape
    # interior 8-grid edges: edge at x needs q1 at x+1 <= w-1, so the
    # last edge can sit past w//8*8-8 when w is not a multiple of 8
    # (4:2:0 chroma planes are only multiples of 4)
    ne = max((w - 2) // 8, 0)
    ns = h // 4
    on = bs2[:, :ne, None]
    q_idx = jnp.clip(qp_c + 2 + (tc_off << 1), 0, 53)
    tc = jnp.asarray(TC_TABLE)[q_idx] << (bd - 8)
    maxv = (1 << bd) - 1

    pad = max(6 + ne * 8 - w, 0)
    plp = jnp.pad(pl, ((0, 0), (0, pad)), mode="edge") if pad else pl
    seg0 = plp[:, 6:6 + ne * 8].reshape(ns, 4, ne, 8) \
        .transpose(0, 2, 1, 3)
    seg = seg0.astype(jnp.int32)
    p1, p0, q0, q1 = (seg[..., i] for i in range(4))
    delta = jnp.clip((((q0 - p0) << 2) + p1 - q1 + 4) >> 3, -tc, tc)
    o_p0 = jnp.where(on, jnp.clip(p0 + delta, 0, maxv), p0)
    o_q0 = jnp.where(on, jnp.clip(q0 - delta, 0, maxv), q0)
    out = seg.at[..., 1].set(o_p0).at[..., 2].set(o_q0)
    mid = out.transpose(0, 2, 1, 3).reshape(ns * 4, ne * 8)
    return jnp.concatenate([plp[:, :6], mid, plp[:, 6 + ne * 8:]],
                           axis=1)[:, :w]


def _motion_bs_dev(jnp, pmx, pmy, pr, qmx, qmy, qr):
    """jnp twin of _motion_bs (identical arithmetic)."""
    big = 1 << 20
    pu0, pu1 = pr[0] >= 0, pr[1] >= 0
    qu0, qu1 = qr[0] >= 0, qr[1] >= 0
    cnt_p = pu0.astype(jnp.int32) + pu1
    cnt_q = qu0.astype(jnp.int32) + qu1
    p_lo = jnp.minimum(jnp.where(pu0, pr[0], big),
                       jnp.where(pu1, pr[1], big))
    p_hi = jnp.maximum(jnp.where(pu0, pr[0], -big),
                       jnp.where(pu1, pr[1], -big))
    q_lo = jnp.minimum(jnp.where(qu0, qr[0], big),
                       jnp.where(qu1, qr[1], big))
    q_hi = jnp.maximum(jnp.where(qu0, qr[0], -big),
                       jnp.where(qu1, qr[1], -big))
    diff_set = (cnt_p != cnt_q) | (p_lo != q_lo) | (p_hi != q_hi)

    def far(ax, ay, bx, by):
        return (jnp.abs(ax - bx) >= 4) | (jnp.abs(ay - by) >= 4)

    pux = jnp.where(pu0, pmx[0], pmx[1])
    puy = jnp.where(pu0, pmy[0], pmy[1])
    qux = jnp.where(qu0, qmx[0], qmx[1])
    quy = jnp.where(qu0, qmy[0], qmy[1])
    far_single = far(pux, puy, qux, quy)
    p_is_lo = pu0 & (pr[0] == p_lo)
    q_is_lo = qu0 & (qr[0] == q_lo)
    plx = jnp.where(p_is_lo, pmx[0], pmx[1])
    ply = jnp.where(p_is_lo, pmy[0], pmy[1])
    phx = jnp.where(p_is_lo, pmx[1], pmx[0])
    phy = jnp.where(p_is_lo, pmy[1], pmy[0])
    qlx = jnp.where(q_is_lo, qmx[0], qmx[1])
    qly = jnp.where(q_is_lo, qmy[0], qmy[1])
    qhx = jnp.where(q_is_lo, qmx[1], qmx[0])
    qhy = jnp.where(q_is_lo, qmy[1], qmy[0])
    far_matched = far(plx, ply, qlx, qly) | far(phx, phy, qhx, qhy)
    far_same = (far(pmx[0], pmy[0], qmx[0], qmy[0])
                | far(pmx[1], pmy[1], qmx[1], qmy[1])) \
        & (far(pmx[0], pmy[0], qmx[1], qmy[1])
           | far(pmx[1], pmy[1], qmx[0], qmy[0]))
    both_two = (cnt_p == 2) & (cnt_q == 2)
    mv_far = jnp.where(both_two,
                       jnp.where(p_lo == p_hi, far_same, far_matched),
                       far_single)
    return diff_set | mv_far


def _bs_dev(jnp, intra4, cbf4, mv_x, mv_y, ref_poc, vertical: bool):
    if vertical:
        sel_p, sel_q = np.s_[..., :, 1::2], np.s_[..., :, 2::2]
    else:
        sel_p, sel_q = np.s_[..., 1::2, :], np.s_[..., 2::2, :]
    qi = intra4[sel_q]
    sh = qi.shape
    crop = (np.s_[: sh[0], : sh[1]], np.s_[:, : sh[0], : sh[1]])
    pi = intra4[sel_p][crop[0]]
    pc = cbf4[sel_p][crop[0]]
    qc = cbf4[sel_q]
    pmx, qmx = mv_x[sel_p][crop[1]], mv_x[sel_q]
    pmy, qmy = mv_y[sel_p][crop[1]], mv_y[sel_q]
    pr, qr = ref_poc[sel_p][crop[1]], ref_poc[sel_q]
    any_intra = pi | qi
    cond1 = pc | qc | _motion_bs_dev(jnp, pmx, pmy, pr, qmx, qmy, qr)
    return jnp.where(any_intra, 2, jnp.where(cond1, 1, 0))


def deblock_frame_dev(rec_y, rec_u, rec_v, intra4, cbf4, mv_x, mv_y,
                      ref_poc, qp: int, bd: int = 8, beta_off: int = 0,
                      tc_off: int = 0, cb_qp_off: int = 0,
                      cr_qp_off: int = 0, int_v=None, int_h=None):
    """Device deblock of one picture.  int_v/int_h (optional bool
    masks over the 8-cell grid) mark 8-pel edges interior to a larger
    CU/TU (not boundaries, 8.7.2.2): int_v[cy, j] = edge between cell
    columns j and j+1 is interior.  Returns filtered (y, u, v)."""
    import jax.numpy as jnp

    bs_v = _bs_dev(jnp, intra4, cbf4, mv_x, mv_y, ref_poc, True)
    bs_h = _bs_dev(jnp, intra4, cbf4, mv_x, mv_y, ref_poc, False)
    if int_v is not None:
        m = jnp.repeat(~int_v, 2, axis=0)
        bs_v = bs_v * m[: bs_v.shape[0], : bs_v.shape[1]]
    if int_h is not None:
        m = jnp.repeat(~int_h, 2, axis=1)
        bs_h = bs_h * m[: bs_h.shape[0], : bs_h.shape[1]]
    rec_y = _luma_edges_dev(rec_y, bs_v, qp, bd, beta_off, tc_off)
    rec_y = _luma_edges_dev(rec_y.T, bs_h.T, qp, bd, beta_off,
                            tc_off).T
    from hmtpu.common.spec_tables import CHROMA_QP_TABLE
    for i, (off, pl) in enumerate(((cb_qp_off, rec_u),
                                   (cr_qp_off, rec_v))):
        qp_c = jnp.asarray(CHROMA_QP_TABLE)[jnp.clip(qp + off, 0, 63)]
        v2 = bs_v[0::2, 1::2] == 2
        h2 = bs_h[1::2, 0::2] == 2
        pl = _chroma_edges_dev(pl, v2, qp_c, bd, tc_off)
        pl = _chroma_edges_dev(pl.T, h2.T, qp_c, bd, tc_off).T
        if i == 0:
            rec_u = pl
        else:
            rec_v = pl
    return rec_y, rec_u, rec_v


def meta_from_frame_state(field, cbf8: np.ndarray,
                          ref_pocs: list[int],
                          leaf_id8: np.ndarray | None = None,
                          ref_pocs_l1: list[int] | None = None
                          ) -> DeblockMeta:
    """Build DeblockMeta from a PicMotion field (4x4 granularity), a
    per-8x8 luma-cbf map and an optional per-8x8 leaf-id map (CU==TU==PU
    in this envelope, so CU boundaries are the only filtered edges)."""
    intra4 = field.inter_dir == 0
    cbf4 = np.repeat(np.repeat(cbf8.astype(bool), 2, 0), 2, 1)
    ref_poc = np.full((2,) + intra4.shape, -1, dtype=np.int32)
    for li, pocs in enumerate((ref_pocs, ref_pocs_l1 or [])):
        if not pocs:
            continue
        ridx = field.ref_idx[li]
        lut = np.asarray(list(pocs) + [0], dtype=np.int32)
        ref_poc[li] = np.where(ridx >= 0, lut[np.clip(ridx, 0, None)], -1)
    edge_v = edge_h = None
    if leaf_id8 is not None:
        edge_v = leaf_id8[:, :-1] != leaf_id8[:, 1:]
        edge_h = leaf_id8[:-1, :] != leaf_id8[1:, :]
    return DeblockMeta(
        intra=intra4, cbf=cbf4,
        mv_x=field.mv[:, :, :, 0].copy(),
        mv_y=field.mv[:, :, :, 1].copy(),
        ref_poc=ref_poc,
        edge_v=edge_v, edge_h=edge_h,
    )

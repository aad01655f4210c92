"""Sample adaptive offset (H.265 8.7.3) — estimation and application.

Capability parity with the reference's TComSampleAdaptiveOffset
(offsetBlock TComSampleAdaptiveOffset.cpp:313, SAOProcess :614) and the
encoder-side estimator TEncSampleAdaptiveOffset.cpp, re-designed
batched: edge-offset categories for all four classes and band indices
are derived for the whole picture as dense elementwise tensor ops, the
per-CTU statistics fall out of reshaped reductions, and the per-CTU
type/offset decision is a small vectorized argmin over candidate
distortion deltas (dD = N*h^2 - 2*h*E per category).

Component order per CTU params: 0 = luma, 1 = Cb, 2 = Cr.
Types: 0 = off, 1 = band, 2 = edge.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# EO class -> (neighbor a dy,dx), (neighbor b dy,dx)
EO_NEIGHBORS = {
    0: ((0, -1), (0, 1)),      # horizontal
    1: ((-1, 0), (1, 0)),      # vertical
    2: ((-1, -1), (1, 1)),     # 135 degree
    3: ((-1, 1), (1, -1)),     # 45 degree
}
MAX_OFFSET = 7  # 8-bit saoMaxOffsetQVal (see max_offset() for >8bit)


def max_offset(bd: int) -> int:
    """saoMaxOffsetQVal = (1 << (Min(bitDepth, 10) - 5)) - 1."""
    return (1 << (min(bd, 10) - 5)) - 1


@dataclass
class CtuSaoParams:
    """Decoded/encoded SAO parameters of one CTU, one component."""
    type_idx: int = 0                       # 0 off, 1 band, 2 edge
    eo_class: int = 0                       # 0..3 (edge)
    band_pos: int = 0                       # 0..31 (band)
    offsets: np.ndarray = field(
        default_factory=lambda: np.zeros(4, dtype=np.int32))


def _edge_categories(plane: np.ndarray, cls: int) -> np.ndarray:
    """Per-sample edgeIdx after the spec's remap (0 = no offset,
    1..4 = categories); boundary samples (missing neighbor) get 0."""
    h, w = plane.shape
    (ady, adx), (bdy, bdx) = EO_NEIGHBORS[cls]
    p = plane.astype(np.int32)
    pad = np.pad(p, 1, mode="edge")
    a = pad[1 + ady:1 + ady + h, 1 + adx:1 + adx + w]
    b = pad[1 + bdy:1 + bdy + h, 1 + bdx:1 + bdx + w]
    raw = 2 + np.sign(p - a) + np.sign(p - b)
    remap = np.array([1, 2, 0, 3, 4], dtype=np.int32)
    cat = remap[raw]
    # 8.7.3: no offset where a neighbor falls outside the picture
    if adx or bdx:
        cat[:, 0] = 0
        cat[:, -1] = 0
    if ady or bdy:
        cat[0, :] = 0
        cat[-1, :] = 0
    return cat


def _band_index(plane: np.ndarray, bd: int) -> np.ndarray:
    return (plane >> (bd - 5)).astype(np.int32)


def _ctu_reduce(values: np.ndarray, mask: np.ndarray, ctu: int):
    """Sum `values` and count `mask` per CTU tile -> (nCtuY, nCtuX)."""
    h, w = values.shape
    hh = -(-h // ctu) * ctu
    ww = -(-w // ctu) * ctu
    v = np.zeros((hh, ww), dtype=np.int64)
    m = np.zeros((hh, ww), dtype=np.int64)
    v[:h, :w] = values * mask
    m[:h, :w] = mask
    v4 = v.reshape(hh // ctu, ctu, ww // ctu, ctu)
    m4 = m.reshape(hh // ctu, ctu, ww // ctu, ctu)
    return v4.sum(axis=(1, 3)), m4.sum(axis=(1, 3))


def estimate_sao_plane(org: np.ndarray, rec: np.ndarray, ctu: int,
                       lam: float, bd: int,
                       bits_scale: float = 1.0) -> list[list[CtuSaoParams]]:
    """Choose per-CTU SAO params for one component.

    Statistics for every EO class/category and every band are computed
    picture-wide (dense ops), reduced per CTU, then the best
    (type, class/band, offsets) is picked by estimated RD cost."""
    diff = org.astype(np.int64) - rec.astype(np.int64)
    max_off = max_offset(bd)
    h, w = rec.shape
    n_y, n_x = -(-h // ctu), -(-w // ctu)
    best_cost = np.zeros((n_y, n_x))           # type off = 0 cost
    out = [[CtuSaoParams() for _ in range(n_x)] for _ in range(n_y)]

    def offsets_and_delta(e_sum, cnt, sign_constrained):
        """Optimal integer offset per candidate and its distortion
        delta dD = cnt*h^2 - 2*h*e_sum (negative = improvement)."""
        with np.errstate(divide="ignore", invalid="ignore"):
            off = np.where(cnt > 0, np.round(e_sum / np.maximum(cnt, 1)),
                           0.0)
        off = np.clip(off, -max_off, max_off)
        if sign_constrained is not None:
            if sign_constrained > 0:
                off = np.maximum(off, 0)
            else:
                off = np.minimum(off, 0)
        off = off.astype(np.int64)
        # refine: the rounded offset is not always RD-optimal once the
        # rate is counted; a 1-step shrink toward zero check
        d0 = cnt * off * off - 2 * off * e_sum
        shr = off - np.sign(off)
        d1 = cnt * shr * shr - 2 * shr * e_sum
        take = d1 < d0
        off = np.where(take, shr, off)
        return off, np.where(take, d1, d0)

    # ---- edge offset candidates
    for cls in range(4):
        cat = _edge_categories(rec, cls)
        dsum = np.zeros((5, n_y, n_x), dtype=np.int64)
        dcnt = np.zeros((5, n_y, n_x), dtype=np.int64)
        for c in range(1, 5):
            m = cat == c
            dsum[c], dcnt[c] = _ctu_reduce(diff, m, ctu)
        offs = np.zeros((4, n_y, n_x), dtype=np.int64)
        delta = np.zeros((n_y, n_x), dtype=np.float64)
        for c in range(1, 5):
            sign = 1 if c <= 2 else -1
            o, d = offsets_and_delta(dsum[c], dcnt[c], sign)
            offs[c - 1] = o
            delta += d
        bits = 2.0 + 2.0 + np.abs(offs).sum(axis=0) + 2.0
        cost = delta + lam * bits * bits_scale
        improve = cost < best_cost
        for cy, cx in zip(*np.nonzero(improve)):
            out[cy][cx] = CtuSaoParams(2, cls, 0,
                                       offs[:, cy, cx].astype(np.int32))
        best_cost = np.where(improve, cost, best_cost)

    # ---- band offset candidates
    band = _band_index(rec, bd)
    bsum = np.zeros((32, n_y, n_x), dtype=np.int64)
    bcnt = np.zeros((32, n_y, n_x), dtype=np.int64)
    for b in range(32):
        bsum[b], bcnt[b] = _ctu_reduce(diff, band == b, ctu)
    boffs, bdelta = offsets_and_delta(bsum, bcnt, None)   # (32, nY, nX)
    # best run of 4 consecutive bands per CTU
    run_delta = np.full((29, n_y, n_x), np.inf)
    for p in range(29):
        run_delta[p] = bdelta[p:p + 4].sum(axis=0)
    best_pos = np.argmin(run_delta, axis=0)
    iy, ix = np.meshgrid(np.arange(n_y), np.arange(n_x), indexing="ij")
    bdel = run_delta[best_pos, iy, ix]
    sel_offs = np.stack([boffs[best_pos + k, iy, ix] for k in range(4)])
    bbits = 2.0 + 5.0 + (np.abs(sel_offs)
                         + (sel_offs != 0)).sum(axis=0) + 2.0
    bcost = bdel + lam * bbits * bits_scale
    improve = bcost < best_cost
    for cy, cx in zip(*np.nonzero(improve)):
        out[cy][cx] = CtuSaoParams(1, 0, int(best_pos[cy, cx]),
                                   sel_offs[:, cy, cx].astype(np.int32))
    return out


def estimate_sao_chroma(org_cb, rec_cb, org_cr, rec_cr, ctu: int,
                        lam: float, bd: int):
    """Chroma SAO: sao_type_idx_chroma and sao_eo_class are shared
    between Cb and Cr (7.3.8.3); Cb is estimated freely and Cr gets the
    optimal offsets/band position under Cb's type."""
    cb = estimate_sao_plane(org_cb, rec_cb, ctu, lam, bd)
    h, w = rec_cr.shape
    n_y, n_x = len(cb), len(cb[0])
    cr = [[CtuSaoParams() for _ in range(n_x)] for _ in range(n_y)]
    diff = org_cr.astype(np.int64) - rec_cr.astype(np.int64)
    cat_cache: dict[int, np.ndarray] = {}
    band = _band_index(rec_cr, bd)

    def best_off(e, n, lo, hi):
        if n == 0:
            return 0, 0.0
        o = int(np.clip(round(e / n), lo, hi))
        best, bo = 0.0, 0
        for cand in {o, o - np.sign(o)}:
            d = n * cand * cand - 2 * cand * e
            if d < best:
                best, bo = d, cand
        return bo, best

    for cy in range(n_y):
        for cx in range(n_x):
            p_cb = cb[cy][cx]
            if p_cb.type_idx == 0:
                continue
            ys = slice(cy * ctu, min((cy + 1) * ctu, h))
            xs = slice(cx * ctu, min((cx + 1) * ctu, w))
            d = diff[ys, xs]
            if p_cb.type_idx == 2:
                cls = p_cb.eo_class
                if cls not in cat_cache:
                    cat_cache[cls] = _edge_categories(rec_cr, cls)
                cat = cat_cache[cls][ys, xs]
                offs = np.zeros(4, dtype=np.int32)
                for c in range(1, 5):
                    m = cat == c
                    mo = max_offset(bd)
                    lo, hi = (0, mo) if c <= 2 else (-mo, 0)
                    offs[c - 1], _ = best_off(int(d[m].sum()),
                                              int(m.sum()), lo, hi)
                cr[cy][cx] = CtuSaoParams(2, cls, 0, offs)
            else:
                b = band[ys, xs]
                boffs = np.zeros(32, dtype=np.int64)
                bdelta = np.zeros(32)
                for bi in range(32):
                    m = b == bi
                    boffs[bi], bdelta[bi] = best_off(
                        int(d[m].sum()), int(m.sum()),
                        -max_offset(bd), max_offset(bd))
                runs = np.array([bdelta[p:p + 4].sum() for p in range(29)])
                pos = int(np.argmin(runs))
                cr[cy][cx] = CtuSaoParams(
                    1, 0, pos, boffs[pos:pos + 4].astype(np.int32))
    return cb, cr


# ---------------------------------------------------------------------------
# Device (jnp) twin: dense per-CTU statistics + vectorised RD choice +
# dense apply.  Params tensor layout per CTU: (7,) = [type, eo_class,
# band_pos, off0..off3] — the native slice writer's packed layout.

def _edge_categories_dev(jnp, plane, cls: int):
    h, w = plane.shape
    (ady, adx), (bdy, bdx) = EO_NEIGHBORS[cls]
    pad = jnp.pad(plane, 1, mode="edge")
    a = pad[1 + ady:1 + ady + h, 1 + adx:1 + adx + w]
    b = pad[1 + bdy:1 + bdy + h, 1 + bdx:1 + bdx + w]
    raw = 2 + jnp.sign(plane - a) + jnp.sign(plane - b)
    cat = jnp.asarray([1, 2, 0, 3, 4], jnp.int32)[raw]
    if adx or bdx:
        cat = cat.at[:, 0].set(0).at[:, -1].set(0)
    if ady or bdy:
        cat = cat.at[0, :].set(0).at[-1, :].set(0)
    return cat


def _pad_to(jnp, a, ctu: int):
    h, w = a.shape
    hh, ww = -(-h // ctu) * ctu, -(-w // ctu) * ctu
    return jnp.pad(a, ((0, hh - h), (0, ww - w)))


def _ctu_reduce_dev(jnp, values, mask, ctu: int):
    v = _pad_to(jnp, jnp.where(mask, values, 0), ctu)
    m = _pad_to(jnp, mask.astype(jnp.int32), ctu)
    hh, ww = v.shape
    v4 = v.reshape(hh // ctu, ctu, ww // ctu, ctu)
    m4 = m.reshape(hh // ctu, ctu, ww // ctu, ctu)
    return v4.sum(axis=(1, 3)), m4.sum(axis=(1, 3))


def _offsets_and_delta_dev(jnp, e_sum, cnt, sign_constrained, max_off):
    off = jnp.where(cnt > 0,
                    jnp.round(e_sum / jnp.maximum(cnt, 1)), 0.0)
    off = jnp.clip(off, -max_off, max_off)
    if sign_constrained is not None:
        off = jnp.maximum(off, 0) if sign_constrained > 0 \
            else jnp.minimum(off, 0)
    off = off.astype(jnp.int32)
    d0 = cnt * off * off - 2 * off * e_sum
    shr = off - jnp.sign(off)
    d1 = cnt * shr * shr - 2 * shr * e_sum
    take = d1 < d0
    return jnp.where(take, shr, off), jnp.where(take, d1, d0)


def _sao_stats_dev(jnp, org, rec, ctu: int, bd: int):
    """Per-CTU stats: edge (4 cls x 4 cat) sums/counts and band (32)."""
    diff = org - rec
    es, ec = [], []
    for cls in range(4):
        cat = _edge_categories_dev(jnp, rec, cls)
        s = [None] * 4
        c = [None] * 4
        for k in range(1, 5):
            s[k - 1], c[k - 1] = _ctu_reduce_dev(jnp, diff, cat == k,
                                                 ctu)
        es.append(jnp.stack(s))
        ec.append(jnp.stack(c))
    band = rec >> (bd - 5)
    bs_, bc_ = [], []
    for b in range(32):
        s, c = _ctu_reduce_dev(jnp, diff, band == b, ctu)
        bs_.append(s)
        bc_.append(c)
    return (jnp.stack(es), jnp.stack(ec),
            jnp.stack(bs_), jnp.stack(bc_))      # (4,4,Y,X),(32,Y,X)


def _choose_params_dev(jnp, es, ec, bsum, bcnt, lam, bd: int,
                       force_type=None, force_cls=None):
    """RD choice per CTU.  force_type/cls: Cr under Cb's shared type.
    Returns (params (Y, X, 7) int32)."""
    mo = max_offset(bd)
    esf, ecf = es.astype(jnp.float32), ec.astype(jnp.float32)
    # edge candidates: offsets per class (4, 4, Y, X)
    e_off_p, e_del_p = _offsets_and_delta_dev(jnp, esf[:, :2],
                                              ecf[:, :2], 1, mo)
    e_off_n, e_del_n = _offsets_and_delta_dev(jnp, esf[:, 2:],
                                              ecf[:, 2:], -1, mo)
    e_off = jnp.concatenate([e_off_p, e_off_n], axis=1)
    e_delta = (e_del_p.sum(axis=1) + e_del_n.sum(axis=1))  # (4, Y, X)
    e_bits = 6.0 + jnp.abs(e_off).sum(axis=1)
    e_cost = e_delta + lam * e_bits
    best_cls = jnp.argmin(e_cost, axis=0)                  # (Y, X)
    if force_cls is not None:
        best_cls = force_cls
    e_cost_b = jnp.take_along_axis(e_cost, best_cls[None], 0)[0]
    e_off_b = jnp.take_along_axis(
        e_off, best_cls[None, None], 0)[0]                 # (4, Y, X)

    # band candidates
    b_off, b_delta = _offsets_and_delta_dev(
        jnp, bsum.astype(jnp.float32), bcnt.astype(jnp.float32),
        None, mo)                                          # (32, Y, X)
    runs = jnp.stack([b_delta[p:p + 4].sum(axis=0)
                      for p in range(29)])                 # (29, Y, X)
    best_pos = jnp.argmin(runs, axis=0)                    # (Y, X)
    b_del_b = jnp.take_along_axis(runs, best_pos[None], 0)[0]
    sel = jnp.stack([jnp.take_along_axis(
        b_off, jnp.clip(best_pos + k, 0, 31)[None], 0)[0]
        for k in range(4)])                                # (4, Y, X)
    b_bits = 9.0 + (jnp.abs(sel) + (sel != 0)).sum(axis=0)
    b_cost = b_del_b + lam * b_bits

    off_cost = jnp.zeros_like(b_cost)
    if force_type is None:
        typ = jnp.where(
            (e_cost_b < off_cost) & (e_cost_b <= b_cost), 2,
            jnp.where(b_cost < off_cost, 1, 0)).astype(jnp.int32)
    else:
        typ = force_type
    use_edge = typ == 2
    offs = jnp.where(use_edge[None], e_off_b, sel)         # (4, Y, X)
    offs = jnp.where((typ == 0)[None], 0, offs)
    return jnp.stack(
        [typ, jnp.where(use_edge, best_cls, 0).astype(jnp.int32),
         jnp.where(typ == 1, best_pos, 0).astype(jnp.int32),
         offs[0], offs[1], offs[2], offs[3]],
        axis=-1)                                           # (Y, X, 7)


def apply_sao_dev(jnp, rec, params, ctu: int, bd: int):
    """Dense SAO apply: params (Y, X, 7) per CTU -> filtered plane."""
    h, w = rec.shape
    maxv = (1 << bd) - 1
    cats = jnp.stack([_edge_categories_dev(jnp, rec, c)
                      for c in range(4)])                  # (4, H, W)
    iy = jnp.arange(h) // ctu
    ix = jnp.arange(w) // ctu
    px = params[iy[:, None], ix[None, :]]                  # (H, W, 7)
    typ, cls, bpos = px[..., 0], px[..., 1], px[..., 2]
    offs = px[..., 3:]                                     # (H, W, 4)
    cat = jnp.take_along_axis(cats, cls[None], 0)[0]       # (H, W)
    e_off = jnp.where(
        cat > 0,
        jnp.take_along_axis(offs, jnp.maximum(cat - 1, 0)[..., None],
                            -1)[..., 0], 0)
    bidx = ((rec >> (bd - 5)) - bpos) & 31
    b_off = jnp.where(
        bidx < 4,
        jnp.take_along_axis(offs, jnp.minimum(bidx, 3)[..., None],
                            -1)[..., 0], 0)
    delta = jnp.where(typ == 2, e_off, jnp.where(typ == 1, b_off, 0))
    return jnp.clip(rec + delta, 0, maxv)


def sao_frame_dev(org_y, rec_y, org_u, rec_u, org_v, rec_v, ctu: int,
                  lam: float, bd: int):
    """Estimate + apply SAO for a whole picture on device.

    Returns (new_y, new_u, new_v, params (Y, X, 3, 7) int32) with the
    chroma type/class sharing rule (Cr follows Cb)."""
    import jax.numpy as jnp

    p_y = _choose_params_dev(jnp, *_sao_stats_dev(jnp, org_y, rec_y,
                                                  ctu, bd), lam, bd)
    p_cb = _choose_params_dev(jnp, *_sao_stats_dev(jnp, org_u, rec_u,
                                                   ctu // 2, bd),
                              lam, bd)
    p_cr = _choose_params_dev(
        jnp, *_sao_stats_dev(jnp, org_v, rec_v, ctu // 2, bd), lam, bd,
        force_type=p_cb[..., 0], force_cls=p_cb[..., 1])
    new_y = apply_sao_dev(jnp, rec_y, p_y, ctu, bd)
    new_u = apply_sao_dev(jnp, rec_u, p_cb, ctu // 2, bd)
    new_v = apply_sao_dev(jnp, rec_v, p_cr, ctu // 2, bd)
    return new_y, new_u, new_v, jnp.stack([p_y, p_cb, p_cr], axis=2)


def grid_from_packed(packed: np.ndarray):
    """(nY, nX, 3, 7) int tensor -> [luma, cb, cr]-per-cell grid of
    CtuSaoParams (the host/entropy-fallback representation)."""
    ny, nx = packed.shape[:2]
    return [[tuple(CtuSaoParams(int(packed[y, x, c, 0]),
                                int(packed[y, x, c, 1]),
                                int(packed[y, x, c, 2]),
                                np.asarray(packed[y, x, c, 3:],
                                           np.int32))
                   for c in range(3)) for x in range(nx)]
            for y in range(ny)]


def apply_sao_plane(rec: np.ndarray, params: list[list[CtuSaoParams]],
                    ctu: int, bd: int) -> np.ndarray:
    """Apply SAO to one component; reads the full pre-SAO plane (the
    spec's saoPicture/recPicture separation) and returns the filtered
    copy."""
    h, w = rec.shape
    maxv = (1 << bd) - 1
    out = rec.copy()

    # precompute category maps once per used EO class
    cats = {}
    for row in params:
        for p in row:
            if p.type_idx == 2 and p.eo_class not in cats:
                cats[p.eo_class] = _edge_categories(rec, p.eo_class)
    band = None

    for cy, row in enumerate(params):
        for cx, p in enumerate(row):
            if p.type_idx == 0:
                continue
            ys = slice(cy * ctu, min((cy + 1) * ctu, h))
            xs = slice(cx * ctu, min((cx + 1) * ctu, w))
            tile = rec[ys, xs].astype(np.int32)
            if p.type_idx == 2:
                cat = cats[p.eo_class][ys, xs]
                lut = np.zeros(5, dtype=np.int32)
                lut[1:] = p.offsets
                out[ys, xs] = np.clip(tile + lut[cat], 0, maxv)
            else:
                if band is None:
                    band = _band_index(rec, bd)
                b = band[ys, xs]
                lut = np.zeros(32, dtype=np.int32)
                for k in range(4):
                    lut[(p.band_pos + k) & 31] = p.offsets[k]
                out[ys, xs] = np.clip(tile + lut[b], 0, maxv)
    return out

"""All-intra frame encoder: mode decision + reconstruction + entropy.

Replaces the reference's depth-first RDO recursion (TEncCu::xCompressCU
TEncCu.cpp:352 + TEncSearch::estIntraPredLumaQT TEncSearch.cpp:2945)
with a breadth-shaped pipeline: candidate prediction for all 35 modes is
produced by one gather+lerp op per block, SATD-scored, and the chosen
mode is reconstructed with true (decoded) neighbours in coding order.
The entropy pass serialises decisions through the CABAC engine.

This module is the host/correctness path; the device wavefront pipeline
(encoder/wavefront.py) batches the same math across CTU diagonals and
frames.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from hmtpu.common.constants import DC_IDX, SliceType
from hmtpu.common.geometry import (
    encode_rem_mode,
    mpm_list,
    ref_availability,
)
from hmtpu.common.params import Pps, Sps
from hmtpu.common.scan import intra_scan_idx
from hmtpu.common.spec_tables import chroma_qp_from_luma
from hmtpu.entropy.cabac import CabacEncoder
from hmtpu.entropy.contexts import OFF, make_contexts
from hmtpu.entropy.residual import encode_residual
from hmtpu.io.yuv import Frame
from hmtpu.ops.intra_pred import predict_all_modes_np
from hmtpu.ops.intra_ref import filter_reference, substitute_unavailable
from hmtpu.ops.quant import dequantize_np, quantize_np
from hmtpu.ops.transform import forward_np, inverse_np

_H8 = None


def _hadamard8():
    global _H8
    if _H8 is None:
        h = np.array([[1]])
        for _ in range(3):
            h = np.block([[h, h], [h, -h]])
        _H8 = h.astype(np.int64)
    return _H8


def satd8(resi: np.ndarray) -> np.ndarray:
    """(..., 8, 8) residual -> HM-style Hadamard SATD
    (TComRdCost.cpp:303 xCalcHADs8x8 normalisation)."""
    h = _hadamard8()
    t = np.einsum("ik,...kj->...ij", h, resi.astype(np.int64))
    t = np.einsum("...ik,kj->...ij", t, h)
    s = np.abs(t).sum(axis=(-2, -1))
    return (s + 2) >> 2


def gather_ref_line(plane: np.ndarray, x: int, y: int, n: int) -> np.ndarray:
    """Raw 4N+1 neighbour samples (clamped gather; substitution fixes
    the unavailable ones)."""
    h, w = plane.shape
    out = np.zeros(4 * n + 1, dtype=np.int32)
    ys = np.clip(np.arange(2 * n - 1, -1, -1) + y, 0, h - 1)
    xs_ = np.clip(np.arange(2 * n) + x, 0, w - 1)
    xm1 = max(x - 1, 0)
    ym1 = max(y - 1, 0)
    out[:2 * n] = plane[ys, xm1]
    out[2 * n] = plane[ym1, xm1]
    out[2 * n + 1:] = plane[ym1, xs_]
    return out


@dataclass
class BlockDecision:
    mode: int
    lev_y: np.ndarray | None
    lev_cb: np.ndarray | None
    lev_cr: np.ndarray | None


@dataclass
class FrameStats:
    bits: int = 0
    psnr_y: float = 0.0
    psnr_u: float = 0.0
    psnr_v: float = 0.0


class IntraFrameEncoder:
    """Fixed 8x8-CU all-intra encoder (quadtree RDO widens this in the
    search module)."""

    def __init__(self, sps: Sps, pps: Pps):
        self.sps = sps
        self.pps = pps
        self.bd = sps.bit_depth_luma

    # -- main entry ---------------------------------------------------------
    def encode_frame(self, frame: Frame, qp: int):
        sps = self.sps
        w, h = sps.pic_width, sps.pic_height
        assert w % 8 == 0 and h % 8 == 0, "pad input to the 8-pel grid"
        maxv = (1 << self.bd) - 1
        qpc = chroma_qp_from_luma(qp + self.pps.cb_qp_offset)

        rec_y = np.zeros((h, w), dtype=np.int32)
        rec_u = np.zeros((h // 2, w // 2), dtype=np.int32)
        rec_v = np.zeros((h // 2, w // 2), dtype=np.int32)
        modes = np.full((h // 8, w // 8), -1, dtype=np.int32)
        decisions: dict[tuple[int, int], BlockDecision] = {}

        lam_sqrt = np.sqrt(0.57 * 2.0 ** ((qp - 12) / 3.0))

        ctu = sps.ctu_size
        for cty in range(sps.pic_height_in_ctus):
            for ctx_ in range(sps.pic_width_in_ctus):
                for zi in range(64):
                    bx = 0
                    by = 0
                    for bit in range(3):
                        bx |= ((zi >> (2 * bit)) & 1) << bit
                        by |= ((zi >> (2 * bit + 1)) & 1) << bit
                    x = ctx_ * ctu + bx * 8
                    y = cty * ctu + by * 8
                    if x >= w or y >= h:
                        continue
                    self._encode_block(frame, qp, qpc, x, y, rec_y, rec_u,
                                       rec_v, modes, decisions, lam_sqrt,
                                       maxv)

        rbsp = self._entropy_pass(qp, modes, decisions)
        recon = Frame(rec_y, rec_u, rec_v, self.bd)
        return rbsp, recon, decisions

    # -- per-block ----------------------------------------------------------
    def _encode_block(self, frame, qp, qpc, x, y, rec_y, rec_u, rec_v,
                      modes, decisions, lam_sqrt, maxv):
        sps = self.sps
        w, h = sps.pic_width, sps.pic_height
        n = 8
        org = frame.y[y:y + n, x:x + n].astype(np.int32)

        avail = ref_availability(x, y, n, w, h, sps.log2_ctu_size)
        raw = gather_ref_line(rec_y, x, y, n)
        ref_u_line = substitute_unavailable(raw, avail, self.bd)
        ref_f_line = filter_reference(ref_u_line, n, self.bd, False)
        preds = predict_all_modes_np(ref_u_line, ref_f_line, n, True, self.bd)

        satds = satd8(org[None] - preds)
        bxi, byi = x // 8, y // 8
        left_mode = modes[byi, bxi - 1] if bxi > 0 else -1
        above_mode = modes[byi - 1, bxi] if (byi > 0 and (y % sps.ctu_size) != 0) else -1
        mpms = mpm_list(left_mode if left_mode >= 0 else DC_IDX,
                        above_mode if above_mode >= 0 else DC_IDX)
        bits = np.full(35, 6.0)
        bits[mpms[0]] = 2.0
        bits[mpms[1]] = 3.0
        bits[mpms[2]] = 3.0
        cost = satds + lam_sqrt * bits
        mode = int(np.argmin(cost))
        modes[byi, bxi] = mode

        pred = preds[mode]
        resi = org - pred
        coef = forward_np(resi[None], self.bd)[0]
        lev = quantize_np(coef, qp, 3, self.bd, True)
        if lev.any():
            deq = dequantize_np(lev, qp, 3, self.bd)
            r = inverse_np(deq[None], self.bd)[0]
        else:
            r = 0
        rec_y[y:y + n, x:x + n] = np.clip(pred + r, 0, maxv)

        # chroma (4x4, DM mode)
        cx, cy = x // 2, y // 2
        lev_c = []
        for plane_org, plane_rec in ((frame.u, rec_u), (frame.v, rec_v)):
            corg = plane_org[cy:cy + 4, cx:cx + 4].astype(np.int32)
            avail_c = ref_availability(cx, cy, 4, w // 2, h // 2,
                                       sps.log2_ctu_size - 1)
            raw_c = gather_ref_line(plane_rec, cx, cy, 4)
            ref_c = substitute_unavailable(raw_c, avail_c, self.bd)
            pred_c = predict_all_modes_np(ref_c, ref_c, 4, False,
                                          self.bd)[mode]
            resi_c = corg - pred_c
            coef_c = forward_np(resi_c[None], self.bd)[0]
            lv = quantize_np(coef_c, qpc, 2, self.bd, True)
            if lv.any():
                deq = dequantize_np(lv, qpc, 2, self.bd)
                rc = inverse_np(deq[None], self.bd)[0]
            else:
                rc = 0
            plane_rec[cy:cy + 4, cx:cx + 4] = np.clip(pred_c + rc, 0, maxv)
            lev_c.append(lv)

        decisions[(x, y)] = BlockDecision(mode, lev, lev_c[0], lev_c[1])

    # -- entropy ------------------------------------------------------------
    def _entropy_pass(self, qp, modes, decisions) -> bytes:
        from hmtpu.io.bitstream import BitWriter

        sps = self.sps
        w, h = sps.pic_width, sps.pic_height
        bw = BitWriter()
        enc = CabacEncoder(bw)
        ctx = make_contexts(SliceType.I, qp)
        sdh = self.pps.sign_data_hiding

        n_ctu_x = sps.pic_width_in_ctus
        n_ctu_y = sps.pic_height_in_ctus
        ctu = sps.ctu_size

        def encode_cu(x0, y0):
            bxi, byi = x0 // 8, y0 // 8
            # part_mode 2Nx2N at min CU size
            enc.encode_bin(ctx, OFF["PART_SIZE"], 1)
            mode = int(modes[byi, bxi])
            left_mode = modes[byi, bxi - 1] if bxi > 0 else -1
            above_mode = modes[byi - 1, bxi] \
                if (byi > 0 and (y0 % ctu) != 0) else -1
            mpms = mpm_list(left_mode if left_mode >= 0 else DC_IDX,
                            above_mode if above_mode >= 0 else DC_IDX)
            if mode in mpms:
                enc.encode_bin(ctx, OFF["INTRA_PRED_MODE"], 1)
                idx = mpms.index(mode)
                enc.encode_bin_ep(0 if idx == 0 else 1)
                if idx:
                    enc.encode_bin_ep(idx - 1)
            else:
                enc.encode_bin(ctx, OFF["INTRA_PRED_MODE"], 0)
                enc.encode_bins_ep(encode_rem_mode(mode, mpms), 5)
            # intra_chroma_pred_mode = DM
            enc.encode_bin(ctx, OFF["CHROMA_PRED_MODE"], 0)

            d = decisions[(x0, y0)]
            cbf_y = bool(d.lev_y.any())
            cbf_cb = bool(d.lev_cb.any())
            cbf_cr = bool(d.lev_cr.any())
            # transform_tree at trafoDepth 0: cbf_cb, cbf_cr, cbf_luma
            enc.encode_bin(ctx, OFF["QT_CBF_CHROMA"] + 0, int(cbf_cb))
            enc.encode_bin(ctx, OFF["QT_CBF_CHROMA"] + 0, int(cbf_cr))
            enc.encode_bin(ctx, OFF["QT_CBF_LUMA"] + 1, int(cbf_y))
            if cbf_y:
                scan = intra_scan_idx(mode, 3, True)
                encode_residual(enc, ctx, d.lev_y, 3, True, scan, sdh)
            if cbf_cb:
                scan = intra_scan_idx(mode, 2, False)
                encode_residual(enc, ctx, d.lev_cb, 2, False, scan, sdh)
            if cbf_cr:
                scan = intra_scan_idx(mode, 2, False)
                encode_residual(enc, ctx, d.lev_cr, 2, False, scan, sdh)

        def split_ctx_inc(x0, y0, depth):
            inc = 0
            if x0 > 0:  # left neighbour depth (uniform grid: depth 3)
                inc += 1 if 3 > depth else 0
            if y0 > 0:
                inc += 1 if 3 > depth else 0
            return inc

        def encode_quadtree(x0, y0, log2, depth):
            size = 1 << log2
            inside = x0 + size <= w and y0 + size <= h
            if inside and log2 > 3:
                enc.encode_bin(ctx, OFF["SPLIT_FLAG"]
                               + split_ctx_inc(x0, y0, depth), 1)
            if log2 > 3:
                half = size >> 1
                for dy, dx in ((0, 0), (0, half), (half, 0), (half, half)):
                    if x0 + dx < w and y0 + dy < h:
                        encode_quadtree(x0 + dx, y0 + dy, log2 - 1, depth + 1)
            else:
                encode_cu(x0, y0)

        for cty in range(n_ctu_y):
            for ctx_i in range(n_ctu_x):
                encode_quadtree(ctx_i * ctu, cty * ctu, sps.log2_ctu_size, 0)
                last = (cty == n_ctu_y - 1) and (ctx_i == n_ctu_x - 1)
                if not last:
                    enc.encode_bin_trm(0)
        enc.encode_bin_trm(1)
        enc.finish()
        bw.write(1, 1)
        bw.align_zero()
        return bw.get_bytes()

"""HEVC decoder for the encoder's capability envelope — the in-repo
verification oracle (the reference decoder build is the out-of-repo
one).

Capability parity with TLibDecoder's slice/CTU reconstruction path
(TDecSlice.cpp:69, TDecCu.cpp:135/155, TDecTop.cpp:725): Annex-B parse,
parameter-set activation, DPB/reference-list management from the slice
RPS, CABAC parse of I and P coding trees, motion-compensated + intra
reconstruction, decoded-picture-hash check.  Shares every
reconstruction op with the encoder (single source of truth for the
math; bit-exactness vs HM is established by the external oracle tests).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from hmtpu.common.constants import (
    DC_IDX,
    NalUnitType,
    SEI_DECODED_PICTURE_HASH,
    SliceType,
)
from hmtpu.common.geometry import decode_rem_mode, mpm_list, ref_availability
from hmtpu.common.motion import MotionCtx, PicMotion, amvp_candidates, \
    merge_candidates
from hmtpu.common.params import Pps, Sps
from hmtpu.common.scan import intra_scan_idx
from hmtpu.common.spec_tables import chroma_qp_from_luma
from hmtpu.entropy.cabac import CabacDecoder
from hmtpu.entropy.contexts import OFF, make_contexts
from hmtpu.entropy.headers import parse_pps, parse_slice_header, parse_sps
from hmtpu.entropy.inter_syntax import (
    decode_inter_dir,
    decode_merge_idx,
    decode_mvd,
    decode_ref_idx,
)
from hmtpu.entropy.residual import decode_residual
from hmtpu.io.bitstream import strip_emulation_prevention
from hmtpu.io.hashsei import parse_sei_messages, picture_md5
from hmtpu.io.nal import split_annexb
from hmtpu.io.yuv import Frame
from hmtpu.ops.interp import (
    bi_average,
    mc_chroma_np,
    mc_chroma_np_i,
    mc_luma_np,
    mc_luma_np_i,
)
from hmtpu.ops.intra_pred import predict_mode_np
from hmtpu.ops.intra_ref import filter_reference, substitute_unavailable
from hmtpu.ops.quant import dequantize_np
from hmtpu.ops.transform import inverse_np
from hmtpu.encoder.intra import gather_ref_line


@dataclass
class DecodedPicture:
    frame: Frame
    poc: int
    hash_ok: bool | None = None  # None when no hash SEI present
    # compressed motion (8x8 grid) kept for TMVP when this picture is
    # collocated (8.5.3.2.8); None for intra pictures
    col: dict | None = None


_SLICE_NALS = (NalUnitType.IDR_W_RADL, NalUnitType.IDR_N_LP,
               NalUnitType.TRAIL_R, NalUnitType.TRAIL_N,
               NalUnitType.CRA_NUT)


class Decoder:
    def __init__(self):
        self.sps: Sps | None = None
        self.pps: Pps | None = None
        self.pictures: list[DecodedPicture] = []
        self._prev_poc = 0

    # -- bitstream ----------------------------------------------------------
    def decode_annexb(self, data: bytes) -> list[DecodedPicture]:
        for nal in split_annexb(data):
            nal_type = NalUnitType((nal[0] >> 1) & 0x3F)
            rbsp = strip_emulation_prevention(nal[2:])
            if nal_type == NalUnitType.SPS_NUT:
                self.sps = parse_sps(rbsp)
            elif nal_type == NalUnitType.PPS_NUT:
                self.pps = parse_pps(rbsp)
            elif nal_type == NalUnitType.VPS_NUT:
                pass
            elif nal_type == NalUnitType.SUFFIX_SEI_NUT:
                for ptype, payload in parse_sei_messages(rbsp):
                    if ptype == SEI_DECODED_PICTURE_HASH and payload[0] == 0:
                        self._check_hash(payload[1:])
            elif nal_type in _SLICE_NALS:
                from hmtpu.io.bitstream import \
                    strip_emulation_prevention_positions
                rbsp, eps = strip_emulation_prevention_positions(nal[2:])
                pic = self._decode_slice(rbsp, nal_type, eps)
                self.pictures.append(pic)
        return self.pictures

    def _check_hash(self, digests: bytes) -> None:
        pic = self.pictures[-1]
        got = picture_md5(pic.frame.planes(),
                          [pic.frame.bit_depth] * 3)
        want = [digests[i * 16:(i + 1) * 16] for i in range(3)]
        pic.hash_ok = got == want

    def _poc_of(self, sh, nal_type) -> int:
        if nal_type in (NalUnitType.IDR_W_RADL, NalUnitType.IDR_N_LP):
            self._prev_poc = 0
            return 0
        max_lsb = 1 << self.sps.log2_max_pic_order_cnt_lsb
        prev_lsb = self._prev_poc & (max_lsb - 1)
        prev_msb = self._prev_poc - prev_lsb
        lsb = sh.pic_order_cnt_lsb
        if lsb < prev_lsb and prev_lsb - lsb >= max_lsb // 2:
            msb = prev_msb + max_lsb
        elif lsb > prev_lsb and lsb - prev_lsb > max_lsb // 2:
            msb = prev_msb - max_lsb
        else:
            msb = prev_msb
        poc = msb + lsb
        self._prev_poc = poc
        return poc

    # -- slice decode -------------------------------------------------------
    def _decode_slice(self, rbsp: bytes, nal_type: NalUnitType,
                      eps=()):
        sps, pps = self.sps, self.pps
        sh = parse_slice_header(rbsp, sps, pps, nal_type)
        poc = self._poc_of(sh, nal_type)
        qp = sh.slice_qp
        qpc = chroma_qp_from_luma(qp + pps.cb_qp_offset)
        w, h = sps.pic_width, sps.pic_height
        bd = sps.bit_depth_luma
        maxv = (1 << bd) - 1
        is_b = sh.slice_type == SliceType.B
        is_p = sh.slice_type == SliceType.P or is_b

        refs: list[Frame] = []
        ref_pocs: list[int] = []
        refs_l1: list[Frame] = []
        ref_pocs_l1: list[int] = []
        if is_p:
            by_poc = {p.poc: p.frame for p in self.pictures}
            negs = [poc - d for d, used in (sh.negative_refs or [])
                    if used]
            poss = [poc + d for d, used in (sh.positive_refs or [])
                    if used]
            # default reference list order (8.3.4): L0 = past then
            # future, L1 = future then past, both closest-first
            l0 = negs + poss
            l1 = poss + negs
            ref_pocs = l0[:sh.num_ref_idx_l0]
            refs = [by_poc[p] for p in ref_pocs]
            assert len(refs) == sh.num_ref_idx_l0 > 0
            if is_b:
                ref_pocs_l1 = l1[:sh.num_ref_idx_l1]
                refs_l1 = [by_poc[p] for p in ref_pocs_l1]
                assert len(refs_l1) == sh.num_ref_idx_l1 > 0

        ts_on = bool(pps.transform_skip_enabled)

        def read_ts(is_luma, log2):
            """transform_skip_flag for 4x4 TBs (7.3.8.11)."""
            if ts_on and log2 == 2:
                return dec.decode_bin(
                    ctx, OFF["TRANSFORMSKIP_FLAG"]
                    + (0 if is_luma else 1))
            return 0

        def inv_tb(deq, tsf, use_dst=False):
            from hmtpu.ops.transform import transform_skip_inv
            if tsf:
                return transform_skip_inv(deq, deq.shape[-1], bd)
            return inverse_np(deq[None], bd, use_dst=use_dst)[0]

        rec_y = np.zeros((h, w), dtype=np.int32)
        rec_u = np.zeros((h // 2, w // 2), dtype=np.int32)
        rec_v = np.zeros((h // 2, w // 2), dtype=np.int32)
        modes = np.full((h // 8, w // 8), -1, dtype=np.int32)
        modes4 = np.full((h // 4, w // 4), -1, dtype=np.int32)
        skip_map = np.zeros((h // 8, w // 8), dtype=np.int32)
        depth_map = np.zeros((h // 8, w // 8), dtype=np.int32)
        cbf_map = np.zeros((h // 8, w // 8), dtype=bool)
        # TU-split depth floor for deblock edge derivation: a 64x64 CU
        # with residual has four 32x32 TBs (inferred split), so its
        # interior 32-edges are TU boundaries even though the CU depth
        # is 0
        tu_depth = np.zeros((h // 8, w // 8), dtype=np.int32)
        field = PicMotion.create(w, h)
        col = None
        if is_p and not is_b and sh.temporal_mvp:
            col_poc = ref_pocs[sh.collocated_ref_idx]
            for p in reversed(self.pictures):
                if p.poc == col_poc:
                    col = p.col
                    break
        mctx = MotionCtx(field, w, h, sps.log2_ctu_size, ref_pocs,
                         ref_pocs_l1, cur_poc=poc, col=col)
        max_merge = sh.max_num_merge_cand
        num_ref = sh.num_ref_idx_l0
        num_ref_l1 = sh.num_ref_idx_l1
        refs01 = (refs, refs_l1)

        dec = CabacDecoder(rbsp, sh.data_start_byte)
        ctx = make_contexts(sh.slice_type, qp)
        ctu = sps.ctu_size
        sdh = pps.sign_data_hiding

        def mpm_at(px, py):
            qx, qy = px // 4, py // 4
            lm = modes4[qy, qx - 1] if qx > 0 else -1
            am = modes4[qy - 1, qx] \
                if (qy > 0 and (py % ctu) != 0) else -1
            return mpm_list(lm if lm >= 0 else DC_IDX,
                            am if am >= 0 else DC_IDX)

        def read_mode(mpm_flag, mpms):
            if mpm_flag:
                if dec.decode_bin_ep() == 0:
                    return mpms[0]
                return mpms[1 + dec.decode_bin_ep()]
            return decode_rem_mode(dec.decode_bins_ep(5), mpms)

        def decode_intra_nxn(x0, y0):
            """part NxN: four 4x4 luma PUs + one 4x4 chroma TB pair
            (7.3.8.5 syntax order: all prev flags, then idx/rem per
            PU; chroma residual with the last sub-TU)."""
            bxi, byi = x0 // 8, y0 // 8
            offs = ((0, 0), (4, 0), (0, 4), (4, 4))
            flags = [dec.decode_bin(ctx, OFF["INTRA_PRED_MODE"])
                     for _ in range(4)]
            ms = []
            for f, (dx, dy) in zip(flags, offs):
                mp = mpm_at(x0 + dx, y0 + dy)
                m = read_mode(f, mp)
                modes4[(y0 + dy) // 4, (x0 + dx) // 4] = m
                ms.append(m)
            modes[byi, bxi] = ms[0]
            chroma_dm = dec.decode_bin(ctx, OFF["CHROMA_PRED_MODE"])
            assert chroma_dm == 0, "only DM chroma in envelope yet"
            cbf_cb = dec.decode_bin(ctx, OFF["QT_CBF_CHROMA"])
            cbf_cr = dec.decode_bin(ctx, OFF["QT_CBF_CHROMA"])
            any_y = False
            for p, (dx, dy) in enumerate(offs):
                px, py = x0 + dx, y0 + dy
                cbf = dec.decode_bin(ctx, OFF["QT_CBF_LUMA"] + 0)
                any_y = any_y or bool(cbf)
                avail = ref_availability(px, py, 4, w, h,
                                         sps.log2_ctu_size)
                raw = gather_ref_line(rec_y, px, py, 4)
                line = substitute_unavailable(raw, avail, bd)
                pred = predict_mode_np(line, line, 4, ms[p], True, bd)
                if cbf:
                    tsf = read_ts(True, 2)
                    scan = intra_scan_idx(ms[p], 2, True)
                    lev = decode_residual(dec, ctx, 2, True, scan, sdh)
                    deq = dequantize_np(lev, qp, 2, bd)
                    resi = inv_tb(deq, tsf, use_dst=True)
                else:
                    resi = 0
                rec_y[py:py + 4, px:px + 4] = np.clip(pred + resi, 0,
                                                      maxv)
                if p == 3:
                    cx, cy = x0 // 2, y0 // 2
                    for cbfc, plane in ((cbf_cb, rec_u),
                                        (cbf_cr, rec_v)):
                        avail_c = ref_availability(
                            cx, cy, 4, w // 2, h // 2,
                            sps.log2_ctu_size - 1)
                        raw_c = gather_ref_line(plane, cx, cy, 4)
                        ref_c = substitute_unavailable(raw_c, avail_c,
                                                       bd)
                        pred_c = predict_mode_np(ref_c, ref_c, 4,
                                                 ms[0], False, bd)
                        if cbfc:
                            tsf = read_ts(False, 2)
                            scan = intra_scan_idx(ms[0], 2, False)
                            lev = decode_residual(dec, ctx, 2, False,
                                                  scan, sdh)
                            deq = dequantize_np(lev, qpc, 2, bd)
                            resi_c = inv_tb(deq, tsf)
                        else:
                            resi_c = 0
                        plane[cy:cy + 4, cx:cx + 4] = np.clip(
                            pred_c + resi_c, 0, maxv)
            cbf_map[byi, bxi] = any_y

        def decode_intra_pu(x0, y0, size, log2):
            bxi, byi = x0 // 8, y0 // 8
            mpm_flag = dec.decode_bin(ctx, OFF["INTRA_PRED_MODE"])
            mpms = mpm_at(x0, y0)
            mode = read_mode(mpm_flag, mpms)
            nb = size // 8
            modes[byi:byi + nb, bxi:bxi + nb] = mode
            nq = size // 4
            modes4[y0 // 4:y0 // 4 + nq, x0 // 4:x0 // 4 + nq] = mode
            chroma_dm = dec.decode_bin(ctx, OFF["CHROMA_PRED_MODE"])
            assert chroma_dm == 0, "only DM chroma in envelope yet"

            cbf_cb = dec.decode_bin(ctx, OFF["QT_CBF_CHROMA"])
            cbf_cr = dec.decode_bin(ctx, OFF["QT_CBF_CHROMA"])
            cbf_y = dec.decode_bin(ctx, OFF["QT_CBF_LUMA"] + 1)
            cbf_map[byi:byi + size // 8, bxi:bxi + size // 8] = bool(cbf_y)

            n = size
            avail = ref_availability(x0, y0, n, w, h, sps.log2_ctu_size)
            raw = gather_ref_line(rec_y, x0, y0, n)
            ref_u_line = substitute_unavailable(raw, avail, bd)
            ref_f_line = filter_reference(ref_u_line, n, bd,
                                          sps.strong_intra_smoothing)
            pred = predict_mode_np(ref_u_line, ref_f_line, n, mode, True,
                                   bd)
            if cbf_y:
                tsf = read_ts(True, log2)
                scan = intra_scan_idx(mode, log2, True)
                lev = decode_residual(dec, ctx, log2, True, scan, sdh)
                deq = dequantize_np(lev, qp, log2, bd)
                resi = inv_tb(deq, tsf, use_dst=(log2 == 2))
            else:
                resi = 0
            rec_y[y0:y0 + n, x0:x0 + n] = np.clip(pred + resi, 0, maxv)

            cx, cy, cn, clog2 = x0 // 2, y0 // 2, n // 2, log2 - 1
            for cbf, plane in ((cbf_cb, rec_u), (cbf_cr, rec_v)):
                avail_c = ref_availability(cx, cy, cn, w // 2, h // 2,
                                           sps.log2_ctu_size - 1)
                raw_c = gather_ref_line(plane, cx, cy, cn)
                ref_c = substitute_unavailable(raw_c, avail_c, bd)
                pred_c = predict_mode_np(ref_c, ref_c, cn, mode, False, bd)
                if cbf:
                    tsf = read_ts(False, clog2)
                    scan = intra_scan_idx(mode, clog2, False)
                    lev = decode_residual(dec, ctx, clog2, False, scan, sdh)
                    deq = dequantize_np(lev, qpc, clog2, bd)
                    resi_c = inv_tb(deq, tsf)
                else:
                    resi_c = 0
                plane[cy:cy + cn, cx:cx + cn] = np.clip(pred_c + resi_c,
                                                        0, maxv)

        def mc_reconstruct(x0, y0, n, inter_dir, mv01, ridx01):
            if inter_dir != 3:
                li = 0 if inter_dir == 1 else 1
                ref = refs01[li][ridx01[li]]
                mv = mv01[li]
                pl = mc_luma_np(ref.y, x0, y0, n, n, mv[0], mv[1], bd)
                pu = mc_chroma_np(ref.u, x0 // 2, y0 // 2, n // 2,
                                  n // 2, mv[0], mv[1], bd)
                pv = mc_chroma_np(ref.v, x0 // 2, y0 // 2, n // 2,
                                  n // 2, mv[0], mv[1], bd)
                return pl, pu, pv
            hyp = []
            for li in (0, 1):
                ref = refs01[li][ridx01[li]]
                mv = mv01[li]
                hyp.append((
                    mc_luma_np_i(ref.y, x0, y0, n, n, mv[0], mv[1], bd),
                    mc_chroma_np_i(ref.u, x0 // 2, y0 // 2, n // 2,
                                   n // 2, mv[0], mv[1], bd),
                    mc_chroma_np_i(ref.v, x0 // 2, y0 // 2, n // 2,
                                   n // 2, mv[0], mv[1], bd)))
            return tuple(bi_average(a, b, bd)
                         for a, b in zip(hyp[0], hyp[1]))

        def add_inter_residual(x0, y0, n, pl, pu, pv, cbf_y, cbf_cb,
                               cbf_cr):
            log2 = n.bit_length() - 1
            if cbf_y:
                lev = decode_residual(dec, ctx, log2, True, 0, sdh)
                deq = dequantize_np(lev, qp, log2, bd)
                ry = inverse_np(deq[None], bd)[0]
            else:
                ry = 0
            rec_y[y0:y0 + n, x0:x0 + n] = np.clip(pl + ry, 0, maxv)
            cx, cy = x0 // 2, y0 // 2
            for cbf, pc, plane in ((cbf_cb, pu, rec_u), (cbf_cr, pv, rec_v)):
                if cbf:
                    tsf = read_ts(False, log2 - 1)
                    lev = decode_residual(dec, ctx, log2 - 1, False, 0,
                                          sdh)
                    deq = dequantize_np(lev, qpc, log2 - 1, bd)
                    rc = inv_tb(deq, tsf)
                else:
                    rc = 0
                plane[cy:cy + n // 2, cx:cx + n // 2] = \
                    np.clip(pc + rc, 0, maxv)

        def skip_ctx_inc(bxi, byi):
            inc = 0
            if bxi > 0 and skip_map[byi, bxi - 1]:
                inc += 1
            if byi > 0 and skip_map[byi - 1, bxi]:
                inc += 1
            return inc

        def decode_cu(x0, y0, log2, depth):
            bxi, byi = x0 // 8, y0 // 8
            size = 1 << log2
            depth_map[byi:(y0 + size) // 8, bxi:(x0 + size) // 8] = depth
            n = size

            if is_p:
                skip = dec.decode_bin(ctx, OFF["SKIP_FLAG"]
                                      + skip_ctx_inc(bxi, byi))
                if skip:
                    skip_map[byi:(y0 + n) // 8, bxi:(x0 + n) // 8] = 1
                    mi = decode_merge_idx(dec, ctx, max_merge)
                    cands = merge_candidates(mctx, x0, y0, n, n, max_merge,
                                             num_ref, is_b, num_ref_l1)
                    c = cands[mi]
                    field.set_block(x0, y0, n, n, c.inter_dir, c.mv[0],
                                    c.ref_idx[0], c.mv[1], c.ref_idx[1])
                    pl, pu, pv = mc_reconstruct(x0, y0, n, c.inter_dir,
                                                c.mv, c.ref_idx)
                    rec_y[y0:y0 + n, x0:x0 + n] = pl
                    rec_u[y0 // 2:y0 // 2 + n // 2,
                          x0 // 2:x0 // 2 + n // 2] = pu
                    rec_v[y0 // 2:y0 // 2 + n // 2,
                          x0 // 2:x0 // 2 + n // 2] = pv
                    return
                intra = dec.decode_bin(ctx, OFF["PRED_MODE"])
            else:
                intra = 1

            if intra:
                if log2 == sps.log2_min_cb_size:
                    part2n = dec.decode_bin(ctx, OFF["PART_SIZE"])
                    if not part2n:
                        decode_intra_nxn(x0, y0)
                        return
                decode_intra_pu(x0, y0, size, log2)
                return

            # inter CU
            part2n = dec.decode_bin(ctx, OFF["PART_SIZE"])
            assert part2n == 1, "only 2Nx2N inter PUs in envelope yet"
            merge = dec.decode_bin(ctx, OFF["MERGE_FLAG"])
            if merge:
                mi = decode_merge_idx(dec, ctx, max_merge)
                cands = merge_candidates(mctx, x0, y0, n, n, max_merge,
                                         num_ref, is_b, num_ref_l1)
                c = cands[mi]
                inter_dir, mv01, ridx01 = c.inter_dir, c.mv, c.ref_idx
                root_cbf = 1
            else:
                inter_dir = decode_inter_dir(dec, ctx, depth) \
                    if is_b else 1
                mv01 = [(0, 0), (0, 0)]
                ridx01 = [-1, -1]
                for li in (0, 1):
                    if not (inter_dir & (1 << li)):
                        continue
                    nr = num_ref if li == 0 else num_ref_l1
                    ridx01[li] = decode_ref_idx(dec, ctx, nr)
                    if li == 1 and sh.mvd_l1_zero and inter_dir == 3:
                        mvd = (0, 0)
                    else:
                        mvd = decode_mvd(dec, ctx)
                    mvp_idx = dec.decode_bin(ctx, OFF["MVP_IDX"])
                    amvp = amvp_candidates(mctx, x0, y0, n, n, li,
                                           ridx01[li])
                    p = amvp[mvp_idx]
                    mv01[li] = (p[0] + mvd[0], p[1] + mvd[1])
                mv01 = tuple(mv01)
                ridx01 = tuple(ridx01)
                root_cbf = dec.decode_bin(ctx, OFF["QT_ROOT_CBF"])
            field.set_block(x0, y0, n, n, inter_dir, mv01[0], ridx01[0],
                            mv01[1], ridx01[1])
            pl, pu, pv = mc_reconstruct(x0, y0, n, inter_dir, mv01,
                                        ridx01)
            if not root_cbf:
                rec_y[y0:y0 + n, x0:x0 + n] = pl
                rec_u[y0 // 2:y0 // 2 + n // 2, x0 // 2:x0 // 2 + n // 2] = pu
                rec_v[y0 // 2:y0 // 2 + n // 2, x0 // 2:x0 // 2 + n // 2] = pv
                return
            if log2 == 6:
                # TU split inferred (7.3.8.8): root chroma cbfs, then
                # four 32x32 TBs at trafoDepth 1
                root_cb = dec.decode_bin(ctx, OFF["QT_CBF_CHROMA"])
                root_cr = dec.decode_bin(ctx, OFF["QT_CBF_CHROMA"])
                tu_depth[byi:byi + 8, bxi:bxi + 8] = 1
                for qy, qx in ((0, 0), (0, 1), (1, 0), (1, 1)):
                    sx, sy = x0 + qx * 32, y0 + qy * 32
                    ccb = dec.decode_bin(ctx, OFF["QT_CBF_CHROMA"] + 1) \
                        if root_cb else 0
                    ccr = dec.decode_bin(ctx, OFF["QT_CBF_CHROMA"] + 1) \
                        if root_cr else 0
                    cy = dec.decode_bin(ctx, OFF["QT_CBF_LUMA"] + 0)
                    cbf_map[sy // 8:sy // 8 + 4,
                            sx // 8:sx // 8 + 4] = bool(cy)
                    add_inter_residual(
                        sx, sy, 32,
                        pl[qy * 32:qy * 32 + 32, qx * 32:qx * 32 + 32],
                        pu[qy * 16:qy * 16 + 16, qx * 16:qx * 16 + 16],
                        pv[qy * 16:qy * 16 + 16, qx * 16:qx * 16 + 16],
                        cy, ccb, ccr)
                return
            cbf_cb = dec.decode_bin(ctx, OFF["QT_CBF_CHROMA"])
            cbf_cr = dec.decode_bin(ctx, OFF["QT_CBF_CHROMA"])
            if cbf_cb or cbf_cr:
                cbf_y = dec.decode_bin(ctx, OFF["QT_CBF_LUMA"] + 1)
            else:
                cbf_y = 1   # inferred: rqt_root_cbf promised residual
            cbf_map[byi:(y0 + n) // 8, bxi:(x0 + n) // 8] = bool(cbf_y)
            add_inter_residual(x0, y0, n, pl, pu, pv, cbf_y, cbf_cb, cbf_cr)

        def split_ctx_inc(x0, y0, depth):
            inc = 0
            bxi, byi = x0 // 8, y0 // 8
            if x0 > 0 and depth_map[byi, bxi - 1] > depth:
                inc += 1
            if y0 > 0 and depth_map[byi - 1, bxi] > depth:
                inc += 1
            return inc

        def decode_quadtree(x0, y0, log2, depth):
            size = 1 << log2
            inside = x0 + size <= w and y0 + size <= h
            if inside and log2 > sps.log2_min_cb_size:
                split = dec.decode_bin(ctx, OFF["SPLIT_FLAG"]
                                       + split_ctx_inc(x0, y0, depth))
            else:
                split = 1 if log2 > sps.log2_min_cb_size else 0
            if split:
                half = size >> 1
                for dy, dx in ((0, 0), (0, half), (half, 0), (half, half)):
                    if x0 + dx < w and y0 + dy < h:
                        decode_quadtree(x0 + dx, y0 + dy, log2 - 1,
                                        depth + 1)
            else:
                decode_cu(x0, y0, log2, depth)

        n_ctu_x, n_ctu_y = sps.pic_width_in_ctus, sps.pic_height_in_ctus
        parse_sao = sps.sao_enabled and (sh.sao_luma or sh.sao_chroma)
        sao_grid = [[None] * n_ctu_x for _ in range(n_ctu_y)]
        # WPP: per-row substreams located via entry points (the coded
        # offsets count emulation bytes — subtract them back the way
        # the reference does, TDecCAVLC.cpp:1485-1516), CABAC engine
        # restarted per row with contexts synced from the saved state
        wpp = bool(pps.entropy_coding_sync_enabled)
        sub_start = None
        if wpp and sh.entry_point_offsets:
            hdr_end = sh.data_start_byte
            for p in eps:
                if p < hdr_end:
                    hdr_end += 1
            sub_start = [sh.data_start_byte]
            cur = prev = 0
            for off in sh.entry_point_offsets:
                cur += off
                epc = sum(1 for p in eps
                          if prev + hdr_end <= p < cur + hdr_end)
                sub_start.append(sub_start[-1] + off - epc)
                prev = cur
        saved_ctx = ctx.copy()          # width-1 fallback: slice init
        sync_x = 1 if n_ctu_x > 1 else -1
        for cty in range(n_ctu_y):
            if wpp and cty > 0:
                dec = CabacDecoder(rbsp, sub_start[cty])
                ctx[:] = saved_ctx
            for ctx_i in range(n_ctu_x):
                if parse_sao:
                    from hmtpu.entropy.sao_syntax import decode_sao_ctu
                    left = sao_grid[cty][ctx_i - 1] if ctx_i > 0 else None
                    up = sao_grid[cty - 1][ctx_i] if cty > 0 else None
                    sao_grid[cty][ctx_i] = decode_sao_ctu(
                        dec, ctx, left, up, sh.sao_luma, sh.sao_chroma,
                        bd)
                decode_quadtree(ctx_i * ctu, cty * ctu, sps.log2_ctu_size, 0)
                if wpp and ctx_i == sync_x:
                    saved_ctx = ctx.copy()
                last = (cty == n_ctu_y - 1) and (ctx_i == n_ctu_x - 1)
                end = dec.decode_bin_trm()
                assert end == (1 if last else 0), "end_of_slice desync"
                if wpp and ctx_i == n_ctu_x - 1 and not last:
                    subset = dec.decode_bin_trm()
                    assert subset == 1, "end_of_subset desync"

        if not pps.deblocking_filter_disabled:
            from hmtpu.encoder.intra_rdo import leaf_id_map
            from hmtpu.ops.deblock import deblock_frame, \
                meta_from_frame_state
            leaf_id8 = leaf_id_map(np.maximum(depth_map, tu_depth),
                                   sps.log2_ctu_size)
            meta = meta_from_frame_state(field, cbf_map, ref_pocs,
                                         leaf_id8, ref_pocs_l1)
            deblock_frame(rec_y, rec_u, rec_v, meta, qp, bd,
                          pps.beta_offset_div2, pps.tc_offset_div2,
                          pps.cb_qp_offset, pps.cr_qp_offset)

        if parse_sao:
            from hmtpu.ops.sao import apply_sao_plane
            p_y = [[p3[0] for p3 in row] for row in sao_grid]
            p_cb = [[p3[1] for p3 in row] for row in sao_grid]
            p_cr = [[p3[2] for p3 in row] for row in sao_grid]
            rec_y = apply_sao_plane(rec_y, p_y, ctu, bd)
            rec_u = apply_sao_plane(rec_u, p_cb, ctu // 2, bd)
            rec_v = apply_sao_plane(rec_v, p_cr, ctu // 2, bd)

        col_self = None
        if is_p and ref_pocs:
            col_self = dict(
                mvx=field.mv[0][::2, ::2, 0].copy(),
                mvy=field.mv[0][::2, ::2, 1].copy(),
                ok=(field.inter_dir[::2, ::2] & 1) > 0,
                refpoc=np.asarray(ref_pocs, np.int32)[
                    np.clip(field.ref_idx[0][::2, ::2], 0,
                            len(ref_pocs) - 1)],
                poc=poc)
        return DecodedPicture(Frame(rec_y, rec_u, rec_v, bd), poc,
                              col=col_self)

"""P-frame (low-delay) encoder: batched motion search + NN-FME sub-pel
on device, sequential mode decision / reconstruction / entropy on host.

Layer parity with the reference's inter path — TEncSlice::compressSlice
(TEncSlice.cpp:641) -> TEncCu RDO (TEncCu.cpp:352) ->
TEncSearch::predInterSearch (TEncSearch.cpp:3683) — inverted
breadth-first for the TPU: stage A runs integer ME for EVERY block of
the frame in one jitted kernel (search/me.py), stage B maps all cost
stencils through the NN-FME MLP in one matmul batch (models/nnfme.py;
reference: NN_pred TEncSearch.cpp:85 called per-PU at :4541), and only
the normatively sequential parts (merge/AMVP neighbour derivation,
reconstruction in coding order, CABAC) run as a host pass.

Mode decision per 8x8 CU: skip / merge+residual (best merge candidate),
AMVP inter with the searched MV, or intra — chosen by SSE + lambda *
estimated bits (the reference's RD with CABAC-counter bits lands with
the RDO-tree milestone; estimates here follow the same cost shape).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from hmtpu.common.constants import DC_IDX, SliceType
from hmtpu.common.geometry import encode_rem_mode, mpm_list, ref_availability
from hmtpu.common.motion import MotionCtx, MvCand, PicMotion, merge_candidates, \
    amvp_candidates
from hmtpu.common.params import Pps, Sps
from hmtpu.common.scan import intra_scan_idx
from hmtpu.common.spec_tables import chroma_qp_from_luma
from hmtpu.encoder.intra import gather_ref_line, satd8
from hmtpu.entropy.contexts import OFF, make_contexts
from hmtpu.entropy.headers import SliceHeader
from hmtpu.entropy.inter_syntax import (
    encode_inter_dir,
    encode_merge_idx,
    encode_mvd,
    encode_ref_idx,
)
from hmtpu.io.yuv import Frame
from hmtpu.ops.interp import (
    bi_average,
    mc_chroma_np,
    mc_chroma_np_i,
    mc_luma_np,
    mc_luma_np_i,
)
from hmtpu.ops.intra_pred import predict_all_modes_np, \
    predict_mode_np
from hmtpu.ops.intra_ref import filter_reference, substitute_unavailable
from hmtpu.ops.quant import dequantize_np, quantize_np
from hmtpu.ops.transform import forward_np, inverse_np


@dataclass
class PuDec:
    kind: str                      # 'skip' | 'merge' | 'amvp' | 'intra'
    log2: int = 3                  # CU size (8x8 or 16x16 inter)
    merge_idx: int = 0
    mv: tuple = (0, 0)             # final quarter-pel MV (L0)
    mvd: tuple = (0, 0)
    mvp_idx: int = 0
    ref_idx: int = 0
    intra_mode: int = -1
    # B slices (AMVP): 1 = L0, 2 = L1, 3 = BI; L1 motion fields
    inter_dir: int = 1
    mv_l1: tuple = (0, 0)
    mvd_l1: tuple = (0, 0)
    mvp_idx_l1: int = 0
    ref_idx_l1: int = 0
    lev_y: np.ndarray | None = None
    lev_cb: np.ndarray | None = None
    lev_cr: np.ndarray | None = None
    # transform_skip_flag per 4x4 chroma TB (PPS TransformSkip on)
    ts_cb: int = 0
    ts_cr: int = 0

    @property
    def coded(self) -> bool:
        return any(l is not None and l.any()
                   for l in (self.lev_y, self.lev_cb, self.lev_cr))


def est_level_bits(lev: np.ndarray) -> float:
    """Rough residual-rate estimate (stands in for the CABAC-counter
    estimate of TEncBinCoderCABACCounter.cpp until the RDO milestone)."""
    nz = lev[lev != 0]
    if nz.size == 0:
        return 1.0
    return 8.0 + nz.size * 2.0 + float(np.ceil(np.log2(np.abs(nz) + 1)).sum()) * 2.0


def code_residual_block(org, pred, qp, log2, bd, sdh=False,
                        scan_idx=0):
    """transform -> quant -> (dequant -> inverse) ; returns (lev, recon
    residual).  scan_idx must match the writer's (mode-dependent for
    intra) so the SDH parity fix groups the right CGs."""
    resi = org - pred
    coef = forward_np(resi[None], bd)[0]
    lev = quantize_np(coef, qp, log2, bd, True)
    if sdh and lev.any():
        from hmtpu.ops.quant import sdh_fix_np
        lev = sdh_fix_np(lev, log2, scan_idx)
    if lev.any():
        deq = dequantize_np(lev, qp, log2, bd)
        r = inverse_np(deq[None], bd)[0]
    else:
        r = np.zeros_like(org)
    return lev, r


class PFrameEncoder:
    """One P slice: num_ref L0 references, 8x8 CU grid (the RDO-tree
    milestone widens the partitioning)."""

    def __init__(self, sps: Sps, pps: Pps, subpel: str = "nn",
                 nn_params=None, search_range: int = 16):
        self.sps, self.pps = sps, pps
        self.bd = sps.bit_depth_luma
        self.subpel = subpel
        self.nn_params = nn_params
        self.search_range = search_range
        self._sdh = bool(pps.sign_data_hiding)

    # -- stage A+B: device batched search ----------------------------------
    def motion_search(self, frame: Frame, ref: Frame, qp: int):
        import jax.numpy as jnp

        from hmtpu.search.me import frac_refine_batch, integer_me

        w, h = self.sps.pic_width, self.sps.pic_height
        lam_sqrt = np.sqrt(0.57 * 2.0 ** ((qp - 12) / 3.0))
        org = jnp.asarray(frame.y.astype(np.int32))
        refy = jnp.asarray(ref.y.astype(np.int32))
        zeros = jnp.zeros((h // 8, w // 8), jnp.int32)
        (mvx, mvy), stencil, best_sad = integer_me(
            refy, org, 8, self.search_range, jnp.float32(lam_sqrt),
            zeros, zeros)

        if self.subpel == "nn" and self.nn_params is not None:
            from hmtpu.models.nnfme import predict_offsets
            st = np.asarray(stencil).reshape(-1, 9).astype(np.float32)
            nblk = st.shape[0]
            sizes = jnp.full((nblk,), 8, jnp.int32)
            _, offs = predict_offsets(self.nn_params, jnp.asarray(st),
                                      sizes, sizes)
            offs = np.asarray(offs)
            mvq_x = np.asarray(mvx).reshape(-1) * 4 + offs[:, 0]
            mvq_y = np.asarray(mvy).reshape(-1) * 4 + offs[:, 1]
        elif self.subpel == "dctif":
            by, bx = h // 8, w // 8
            ys, xs = np.mgrid[0:by, 0:bx] * 8
            org_blocks = frame.y.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) \
                .reshape(-1, 8, 8).astype(np.int32)
            mvq_x, mvq_y = frac_refine_batch(
                refy, jnp.asarray(xs.reshape(-1)), jnp.asarray(ys.reshape(-1)),
                jnp.asarray(org_blocks), jnp.asarray(mvx).reshape(-1),
                jnp.asarray(mvy).reshape(-1), 8, self.bd)
            mvq_x, mvq_y = np.asarray(mvq_x), np.asarray(mvq_y)
        else:
            mvq_x = np.asarray(mvx).reshape(-1) * 4
            mvq_y = np.asarray(mvy).reshape(-1) * 4

        by, bx = h // 8, w // 8
        return (mvq_x.reshape(by, bx), mvq_y.reshape(by, bx),
                np.asarray(stencil), np.asarray(best_sad))

    # -- main entry ---------------------------------------------------------
    def analyze(self, frame: Frame, qp: int, refs: list[Frame],
                ref_pocs: list[int], poc: int, sh: SliceHeader,
                refs_l1: list[Frame] | None = None,
                ref_pocs_l1: list[int] | None = None):
        sps = self.sps
        w, h = sps.pic_width, sps.pic_height
        bd = self.bd
        maxv = (1 << bd) - 1
        qpc = chroma_qp_from_luma(qp + self.pps.cb_qp_offset)
        lam = 0.57 * 2.0 ** ((qp - 12) / 3.0)
        lam_sqrt = np.sqrt(lam)
        is_b = sh.slice_type == SliceType.B
        refs_l1 = refs_l1 or []
        ref_pocs_l1 = ref_pocs_l1 or []

        mvq_x, mvq_y, stencil, best_sad = self.motion_search(
            frame, refs[0], qp)
        if is_b and refs_l1:
            mvq_x1, mvq_y1, _, _ = self.motion_search(frame, refs_l1[0],
                                                      qp)
        else:
            mvq_x1 = mvq_y1 = None

        rec_y = np.zeros((h, w), dtype=np.int32)
        rec_u = np.zeros((h // 2, w // 2), dtype=np.int32)
        rec_v = np.zeros((h // 2, w // 2), dtype=np.int32)
        modes = np.full((h // 8, w // 8), -1, dtype=np.int32)
        skip_map = np.zeros((h // 8, w // 8), dtype=np.int32)
        intra_map = np.zeros((h // 8, w // 8), dtype=np.int32)
        field = PicMotion.create(w, h)
        mctx = MotionCtx(field, w, h, sps.log2_ctu_size, ref_pocs,
                         ref_pocs_l1, cur_poc=poc)
        decisions: dict[tuple, PuDec] = {}
        max_merge = sh.max_num_merge_cand
        num_ref = len(refs)
        num_ref_l1 = len(refs_l1)
        refs01 = (refs, refs_l1)

        ctu = sps.ctu_size
        for cty in range(sps.pic_height_in_ctus):
            for ctxi in range(sps.pic_width_in_ctus):
                for zi in range(64):
                    bx = by = 0
                    for bit in range(3):
                        bx |= ((zi >> (2 * bit)) & 1) << bit
                        by |= ((zi >> (2 * bit + 1)) & 1) << bit
                    x, y = ctxi * ctu + bx * 8, cty * ctu + by * 8
                    if x >= w or y >= h:
                        continue
                    self._encode_block(
                        frame, qp, qpc, x, y, rec_y, rec_u, rec_v,
                        modes, skip_map, intra_map, field, mctx,
                        decisions, refs01, (mvq_x, mvq_y),
                        (mvq_x1, mvq_y1), lam, lam_sqrt,
                        maxv, max_merge, num_ref, num_ref_l1, is_b)

        recon = Frame(rec_y, rec_u, rec_v, bd)
        return recon, field, decisions, (modes, skip_map, intra_map)

    def encode_frame(self, frame: Frame, qp: int, refs: list[Frame],
                     ref_pocs: list[int], poc: int, sh: SliceHeader,
                     refs_l1=None, ref_pocs_l1=None):
        recon, field, decisions, maps = self.analyze(
            frame, qp, refs, ref_pocs, poc, sh, refs_l1, ref_pocs_l1)
        rbsp = self._entropy_pass(qp, *maps, decisions, sh)
        return rbsp, recon, field, decisions

    # -- candidate helpers --------------------------------------------------
    def _mc_pred(self, refs, ref_idx, x, y, mv):
        ref = refs[ref_idx]
        pl = mc_luma_np(ref.y, x, y, 8, 8, mv[0], mv[1], self.bd)
        pu = mc_chroma_np(ref.u, x // 2, y // 2, 4, 4, mv[0], mv[1], self.bd)
        pv = mc_chroma_np(ref.v, x // 2, y // 2, 4, 4, mv[0], mv[1], self.bd)
        return pl, pu, pv

    def _mc_pred_dir(self, refs01, inter_dir, mv01, ridx01, x, y):
        # uni: final precision; bi: intermediate hypotheses + average
        bd = self.bd
        if inter_dir != 3:
            li = 0 if inter_dir == 1 else 1
            return self._mc_pred(refs01[li], ridx01[li], x, y, mv01[li])
        hyp = []
        for li in (0, 1):
            ref = refs01[li][ridx01[li]]
            mv = mv01[li]
            hyp.append((
                mc_luma_np_i(ref.y, x, y, 8, 8, mv[0], mv[1], bd),
                mc_chroma_np_i(ref.u, x // 2, y // 2, 4, 4, mv[0],
                               mv[1], bd),
                mc_chroma_np_i(ref.v, x // 2, y // 2, 4, 4, mv[0],
                               mv[1], bd)))
        return tuple(bi_average(a, b, bd)
                     for a, b in zip(hyp[0], hyp[1]))

    def _mc_pred_luma(self, refs01, inter_dir, mv01, ridx01, x, y):
        # luma-only hypothesis for candidate screening
        bd = self.bd
        if inter_dir != 3:
            li = 0 if inter_dir == 1 else 1
            ref = refs01[li][ridx01[li]]
            mv = mv01[li]
            return mc_luma_np(ref.y, x, y, 8, 8, mv[0], mv[1], bd)
        h0 = mc_luma_np_i(refs01[0][ridx01[0]].y, x, y, 8, 8,
                          mv01[0][0], mv01[0][1], bd)
        h1 = mc_luma_np_i(refs01[1][ridx01[1]].y, x, y, 8, 8,
                          mv01[1][0], mv01[1][1], bd)
        return bi_average(h0, h1, bd)

    def _intra_candidate(self, frame, qp, x, y, rec_y, modes):
        sps, bd = self.sps, self.bd
        w, h = sps.pic_width, sps.pic_height
        n = 8
        org = frame.y[y:y + n, x:x + n].astype(np.int32)
        avail = ref_availability(x, y, n, w, h, sps.log2_ctu_size)
        raw = gather_ref_line(rec_y, x, y, n)
        ref_u_line = substitute_unavailable(raw, avail, bd)
        ref_f_line = filter_reference(ref_u_line, n, bd, False)
        preds = predict_all_modes_np(ref_u_line, ref_f_line, n, True, bd)
        satds = satd8(org[None] - preds)
        bxi, byi = x // 8, y // 8
        left_mode = modes[byi, bxi - 1] if bxi > 0 else -1
        above_mode = modes[byi - 1, bxi] \
            if (byi > 0 and (y % sps.ctu_size) != 0) else -1
        mpms = mpm_list(left_mode if left_mode >= 0 else DC_IDX,
                        above_mode if above_mode >= 0 else DC_IDX)
        bits = np.full(35, 6.0)
        for i, m in enumerate(mpms):
            bits[m] = 2.0 if i == 0 else 3.0
        mode = int(np.argmin(satds + np.sqrt(
            0.57 * 2.0 ** ((qp - 12) / 3.0)) * bits))
        return mode, preds[mode], bits[mode]

    # -- per-block decision -------------------------------------------------
    def _encode_block(self, frame, qp, qpc, x, y, rec_y, rec_u, rec_v,
                      modes, skip_map, intra_map, field, mctx, decisions,
                      refs01, mv0_grid, mv1_grid, lam, lam_sqrt, maxv,
                      max_merge, num_ref, num_ref_l1, is_b):
        bd = self.bd
        n = 8
        bxi, byi = x // 8, y // 8
        org = frame.y[y:y + n, x:x + n].astype(np.int32)
        org_u = frame.u[y // 2:y // 2 + 4, x // 2:x // 2 + 4].astype(np.int32)
        org_v = frame.v[y // 2:y // 2 + 4, x // 2:x // 2 + 4].astype(np.int32)

        def sse3(pl, pu, pv):
            return float(((org - pl) ** 2).sum()) \
                + float(((org_u - pu) ** 2).sum()) \
                + float(((org_v - pv) ** 2).sum())

        merge = merge_candidates(mctx, x, y, n, n, max_merge, num_ref,
                                 is_b, num_ref_l1)
        # screen merge candidates by luma-only prediction SSE, then
        # evaluate the winner at full (luma+chroma) precision
        best_mi, best_lsse = 0, None
        seen = []
        for mi, cand in enumerate(merge):
            key = (cand.inter_dir, cand.mv, cand.ref_idx)
            if key in seen:
                continue
            seen.append(key)
            pl = self._mc_pred_luma(refs01, cand.inter_dir, cand.mv,
                                    cand.ref_idx, x, y)
            sse = float(((org - pl) ** 2).sum())
            if best_lsse is None or sse < best_lsse:
                best_mi, best_lsse = mi, sse
        mcand = merge[best_mi]
        best_mpred = self._mc_pred_dir(refs01, mcand.inter_dir, mcand.mv,
                                       mcand.ref_idx, x, y)
        best_msse = sse3(*best_mpred)

        # candidate 1: SKIP (merge MV, no residual)
        cost_skip = best_msse + lam * (1.0 + best_mi + 1.0)


        # candidate 3: AMVP inter with the searched MV(s)
        def mvd_bits_of(mv, amvp):
            mvds = [(mv[0] - p[0], mv[1] - p[1]) for p in amvp]
            bits = [abs(a).bit_length() * 2 + abs(b).bit_length() * 2 + 2
                    for a, b in mvds]
            i = int(np.argmin(bits))
            return mvds[i], i, bits[i]

        mv0 = (int(mv0_grid[0][byi, bxi]), int(mv0_grid[1][byi, bxi]))
        amvp0 = amvp_candidates(mctx, x, y, n, n, 0, 0)
        mvd0, mvp0, bits0 = mvd_bits_of(mv0, amvp0)
        amvp_opts = []          # (dir, mv01, mvd01, mvp01, hdr_bits)
        amvp_opts.append((1, (mv0, (0, 0)), (mvd0, (0, 0)), (mvp0, 0),
                          6.0 + bits0))
        if is_b and num_ref_l1:
            mv1 = (int(mv1_grid[0][byi, bxi]), int(mv1_grid[1][byi, bxi]))
            amvp1 = amvp_candidates(mctx, x, y, n, n, 1, 0)
            mvd1, mvp1, bits1 = mvd_bits_of(mv1, amvp1)
            amvp_opts.append((2, ((0, 0), mv1), ((0, 0), mvd1), (0, mvp1),
                              6.0 + bits1))
            amvp_opts.append((3, (mv0, mv1), (mvd0, mvd1), (mvp0, mvp1),
                              7.0 + bits0 + bits1))

        # screen AMVP directions by luma SSE, full RD on the winner
        if len(amvp_opts) > 1:
            lsse = [float(((org - self._mc_pred_luma(
                refs01, ad, mv01, (0, 0), x, y)) ** 2).sum())
                for ad, mv01, _, _, _ in amvp_opts]
            amvp_opts = [amvp_opts[int(np.argmin(lsse))]]
        adir, mv01, mvd01, mvp01, hdr_a = amvp_opts[0]
        pred_a = self._mc_pred_dir(refs01, adir, mv01, (0, 0), x, y)
        sse_a = sse3(*pred_a)

        # decide merge vs AMVP on prediction SSE + header bits, then
        # code the winner's residual once (TEncCu keeps both full-RD
        # paths; this is the fast-decision analogue)
        code_merge = best_msse + lam * (4.0 + best_mi) \
            <= sse_a + lam * hdr_a
        if code_merge:
            lev_y_m, ry_m = code_residual_block(org, best_mpred[0], qp,
                                                3, bd, self._sdh)
            lev_cb_m, ru_m = code_residual_block(org_u, best_mpred[1],
                                                 qpc, 2, bd, self._sdh)
            lev_cr_m, rv_m = code_residual_block(org_v, best_mpred[2],
                                                 qpc, 2, bd, self._sdh)
            d_merge = sse3(np.clip(best_mpred[0] + ry_m, 0, maxv),
                           np.clip(best_mpred[1] + ru_m, 0, maxv),
                           np.clip(best_mpred[2] + rv_m, 0, maxv))
            bits_merge = 4.0 + best_mi + est_level_bits(lev_y_m) \
                + est_level_bits(lev_cb_m) + est_level_bits(lev_cr_m)
            cost_merge = d_merge + lam * bits_merge
            lev_y_a = lev_cb_a = lev_cr_a = None
            cost_amvp = np.inf
            best_a = None
        else:
            lev_y_m = lev_cb_m = lev_cr_m = np.zeros((8, 8), np.int32)
            ry_m = ru_m = rv_m = 0
            cost_merge = np.inf
            lev_y_a, ry_a = code_residual_block(org, pred_a[0], qp, 3, bd, self._sdh)
            lev_cb_a, ru_a = code_residual_block(org_u, pred_a[1], qpc,
                                                 2, bd, self._sdh)
            lev_cr_a, rv_a = code_residual_block(org_v, pred_a[2], qpc,
                                                 2, bd, self._sdh)
            d = sse3(np.clip(pred_a[0] + ry_a, 0, maxv),
                     np.clip(pred_a[1] + ru_a, 0, maxv),
                     np.clip(pred_a[2] + rv_a, 0, maxv))
            bits = hdr_a + est_level_bits(lev_y_a) \
                + est_level_bits(lev_cb_a) + est_level_bits(lev_cr_a)
            best_a = (d + lam * bits, adir, mv01, mvd01, mvp01,
                      (lev_y_a, lev_cb_a, lev_cr_a),
                      (ry_a, ru_a, rv_a), pred_a)
            cost_amvp = best_a[0]

        # candidate 4: intra — evaluated only when inter prediction is
        # poor (the reference's FEN fast-encoder-decision analogue)
        inter_best = min(cost_skip, cost_merge, cost_amvp)
        if inter_best <= 24.0 * lam:
            costs = [cost_skip, cost_merge, cost_amvp, np.inf]
            choice = int(np.argmin(costs))
            if choice == 1 and not (lev_y_m.any() or lev_cb_m.any()
                                    or lev_cr_m.any()):
                choice = 0
            return self._commit_inter(
                choice, x, y, rec_y, rec_u, rec_v, skip_map, field,
                decisions, maxv, best_mi, best_mpred, mcand,
                (lev_y_m, lev_cb_m, lev_cr_m), (ry_m, ru_m, rv_m),
                best_a)

        imode, ipred, ibits = self._intra_candidate(frame, qp, x, y,
                                                    rec_y, modes)
        from hmtpu.common.scan import intra_scan_idx as _isi
        lev_y_i, ry_i = code_residual_block(org, ipred, qp, 3, bd,
                                            self._sdh, _isi(imode, 3,
                                                            True))
        # chroma DM prediction from reconstructed chroma neighbours
        ich = []
        for plane_org, plane_rec, corg in ((frame.u, rec_u, org_u),
                                           (frame.v, rec_v, org_v)):
            cx, cy = x // 2, y // 2
            avail_c = ref_availability(cx, cy, 4, self.sps.pic_width // 2,
                                       self.sps.pic_height // 2,
                                       self.sps.log2_ctu_size - 1)
            raw_c = gather_ref_line(plane_rec, cx, cy, 4)
            ref_c = substitute_unavailable(raw_c, avail_c, bd)
            pred_c = predict_mode_np(ref_c, ref_c, 4, imode, False, bd)
            lv, rc = code_residual_block(corg, pred_c, qpc, 2, bd,
                                         self._sdh,
                                         _isi(imode, 2, False))
            ich.append((pred_c, lv, rc))
        d_intra = sse3(np.clip(ipred + ry_i, 0, maxv),
                       np.clip(ich[0][0] + ich[0][2], 0, maxv),
                       np.clip(ich[1][0] + ich[1][2], 0, maxv))
        bits_intra = 3.0 + ibits + est_level_bits(lev_y_i) \
            + est_level_bits(ich[0][1]) + est_level_bits(ich[1][1])
        cost_intra = d_intra + lam * bits_intra

        costs = [cost_skip, cost_merge, cost_amvp, cost_intra]
        choice = int(np.argmin(costs))
        # a merge CU whose residual quantises to zero is normatively skip
        if choice == 1 and not (lev_y_m.any() or lev_cb_m.any()
                                or lev_cr_m.any()):
            choice = 0
        if choice < 3:
            return self._commit_inter(
                choice, x, y, rec_y, rec_u, rec_v, skip_map, field,
                decisions, maxv, best_mi, best_mpred, mcand,
                (lev_y_m, lev_cb_m, lev_cr_m), (ry_m, ru_m, rv_m),
                best_a)
        # intra
        rec_y[y:y + n, x:x + n] = np.clip(ipred + ry_i, 0, maxv)
        rec_u[y // 2:y // 2 + 4, x // 2:x // 2 + 4] = \
            np.clip(ich[0][0] + ich[0][2], 0, maxv)
        rec_v[y // 2:y // 2 + 4, x // 2:x // 2 + 4] = \
            np.clip(ich[1][0] + ich[1][2], 0, maxv)
        modes[byi, bxi] = imode
        intra_map[byi, bxi] = 1
        decisions[(x, y)] = PuDec("intra", intra_mode=imode,
                                  lev_y=lev_y_i, lev_cb=ich[0][1],
                                  lev_cr=ich[1][1])

    def _commit_inter(self, choice, x, y, rec_y, rec_u, rec_v, skip_map,
                      field, decisions, maxv, best_mi, best_mpred,
                      mcand, mlevs, mres, best_a):
        n = 8
        bxi, byi = x // 8, y // 8
        lev_y_m, lev_cb_m, lev_cr_m = mlevs
        ry_m, ru_m, rv_m = mres

        def set_field(cand_dir, mv01, ridx01):
            field.set_block(x, y, n, n, cand_dir, mv01[0], ridx01[0],
                            mv01[1], ridx01[1])

        if choice == 0:       # SKIP
            pl, pu, pv = best_mpred
            rec_y[y:y + n, x:x + n] = pl
            rec_u[y // 2:y // 2 + 4, x // 2:x // 2 + 4] = pu
            rec_v[y // 2:y // 2 + 4, x // 2:x // 2 + 4] = pv
            skip_map[byi, bxi] = 1
            set_field(mcand.inter_dir, mcand.mv, mcand.ref_idx)
            decisions[(x, y)] = PuDec("skip", merge_idx=best_mi,
                                      mv=mcand.mv[0],
                                      ref_idx=mcand.ref_idx[0])
        elif choice == 1:     # merge + residual
            pl, pu, pv = best_mpred
            rec_y[y:y + n, x:x + n] = np.clip(pl + ry_m, 0, maxv)
            rec_u[y // 2:y // 2 + 4, x // 2:x // 2 + 4] = \
                np.clip(pu + ru_m, 0, maxv)
            rec_v[y // 2:y // 2 + 4, x // 2:x // 2 + 4] = \
                np.clip(pv + rv_m, 0, maxv)
            set_field(mcand.inter_dir, mcand.mv, mcand.ref_idx)
            decisions[(x, y)] = PuDec("merge", merge_idx=best_mi,
                                      mv=mcand.mv[0],
                                      ref_idx=mcand.ref_idx[0],
                                      lev_y=lev_y_m, lev_cb=lev_cb_m,
                                      lev_cr=lev_cr_m)
        else:                 # AMVP
            _, adir, mv01, mvd01, mvp01, levs, rs, pred = best_a
            rec_y[y:y + n, x:x + n] = np.clip(pred[0] + rs[0], 0, maxv)
            rec_u[y // 2:y // 2 + 4, x // 2:x // 2 + 4] = \
                np.clip(pred[1] + rs[1], 0, maxv)
            rec_v[y // 2:y // 2 + 4, x // 2:x // 2 + 4] = \
                np.clip(pred[2] + rs[2], 0, maxv)
            set_field(adir, mv01, (0 if adir & 1 else -1,
                                   0 if adir & 2 else -1))
            decisions[(x, y)] = PuDec(
                "amvp", mv=mv01[0], mvd=mvd01[0], mvp_idx=mvp01[0],
                ref_idx=0, inter_dir=adir, mv_l1=mv01[1],
                mvd_l1=mvd01[1], mvp_idx_l1=mvp01[1], ref_idx_l1=0,
                lev_y=levs[0], lev_cb=levs[1], lev_cr=levs[2])

    # -- entropy ------------------------------------------------------------
    def _entropy_pass(self, qp, modes, skip_map, intra_map, decisions,
                      sh: SliceHeader, sao=None, depth8=None) -> bytes:
        from hmtpu.entropy.recorder import make_backend
        from hmtpu.entropy.sao_syntax import encode_sao_ctu

        sps = self.sps
        w, h = sps.pic_width, sps.pic_height
        ctx = make_contexts(sh.slice_type, qp)
        enc = make_backend(ctx)
        sdh = self.pps.sign_data_hiding
        ts_on = bool(self.pps.transform_skip_enabled)

        def emit_ts_chroma(val):
            """transform_skip_flag, 4x4 chroma TB (7.3.8.11)."""
            if ts_on:
                enc.encode_bin(OFF["TRANSFORMSKIP_FLAG"] + 1, int(val))
        max_merge = sh.max_num_merge_cand
        num_ref = sh.num_ref_idx_l0
        num_ref_l1 = sh.num_ref_idx_l1
        is_b = sh.slice_type == SliceType.B
        ctu = sps.ctu_size

        def skip_ctx_inc(bxi, byi):
            inc = 0
            if bxi > 0 and skip_map[byi, bxi - 1]:
                inc += 1
            if byi > 0 and skip_map[byi - 1, bxi]:
                inc += 1
            return inc

        def encode_cu(x0, y0, log2=3):
            bxi, byi = x0 // 8, y0 // 8
            d = decisions[(x0, y0)]
            enc.encode_bin(OFF["SKIP_FLAG"] + skip_ctx_inc(bxi, byi),
                           int(d.kind == "skip"))
            if d.kind == "skip":
                encode_merge_idx(enc, d.merge_idx, max_merge)
                return
            assert log2 == 3 or (log2 in (4, 5, 6) and d.kind != "intra"), \
                "intra CUs are 8x8 in this envelope"
            enc.encode_bin(OFF["PRED_MODE"], int(d.kind == "intra"))
            if d.kind == "intra":
                enc.encode_bin(OFF["PART_SIZE"], 1)   # 2Nx2N
                mode = d.intra_mode
                left_mode = modes[byi, bxi - 1] if bxi > 0 else -1
                above_mode = modes[byi - 1, bxi] \
                    if (byi > 0 and (y0 % ctu) != 0) else -1
                mpms = mpm_list(left_mode if left_mode >= 0 else DC_IDX,
                                above_mode if above_mode >= 0 else DC_IDX)
                if mode in mpms:
                    enc.encode_bin(OFF["INTRA_PRED_MODE"], 1)
                    idx = mpms.index(mode)
                    enc.encode_bin_ep(0 if idx == 0 else 1)
                    if idx:
                        enc.encode_bin_ep(idx - 1)
                else:
                    enc.encode_bin(OFF["INTRA_PRED_MODE"], 0)
                    enc.encode_bins_ep(encode_rem_mode(mode, mpms), 5)
                enc.encode_bin(OFF["CHROMA_PRED_MODE"], 0)  # DM
                cbf_cb = bool(d.lev_cb.any())
                cbf_cr = bool(d.lev_cr.any())
                cbf_y = bool(d.lev_y.any())
                enc.encode_bin(OFF["QT_CBF_CHROMA"], int(cbf_cb))
                enc.encode_bin(OFF["QT_CBF_CHROMA"], int(cbf_cr))
                enc.encode_bin(OFF["QT_CBF_LUMA"] + 1, int(cbf_y))
                if cbf_y:
                    enc.residual(d.lev_y, 3, True,
                                 intra_scan_idx(mode, 3, True), sdh)
                if cbf_cb:
                    emit_ts_chroma(d.ts_cb)
                    enc.residual(d.lev_cb, 2, False,
                                 intra_scan_idx(mode, 2, False), sdh)
                if cbf_cr:
                    emit_ts_chroma(d.ts_cr)
                    enc.residual(d.lev_cr, 2, False,
                                 intra_scan_idx(mode, 2, False), sdh)
                return

            # inter, 2Nx2N
            enc.encode_bin(OFF["PART_SIZE"], 1)
            if d.kind == "merge":
                enc.encode_bin(OFF["MERGE_FLAG"], 1)
                encode_merge_idx(enc, d.merge_idx, max_merge)
            else:
                enc.encode_bin(OFF["MERGE_FLAG"], 0)
                if is_b:
                    # bin0 ctx = CtDepth of the CU (9.3.4.2.2)
                    encode_inter_dir(enc, d.inter_dir,
                                     sps.log2_ctu_size - log2)
                if d.inter_dir & 1:
                    encode_ref_idx(enc, d.ref_idx, num_ref)
                    encode_mvd(enc, d.mvd[0], d.mvd[1])
                    enc.encode_bin(OFF["MVP_IDX"], d.mvp_idx)
                if d.inter_dir & 2:
                    encode_ref_idx(enc, d.ref_idx_l1, num_ref_l1)
                    if not sh.mvd_l1_zero or d.inter_dir != 3:
                        encode_mvd(enc, d.mvd_l1[0], d.mvd_l1[1])
                    enc.encode_bin(OFF["MVP_IDX"], d.mvp_idx_l1)
            cbf_cb = bool(d.lev_cb.any())
            cbf_cr = bool(d.lev_cr.any())
            cbf_y = bool(d.lev_y.any())
            if d.kind == "amvp":
                root = int(cbf_cb or cbf_cr or cbf_y)
                enc.encode_bin(OFF["QT_ROOT_CBF"], root)
                if not root:
                    return
            if log2 == 6:
                # TU split inferred (log2TrafoSize 6 > MaxTbLog2SizeY,
                # 7.3.8.8 interSplitFlag): root chroma cbfs at
                # trafoDepth 0, then four 32x32 TBs at trafoDepth 1
                enc.encode_bin(OFF["QT_CBF_CHROMA"], int(cbf_cb))
                enc.encode_bin(OFF["QT_CBF_CHROMA"], int(cbf_cr))
                for qy, qx in ((0, 0), (0, 1), (1, 0), (1, 1)):
                    ly = d.lev_y[qy * 32:qy * 32 + 32,
                                 qx * 32:qx * 32 + 32]
                    lcb = d.lev_cb[qy * 16:qy * 16 + 16,
                                   qx * 16:qx * 16 + 16]
                    lcr = d.lev_cr[qy * 16:qy * 16 + 16,
                                   qx * 16:qx * 16 + 16]
                    ccb, ccr = bool(lcb.any()), bool(lcr.any())
                    cy = bool(ly.any())
                    if cbf_cb:
                        enc.encode_bin(OFF["QT_CBF_CHROMA"] + 1,
                                       int(ccb))
                    if cbf_cr:
                        enc.encode_bin(OFF["QT_CBF_CHROMA"] + 1,
                                       int(ccr))
                    enc.encode_bin(OFF["QT_CBF_LUMA"] + 0, int(cy))
                    if cy:
                        enc.residual(ly, 5, True, 0, sdh)
                    if cbf_cb and ccb:
                        enc.residual(lcb, 4, False, 0, sdh)
                    if cbf_cr and ccr:
                        enc.residual(lcr, 4, False, 0, sdh)
                return
            enc.encode_bin(OFF["QT_CBF_CHROMA"], int(cbf_cb))
            enc.encode_bin(OFF["QT_CBF_CHROMA"], int(cbf_cr))
            if cbf_cb or cbf_cr:
                enc.encode_bin(OFF["QT_CBF_LUMA"] + 1, int(cbf_y))
            # else cbf_luma inferred 1
            if cbf_y:
                enc.residual(d.lev_y, log2, True, 0, sdh)
            if cbf_cb:
                if log2 == 3:
                    emit_ts_chroma(d.ts_cb)
                enc.residual(d.lev_cb, log2 - 1, False, 0, sdh)
            if cbf_cr:
                if log2 == 3:
                    emit_ts_chroma(d.ts_cr)
                enc.residual(d.lev_cr, log2 - 1, False, 0, sdh)

        # depth of the coding tree per 8x8 cell: the real split-flag
        # context rule (9.3.4.2.2) compares neighbour CU depths
        d8 = depth8 if depth8 is not None \
            else np.full((h // 8, w // 8), sps.log2_ctu_size - 3,
                         dtype=np.int32)

        def split_ctx_inc(x0, y0, depth):
            bxi, byi = x0 // 8, y0 // 8
            inc = 0
            if x0 > 0 and d8[byi, bxi - 1] > depth:
                inc += 1
            if y0 > 0 and d8[byi - 1, bxi] > depth:
                inc += 1
            return inc

        def encode_quadtree(x0, y0, log2, depth):
            size = 1 << log2
            inside = x0 + size <= w and y0 + size <= h
            split = d8[y0 // 8, x0 // 8] > depth
            if inside and log2 > 3:
                enc.encode_bin(OFF["SPLIT_FLAG"]
                               + split_ctx_inc(x0, y0, depth),
                               int(split))
            if log2 > 3 and (split or not inside):
                half = size >> 1
                for dy, dx in ((0, 0), (0, half), (half, 0), (half, half)):
                    if x0 + dx < w and y0 + dy < h:
                        encode_quadtree(x0 + dx, y0 + dy, log2 - 1,
                                        depth + 1)
            else:
                encode_cu(x0, y0, log2)

        n_ctu_x, n_ctu_y = sps.pic_width_in_ctus, sps.pic_height_in_ctus
        wpp = bool(self.pps.entropy_coding_sync_enabled)
        # WPP (9.3.2.2 / TEncSlice.cpp:1066-1089): ctx stored after the
        # row's 2nd CTU, restored at each row start; one byte-aligned
        # substream per CTU row with end_of_subset_one_bit
        sync_x = 1 if n_ctu_x > 1 else -1
        if wpp and sync_x < 0:
            enc.save_ctx()        # width-1 fallback: slice-init state
        for cty in range(n_ctu_y):
            if wpp and cty > 0:
                enc.restore_ctx()
            for ctxi in range(n_ctu_x):
                if sao is not None:
                    grid, sl, sc = sao
                    encode_sao_ctu(enc, grid[cty][ctxi], ctxi > 0,
                                   cty > 0, sl, sc, self.bd)
                encode_quadtree(ctxi * ctu, cty * ctu, sps.log2_ctu_size, 0)
                if wpp and ctxi == sync_x:
                    enc.save_ctx()
                last = (cty == n_ctu_y - 1) and (ctxi == n_ctu_x - 1)
                if not last:
                    enc.encode_bin_trm(0)
                if wpp and ctxi == n_ctu_x - 1 and not last:
                    enc.end_substream()
        rbsp = enc.finish()
        if wpp:
            from hmtpu.entropy.recorder import entry_point_sizes
            sh.entry_point_offsets = entry_point_sizes(
                rbsp, enc.boundaries)
        return rbsp

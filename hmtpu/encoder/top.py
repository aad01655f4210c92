"""Encoder top level: owns parameter sets, DPB, GOP structure; drives
per-frame encoding and assembles access units (capability parity with
TEncTop.cpp:87-353, TEncGOP::compressGOP TEncGOP.cpp:1077 and the NAL
assembly at TEncGOP.cpp:2434, for the all-intra and low-delay-P
configurations).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

from hmtpu.common.constants import NalUnitType, SliceType
from hmtpu.common.params import Pps, Sps, Vps
from hmtpu.encoder.intra import IntraFrameEncoder
from hmtpu.encoder.pframe import PFrameEncoder
from hmtpu.entropy.headers import (
    SliceHeader,
    write_pps,
    write_slice_header,
    write_sps,
    write_vps,
)
from hmtpu.io.hashsei import make_hash_sei_nal, picture_md5
from hmtpu.io.nal import NalUnit, write_annexb
from hmtpu.io.yuv import Frame


@dataclass
class EncoderConfig:
    width: int = 416
    height: int = 240
    qp: int = 32
    bit_depth: int = 8
    # profile signalled in the PTL: "" = derive (main / main10),
    # "main-rext" / "high-throughput-rext" add the A.3.5/A.3.6
    # constraint flags
    profile: str = ""
    ctu_size: int = 64
    decoded_picture_hash: bool = True
    sign_data_hiding: bool = True   # HM SignHideFlag default
    frames: int = 0            # 0 = all
    deblock: bool = True       # in-loop deblocking filter
    sao: bool = True           # sample adaptive offset
    # GOP: "ai" = all intra, "ldp" = IPPP low-delay
    gop: str = "ai"
    intra_period: int = 0      # 0 = only first frame is IDR (ldp)
    num_refs: int = 1
    # fractional-pel strategy: "nn" (NN-FME), "dctif" (HM-style), "none"
    subpel: str = "dctif"
    # RDOQ trellis in the device quantiser (TComTrQuant RDOQ flag);
    # False = plain deadzone quantisation (+ SDH parity stage)
    rdoq: bool = True
    # 4x4 transform skip (TComTrQuant.cpp:1460 TS branch + RDOQTS);
    # currently effective on the all-intra path — the native P-slice
    # walk does not speak the flag yet, so LDP/RA force it off
    transform_skip: bool = False
    # WPP (entropy_coding_sync): per-CTU-row CABAC substreams with
    # context sync after the row's 2nd CTU + entry points in the
    # slice header (TEncSlice.cpp:751-870,937,1001).  Prediction is
    # unrestricted — only the entropy tail changes shape.
    wpp: bool = False
    # P-slice decision engine: "scan" = exact z-scan wavefront,
    # "jacobi" = batched iteration + exact syntax repair
    # (encoder/pframe_jacobi.py)
    decision: str = "scan"
    # device wavefront decision pass for P slices (encoder/pframe_dev.py)
    wavefront: bool = True
    nn_weights_dir: str | None = None
    search_range: int = 16
    max_num_merge_cand: int = 5
    # temporal MVP (collocated merge/AMVP candidate, 8.5.3.2.8; HM
    # default on) — applied on the device-wavefront P path
    tmvp: bool = True
    # per-GOP-position QP offsets + lambda QP-factors (HM's Frame1..N
    # rows, encoder_lowdelay_P_main.cfg); applied to P slices by
    # coding position within the GOP.  Empty = flat QP.
    gop_qp_offsets: tuple = ()
    gop_qp_factors: tuple = ()
    # R-lambda rate control (encoder/ratectrl.py); 0 = fixed QP
    target_kbps: float = 0.0
    frame_rate: float = 50.0
    # prefix-SEI messages (io/sei.py; HM SEIEncoder.cpp — off in the
    # BASELINE configs, on by the matching cfg keys)
    sei_active_parameter_sets: bool = False
    sei_recovery_point: bool = False
    sei_pic_timing: bool = False
    # buffering-period SEI + the VUI/HRD signalling it requires
    # (SEIEncoder initSEIBufferingPeriod; implies per-AU pic_timing
    # with CPB/DPB clocks)
    sei_buffering_period: bool = False


@dataclass
class FrameResult:
    poc: int
    bits: int
    psnr_y: float
    psnr_u: float
    psnr_v: float
    seconds: float
    slice_type: str = "I"


def psnr(org: np.ndarray, rec: np.ndarray, maxv: int) -> float:
    mse = np.mean((org.astype(np.float64) - rec.astype(np.float64)) ** 2)
    if mse == 0:
        return 999.99
    return 10.0 * np.log10(maxv * maxv / mse)


def gop_depth(poc: int, gop_size: int) -> int:
    """Hierarchy depth of a POC within the GOP (TEncSlice::initEncSlice
    depth derivation): 0 for GOP-aligned pictures, >0 otherwise; HM
    scales lambda by Clip3(2,4,(qp-12)/6) whenever depth > 0."""
    p = poc % gop_size
    if p == 0:
        return 0
    depth = 0
    step = gop_size
    i = step >> 1
    while i >= 1:
        for j in range(i, gop_size, step):
            if j == p:
                i = 0
                break
        step >>= 1
        depth += 1
        if i == 0:
            break
        i >>= 1
    return depth


def lambda_qp_factor(base_factor: float, qp: int, depth: int) -> float:
    """HM's per-slice lambda = factor * 2^((qp-12)/3), with the depth
    scale for non-anchor pictures (TEncSlice.cpp initEncSlice)."""
    f = base_factor
    if depth > 0:
        f *= min(max((qp - 12) / 6.0, 2.0), 4.0)
    return f


class Encoder:
    def __init__(self, cfg: EncoderConfig):
        self.cfg = cfg
        if cfg.gop == "ldp" and not cfg.gop_qp_offsets:
            # HM low-delay-P GOP4 defaults (Frame1..4 rows)
            cfg.gop_qp_offsets = (3, 2, 3, 1)
            cfg.gop_qp_factors = (0.4624, 0.4624, 0.4624, 0.578)
            if cfg.num_refs == 1:
                cfg.num_refs = 4     # HM LDP: four active references
        self.sps = Sps(
            pic_width=cfg.width, pic_height=cfg.height,
            bit_depth_luma=cfg.bit_depth, bit_depth_chroma=cfg.bit_depth,
            log2_ctu_size=cfg.ctu_size.bit_length() - 1,
            sao_enabled=cfg.sao,
            temporal_mvp_enabled=cfg.tmvp and cfg.gop == "ldp"
            and cfg.wavefront,
        )
        if cfg.gop == "ra":
            # hierarchical GOP-8: up to 4 retained refs + reordering
            self.sps.max_dec_pic_buffering = 6
            self.sps.max_num_reorder_pics = 4
        elif cfg.gop == "ldp":
            # HM LDP RPS keeps GOP anchors + startup recents (up to 7)
            self.sps.max_dec_pic_buffering = 8
        if cfg.sei_buffering_period and cfg.gop == "ra":
            # pic_timing_hrd writes a constant dpb_output_delay, which
            # is only conformant when the stream has no reordering; the
            # per-AU decode-vs-output delay for hierarchical GOPs is
            # not derived yet (HM: numReorderPics + encOrder - outOrder)
            raise ValueError("sei_buffering_period supports ai/ldp GOPs")
        if cfg.sei_buffering_period:
            self.sps.vui_timing_present = True
            self.sps.hrd_present = True
            self.sps.time_scale = int(cfg.frame_rate * 1000)
            self.sps.num_units_in_tick = 1000
            if cfg.target_kbps > 0:
                self.sps.hrd_bit_rate = int(cfg.target_kbps * 1500)
                self.sps.hrd_cpb_size = int(cfg.target_kbps * 2000)
        if cfg.bit_depth == 10:
            # Main10 profile signalling (A.3.3)
            self.sps.ptl.general_profile_idc = 2
            self.sps.ptl.general_profile_compatibility = 1 << 2
        prof = (cfg.profile or "").lower().replace("_", "-")
        if prof in ("main-rext", "high-throughput-rext"):
            # RExt profile signalling (A.3.5/A.3.6): constraint flags
            # describe the coded stream's envelope
            idc = 4 if prof == "main-rext" else 5
            self.sps.ptl.general_profile_idc = idc
            self.sps.ptl.general_profile_compatibility = 1 << idc
            self.sps.ptl.bit_depth_constraint = max(cfg.bit_depth, 8)
            self.sps.ptl.chroma_constraint = self.sps.chroma_format
            self.sps.ptl.intra_constraint = \
                prof == "high-throughput-rext" or cfg.gop == "ai"
            self.sps.ptl.lower_bit_rate_constraint = True
        elif prof not in ("", "main", "main10"):
            raise ValueError(f"unsupported profile {cfg.profile}")
        self.pps = Pps(init_qp=cfg.qp, sign_data_hiding=cfg.sign_data_hiding,
                       deblocking_filter_disabled=not cfg.deblock,
                       # TS reaches AI (4x4 luma+chroma TBs) and LDP
                       # (4x4 chroma TBs in the device P pass + both
                       # walks); the RA B path does not speak it yet
                       transform_skip_enabled=cfg.transform_skip
                       and cfg.gop in ("ai", "ldp"),
                       entropy_coding_sync_enabled=cfg.wpp)
        self.vps = Vps(max_dec_pic_buffering=self.sps.max_dec_pic_buffering,
                       max_num_reorder_pics=self.sps.max_num_reorder_pics,
                       ptl=self.sps.ptl)
        self.results: list[FrameResult] = []
        self.rc = None                           # R-lambda rate control
        self.dpb: list[tuple[int, Frame]] = []   # (poc, recon) newest last
        self._last_idr = 0                       # input index of last IDR
        # adapted CABAC states harvested per GOP position, pricing the
        # next same-position frame's device RDO (entropy/fracbits.py)
        self._ctx_harvest: dict[int, object] = {}
        self.nn_params = None
        if cfg.subpel == "nn":
            self.nn_params = self._load_nn(cfg)

    @staticmethod
    def _load_nn(cfg: EncoderConfig):
        import os

        import jax

        from hmtpu.models import nnfme

        dirs = [cfg.nn_weights_dir] if cfg.nn_weights_dir else []
        # in-repo trained weights (tools/train_nnfme.py output)
        dirs.append(os.path.join(os.path.dirname(nnfme.__file__), "weights"))
        # nearest trained QP wins (the reference trains {22,27,32,37}
        # and falls back to the QP22 block otherwise, TEncSearch.cpp:924)
        for d in dirs:
            if not d:
                continue
            sub = os.path.join(d, str(cfg.qp))
            if os.path.isdir(sub):
                return nnfme.load_reference_csv(sub)
            cands = []
            if os.path.isdir(d):
                for f in os.listdir(d):
                    if f.startswith("qp") and f.endswith(".npz"):
                        cands.append(int(f[2:-4]))
            if cands:
                best = min(cands, key=lambda q: abs(q - cfg.qp))
                return nnfme.load_npz(os.path.join(d, f"qp{best}.npz"))
        return nnfme.init_random(jax.random.PRNGKey(0))

    def _intra_lambda_factor(self) -> float:
        """I-slice QP factor: 0.57 * (1 - Clip3(0, .5, .05*(GOPSize-1)))
        (TEncSlice::initEncSlice I_SLICE branch)."""
        if self.cfg.gop == "ai":
            return 0.57
        gop_size = 8 if self.cfg.gop == "ra" \
            else max(len(self.cfg.gop_qp_offsets), 4)
        nb = gop_size - 1
        return 0.57 * (1.0 - min(max(0.05 * nb, 0.0), 0.5))

    def _is_idr(self, poc: int) -> bool:
        if self.cfg.gop == "ai":
            return True
        if poc == 0:
            return True
        ip = self.cfg.intra_period
        return ip > 0 and poc % ip == 0

    # HM low-delay-P GOP4 reference rows (encoder_lowdelay_P_main.cfg
    # Frame1..4 deltaRPS columns): each P frame references the previous
    # picture plus the low-QP GOP anchors — materially better
    # references than the 4 most recent pictures
    LDP_RPS_ROWS = ((-1, -5, -9, -13), (-1, -2, -6, -10),
                    (-1, -3, -7, -11), (-1, -4, -8, -12))

    def _ldp_lists(self, rel_poc: int, avail: set):
        """HM-parity L0 + the RPS retention set for a low-delay-P
        picture: the GOP-position row's deltas, missing entries filled
        with the most recent available pictures (TEncTop::xInitRPS
        startup RPSs), list in descending POC.  Verified line-by-line
        against the reference encoder's per-POC [L0 ...] log."""
        row = self.LDP_RPS_ROWS[(rel_poc - 1) % 4]
        want = [rel_poc + d for d in row if rel_poc + d >= 0]
        l0 = [p for p in want if p in avail]
        for p in sorted(avail, reverse=True):
            if len(l0) >= min(4, self.cfg.num_refs):
                break
            if p not in l0:
                l0.append(p)
        l0 = sorted(l0, reverse=True)[:min(4, self.cfg.num_refs)]
        keep = set(l0)
        for q in avail:
            if q % 4 == 0 and q >= rel_poc - 12:
                keep.add(q)            # anchors reachable by later rows
            if rel_poc <= 12 and q >= rel_poc - 2:
                keep.add(q)            # startup fills
        return l0, keep

    # hierarchical GOP-8 random-access structure in coding order:
    # (display offset within GOP, referenced display offsets)
    RA_GOP8 = (
        (8, (0,)),
        (4, (0, 8)),
        (2, (0, 4, 8)),
        (1, (0, 2, 4)),
        (3, (2, 4, 0)),
        (6, (4, 8, 0)),
        (5, (4, 6, 8)),
        (7, (6, 8, 4)),
    )

    def _ra_schedule(self, n: int) -> list[tuple[int, tuple[int, ...]]]:
        """Coding-order schedule [(poc, referenced pocs)] for n frames:
        full hierarchical GOP-8 groups, low-delay tail."""
        sched = [(0, ())]
        base = 0
        while base + 8 <= n - 1:
            for off, refs in self.RA_GOP8:
                sched.append((base + off, tuple(base + r for r in refs)))
            base += 8
        for poc in range(base + 1, n):
            sched.append((poc, (poc - 1,)))
        return sched

    # -- checkpoint / resume (SURVEY §5: resumable long encodes; the
    # reference has none — its only state is the DPB ring,
    # TEncTop.cpp:475 — so a resume there means re-encoding) ---------------
    def save_checkpoint(self, path: str) -> None:
        """Serialize the inter-frame state after encode_sequence
        returned (pipeline flushed): DPB recon + collocated motion,
        harvested CABAC states, rate-control model, POC counters.
        The bitstream itself is append-only per access unit, so the
        caller just concatenates the bytes from each segment."""
        import pickle

        dpb = [(p, dict(y=f.y, u=f.u, v=f.v, bd=f.bit_depth,
                        col_np=getattr(f, "col_np", None)))
               for p, f in self.dpb]
        state = dict(
            version=1, poc_base=getattr(self, "_poc_base", 0),
            last_idr=self._last_idr,
            dpb=dpb, ctx=self._ctx_harvest, rc=self.rc,
            results=self.results)
        with open(path, "wb") as f:
            pickle.dump(state, f)

    def load_checkpoint(self, path: str) -> None:
        """Restore state saved by save_checkpoint; the next
        encode_sequence call continues the sequence (pass the frames
        AFTER the checkpoint point)."""
        import pickle

        with open(path, "rb") as f:
            state = pickle.load(f)
        self._poc_base = state["poc_base"]
        self._last_idr = state["last_idr"]
        self._ctx_harvest = state["ctx"]
        self.rc = state["rc"]
        self.results = state["results"]
        self.dpb = []
        for p, d in state["dpb"]:
            fr = Frame(d["y"], d["u"], d["v"], d["bd"])
            if d["col_np"] is not None:
                fr.col_np = d["col_np"]
                # device collocated field for TMVP: the decoder's col
                # picture has this motion, so the device derivation
                # must see it too (an empty field would de-sync the
                # coded merge indices from the decoder's list)
                import jax.numpy as jnp
                c = d["col_np"]
                fr.dev_col = ((jnp.asarray(c["mvx"], jnp.int32),
                               jnp.asarray(c["mvy"], jnp.int32),
                               jnp.asarray(c["ok"]),
                               jnp.asarray(c["refpoc"], jnp.int32)),
                              int(c["poc"]))
            self.dpb.append((p, fr))

    def encode_sequence(self, frames: list[Frame]) -> bytes:
        out = bytearray()
        poc0 = getattr(self, "_poc_base", 0)
        if self.cfg.gop != "ra":
            if self.cfg.target_kbps > 0 and self.rc is None:
                from hmtpu.encoder.ratectrl import RateControl
                self.rc = RateControl(
                    self.cfg.target_kbps, self.cfg.frame_rate,
                    self.cfg.width, self.cfg.height, len(frames))
            elif self.rc is not None:
                # resumed (or chained) segment: the pickled rc carries
                # the FIRST segment's total_frames; without extending it
                # _budget_left() goes negative once frames_done passes
                # it and every target clamps to the floor (QP ceiling)
                self.rc.total_frames = self.rc.frames_done + len(frames)
            # two-phase pipeline: while the device computes frame N+1
            # (whose references live on device), the host pulls frame
            # N's decision tensors and runs entropy/hash.  Rate control
            # needs causal bit feedback, so it finishes before launch.
            pending = None
            for i, frame in enumerate(frames):
                poc = poc0 + i
                if self.rc is not None and pending is not None:
                    out.extend(write_annexb(self._finish_p(pending)))
                    pending = None
                if self._is_idr(poc) or not self.cfg.wavefront:
                    if pending is not None:
                        out.extend(write_annexb(self._finish_p(pending)))
                        pending = None
                    out.extend(write_annexb(
                        self.encode_frame_au(frame, poc)))
                else:
                    launched = self._launch_p(frame, poc)
                    if pending is not None:
                        out.extend(write_annexb(self._finish_p(pending)))
                    pending = launched
            if pending is not None:
                out.extend(write_annexb(self._finish_p(pending)))
            self._poc_base = poc0 + len(frames)
            return bytes(out)

        # RA: schedule the FULL sequence (including any checkpointed
        # prefix) and keep the entries of this segment — segmentation
        # then cannot change the coding order or the reference
        # structure, so a resumed encode is byte-identical.  A resume
        # point must be a completed-GOP boundary (the checkpoint DPB
        # carries the retained anchors).
        sched = [e for e in self._ra_schedule(poc0 + len(frames))
                 if e[0] >= poc0]
        if {p for p, _ in sched} != set(range(poc0,
                                              poc0 + len(frames))):
            # a resume point inside an unfinished GOP would leave
            # earlier display-order pictures uncodable
            raise ValueError("RA resume must start at a completed-GOP "
                             "boundary")
        dpb_map: dict[int, Frame] = dict(self.dpb)
        if poc0:
            missing = {p for _, u in sched for p in u
                       if p < poc0 and p not in dpb_map}
            if missing:
                raise ValueError(
                    f"RA resume point is not a GOP boundary: the "
                    f"checkpoint DPB lacks {sorted(missing)}")
        for i, (poc, used) in enumerate(sched):
            # pictures still needed by this or any later frame
            future = set()
            for _, u in sched[i:]:
                future.update(u)
            retained = {p: f for p, f in dpb_map.items() if p in future}
            nals = self.encode_frame_au(frames[poc - poc0], poc,
                                        ra=(used, retained))
            out.extend(write_annexb(nals))
            dpb_map = dict(retained)
            dpb_map[poc] = self._last_recon
        self.dpb = sorted(dpb_map.items())
        self._poc_base = poc0 + len(frames)
        return bytes(out)

    # -- two-phase P-frame pipeline (device wavefront path) -----------------
    def _launch_p(self, frame: Frame, poc: int) -> dict:
        """Dispatch frame's device pass; a device-plane placeholder
        enters the DPB immediately so the next frame can launch without
        waiting for this one's host side."""
        from hmtpu.encoder.pframe_dev import PFrameDeviceEncoder

        t0 = time.time()
        cfg = self.cfg
        rel_poc = poc - self._last_idr
        dpb_map = dict(self.dpb)
        ref_pocs, keep = self._ldp_lists(rel_poc, set(dpb_map))
        refs = [dpb_map[p] for p in ref_pocs]
        n_ref = len(ref_pocs)
        rps = sorted(keep, key=lambda p: rel_poc - p)
        negs = [(rel_poc - p, p in set(ref_pocs)) for p in rps]
        qp, qpf = cfg.qp, 0.57
        gop_size = max(len(cfg.gop_qp_offsets), 1)
        if cfg.gop_qp_offsets:
            gpos = (rel_poc - 1) % len(cfg.gop_qp_offsets)
            qp = cfg.qp + cfg.gop_qp_offsets[gpos]
            qpf = cfg.gop_qp_factors[gpos]
        qpf = lambda_qp_factor(qpf, qp, gop_depth(rel_poc, gop_size))
        if self.rc is not None:
            # preanalyzer activity steers the picture's share of the
            # budget (TEncPreanalyzer::xPreanalyze -> bit allocation)
            from hmtpu.encoder.preanalyze import activity_map
            _, avg_act = activity_map(np.asarray(frame.y))
            _, lam, qp = self.rc.pick(False, (rel_poc - 1) % 4,
                                      complexity=avg_act)
            qpf = lam / 2.0 ** ((qp - 12) / 3.0)
        sh = SliceHeader(
            slice_type=SliceType.P, pps_id=0, slice_qp=qp,
            pic_order_cnt_lsb=rel_poc, nal_type=NalUnitType.TRAIL_R,
            negative_refs=negs, num_ref_idx_l0=n_ref,
            five_minus_max_num_merge_cand=5 - cfg.max_num_merge_cand,
            temporal_mvp=self.sps.temporal_mvp_enabled)
        gpos_key = (rel_poc - 1) % max(len(cfg.gop_qp_offsets), 1)
        pe = PFrameDeviceEncoder(self.sps, self.pps, subpel=cfg.subpel,
                                 nn_params=self.nn_params,
                                 search_range=cfg.search_range,
                                 qp_factor=qpf, tmvp=cfg.tmvp,
                                 rdoq=cfg.rdoq, decision=cfg.decision,
                                 pad_refs=cfg.num_refs,
                                 ctx_states=self._ctx_harvest.get(
                                     gpos_key))
        pe._gpos_key = gpos_key
        ctx = pe.launch(frame, qp, refs, ref_pocs, rel_poc, sh)
        ph = Frame(None, None, None, cfg.bit_depth)
        ph.dev = ctx["dev"]
        ph.dev_col = ctx["col_out"]
        self.dpb.append((rel_poc, ph))
        self.dpb = [(p, f) for p, f in self.dpb
                    if p in keep or p == rel_poc]
        return dict(pe=pe, ctx=ctx, sh=sh, frame=frame, poc=poc,
                    ph=ph, t0=t0)

    def _finish_p(self, launched: dict) -> list[NalUnit]:
        """Host half: pull decisions, entropy-code, hash, account."""
        cfg = self.cfg
        pe, sh, frame = launched["pe"], launched["sh"], launched["frame"]
        recon, field, decisions, maps = pe.finish(launched["ctx"])
        ph = launched["ph"]
        ph.y, ph.u, ph.v = recon.y, recon.u, recon.v
        ph.col_np = getattr(recon, "col_np", None)

        sao = None
        if self.sps.sao_enabled:
            sh.sao_luma = True
            sh.sao_chroma = True
            sao = ("packed", pe._sao_packed)
        slice_rbsp = pe._entropy_pass(sh.slice_qp, *maps, decisions, sh,
                                      sao=sao)
        if pe.final_ctx is not None:
            self._ctx_harvest[pe._gpos_key] = pe.final_ctx
        bw = write_slice_header(sh, self.sps, self.pps)
        bw.write_bytes(slice_rbsp)
        nals = self._prefix_seis(False)
        nals.append(NalUnit(sh.nal_type, bw.get_bytes()))
        if cfg.decoded_picture_hash:
            digests = picture_md5(recon.planes(), [cfg.bit_depth] * 3)
            nals.append(make_hash_sei_nal(digests))
        maxv = (1 << cfg.bit_depth) - 1
        total_bits = sum(len(n.to_bytes()) * 8 for n in nals)
        if self.rc is not None:
            self.rc.update(total_bits)
        self.results.append(FrameResult(
            launched["poc"], total_bits,
            psnr(frame.y, recon.y, maxv),
            psnr(frame.u, recon.u, maxv),
            psnr(frame.v, recon.v, maxv),
            time.time() - launched["t0"], "P"))
        self._last_recon = recon
        return nals

    def _prefix_seis(self, is_idr: bool) -> list[NalUnit]:
        """Access-unit prefix SEI per HM's TEncGOP SEI assembly:
        active_parameter_sets + recovery_point at IRAPs, pic_timing
        per picture (all config-gated, defaults off like the BASELINE
        configs)."""
        from hmtpu.io import sei

        cfg = self.cfg
        msgs = []
        if is_idr and cfg.sei_active_parameter_sets:
            msgs.append(sei.active_parameter_sets())
        if is_idr and cfg.sei_recovery_point:
            msgs.append(sei.recovery_point())
        if cfg.sei_buffering_period:
            if is_idr:
                init = min(self.sps.hrd_cpb_size * 90000
                           // max(self.sps.hrd_bit_rate, 1), 0xFFFFFF)
                msgs.append(sei.buffering_period(self.sps.sps_id,
                                                 init))
                self._au_since_bp = 0
            # HRD signalled => pic_timing with CPB/DPB clocks per AU
            n = getattr(self, "_au_since_bp", 0)
            msgs.append(sei.pic_timing_hrd(
                max(n - 1, 0) if not is_idr else 0,
                self.sps.max_num_reorder_pics + 1))
            self._au_since_bp = n + 1
        elif cfg.sei_pic_timing:
            msgs.append(sei.pic_timing_frame_field())
        return [sei.prefix_sei_nal(msgs)] if msgs else []

    def encode_frame_au(self, frame: Frame, poc: int,
                        ra=None) -> list[NalUnit]:
        t0 = time.time()
        cfg = self.cfg
        nals: list[NalUnit] = []
        is_idr = self._is_idr(poc) if ra is None else poc == 0
        qp_frame = cfg.qp
        if self.rc is not None and is_idr:
            from hmtpu.encoder.preanalyze import activity_map
            _, avg_act = activity_map(np.asarray(frame.y))
            _, _, qp_frame = self.rc.pick(True, complexity=avg_act)
        if poc == 0:
            nals += [write_vps(self.vps), write_sps(self.sps),
                     write_pps(self.pps)]
        nals += self._prefix_seis(is_idr)

        if is_idr:
            self.dpb.clear()
            self._last_idr = poc
            fe = IntraFrameEncoder(self.sps, self.pps)
            if cfg.wavefront:
                recon, decisions, mode8, depth8 = fe.analyze_device(
                    frame, qp_frame,
                    lam_factor=self._intra_lambda_factor(),
                    deblock=cfg.deblock,
                    sao=bool(self.sps.sao_enabled))
            else:
                recon, decisions, mode8, depth8 = fe.analyze(
                    frame, qp_frame,
                    lam_factor=self._intra_lambda_factor())
            sh = SliceHeader(slice_type=SliceType.I, pps_id=0,
                             slice_qp=qp_frame,
                             nal_type=NalUnitType.IDR_W_RADL)
            stype = "I"
            rel_poc = 0
            field, ref_pocs, ref_pocs_l1 = None, [], []
        elif ra is None:
            if cfg.wavefront:
                return nals + self._finish_p(self._launch_p(frame, poc))
            rel_poc = poc - self._last_idr       # POC restarts at each IDR
            n_ref = min(cfg.num_refs, len(self.dpb))
            refs = [f for _, f in self.dpb[-n_ref:]][::-1]   # newest first
            ref_pocs = [p for p, _ in self.dpb[-n_ref:]][::-1]
            ref_pocs_l1 = []
            negs = [(rel_poc - p, True) for p in ref_pocs]
            sh = SliceHeader(
                slice_type=SliceType.P, pps_id=0, slice_qp=qp_frame,
                pic_order_cnt_lsb=rel_poc, nal_type=NalUnitType.TRAIL_R,
                negative_refs=negs, num_ref_idx_l0=n_ref,
                five_minus_max_num_merge_cand=5 - cfg.max_num_merge_cand)
            pe = PFrameEncoder(self.sps, self.pps, subpel=cfg.subpel,
                               nn_params=self.nn_params,
                               search_range=cfg.search_range)
            recon, field, decisions, maps = pe.analyze(
                frame, qp_frame, refs, ref_pocs, rel_poc, sh)
            stype = "P"
        else:
            # random access: B slice with RPS covering the retained DPB
            used, retained = ra
            rel_poc = poc
            # hierarchical QP/lambda per temporal layer (the reference
            # encoder_randomaccess GOP8 table: offsets 1/2/3/4, factors
            # 0.442/0.3536/0.68)
            _off_fac = {0: (1, 0.442), 4: (2, 0.3536),
                        2: (3, 0.3536), 6: (3, 0.3536)}
            ra_off, ra_fac = _off_fac.get(poc % 8, (4, 0.68))
            qp_frame = min(cfg.qp + ra_off, 51)
            past_u = sorted((p for p in used if p < poc), reverse=True)
            futr_u = sorted(p for p in used if p > poc)
            ref_pocs = past_u + futr_u                  # L0 default order
            ref_pocs_l1 = futr_u + past_u               # L1 default order
            all_pocs = set(retained) | set(used)
            negs = [(poc - p, p in used)
                    for p in sorted((q for q in all_pocs if q < poc),
                                    reverse=True)]
            poss = [(p - poc, p in used)
                    for p in sorted(q for q in all_pocs if q > poc)]
            dpb_all = dict(retained)
            refs = [dpb_all[p] for p in ref_pocs]
            refs_l1 = [dpb_all[p] for p in ref_pocs_l1]
            sh = SliceHeader(
                slice_type=SliceType.B, pps_id=0, slice_qp=qp_frame,
                pic_order_cnt_lsb=poc & ((1 << 8) - 1),
                nal_type=NalUnitType.TRAIL_R,
                negative_refs=negs, positive_refs=poss,
                num_ref_idx_l0=len(ref_pocs),
                num_ref_idx_l1=len(ref_pocs_l1),
                five_minus_max_num_merge_cand=5 - cfg.max_num_merge_cand)
            if cfg.wavefront:
                from hmtpu.encoder.pframe_dev import PFrameDeviceEncoder
                pe = PFrameDeviceEncoder(
                    self.sps, self.pps, subpel=cfg.subpel,
                    nn_params=self.nn_params,
                    search_range=cfg.search_range, qp_factor=ra_fac,
                    tmvp=False, rdoq=cfg.rdoq)
            else:
                pe = PFrameEncoder(self.sps, self.pps,
                                   subpel=cfg.subpel,
                                   nn_params=self.nn_params,
                                   search_range=cfg.search_range)
            recon, field, decisions, maps = pe.analyze(
                frame, qp_frame, refs, ref_pocs, poc, sh, refs_l1,
                ref_pocs_l1)
            stype = "B"

        post_done = getattr(fe, "post_done", False) if is_idr \
            else (not is_idr and ra is not None
                  and getattr(pe, "post_done", False))
        if cfg.deblock and not post_done:
            from hmtpu.common.motion import PicMotion
            from hmtpu.ops.deblock import deblock_frame, \
                meta_from_frame_state

            if field is None:
                field = PicMotion.create(cfg.width, cfg.height)
            h8, w8 = cfg.height // 8, cfg.width // 8
            cbf8 = np.zeros((h8, w8), dtype=bool)
            leaf_id8 = np.arange(h8 * w8, dtype=np.int32).reshape(h8, w8)
            for (x, y), d in decisions.items():
                lev = getattr(d, "lev_y", None)
                s8 = (1 << getattr(d, "log2", 3)) // 8
                yi, xi = y // 8, x // 8
                cbf8[yi:yi + s8, xi:xi + s8] = \
                    lev is not None and bool(lev.any())
                leaf_id8[yi:yi + s8, xi:xi + s8] = yi * w8 + xi
            meta = meta_from_frame_state(field, cbf8, ref_pocs, leaf_id8,
                                         ref_pocs_l1)
            deblock_frame(recon.y, recon.u, recon.v, meta, qp_frame,
                          cfg.bit_depth, cb_qp_off=self.pps.cb_qp_offset,
                          cr_qp_off=self.pps.cr_qp_offset)

        sao = None
        if self.sps.sao_enabled and post_done:
            from hmtpu.ops.sao import grid_from_packed

            ny = self.sps.pic_height_in_ctus
            nx = self.sps.pic_width_in_ctus
            packed = (fe if is_idr else pe)._sao_packed
            grid = grid_from_packed(packed.reshape(ny, nx, 3, 7))
            sh.sao_luma = True
            sh.sao_chroma = True
            sao = (grid, True, True)
        elif self.sps.sao_enabled:
            from hmtpu.common.spec_tables import chroma_qp_from_luma
            from hmtpu.ops.sao import (
                apply_sao_plane,
                estimate_sao_chroma,
                estimate_sao_plane,
            )

            lamf_sao = self._intra_lambda_factor() if is_idr else 0.57
            lam = lamf_sao * 2.0 ** ((qp_frame - 12) / 3.0)
            ctu = cfg.ctu_size
            p_y = estimate_sao_plane(frame.y, recon.y, ctu, lam,
                                     cfg.bit_depth)
            p_cb, p_cr = estimate_sao_chroma(
                frame.u, recon.u, frame.v, recon.v, ctu // 2, lam,
                cfg.bit_depth)
            grid = [[(p_y[cy][cx], p_cb[cy][cx], p_cr[cy][cx])
                     for cx in range(len(p_y[0]))]
                    for cy in range(len(p_y))]
            new_y = apply_sao_plane(recon.y, p_y, ctu, cfg.bit_depth)
            new_u = apply_sao_plane(recon.u, p_cb, ctu // 2,
                                    cfg.bit_depth)
            new_v = apply_sao_plane(recon.v, p_cr, ctu // 2,
                                    cfg.bit_depth)
            recon = Frame(new_y, new_u, new_v, cfg.bit_depth)
            sh.sao_luma = True
            sh.sao_chroma = True
            sao = (grid, True, True)

        if is_idr:
            slice_rbsp = fe._entropy_pass(qp_frame, mode8, depth8,
                                          decisions, sao=sao)
            if getattr(fe, "entry_boundaries", None):
                from hmtpu.entropy.recorder import entry_point_sizes
                sh.entry_point_offsets = entry_point_sizes(
                    slice_rbsp, fe.entry_boundaries)
        else:
            slice_rbsp = pe._entropy_pass(qp_frame, *maps, decisions, sh,
                                          sao=sao)

        bw = write_slice_header(sh, self.sps, self.pps)
        bw.write_bytes(slice_rbsp)
        nals.append(NalUnit(sh.nal_type, bw.get_bytes()))

        if cfg.decoded_picture_hash:
            digests = picture_md5(recon.planes(), [cfg.bit_depth] * 3)
            nals.append(make_hash_sei_nal(digests))

        self.dpb.append((rel_poc, recon))
        if len(self.dpb) > max(self.cfg.num_refs, 1):
            self.dpb = self.dpb[-max(self.cfg.num_refs, 1):]

        maxv = (1 << cfg.bit_depth) - 1
        total_bits = sum(len(n.to_bytes()) * 8 for n in nals)
        if self.rc is not None and is_idr:
            self.rc.update(total_bits)
        self.results.append(FrameResult(
            poc, total_bits,
            psnr(frame.y, recon.y, maxv),
            psnr(frame.u, recon.u, maxv),
            psnr(frame.v, recon.v, maxv),
            time.time() - t0,
            stype,
        ))
        self._last_recon = recon
        return nals

"""Encoder top level: owns parameter sets, drives per-frame encoding,
assembles access units (capability parity with TEncTop.cpp:87-353 and
TEncGOP's NAL assembly at TEncGOP.cpp:2434, reduced to the currently
supported all-intra path).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

from hmtpu.common.constants import NalUnitType, SliceType
from hmtpu.common.params import Pps, Sps, Vps
from hmtpu.encoder.intra import IntraFrameEncoder
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
    ctu_size: int = 64
    decoded_picture_hash: bool = True
    sign_data_hiding: bool = False
    frames: int = 0  # 0 = all


@dataclass
class FrameResult:
    poc: int
    bits: int
    psnr_y: float
    psnr_u: float
    psnr_v: float
    seconds: float


def psnr(org: np.ndarray, rec: np.ndarray, maxv: int) -> float:
    mse = np.mean((org.astype(np.float64) - rec.astype(np.float64)) ** 2)
    if mse == 0:
        return 999.99
    return 10.0 * np.log10(maxv * maxv / mse)


class Encoder:
    def __init__(self, cfg: EncoderConfig):
        self.cfg = cfg
        self.sps = Sps(
            pic_width=cfg.width, pic_height=cfg.height,
            bit_depth_luma=cfg.bit_depth, bit_depth_chroma=cfg.bit_depth,
            log2_ctu_size=cfg.ctu_size.bit_length() - 1,
        )
        self.pps = Pps(init_qp=cfg.qp, sign_data_hiding=cfg.sign_data_hiding)
        self.vps = Vps()
        self.results: list[FrameResult] = []

    def encode_sequence(self, frames: list[Frame]) -> bytes:
        out = bytearray()
        for poc, frame in enumerate(frames):
            out.extend(write_annexb(self.encode_frame_au(frame, poc)))
        return bytes(out)

    def encode_frame_au(self, frame: Frame, poc: int) -> list[NalUnit]:
        t0 = time.time()
        cfg = self.cfg
        nals: list[NalUnit] = []
        if poc == 0:
            nals += [write_vps(self.vps), write_sps(self.sps),
                     write_pps(self.pps)]

        fe = IntraFrameEncoder(self.sps, self.pps)
        slice_rbsp, recon, _ = fe.encode_frame(frame, cfg.qp)

        sh = SliceHeader(slice_type=SliceType.I, pps_id=0, slice_qp=cfg.qp,
                         nal_type=NalUnitType.IDR_W_RADL)
        bw = write_slice_header(sh, self.sps, self.pps)
        bw.write_bytes(slice_rbsp)
        nals.append(NalUnit(NalUnitType.IDR_W_RADL, bw.get_bytes()))

        if cfg.decoded_picture_hash:
            digests = picture_md5(recon.planes(), [cfg.bit_depth] * 3)
            nals.append(make_hash_sei_nal(digests))

        maxv = (1 << cfg.bit_depth) - 1
        total_bits = sum(len(n.to_bytes()) * 8 for n in nals)
        self.results.append(FrameResult(
            poc, total_bits,
            psnr(frame.y, recon.y, maxv),
            psnr(frame.u, recon.u, maxv),
            psnr(frame.v, recon.v, maxv),
            time.time() - t0,
        ))
        self._last_recon = recon
        return nals

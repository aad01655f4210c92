"""RExt profile signalling + the fifth BASELINE config
(encoder_intra_high_throughput_rext.cfg): High-Throughput-RExt PTL
constraint flags (A.3.6; reference TEncCavlc codeProfileTier RExt
branch, TComSlice.h:723) over the 10-bit all-intra + transform-skip
coding path.  The stream must HM-decode with per-POC hash OK."""
import os
import subprocess
import sys

import numpy as np
import pytest

from hmtpu.apps.options import resolve, parse_cfg_file
from hmtpu.encoder.top import Encoder, EncoderConfig
from hmtpu.io.yuv import Frame
from tools.gen_test_yuv import synth_clip

W, H = 96, 64
CFG = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "cfg",
    "encoder_intra_high_throughput_rext.cfg")


def _frames(n, bd=10):
    shift = bd - 8
    return [Frame((y.astype(np.int32) << shift),
                  (u.astype(np.int32) << shift),
                  (v.astype(np.int32) << shift), bd)
            for y, u, v in synth_clip(W, H, n)]


def test_cfg_resolves_to_rext_profile():
    app = resolve(parse_cfg_file(CFG))
    assert app.profile == "high-throughput-rext"
    assert app.internal_bit_depth == 10
    assert app.gop == "ai"
    assert app.transform_skip


@pytest.fixture(scope="module")
def stream():
    app = resolve(parse_cfg_file(CFG))
    enc = Encoder(EncoderConfig(
        width=W, height=H, qp=app.qp, bit_depth=app.internal_bit_depth,
        gop=app.gop, transform_skip=app.transform_skip,
        sign_data_hiding=app.sign_hiding, profile=app.profile))
    return enc.encode_sequence(_frames(3))


def test_rext_ptl_bits(stream):
    """general_profile_idc 5 + intra/10-bit constraint flags land in
    the SPS PTL."""
    from hmtpu.common.constants import NalUnitType
    from hmtpu.entropy.headers import parse_sps
    from hmtpu.io.bitstream import strip_emulation_prevention, BitReader
    from hmtpu.io.nal import split_annexb
    for nal in split_annexb(stream):
        if NalUnitType((nal[0] >> 1) & 0x3F) == NalUnitType.SPS_NUT:
            rbsp = strip_emulation_prevention(nal[2:])
            br = BitReader(rbsp)
            br.read(4), br.read(3), br.read(1)   # vps id, layers, nesting
            br.read(2)                           # profile_space
            br.read(1)                           # tier
            assert br.read(5) == 5               # HIGHTHROUGHPUTREXT
            br.read(32)                          # compatibility
            br.read(4)                           # source/constraint
            assert br.read(1) == 1               # max_12bit
            assert br.read(1) == 1               # max_10bit
            assert br.read(1) == 0               # max_8bit (10-bit!)
            assert br.read(1) == 1               # max_422chroma (420)
            assert br.read(1) == 1               # max_420chroma
            assert br.read(1) == 0               # max_monochrome
            assert br.read(1) == 1               # intra_constraint
            return
    pytest.fail("no SPS found")


def test_rext_stream_self_decodes(stream):
    from hmtpu.decoder.core import Decoder
    pics = Decoder().decode_annexb(stream)
    assert len(pics) == 3 and all(p.hash_ok for p in pics)


def test_rext_stream_hm_decodes(stream, tmp_path):
    dec = "/tmp/hm_oracle/bin/TAppDecoderStatic"
    if not os.path.exists(dec):
        pytest.skip("HM oracle decoder not built")
    p = tmp_path / "rext.hevc"
    p.write_bytes(stream)
    out = subprocess.run(
        [dec, "-b", str(p), "-o", str(tmp_path / "rec.yuv")],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stdout + out.stderr
    assert out.stdout.count("(OK)") == 3, out.stdout

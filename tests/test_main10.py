"""Main10 (10-bit) paths: QpBdOffset quantisation, SAO offset range,
profile signalling, e2e hash for AI/LDP/RA vs both decoders."""
import numpy as np
import pytest

from hmtpu.decoder.core import Decoder
from hmtpu.encoder.top import Encoder, EncoderConfig
from hmtpu.io.yuv import Frame
from hmtpu.ops.quant import dequantize_np, quantize_np
from hmtpu.ops.sao import max_offset
from tools.gen_test_yuv import synth_clip

from .oracle import decode, have_decoder


def _frames10(w, h, n, seed=21):
    return [Frame((y.astype(np.int32) << 2), (u.astype(np.int32) << 2),
                  (v.astype(np.int32) << 2), 10)
            for y, u, v in synth_clip(w, h, n, seed=seed)]


def test_qp_bd_offset():
    # Qp' = qp + 6*(bd-8): 10-bit quant at qp must equal 8-bit quant at
    # qp+12 in scale (same per/rem); check dequant magnitudes
    lev = np.zeros((8, 8), np.int32)
    lev[0, 0] = 10
    d8 = dequantize_np(lev, 30 + 12, 3, 8)
    d10 = dequantize_np(lev, 30, 3, 10)
    # same Qp' but the 10-bit dequant shift (bd+log2-5) is 2 larger
    assert d10[0, 0] == d8[0, 0] >> 2


def test_sao_max_offset():
    assert max_offset(8) == 7
    assert max_offset(10) == 31
    assert max_offset(12) == 31


def test_main10_profile_signalled():
    enc = Encoder(EncoderConfig(width=96, height=96, bit_depth=10))
    assert enc.sps.ptl.general_profile_idc == 2
    assert enc.sps.bit_depth_luma == 10


# NB: one GOP type per test — XLA:CPU aborts mid-compile when too many
# whole-frame programs compile in a single process (tests/run_suite.py
# gives each of these its own process).

@pytest.mark.parametrize("gop", ["ai", "ra"])
def test_main10_intree(gop):
    frames = _frames10(96, 96, 9)
    enc = Encoder(EncoderConfig(width=96, height=96, qp=30, gop=gop,
                                subpel="dctif", bit_depth=10))
    pics = Decoder().decode_annexb(enc.encode_sequence(frames))
    assert all(p.hash_ok for p in pics), gop


@pytest.mark.skipif(not have_decoder(), reason="HM oracle not built")
@pytest.mark.parametrize("gop,qp", [("ai", 22), ("ldp", 30),
                                    ("ra", 37)])
def test_main10_hm_oracle(tmp_path, gop, qp):
    frames = _frames10(96, 96, 9)
    enc = Encoder(EncoderConfig(width=96, height=96, qp=qp, gop=gop,
                                subpel="nn" if gop == "ldp"
                                else "dctif", bit_depth=10))
    p = tmp_path / f"m10_{gop}.hevc"
    p.write_bytes(enc.encode_sequence(frames))
    log = decode(str(p), str(tmp_path / "rec.yuv"))
    assert log.count("(OK)") == len(frames), f"{gop}:\n{log}"

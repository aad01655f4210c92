"""Jacobi batched P-slice decision engine (encoder/pframe_jacobi.py):
the two-round decide + exact-syntax-repair path must produce streams
that decode bit-exactly (own decoder hash + HM oracle) and stay
RD-close to the exact z-scan wavefront."""
import numpy as np
import pytest

from hmtpu.decoder.core import Decoder
from hmtpu.encoder.top import Encoder, EncoderConfig
from hmtpu.io.yuv import Frame

from .oracle import decode, have_decoder


def moving_frames(w, h, n, seed=0):
    rng = np.random.RandomState(seed)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    out = []
    for t in range(n):
        y = (128 + 60 * np.sin((xx + 3 * t) / 19.0)
             * np.cos((yy - 2 * t) / 13.0)
             + 30 * np.exp(-(((xx - 30 - 4 * t) ** 2
                              + (yy - h // 2) ** 2) / 500.0))
             + rng.randn(h, w) * 2)
        u = 128 + 25 * np.sin((xx[::2, ::2] + 2 * t) / 23.0)
        v = 128 + 25 * np.cos((yy[::2, ::2] + t) / 29.0)
        out.append(Frame(np.clip(y, 0, 255).astype(np.int32),
                         np.clip(u, 0, 255).astype(np.int32),
                         np.clip(v, 0, 255).astype(np.int32)))
    return out


def test_jacobi_own_decoder_roundtrip():
    w, h = 96, 64
    frames = moving_frames(w, h, 5)
    enc = Encoder(EncoderConfig(width=w, height=h, qp=30, gop="ldp",
                                subpel="dctif", decision="jacobi"))
    stream = enc.encode_sequence(frames)
    pics = Decoder().decode_annexb(stream)
    assert len(pics) == 5
    for pic in pics:
        assert pic.hash_ok is True


def test_jacobi_rd_close_to_scan():
    w, h = 96, 64
    frames = moving_frames(w, h, 5, seed=2)
    res = {}
    for dec in ("scan", "jacobi"):
        enc = Encoder(EncoderConfig(width=w, height=h, qp=30,
                                    gop="ldp", subpel="dctif",
                                    decision=dec))
        enc.encode_sequence(frames)
        res[dec] = (sum(r.bits for r in enc.results),
                    sum(r.psnr_y for r in enc.results) / 5)
    bits_s, psnr_s = res["scan"]
    bits_j, psnr_j = res["jacobi"]
    # the approximation may trade a few % bits; it must stay close
    assert bits_j < bits_s * 1.10
    assert psnr_j > psnr_s - 0.25


@pytest.mark.skipif(not have_decoder(), reason="HM oracle not built")
def test_jacobi_hm_oracle(tmp_path):
    w, h = 96, 64
    frames = moving_frames(w, h, 5, seed=3)
    enc = Encoder(EncoderConfig(width=w, height=h, qp=26, gop="ldp",
                                subpel="nn", num_refs=2,
                                decision="jacobi"))
    stream = enc.encode_sequence(frames)
    bs = tmp_path / "jac.hevc"
    bs.write_bytes(stream)
    out = decode(str(bs), str(tmp_path / "rec.yuv"))
    assert out.count("(OK)") == 5 and "ERROR" not in out

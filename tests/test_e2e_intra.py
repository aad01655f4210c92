"""End-to-end all-intra conformance: our encoder's stream must decode
identically in our decoder AND in the reference HM decoder (external
oracle), with matching reconstruction and picture hashes."""
import os

import numpy as np
import pytest

from hmtpu.decoder.core import Decoder
from hmtpu.encoder.top import Encoder, EncoderConfig
from hmtpu.io.yuv import Frame

from .oracle import DECODER, decode, have_decoder


def synth_frames(w, h, n, seed=0):
    rng = np.random.RandomState(seed)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    frames = []
    for t in range(n):
        y = (128 + 60 * np.sin(xx / 23.0 + t * 0.3) * np.cos(yy / 17.0)
             + 40 * np.exp(-(((xx - (40 + 6 * t)) ** 2
                              + (yy - h // 2) ** 2) / 800.0))
             + rng.randn(h, w) * 3)
        u = 128 + 30 * np.sin((xx[::2, ::2] + t * 4) / 31.0)
        v = 128 + 30 * np.cos((yy[::2, ::2] - t * 3) / 29.0)
        frames.append(Frame(np.clip(y, 0, 255).astype(np.int32),
                            np.clip(u, 0, 255).astype(np.int32),
                            np.clip(v, 0, 255).astype(np.int32)))
    return frames


@pytest.mark.parametrize("qp", [22, 32])
def test_own_decoder_roundtrip(qp):
    w, h = 64, 64
    frames = synth_frames(w, h, 2, seed=qp)
    enc = Encoder(EncoderConfig(width=w, height=h, qp=qp))
    stream = enc.encode_sequence(frames)
    dec = Decoder()
    pics = dec.decode_annexb(stream)
    assert len(pics) == 2
    for pic in pics:
        assert pic.hash_ok is True
    # psnr sanity: decodes resemble the source (SDH trades ~1dB of
    # luma PSNR for bits at low QP — the RD win shows in rate)
    assert enc.results[0].psnr_y > (34 if qp == 32 else 39)


def test_partial_ctu_picture():
    # 80x48: non-square CTU grid with partial CTUs right and bottom
    w, h = 80, 48
    frames = synth_frames(w, h, 1, seed=3)
    enc = Encoder(EncoderConfig(width=w, height=h, qp=30))
    stream = enc.encode_sequence(frames)
    pics = Decoder().decode_annexb(stream)
    assert pics[0].hash_ok is True


@pytest.mark.skipif(not have_decoder(), reason="HM oracle not built")
@pytest.mark.parametrize("qp", [22, 32, 45])
def test_hm_oracle_conformance(tmp_path, qp):
    w, h = 416, 240
    frames = synth_frames(w, h, 2, seed=1)
    enc = Encoder(EncoderConfig(width=w, height=h, qp=qp))
    stream = enc.encode_sequence(frames)
    bs = tmp_path / "out.hevc"
    bs.write_bytes(stream)
    rec = tmp_path / "rec.yuv"
    log = decode(str(bs), str(rec))
    assert "(OK)" in log and "ERROR" not in log, log
    # compare HM's recon with ours
    raw = rec.read_bytes()
    fsize = w * h * 3 // 2
    assert len(raw) == fsize * 2
    dec = Decoder()
    pics = dec.decode_annexb(stream)
    for i, pic in enumerate(pics):
        ofs = i * fsize
        hm_y = np.frombuffer(raw[ofs:ofs + w * h],
                             dtype=np.uint8).reshape(h, w)
        assert np.array_equal(pic.frame.y, hm_y.astype(np.int32))

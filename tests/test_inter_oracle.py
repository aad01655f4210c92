"""Low-delay-P conformance against the reference HM decoder: our
P-slice bitstreams must decode with matching picture hashes in HM
(TDecGop.cpp:222 hash check is the reference's own oracle)."""
import numpy as np
import pytest

from hmtpu.decoder.core import Decoder
from hmtpu.encoder.top import Encoder, EncoderConfig
from hmtpu.io.yuv import Frame
from tools.gen_test_yuv import synth_clip

from .oracle import decode, have_decoder


def synth_frames(w, h, n, seed=1):
    return [Frame(y.astype(np.int32), u.astype(np.int32),
                  v.astype(np.int32))
            for y, u, v in synth_clip(w, h, n, seed=seed)]


@pytest.mark.skipif(not have_decoder(), reason="HM oracle not built")
@pytest.mark.parametrize("subpel", ["none", "dctif", "nn"])
def test_hm_oracle_ldp(tmp_path, subpel):
    w, h = 416, 240
    frames = synth_frames(w, h, 3)
    enc = Encoder(EncoderConfig(width=w, height=h, qp=32, gop="ldp",
                                subpel=subpel, search_range=12))
    stream = enc.encode_sequence(frames)
    bs = tmp_path / "out.hevc"
    bs.write_bytes(stream)
    rec = tmp_path / "rec.yuv"
    log = decode(str(bs), str(rec))
    assert log.count("(OK)") == 3 and "ERROR" not in log, log
    raw = rec.read_bytes()
    fsize = w * h * 3 // 2
    assert len(raw) == fsize * 3
    pics = Decoder().decode_annexb(stream)
    for i, pic in enumerate(pics):
        ofs = i * fsize
        hm_y = np.frombuffer(raw[ofs:ofs + w * h],
                             dtype=np.uint8).reshape(h, w)
        assert np.array_equal(pic.frame.y, hm_y.astype(np.int32)), i


@pytest.mark.skipif(not have_decoder(), reason="HM oracle not built")
def test_hm_oracle_ldp_multiref_qpsweep(tmp_path):
    w, h = 176, 144
    frames = synth_frames(w, h, 4, seed=7)
    for qp in (22, 37):
        enc = Encoder(EncoderConfig(width=w, height=h, qp=qp, gop="ldp",
                                    num_refs=2, subpel="dctif",
                                    search_range=8))
        stream = enc.encode_sequence(frames)
        bs = tmp_path / f"out{qp}.hevc"
        bs.write_bytes(stream)
        log = decode(str(bs), str(tmp_path / f"rec{qp}.yuv"))
        assert log.count("(OK)") == 4 and "ERROR" not in log, log


@pytest.mark.skipif(not have_decoder(), reason="HM oracle not built")
def test_rate_control_hits_target(tmp_path):
    """R-lambda rate control (encoder/ratectrl.py): achieved bitrate
    within 15% of target, stream still decodes with matching hashes."""
    w, h = 416, 240
    frames = synth_frames(w, h, 16)
    target = 600.0
    enc = Encoder(EncoderConfig(width=w, height=h, qp=32, gop="ldp",
                                subpel="nn", target_kbps=target,
                                frame_rate=50.0))
    stream = enc.encode_sequence(frames)
    kbps = len(stream) * 8 / (16 / 50.0) / 1000
    assert abs(kbps - target) / target < 0.15, kbps
    bs = tmp_path / "rc.hevc"
    bs.write_bytes(stream)
    log = decode(str(bs), str(tmp_path / "rec.yuv"))
    assert log.count("(OK)") == 16 and "ERROR" not in log


@pytest.mark.skipif(not have_decoder(), reason="HM oracle not built")
def test_hm_oracle_ldp_tmvp_toggle(tmp_path):
    """TMVP (collocated merge/AMVP candidate, 8.5.3.2.8) must produce
    HM-decodable streams, and the slice header must carry the
    slice_temporal_mvp flag both ways."""
    w, h = 176, 144
    frames = synth_frames(w, h, 5, seed=3)
    for tmvp in (True, False):
        enc = Encoder(EncoderConfig(width=w, height=h, qp=30,
                                    gop="ldp", subpel="nn",
                                    search_range=8, tmvp=tmvp))
        stream = enc.encode_sequence(frames)
        assert enc.sps.temporal_mvp_enabled == tmvp
        bs = tmp_path / f"tmvp{tmvp}.hevc"
        bs.write_bytes(stream)
        log = decode(str(bs), str(tmp_path / f"rec{tmvp}.yuv"))
        assert log.count("(OK)") == 5 and "ERROR" not in log, log
        pics = Decoder().decode_annexb(stream)
        assert all(p.hash_ok for p in pics)

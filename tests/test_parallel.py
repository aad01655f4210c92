"""Segment-parallel encoding: concatenated independent segments must be
a decodable stream matching per-segment sequential encodes."""
import numpy as np
import pytest

from hmtpu.encoder.top import Encoder, EncoderConfig
from hmtpu.io.yuv import Frame
from hmtpu.parallel.segments import encode_parallel_segments, split_segments
from tools.gen_test_yuv import synth_clip

from .oracle import decode, have_decoder


def test_split_segments():
    assert [list(r) for r in split_segments(7, 3)] == \
        [[0, 1, 2], [3, 4], [5, 6]]
    assert [list(r) for r in split_segments(2, 5)] == [[0], [1]]


@pytest.mark.skipif(not have_decoder(), reason="HM oracle not built")
def test_parallel_segments_stream_decodes(tmp_path):
    w, h = 176, 144
    frames = [Frame(y.astype(np.int32), u.astype(np.int32),
                    v.astype(np.int32))
              for y, u, v in synth_clip(w, h, 6, seed=3)]
    cfg = EncoderConfig(width=w, height=h, qp=32, gop="ldp",
                        subpel="dctif", search_range=8)
    stream, encs = encode_parallel_segments(frames, cfg, n_segments=2)
    assert len(encs) == 2
    # identical to sequential segment-by-segment encoding
    seq = b""
    for rng_ in split_segments(6, 2):
        enc = Encoder(EncoderConfig(width=w, height=h, qp=32, gop="ldp",
                                    subpel="dctif", search_range=8))
        seq += enc.encode_sequence([frames[k] for k in rng_])
    assert stream == seq
    bs = tmp_path / "par.hevc"
    bs.write_bytes(stream)
    log = decode(str(bs), str(tmp_path / "rec.yuv"))
    assert log.count("(OK)") == 6 and "ERROR" not in log

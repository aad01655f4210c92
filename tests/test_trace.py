"""Symbol-level CABAC trace (utils/trace.py, the ENC_DEC_TRACE twin,
SURVEY §5): the encoder's and decoder's traces of the same stream must
be line-identical — the conformance-debugging property the reference's
DTRACE_CABAC machinery provides."""
import numpy as np

from hmtpu.decoder.core import Decoder
from hmtpu.encoder.top import Encoder, EncoderConfig
from hmtpu.io.yuv import Frame
from hmtpu.utils import trace
from tools.gen_test_yuv import synth_clip


def _frames(n):
    return [Frame(y.astype(np.int32), u.astype(np.int32),
                  v.astype(np.int32))
            for y, u, v in synth_clip(96, 64, n)]


def test_enc_dec_trace_identical(tmp_path):
    frames = _frames(3)
    enc = Encoder(EncoderConfig(width=96, height=64, qp=32,
                                gop="ldp", subpel="none"))
    with trace.tracing(str(tmp_path / "enc.trace")):
        bs = enc.encode_sequence(frames)
    with trace.tracing(str(tmp_path / "dec.trace")):
        pics = Decoder().decode_annexb(bs)
    assert len(pics) == 3
    e = (tmp_path / "enc.trace").read_text().splitlines()
    d = (tmp_path / "dec.trace").read_text().splitlines()
    assert len(e) > 500                 # a real trace, not a stub
    # encoder flushes a final terminate per slice that the decoder
    # stops at; compare the common prefix per-line and require the
    # decoder trace to be contained in the encoder's order
    for i, (le, ld) in enumerate(zip(e, d)):
        assert le == ld, f"trace diverges at line {i}: {le!r} != {ld!r}"
    assert abs(len(e) - len(d)) <= 8 * len(pics)


def test_trace_categories_present(tmp_path):
    frames = _frames(1)
    enc = Encoder(EncoderConfig(width=96, height=64, qp=32, gop="ai"))
    with trace.tracing(str(tmp_path / "i.trace")):
        enc.encode_sequence(frames)
    txt = (tmp_path / "i.trace").read_text()
    for cat in ("intra_mode", "cbf", "split"):
        assert cat in txt, cat

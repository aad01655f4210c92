"""End-to-end low-delay-P: encode -> in-repo decode -> hash-SEI match.

The external HM-decoder oracle runs in test_e2e_intra-style tests when
the oracle build exists; here the in-repo decoder (which shares no
entropy state with the encoder beyond the spec) verifies conformance of
the inter path.
"""
import numpy as np
import pytest

from hmtpu.decoder.core import Decoder
from hmtpu.encoder.top import Encoder, EncoderConfig
from hmtpu.entropy.cabac import CabacDecoder, CabacEncoder
from hmtpu.entropy.contexts import make_contexts
from hmtpu.entropy.inter_syntax import (
    decode_merge_idx,
    decode_mvd,
    decode_ref_idx,
    encode_merge_idx,
    encode_mvd,
    encode_ref_idx,
)
from hmtpu.io.bitstream import BitWriter
from hmtpu.io.yuv import Frame
from tools.gen_test_yuv import synth_clip

W, H = 64, 64


def _frames(n, w=W, h=H):
    return [Frame(y.astype(np.int32), u.astype(np.int32), v.astype(np.int32))
            for y, u, v in synth_clip(w, h, n)]


def _roundtrip(encode_fn, decode_fn):
    from hmtpu.entropy.recorder import PyBackend
    ctx = make_contexts(1, 30)
    be = PyBackend(ctx)
    encode_fn(be, ctx)
    data = be.finish()
    dec = CabacDecoder(data, 0)
    ctx2 = make_contexts(1, 30)
    return decode_fn(dec, ctx2)


def test_mvd_roundtrip():
    cases = [(0, 0), (1, 0), (0, -1), (2, 3), (-2, 17), (133, -1),
             (-400, 399), (1, 1), (-1, -1), (64, -64)]

    def enc_all(enc, ctx):
        for mx, my in cases:
            encode_mvd(enc, mx, my)

    def dec_all(dec, ctx):
        return [decode_mvd(dec, ctx) for _ in cases]

    assert _roundtrip(enc_all, dec_all) == cases


def test_merge_ref_idx_roundtrip():
    m_cases = [(0, 5), (4, 5), (1, 5), (0, 1), (1, 2), (2, 3)]
    r_cases = [(0, 1), (0, 2), (1, 2), (3, 4), (2, 4), (3, 5), (4, 5)]

    def enc_all(enc, ctx):
        for idx, mx in m_cases:
            encode_merge_idx(enc, idx, mx)
        for idx, nr in r_cases:
            encode_ref_idx(enc, idx, nr)

    def dec_all(dec, ctx):
        got_m = [decode_merge_idx(dec, ctx, mx) for _, mx in m_cases]
        got_r = [decode_ref_idx(dec, ctx, nr) for _, nr in r_cases]
        return got_m, got_r

    got_m, got_r = _roundtrip(enc_all, dec_all)
    assert got_m == [i for i, _ in m_cases]
    assert got_r == [i for i, _ in r_cases]


@pytest.mark.parametrize("subpel", ["none", "dctif", "nn"])
def test_ldp_encode_decode_hash(subpel):
    frames = _frames(3)
    cfg = EncoderConfig(width=W, height=H, qp=32, gop="ldp",
                        subpel=subpel, search_range=8)
    enc = Encoder(cfg)
    stream = enc.encode_sequence(frames)
    dec = Decoder()
    pics = dec.decode_annexb(stream)
    assert len(pics) == 3
    assert [p.poc for p in pics] == [0, 1, 2]
    for p in pics:
        assert p.hash_ok is True, f"hash mismatch at poc {p.poc}"
    # P frames must beat a naive bound and reference the moving content
    assert enc.results[1].psnr_y > 25


def test_ldp_multiref():
    frames = _frames(5)
    cfg = EncoderConfig(width=W, height=H, qp=35, gop="ldp", num_refs=2,
                        subpel="none", search_range=8)
    enc = Encoder(cfg)
    stream = enc.encode_sequence(frames)
    pics = Decoder().decode_annexb(stream)
    assert len(pics) == 5
    for p in pics:
        assert p.hash_ok is True, f"hash mismatch at poc {p.poc}"


def test_ldp_intra_period():
    frames = _frames(4)
    cfg = EncoderConfig(width=W, height=H, qp=32, gop="ldp",
                        intra_period=2, subpel="none", search_range=8)
    enc = Encoder(cfg)
    stream = enc.encode_sequence(frames)
    pics = Decoder().decode_annexb(stream)
    assert [r.slice_type for r in enc.results] == ["I", "P", "I", "P"]
    for p in pics:
        assert p.hash_ok is True

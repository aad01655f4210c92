"""SAO: category derivation, estimator improvement invariant, syntax
roundtrip through both entropy backends, e2e hash with the in-repo
decoder and the HM oracle."""
import numpy as np
import pytest

from hmtpu.common.constants import SliceType
from hmtpu.decoder.core import Decoder
from hmtpu.encoder.top import Encoder, EncoderConfig
from hmtpu.entropy.cabac import CabacDecoder
from hmtpu.entropy.contexts import make_contexts
from hmtpu.entropy.recorder import PyBackend
from hmtpu.entropy.sao_syntax import decode_sao_ctu, encode_sao_ctu
from hmtpu.io.yuv import Frame
from hmtpu.ops.sao import (
    CtuSaoParams,
    _edge_categories,
    apply_sao_plane,
    estimate_sao_chroma,
    estimate_sao_plane,
)
from tools.gen_test_yuv import synth_clip

from .oracle import decode, have_decoder


def test_edge_categories_horizontal():
    plane = np.array([[10, 5, 10, 10, 20, 10]], dtype=np.int32)
    cat = _edge_categories(plane, 0)
    assert cat[0, 0] == 0 and cat[0, -1] == 0   # picture boundary
    assert cat[0, 1] == 1                        # full valley
    assert cat[0, 4] == 4                        # full peak
    assert cat[0, 3] == 2                        # half valley (eq + less)


def test_estimator_never_hurts():
    rng = np.random.RandomState(2)
    org = rng.randint(0, 256, (128, 128)).astype(np.int32)
    noise = rng.randint(-6, 7, org.shape)
    rec = np.clip(org + noise, 0, 255).astype(np.int32)
    params = estimate_sao_plane(org, rec, 64, lam=10.0, bd=8)
    out = apply_sao_plane(rec, params, 64, 8)
    d_before = ((org - rec) ** 2).sum()
    d_after = ((org - out) ** 2).sum()
    assert d_after <= d_before


def test_sao_syntax_roundtrip():
    rng = np.random.RandomState(5)
    cases = []
    for _ in range(40):
        t = rng.randint(3)
        if t == 2:
            off = np.array([rng.randint(0, 8), rng.randint(0, 8),
                            -rng.randint(0, 8), -rng.randint(0, 8)],
                           dtype=np.int32)
            p = CtuSaoParams(2, int(rng.randint(4)), 0, off)
        elif t == 1:
            off = rng.randint(-7, 8, 4).astype(np.int32)
            p = CtuSaoParams(1, 0, int(rng.randint(29)), off)
        else:
            p = CtuSaoParams()
        cases.append(p)
    # chroma pairs share type/class
    triples = []
    for i in range(0, 40, 2):
        cb, cr = cases[i], cases[i + 1]
        cr.type_idx = cb.type_idx
        cr.eo_class = cb.eo_class
        if cb.type_idx == 2:
            cr.offsets = np.abs(cr.offsets) * np.array([1, 1, -1, -1])
        triples.append([cases[(i + 7) % 40], cb, cr])

    ctx = make_contexts(SliceType.I, 30)
    be = PyBackend(ctx)
    for i, p3 in enumerate(triples):
        if p3[0].type_idx == 2:
            p3[0].offsets = np.abs(p3[0].offsets) * np.array([1, 1, -1, -1])
        encode_sao_ctu(be, p3, i > 0, True, True, True)
    data = be.finish()

    dec = CabacDecoder(data, 0)
    ctx2 = make_contexts(SliceType.I, 30)
    for i, p3 in enumerate(triples):
        left = p3 if i > 0 else None   # merge flags coded 0; value unused
        got = decode_sao_ctu(dec, ctx2, left, p3, True, True)
        for a, b in zip(got, p3):
            assert a.type_idx == b.type_idx
            if a.type_idx == 0:
                continue
            assert (a.offsets == b.offsets).all()
            if a.type_idx == 1:
                assert a.band_pos == b.band_pos
            else:
                assert a.eo_class == b.eo_class


def _frames(w, h, n):
    return [Frame(y.astype(np.int32), u.astype(np.int32),
                  v.astype(np.int32))
            for y, u, v in synth_clip(w, h, n, seed=11)]


def test_sao_e2e_intree():
    frames = _frames(96, 96, 3)
    for gop in ("ai", "ldp"):
        enc = Encoder(EncoderConfig(width=96, height=96, qp=30, gop=gop,
                                    subpel="nn", sao=True))
        bs = enc.encode_sequence(frames)
        pics = Decoder().decode_annexb(bs)
        assert all(p.hash_ok for p in pics), gop


@pytest.mark.skipif(not have_decoder(), reason="HM oracle not built")
def test_sao_e2e_hm_oracle(tmp_path):
    frames = _frames(96, 96, 3)
    for gop, qp in (("ai", 22), ("ldp", 32), ("ai", 37)):
        enc = Encoder(EncoderConfig(width=96, height=96, qp=qp, gop=gop,
                                    subpel="nn", sao=True))
        p = tmp_path / f"sao_{gop}_{qp}.hevc"
        p.write_bytes(enc.encode_sequence(frames))
        log = decode(str(p), str(tmp_path / "rec.yuv"))
        assert log.count("(OK)") == len(frames), f"{gop}/qp{qp}:\n{log}"

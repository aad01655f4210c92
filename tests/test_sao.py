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


def _grid_from_packed(packed):
    from hmtpu.ops.sao import CtuSaoParams
    ny, nx = packed.shape[:2]
    return [[CtuSaoParams(int(packed[y, x, 0]), int(packed[y, x, 1]),
                          int(packed[y, x, 2]),
                          np.asarray(packed[y, x, 3:], np.int32))
             for x in range(nx)] for y in range(ny)]


def test_device_sao_apply_matches_host():
    """apply_sao_dev must equal apply_sao_plane for identical params —
    the applied offsets are normative (the decoder re-applies them)."""
    import jax.numpy as jnp

    from hmtpu.ops.sao import (
        apply_sao_dev,
        apply_sao_plane,
        estimate_sao_plane,
        sao_frame_dev,
    )

    rng = np.random.RandomState(3)
    h, w = 160, 224
    org = rng.randint(0, 256, (h, w)).astype(np.int32)
    rec = np.clip(org + rng.randint(-6, 7, (h, w)), 0, 255) \
        .astype(np.int32)
    # params chosen by the device estimator, applied both ways
    oy, ou, ov = org, org[:h // 2, :w // 2], org[:h // 2, :w // 2]
    ry, ru, rv = rec, rec[:h // 2, :w // 2], rec[:h // 2, :w // 2]
    ny, nu, nv, packed = sao_frame_dev(
        jnp.asarray(oy), jnp.asarray(ry), jnp.asarray(ou),
        jnp.asarray(ru), jnp.asarray(ov), jnp.asarray(rv),
        64, 100.0, 8)
    packed = np.asarray(packed)
    grid_y = _grid_from_packed(packed[:, :, 0])
    host_y = apply_sao_plane(ry, grid_y, 64, 8)
    np.testing.assert_array_equal(np.asarray(ny), host_y)
    # chroma grids live on the ctu/2 grid
    cgrid = _grid_from_packed(packed[:, :, 1])
    host_u = apply_sao_plane(ru, cgrid, 32, 8)
    np.testing.assert_array_equal(np.asarray(nu), host_u)
    # the estimator must actually improve distortion vs no SAO
    mse_before = np.mean((oy - ry) ** 2)
    mse_after = np.mean((oy - np.asarray(ny)) ** 2)
    assert mse_after <= mse_before
    # and its choices should be competitive with the host estimator
    host_params = estimate_sao_plane(oy, ry, 64, 100.0, 8)
    host_applied = apply_sao_plane(ry, host_params, 64, 8)
    mse_host = np.mean((oy - host_applied) ** 2)
    assert mse_after <= mse_host * 1.02

"""Transform skip (TComTrQuant.cpp:1460 TS branch; spec 7.3.8.11 /
8.6.4.2): scaling identities, device RD selection, and the encode ->
decode loop with the PPS flag on."""
import numpy as np
import pytest

from hmtpu.decoder.core import Decoder
from hmtpu.encoder.top import Encoder, EncoderConfig
from hmtpu.io.yuv import Frame
from hmtpu.ops.transform import (
    transform_skip_fwd,
    transform_skip_inv,
    ts_shift,
)


def test_ts_scale_chain():
    """fwd -> quant -> dequant -> inv reconstructs the residual to
    within the quantisation step (the same invariant the DCT chain
    satisfies), at the scale conventions of ops/quant.py."""
    import jax.numpy as jnp

    from hmtpu.ops.quant import dequantize_t, quantize_t

    assert ts_shift(4, 8) == 5
    assert ts_shift(4, 10) == 3
    rng = np.random.RandomState(0)
    resi = rng.randint(-64, 65, size=(7, 4, 4)).astype(np.int32)
    coef = transform_skip_fwd(resi, 4, 8)
    assert (np.asarray(coef) == resi << 5).all()
    for qp in (4, 12, 22):
        lev = quantize_t(jnp.asarray(coef), jnp.int32(qp), 2, 8, True)
        deq = dequantize_t(lev, jnp.int32(qp), 2, 8)
        rec = np.asarray(transform_skip_inv(np.asarray(deq), 4, 8))
        step = (2 ** ((qp - 4) / 6.0))
        assert np.abs(rec - resi).max() <= max(1.0, step), qp


def _screenish(w, h, n):
    """Sharp synthetic content (text-like blocks) where TS wins."""
    rng = np.random.RandomState(7)
    out = []
    for t in range(n):
        y = np.full((h, w), 40, np.uint8)
        for _ in range(30):
            x0, y0 = rng.randint(0, w - 8), rng.randint(0, h - 8)
            y[y0:y0 + 2, x0:x0 + rng.randint(3, 8)] = 220
        y = np.roll(y, t, axis=1)
        u = np.full((h // 2, w // 2), 110, np.uint8)
        v = np.full((h // 2, w // 2), 140, np.uint8)
        out.append(Frame(y.astype(np.int32), u.astype(np.int32),
                         v.astype(np.int32)))
    return out


def test_ts_ai_decode_and_helps_on_screen_content(tmp_path):
    frames = _screenish(96, 64, 2)
    bits = {}
    for tson in (False, True):
        enc = Encoder(EncoderConfig(width=96, height=64, qp=27,
                                    gop="ai", transform_skip=tson))
        bs = enc.encode_sequence(frames)
        pics = Decoder().decode_annexb(bs)
        assert len(pics) == 2          # decoder hash-checks internally
        bits[tson] = len(bs) * 8
        if tson:
            from tests import oracle
            if oracle.have_decoder():
                p = tmp_path / "ts.hevc"
                p.write_bytes(bs)
                out = oracle.decode(str(p), str(tmp_path / "r.yuv"))
                assert out.count("(OK)") == 2
    # TS must not lose more than the flag overhead, and on this
    # content it should actually win
    assert bits[True] <= bits[False] * 1.01


def test_ts_pps_flag_roundtrip():
    frames = _screenish(96, 64, 1)
    enc = Encoder(EncoderConfig(width=96, height=64, qp=32, gop="ai",
                                transform_skip=True))
    assert enc.pps.transform_skip_enabled
    bs = enc.encode_sequence(frames)
    d = Decoder()
    d.decode_annexb(bs)
    assert d.pps.transform_skip_enabled

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


def _screenish_chroma(w, h, n):
    """Sharp CHROMA content (the LDP TS surface is the 4x4 chroma
    TBs): coloured text-like strokes on a flat background, drifting
    so P frames carry chroma residual."""
    rng = np.random.RandomState(11)
    marks = [(rng.randint(0, w // 2 - 8), rng.randint(0, h // 2 - 4),
              rng.randint(3, 8)) for _ in range(40)]
    out = []
    for t in range(n):
        y = np.full((h, w), 90, np.uint8)
        u = np.full((h // 2, w // 2), 100, np.uint8)
        v = np.full((h // 2, w // 2), 150, np.uint8)
        for x0, y0, ln in marks:
            x = (x0 + t) % (w // 2 - 8)
            u[y0:y0 + 2, x:x + ln] = 230
            v[y0:y0 + 2, x:x + ln] = 40
            y[2 * y0:2 * y0 + 4, 2 * x:2 * x + 2 * ln] = 200
        out.append(Frame(y.astype(np.int32), u.astype(np.int32),
                         v.astype(np.int32)))
    return out


def test_ts_ldp_decode_and_flags_fire(tmp_path):
    """TS on the LDP path (TComTrQuant.cpp:1460; the anchor cfg
    encoder_lowdelay_P_main.cfg has TransformSkip 1): 4x4 chroma TBs
    of 8x8 CUs are dual-coded in the device P pass, the flag rides the
    native walk, and the stream HM-decodes."""
    from hmtpu.encoder import pframe_dev
    pframe_dev.DBG_COUNTERS["ldp_ts_tbs"] = 0
    frames = _screenish_chroma(96, 64, 4)
    enc = Encoder(EncoderConfig(width=96, height=64, qp=27, gop="ldp",
                                subpel="none", transform_skip=True))
    assert enc.pps.transform_skip_enabled
    bs = enc.encode_sequence(frames)
    assert pframe_dev.DBG_COUNTERS["ldp_ts_tbs"] > 0, \
        "no chroma TB chose transform-skip on chroma screen content"
    pics = Decoder().decode_annexb(bs)
    assert len(pics) == 4              # decoder hash-checks internally
    from tests import oracle
    if oracle.have_decoder():
        p = tmp_path / "ts_ldp.hevc"
        p.write_bytes(bs)
        out = oracle.decode(str(p), str(tmp_path / "r.yuv"))
        assert out.count("(OK)") == 4


def test_ts_pps_flag_roundtrip():
    frames = _screenish(96, 64, 1)
    enc = Encoder(EncoderConfig(width=96, height=64, qp=32, gop="ai",
                                transform_skip=True))
    assert enc.pps.transform_skip_enabled
    bs = enc.encode_sequence(frames)
    d = Decoder()
    d.decode_annexb(bs)
    assert d.pps.transform_skip_enabled

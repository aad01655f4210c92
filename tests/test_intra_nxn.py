"""Intra NxN (four 4x4 luma PUs at the minimum CU size): device trial
exactness, writer/decoder syntax round-trip, and HM-oracle
conformance (TEncCu.cpp:644-650 intra NxN, TEncSearch.cpp:2945)."""
import numpy as np
import pytest

from hmtpu.decoder.core import Decoder
from hmtpu.encoder.top import Encoder, EncoderConfig
from hmtpu.io.yuv import Frame

from .oracle import decode, have_decoder


def nxn_friendly_frame(w, h, seed=3):
    """Per-4x4 alternating directional gratings + noise: content whose
    best intra modes flip at 4x4 scale."""
    rng = np.random.RandomState(seed)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    cell = xx // 4 + yy // 4
    y = np.where(cell % 2 == 0, ((yy % 4) < 2) * 200 + 28,
                 ((xx % 4) < 2) * 200 + 28).astype(np.int32)
    y = np.clip(y + rng.randint(-20, 20, y.shape), 0, 255)
    u = np.clip(128 + rng.randint(-30, 30, (h // 2, w // 2)),
                0, 255).astype(np.int32)
    v = np.clip(128 + rng.randint(-30, 30, (h // 2, w // 2)),
                0, 255).astype(np.int32)
    return Frame(y, u, v, 8)


def device_nxn_count(frame, w, h, qp):
    import jax.numpy as jnp

    from hmtpu.common.constants import SliceType
    from hmtpu.encoder.iframe_dev import iframe_full_pass
    from hmtpu.entropy.contexts import make_contexts
    from hmtpu.entropy.fracbits import ctx_bits_table

    cb = jnp.asarray(
        ctx_bits_table(make_contexts(SliceType.I, qp)).reshape(-1))
    st = iframe_full_pass(jnp.asarray(frame.y), jnp.asarray(frame.u),
                          jnp.asarray(frame.v), jnp.int32(qp),
                          jnp.int32(qp), cb, w=w, h=h, bd=8, sdh=True)
    return int(np.asarray(st["part"]).sum())


def test_nxn_selected_and_own_decoder_roundtrip():
    # 88x56 is not 16-aligned -> the pass runs the 8x8-only level,
    # where the NxN trial competes directly
    w, h = 88, 56
    frame = nxn_friendly_frame(w, h)
    assert device_nxn_count(frame, w, h, 22) > 10
    enc = Encoder(EncoderConfig(width=w, height=h, qp=22, gop="ai"))
    stream = enc.encode_sequence([frame])
    pics = Decoder().decode_annexb(stream)
    assert pics[0].hash_ok is True


def test_nxn_improves_rd_at_levels1():
    # the trial must only ever improve the RD cost the 16/32 levels
    # see; indirectly: the encode with NxN available stays decodable
    # and beats a pure-16-grid stream on this content is covered by
    # the selection count above; here: 16-aligned geometry still green
    w, h = 96, 64
    frame = nxn_friendly_frame(w, h, seed=5)
    enc = Encoder(EncoderConfig(width=w, height=h, qp=27, gop="ai"))
    stream = enc.encode_sequence([frame])
    pics = Decoder().decode_annexb(stream)
    assert pics[0].hash_ok is True


@pytest.mark.skipif(not have_decoder(), reason="HM oracle not built")
def test_nxn_hm_oracle(tmp_path):
    w, h = 88, 56
    frame = nxn_friendly_frame(w, h)
    assert device_nxn_count(frame, w, h, 22) > 10
    enc = Encoder(EncoderConfig(width=w, height=h, qp=22, gop="ai"))
    stream = enc.encode_sequence([frame])
    bs = tmp_path / "nxn.hevc"
    bs.write_bytes(stream)
    out = decode(str(bs), str(tmp_path / "rec.yuv"))
    assert "(OK)" in out and "ERROR" not in out

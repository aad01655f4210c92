"""Deblocking filter: BS derivation, filter invariants, e2e hash with
the in-repo decoder, and (oracle) bit-exactness vs the HM decoder."""
import numpy as np
import pytest

from hmtpu.common.motion import PicMotion
from hmtpu.decoder.core import Decoder
from hmtpu.encoder.top import Encoder, EncoderConfig
from hmtpu.io.yuv import Frame
from hmtpu.ops.deblock import (
    BETA_TABLE,
    TC_TABLE,
    DeblockMeta,
    boundary_strengths,
    deblock_frame,
    meta_from_frame_state,
)
from tools.gen_test_yuv import synth_clip

from .oracle import decode, have_decoder


def _intra_meta(w, h):
    n4 = (h // 4, w // 4)
    return DeblockMeta(
        intra=np.ones(n4, dtype=bool),
        cbf=np.ones(n4, dtype=bool),
        mv_x=np.zeros((2,) + n4, np.int32),
        mv_y=np.zeros((2,) + n4, np.int32),
        ref_poc=np.full((2,) + n4, -1, np.int32))


def test_bs_intra_all_two():
    meta = _intra_meta(64, 64)
    assert (boundary_strengths(meta, True) == 2).all()
    assert (boundary_strengths(meta, False) == 2).all()


def test_bs_inter_mv_and_cbf():
    field = PicMotion.create(64, 64)
    field.set_block(0, 0, 64, 64, 1, (0, 0), 0)
    cbf8 = np.zeros((8, 8), dtype=bool)
    meta = meta_from_frame_state(field, cbf8, [0])
    assert (boundary_strengths(meta, True) == 0).all()
    # one block with a far MV -> bs 1 on its edges
    field.set_block(16, 16, 8, 8, 1, (8, 0), 0)
    meta = meta_from_frame_state(field, cbf8, [0])
    bs = boundary_strengths(meta, True)
    assert bs[4, 1] == 1 and bs[5, 1] == 1    # edge x=16, rows 16..23
    assert bs[4, 2] == 1                      # edge x=24
    # cbf alone also gives bs 1
    cbf8[0, 0] = True
    meta = meta_from_frame_state(field, cbf8, [0])
    bs = boundary_strengths(meta, True)
    assert bs[0, 0] == 1 and bs[1, 0] == 1


def test_flat_plane_unchanged():
    y = np.full((64, 64), 120, np.int32)
    u = np.full((32, 32), 90, np.int32)
    v = np.full((32, 32), 200, np.int32)
    deblock_frame(y, u, v, _intra_meta(64, 64), 37)
    assert (y == 120).all() and (u == 90).all() and (v == 200).all()


def test_step_edge_smoothed():
    y = np.zeros((64, 64), np.int32)
    y[:, 32:] = 40                     # sharp vertical step at x=32
    u = np.full((32, 32), 128, np.int32)
    v = u.copy()
    before = y.copy()
    deblock_frame(y, u, v, _intra_meta(64, 64), 37)
    # samples adjacent to the step moved toward each other
    assert (y[:, 31] > before[:, 31]).all()
    assert (y[:, 32] < before[:, 32]).all()
    # far from edges untouched
    np.testing.assert_array_equal(y[:, 0:28], before[:, 0:28])


def test_picture_boundary_not_filtered():
    y = np.zeros((64, 64), np.int32)
    y[:, :8] = 200                      # contrast at x=8 only
    u = np.full((32, 32), 128, np.int32)
    before = y.copy()
    deblock_frame(y, u, u.copy(), _intra_meta(64, 64), 37)
    # x=0 column cannot change (no edge at picture boundary)
    np.testing.assert_array_equal(y[:, 0], before[:, 0])


def _frames(n, w=64, h=64, seed=5):
    return [Frame(y.astype(np.int32), u.astype(np.int32),
                  v.astype(np.int32))
            for y, u, v in synth_clip(w, h, n, seed=seed)]


@pytest.mark.parametrize("gop", ["ai", "ldp"])
def test_e2e_deblock_own_decoder(gop):
    frames = _frames(3)
    cfg = EncoderConfig(width=64, height=64, qp=32, gop=gop,
                        deblock=True, subpel="none", search_range=8)
    enc = Encoder(cfg)
    stream = enc.encode_sequence(frames)
    pics = Decoder().decode_annexb(stream)
    for p in pics:
        assert p.hash_ok is True, p.poc


@pytest.mark.skipif(not have_decoder(), reason="HM oracle not built")
@pytest.mark.parametrize("gop,qp", [("ai", 32), ("ldp", 27), ("ldp", 37)])
def test_hm_oracle_deblock(tmp_path, gop, qp):
    w, h = 176, 144
    frames = _frames(3, w, h, seed=9)
    enc = Encoder(EncoderConfig(width=w, height=h, qp=qp, gop=gop,
                                deblock=True, subpel="dctif",
                                search_range=8))
    stream = enc.encode_sequence(frames)
    bs = tmp_path / "out.hevc"
    bs.write_bytes(stream)
    log = decode(str(bs), str(tmp_path / "rec.yuv"))
    assert log.count("(OK)") == 3 and "ERROR" not in log, log


def test_device_deblock_matches_numpy():
    """deblock_frame_dev (gather-free jnp) must be bit-exact vs the
    numpy path over random frame state (uniform 8x8 grid)."""
    import jax
    import jax.numpy as jnp

    from hmtpu.ops.deblock import (
        DeblockMeta,
        deblock_frame,
        deblock_frame_dev,
    )

    rng = np.random.RandomState(17)
    w, h = 128, 96
    for qp, bd in ((27, 8), (37, 8), (30, 10)):
        maxv = (1 << bd) - 1
        y = rng.randint(0, maxv + 1, (h, w)).astype(np.int32)
        u = rng.randint(0, maxv + 1, (h // 2, w // 2)).astype(np.int32)
        v = rng.randint(0, maxv + 1, (h // 2, w // 2)).astype(np.int32)
        h4, w4 = h // 4, w // 4
        intra8 = rng.rand(h // 8, w // 8) < 0.2
        cbf8 = rng.rand(h // 8, w // 8) < 0.5
        rep = lambda a: np.repeat(np.repeat(a, 2, 0), 2, 1)
        intra4 = rep(intra8)
        cbf4 = rep(cbf8)
        mv_x = np.zeros((2, h4, w4), np.int32)
        mv_y = np.zeros((2, h4, w4), np.int32)
        mv_x[0] = rep(rng.randint(-32, 32, (h // 8, w // 8)))
        mv_y[0] = rep(rng.randint(-32, 32, (h // 8, w // 8)))
        ref_poc = np.full((2, h4, w4), -1, np.int32)
        ref_poc[0] = np.where(intra4, -1, 9)

        meta = DeblockMeta(intra=intra4, cbf=cbf4,
                           mv_x=mv_x.copy(), mv_y=mv_y.copy(),
                           ref_poc=ref_poc.copy())
        want_y, want_u, want_v = y.copy(), u.copy(), v.copy()
        deblock_frame(want_y, want_u, want_v, meta, qp, bd,
                      cb_qp_off=1, cr_qp_off=-1)

        got = deblock_frame_dev(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
            jnp.asarray(intra4), jnp.asarray(cbf4),
            jnp.asarray(mv_x), jnp.asarray(mv_y), jnp.asarray(ref_poc),
            qp, bd, cb_qp_off=1, cr_qp_off=-1)
        got = [np.asarray(g) for g in got]
        np.testing.assert_array_equal(got[0], want_y, err_msg=f"y qp{qp}")
        np.testing.assert_array_equal(got[1], want_u, err_msg=f"u qp{qp}")
        np.testing.assert_array_equal(got[2], want_v, err_msg=f"v qp{qp}")

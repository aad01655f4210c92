"""Random-access hierarchical-B: schedule, bi-prediction math, merge
combined candidates, e2e hash via the in-repo decoder and HM oracle."""
import numpy as np
import pytest

from hmtpu.common.motion import MotionCtx, PicMotion, merge_candidates
from hmtpu.decoder.core import Decoder
from hmtpu.encoder.top import Encoder, EncoderConfig
from hmtpu.io.yuv import Frame
from hmtpu.ops.interp import (
    IF_INTERNAL_OFFS,
    bi_average,
    mc_luma_np,
    mc_luma_np_i,
)
from tools.gen_test_yuv import synth_clip

from .oracle import decode, have_decoder


def _frames(w, h, n, seed=13):
    return [Frame(y.astype(np.int32), u.astype(np.int32),
                  v.astype(np.int32))
            for y, u, v in synth_clip(w, h, n, seed=seed)]


def test_ra_schedule_covers_all_frames():
    enc = Encoder(EncoderConfig(width=96, height=96, gop="ra"))
    for n in (1, 2, 8, 9, 17, 20):
        sched = enc._ra_schedule(n)
        pocs = sorted(p for p, _ in sched)
        assert pocs == list(range(n)), n
        decoded = set()
        for poc, used in sched:
            assert all(u in decoded for u in used), (n, poc, used)
            decoded.add(poc)


def test_bi_average_identical_hypotheses():
    rng = np.random.RandomState(0)
    plane = rng.randint(0, 256, (64, 64)).astype(np.int32)
    for mvx, mvy in ((0, 0), (1, 2), (5, 7), (-3, 2)):
        uni = mc_luma_np(plane, 16, 16, 8, 8, mvx, mvy, 8)
        hyp = mc_luma_np_i(plane, 16, 16, 8, 8, mvx, mvy, 8)
        bi = bi_average(hyp, hyp, 8)
        # averaging two identical hypotheses must round like uni-pred
        # (within the +-1 rounding-order difference of the spec)
        assert np.abs(bi - uni).max() <= 1, (mvx, mvy)


def test_combined_bi_merge_candidates():
    field = PicMotion.create(64, 64)
    field.set_block(0, 8, 8, 8, 1, (4, 0), 0)        # A1 uni L0
    field.set_block(8, 0, 8, 8, 2, None, -1, (0, 4), 0)  # B1 uni L1
    mctx = MotionCtx(field, 64, 64, 6, [0], [8], cur_poc=4)
    cands = merge_candidates(mctx, 8, 8, 8, 8, 5, 1, True, 1)
    dirs = [c.inter_dir for c in cands]
    # spatial A1 (L0) + B1 (L1), then a combined bi candidate
    assert dirs[0] == 1 and dirs[1] == 2
    assert 3 in dirs
    bi = cands[dirs.index(3)]
    assert bi.mv[0] == (4, 0) and bi.mv[1] == (0, 4)


def test_ra_e2e_intree():
    frames = _frames(96, 96, 10)
    enc = Encoder(EncoderConfig(width=96, height=96, qp=30, gop="ra",
                                subpel="dctif"))
    bs = enc.encode_sequence(frames)
    pics = Decoder().decode_annexb(bs)
    assert sorted(p.poc for p in pics) == list(range(10))
    assert all(p.hash_ok for p in pics)
    assert any(r.slice_type == "B" for r in enc.results)


@pytest.mark.skipif(not have_decoder(), reason="HM oracle not built")
@pytest.mark.parametrize("qp,subpel", [(22, "nn"), (37, "dctif")])
def test_ra_e2e_hm_oracle(tmp_path, qp, subpel):
    # one (qp, subpel) arm per test id: each RA encode compiles ~5-6
    # whole-frame variants (one per GOP-position ref-list shape) and
    # two arms in one process trip the XLA:CPU multi-compile abort —
    # run_suite's PER_TEST isolation gives each arm its own process
    frames = _frames(96, 96, 10)
    enc = Encoder(EncoderConfig(width=96, height=96, qp=qp, gop="ra",
                                subpel=subpel))
    p = tmp_path / f"ra{qp}.hevc"
    p.write_bytes(enc.encode_sequence(frames))
    log = decode(str(p), str(tmp_path / "rec.yuv"))
    assert log.count("(OK)") == len(frames), f"qp{qp}:\n{log}"

"""Adaptive-QP preanalyzer (TEncPreanalyzer.cpp:64 semantics)."""
import numpy as np

from hmtpu.encoder.preanalyze import (
    activity_map,
    preanalyze,
    qp_offset_map,
)


def test_activity_matches_scalar_reference():
    rng = np.random.RandomState(3)
    y = rng.randint(0, 256, (96, 128)).astype(np.int32)
    act, avg = activity_map(y, part=32)
    # scalar re-derivation of one partition (quadrant min variance)
    px, py = 64, 32
    blk = y[py:py + 32, px:px + 32].astype(np.float64)
    vs = []
    for qy in (0, 16):
        for qx in (0, 16):
            q = blk[qy:qy + 16, qx:qx + 16]
            vs.append(q.var())
    assert abs(act[1, 2] - (1.0 + min(vs))) < 1e-6
    assert abs(avg - act.mean()) < 1e-9


def test_offsets_flat_vs_busy():
    """Flat regions get negative offsets (finer QP), busy regions
    positive, zero-mean-ish overall, clipped to the range."""
    y = np.zeros((128, 128), np.int32)
    rng = np.random.RandomState(0)
    y[:, 64:] = rng.randint(0, 256, (128, 64))
    act, avg, off = preanalyze(y, part=64)
    assert off.shape == (2, 2)
    assert (off[:, 0] < 0).all()      # flat half
    assert (off[:, 1] > 0).all()      # busy half
    assert np.abs(off).max() <= 6


def test_uniform_picture_all_zero_offsets():
    y = np.full((64, 64), 128, np.int32)
    _, _, off = preanalyze(y, part=64)
    assert (off == 0).all()


def test_activity_steers_rate_control_targets():
    """The preanalyzer is a real rate-control input: a picture twice
    as busy as the running mean draws a proportionally larger target
    (clipped to [0.5, 2]) — the picture-level form of HM's
    complexity-based bit allocation (TEncRCPic::xEstPicTargetBits)."""
    from hmtpu.encoder.ratectrl import RateControl

    def fresh():
        rc = RateControl(600.0, 50.0, 416, 240, 50)
        rc.pick(False, 0, complexity=100.0)   # seed the running mean
        rc.update(12000)
        return rc

    base, _, _ = fresh().pick(False, 1, complexity=100.0)
    busy, _, _ = fresh().pick(False, 1, complexity=220.0)
    calm, _, _ = fresh().pick(False, 1, complexity=40.0)
    assert busy > 1.5 * base
    assert calm < 0.7 * base

import numpy as np
import pytest

from hmtpu.ops import intra_ref as ir
from hmtpu.ops.intra_pred import filter_reference_batched, predict_all_modes


@pytest.mark.parametrize("n", [4, 8, 16, 32])
@pytest.mark.parametrize("is_luma", [True, False])
def test_all_modes_match_scalar(n, is_luma):
    rng = np.random.RandomState(n + is_luma)
    B = 4
    refs = rng.randint(0, 256, (B, 4 * n + 1)).astype(np.int32)
    filt = np.stack([ir.filter_reference(r, n, 8, strong_smoothing=False)
                     for r in refs])
    got = np.asarray(predict_all_modes(refs, filt, n, is_luma, 8))
    assert got.shape == (B, 35, n, n)
    for b in range(B):
        for mode in range(35):
            want = ir.predict_mode_ref(filt[b], refs[b], n, mode, is_luma, 8)
            assert np.array_equal(got[b, mode], want), (
                f"mode {mode} n {n} luma {is_luma}\n"
                f"got\n{got[b, mode]}\nwant\n{want}"
            )


def test_filter_reference_batched_plain():
    rng = np.random.RandomState(0)
    for n in (8, 16):
        refs = rng.randint(0, 256, (3, 4 * n + 1)).astype(np.int32)
        got = np.asarray(filter_reference_batched(refs, n, 8, strong=True))
        for b in range(3):
            want = ir.filter_reference(refs[b], n, 8, strong_smoothing=False)
            assert np.array_equal(got[b], want)


def test_filter_reference_strong_32():
    n = 32
    # construct a flat (bilinear-eligible) ref line
    corner = 100
    ref = np.zeros(4 * n + 1, dtype=np.int32)
    for y in range(2 * n):
        ref[2 * n - 1 - y] = corner + y // 4  # near-linear left
    ref[2 * n] = corner
    for x in range(2 * n):
        ref[2 * n + 1 + x] = corner - x // 4
    got = np.asarray(filter_reference_batched(ref[None], n, 8, strong=True))[0]
    want = ir.filter_reference(ref, n, 8, strong_smoothing=True)
    assert np.array_equal(got, want)
    # and a noisy one falls back to [1 2 1]
    rng = np.random.RandomState(1)
    noisy = rng.randint(0, 256, (1, 4 * n + 1)).astype(np.int32)
    got = np.asarray(filter_reference_batched(noisy, n, 8, strong=True))[0]
    want = ir.filter_reference(noisy[0], n, 8, strong_smoothing=True)
    assert np.array_equal(got, want)


def test_substitution():
    n = 8
    rng = np.random.RandomState(2)
    raw = rng.randint(0, 256, 4 * n + 1).astype(np.int32)
    avail = np.ones(4 * n + 1, dtype=bool)
    avail[:5] = False       # below-left run unavailable
    avail[20:25] = False
    out = ir.substitute_unavailable(raw, avail)
    assert out[0] == raw[5] and out[4] == raw[5]
    assert np.array_equal(out[5:20], raw[5:20])
    assert np.all(out[20:25] == raw[19])
    # nothing available -> mid grey
    out = ir.substitute_unavailable(raw, np.zeros_like(avail))
    assert np.all(out == 128)


def test_predict_mode_np_matches_all_modes():
    from hmtpu.ops.intra_pred import predict_all_modes_np, predict_mode_np
    rng = np.random.RandomState(3)
    for n in (4, 8, 16, 32):
        for luma in (True, False):
            ref_u = rng.randint(0, 256, 4 * n + 1).astype(np.int32)
            ref_f = rng.randint(0, 256, 4 * n + 1).astype(np.int32)
            full = predict_all_modes_np(ref_u, ref_f, n, luma, 8)
            for mode in range(35):
                one = predict_mode_np(ref_u, ref_f, n, mode, luma, 8)
                assert (one == full[mode]).all(), (n, luma, mode)


def test_predict_one_mode_matches_all_modes():
    """Per-block single-mode predictor (wavefront inner loop) must match
    the all-modes kernel at the selected mode."""
    import jax.numpy as jnp

    from hmtpu.ops.intra_pred import (
        filter_reference_batched,
        predict_all_modes,
        predict_one_mode,
    )

    rng = np.random.RandomState(5)
    for n, is_luma in ((8, True), (4, False), (16, True), (4, True)):
        B = 64
        ref_u = jnp.asarray(rng.randint(0, 256, (B, 4 * n + 1)),
                            jnp.int32)
        ref_f = filter_reference_batched(ref_u, n, 8, strong=False)
        modes = jnp.asarray(np.r_[np.arange(35),
                                  rng.randint(0, 35, B - 35)],
                            jnp.int32)
        allm = predict_all_modes(ref_u, ref_f, n, is_luma, 8)
        want = np.take_along_axis(
            np.asarray(allm), np.asarray(modes)[:, None, None, None],
            axis=1)[:, 0]
        got = np.asarray(predict_one_mode(ref_u, ref_f, modes, n,
                                          is_luma, 8))
        np.testing.assert_array_equal(got, want, err_msg=f"n={n}")

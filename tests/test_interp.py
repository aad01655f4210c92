"""DCT-IF interpolation: filter-table invariants, scalar vs batched
parity, precision-path behaviour."""
import numpy as np
import pytest

from hmtpu.ops.interp import (
    CHROMA_FILTERS,
    LUMA_FILTERS,
    mc_chroma_batch,
    mc_chroma_np,
    mc_luma_batch,
    mc_luma_np,
)


def test_filter_tables():
    # every phase sums to 64 (unity DC gain at 6-bit precision)
    assert (LUMA_FILTERS.sum(axis=1) == 64).all()
    assert (CHROMA_FILTERS.sum(axis=1) == 64).all()
    # phase symmetry: phase 3 is phase 1 reversed; half-pel is palindromic
    assert (LUMA_FILTERS[3] == LUMA_FILTERS[1][::-1]).all()
    assert (LUMA_FILTERS[2] == LUMA_FILTERS[2][::-1]).all()
    for k in range(1, 8):
        assert (CHROMA_FILTERS[k] == CHROMA_FILTERS[8 - k][::-1]).all()


def test_integer_mv_is_copy():
    rng = np.random.RandomState(0)
    plane = rng.randint(0, 256, (64, 64)).astype(np.int32)
    out = mc_luma_np(plane, 8, 8, 16, 8, 4 * 3, 4 * -2)
    np.testing.assert_array_equal(out, plane[6:14, 11:27])
    outc = mc_chroma_np(plane, 8, 8, 8, 8, 8 * 2, 8 * 1)
    np.testing.assert_array_equal(outc, plane[9:17, 10:18])


def test_flat_plane_invariant():
    plane = np.full((32, 32), 117, dtype=np.int32)
    for fx in range(4):
        for fy in range(4):
            out = mc_luma_np(plane, 8, 8, 8, 8, fx, fy)
            assert (out == 117).all(), (fx, fy)
    for fx in range(8):
        for fy in range(8):
            out = mc_chroma_np(plane, 8, 8, 4, 4, fx, fy)
            assert (out == 117).all(), (fx, fy)


def test_halfpel_of_ramp_is_midpoint():
    # a linear ramp interpolates exactly at the midpoint (away from edges)
    plane = (np.arange(64)[None, :] * np.ones((16, 1))).astype(np.int32) * 2
    out = mc_luma_np(plane, 16, 4, 8, 8, 2, 0)   # half-pel in x
    expect = plane[4:12, 16:24] + 1              # midpoint of step-2 ramp
    np.testing.assert_array_equal(out, expect)


def test_batch_refs_matches_scalar():
    """Stacked-reference batched MC: each block picks its own reference
    plane via ridx, result must match the per-plane scalar path."""
    rng = np.random.RandomState(7)
    refs = rng.randint(0, 256, (3, 48, 48)).astype(np.int32)
    B = 30
    xs = rng.randint(0, 40, B)
    ys = rng.randint(0, 40, B)
    mvx = rng.randint(-9, 9, B)
    mvy = rng.randint(-9, 9, B)
    ridx = rng.randint(0, 3, B)
    import jax.numpy as jnp
    from hmtpu.ops.interp import mc_chroma_batch_refs, mc_luma_batch_refs
    got = np.asarray(mc_luma_batch_refs(
        jnp.asarray(refs), jnp.asarray(ridx), jnp.asarray(xs),
        jnp.asarray(ys), jnp.asarray(mvx), jnp.asarray(mvy), 8, 8, 8))
    for i in range(B):
        want = mc_luma_np(refs[ridx[i]], int(xs[i]), int(ys[i]), 8, 8,
                          int(mvx[i]), int(mvy[i]), 8)
        np.testing.assert_array_equal(got[i], want, err_msg=str(i))
    gotc = np.asarray(mc_chroma_batch_refs(
        jnp.asarray(refs), jnp.asarray(ridx), jnp.asarray(xs),
        jnp.asarray(ys), jnp.asarray(mvx), jnp.asarray(mvy), 4, 4, 8))
    for i in range(B):
        want = mc_chroma_np(refs[ridx[i]], int(xs[i]), int(ys[i]), 4, 4,
                            int(mvx[i]), int(mvy[i]), 8)
        np.testing.assert_array_equal(gotc[i], want, err_msg=str(i))


@pytest.mark.parametrize("bd", [8, 10])
def test_batch_matches_scalar_luma(bd):
    rng = np.random.RandomState(1)
    plane = rng.randint(0, 1 << bd, (48, 48)).astype(np.int32)
    B = 40
    xs = rng.randint(-2, 40, B)
    ys = rng.randint(-2, 40, B)
    mvx = rng.randint(-17, 17, B)
    mvy = rng.randint(-17, 17, B)
    import jax.numpy as jnp
    got = np.asarray(mc_luma_batch(
        jnp.asarray(plane), jnp.asarray(xs), jnp.asarray(ys),
        jnp.asarray(mvx), jnp.asarray(mvy), 8, 8, bd))
    for i in range(B):
        want = mc_luma_np(plane, int(xs[i]), int(ys[i]), 8, 8,
                          int(mvx[i]), int(mvy[i]), bd)
        np.testing.assert_array_equal(got[i], want, err_msg=str(i))


def test_batch_matches_scalar_chroma():
    rng = np.random.RandomState(2)
    plane = rng.randint(0, 256, (24, 24)).astype(np.int32)
    B = 40
    xs = rng.randint(0, 16, B)
    ys = rng.randint(0, 16, B)
    mvx = rng.randint(-33, 33, B)
    mvy = rng.randint(-33, 33, B)
    import jax.numpy as jnp
    got = np.asarray(mc_chroma_batch(
        jnp.asarray(plane), jnp.asarray(xs), jnp.asarray(ys),
        jnp.asarray(mvx), jnp.asarray(mvy), 4, 4, 8))
    for i in range(B):
        want = mc_chroma_np(plane, int(xs[i]), int(ys[i]), 4, 4,
                            int(mvx[i]), int(mvy[i]), 8)
        np.testing.assert_array_equal(got[i], want, err_msg=str(i))


def test_batch_intermediate_matches_scalar_and_bi():
    """Intermediate-precision batched MC (the bi-prediction hypothesis
    path) must match mc_luma_np_i / mc_chroma_np_i exactly, and the
    device bi average must match the host bi_average."""
    from hmtpu.ops.interp import (
        bi_average,
        bi_average_t,
        mc_chroma_batch_refs_i,
        mc_chroma_np_i,
        mc_luma_batch_refs_i,
        mc_luma_np_i,
    )

    import jax.numpy as jnp

    for bd in (8, 10):
        rng = np.random.RandomState(33 + bd)
        maxv = (1 << bd) - 1
        planes = rng.randint(0, maxv + 1, (2, 48, 48)).astype(np.int32)
        B = 64
        xs = rng.randint(-2, 40, B)
        ys = rng.randint(-2, 40, B)
        mvx = rng.randint(-17, 17, B)
        mvy = rng.randint(-17, 17, B)
        ridx = rng.randint(0, 2, B)
        got0 = np.asarray(mc_luma_batch_refs_i(
            jnp.asarray(planes), jnp.asarray(ridx), jnp.asarray(xs),
            jnp.asarray(ys), jnp.asarray(mvx), jnp.asarray(mvy),
            8, 8, bd))
        for i in range(B):
            want = mc_luma_np_i(planes[ridx[i]], int(xs[i]),
                                int(ys[i]), 8, 8, int(mvx[i]),
                                int(mvy[i]), bd)
            np.testing.assert_array_equal(got0[i], want,
                                          err_msg=f"bd{bd} i{i}")
        gotc = np.asarray(mc_chroma_batch_refs_i(
            jnp.asarray(planes), jnp.asarray(ridx), jnp.asarray(xs),
            jnp.asarray(ys), jnp.asarray(mvx), jnp.asarray(mvy),
            4, 4, bd))
        for i in range(B):
            want = mc_chroma_np_i(planes[ridx[i]], int(xs[i]),
                                  int(ys[i]), 4, 4, int(mvx[i]),
                                  int(mvy[i]), bd)
            np.testing.assert_array_equal(gotc[i], want,
                                          err_msg=f"c bd{bd} i{i}")
        h1 = np.asarray(mc_luma_batch_refs_i(
            jnp.asarray(planes), jnp.asarray(1 - ridx),
            jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(-mvx),
            jnp.asarray(mvy), 8, 8, bd))
        got_bi = np.asarray(bi_average_t(jnp.asarray(got0),
                                         jnp.asarray(h1), bd))
        want_bi = bi_average(got0, h1, bd)
        np.testing.assert_array_equal(got_bi, want_bi)

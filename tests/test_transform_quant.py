import numpy as np
import pytest

from hmtpu.ops import quant as q
from hmtpu.ops import transform as tf


@pytest.mark.parametrize("size", [4, 8, 16, 32])
@pytest.mark.parametrize("bit_depth", [8, 10])
def test_forward_matches_scalar(size, bit_depth):
    rng = np.random.RandomState(size + bit_depth)
    lim = (1 << bit_depth) - 1
    res = rng.randint(-lim, lim + 1, (5, size, size)).astype(np.int32)
    got = np.asarray(tf.forward_transform(res, size, bit_depth))
    for b in range(res.shape[0]):
        want = tf.forward_transform_ref(res[b], bit_depth)
        assert np.array_equal(got[b], want), f"batch {b}"


def test_dst4_matches_scalar():
    rng = np.random.RandomState(7)
    res = rng.randint(-255, 256, (8, 4, 4)).astype(np.int32)
    got = np.asarray(tf.forward_transform(res, 4, 8, use_dst=True))
    for b in range(8):
        want = tf.forward_transform_ref(res[b], 8, use_dst=True)
        assert np.array_equal(got[b], want)


@pytest.mark.parametrize("size", [4, 8, 16, 32])
def test_inverse_matches_scalar(size):
    rng = np.random.RandomState(size)
    coeff = rng.randint(-30000, 30001, (4, size, size)).astype(np.int32)
    got = np.asarray(tf.inverse_transform(coeff, size, 8))
    for b in range(4):
        want = tf.inverse_transform_ref(coeff[b], 8)
        assert np.array_equal(got[b], want)


@pytest.mark.parametrize("size", [4, 8, 16, 32])
@pytest.mark.parametrize("use_dst", [False, True])
def test_roundtrip_near_identity(size, use_dst):
    if use_dst and size != 4:
        pytest.skip("DST only 4x4")
    rng = np.random.RandomState(1)
    res = rng.randint(-200, 201, (3, size, size)).astype(np.int32)
    coeff = tf.forward_transform(res, size, 8, use_dst=use_dst)
    rec = np.asarray(tf.inverse_transform(coeff, size, 8, use_dst=use_dst))
    err = np.abs(rec - res)
    assert err.max() <= (4 if size == 32 else 2), err.max()


@pytest.mark.parametrize("qp", [0, 17, 22, 37, 51])
@pytest.mark.parametrize("log2", [2, 5])
def test_quant_matches_scalar(qp, log2):
    size = 1 << log2
    rng = np.random.RandomState(qp + log2)
    coeff = rng.randint(-32768, 32768, (3, size, size)).astype(np.int32)
    for intra in (True, False):
        got = np.asarray(q.quantize(coeff, qp, log2, 8, intra))
        want = q.quantize_ref(coeff, qp, log2, 8, intra)
        assert np.array_equal(got, want)
    lv = np.asarray(q.quantize(coeff, qp, log2, 8, True))
    got = np.asarray(q.dequantize(lv, qp, log2, 8))
    want = q.dequantize_ref(lv, qp, log2, 8)
    assert np.array_equal(got, want)


def test_quant_dequant_error_bounded():
    # quant->dequant should approximate the original coefficient with
    # error bounded by the step size
    rng = np.random.RandomState(3)
    coeff = rng.randint(-5000, 5000, (4, 8, 8)).astype(np.int32)
    qp = 27
    lv = q.quantize(coeff, qp, 3, 8, True)
    rec = np.asarray(q.dequantize(np.asarray(lv), qp, 3, 8))
    # effective step in the (transform-scaled) coeff domain:
    # 2^qbits / quantScale[qp%6]
    qbits = q.QUANT_SHIFT + qp // 6 + q.transform_shift(3, 8)
    step = (1 << qbits) / 18396.0
    assert np.abs(rec - coeff).max() < step * 1.1

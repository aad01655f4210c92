import numpy as np
import pytest

from hmtpu.entropy.cabac import (
    CabacDecoder,
    CabacEncoder,
    NEXT_STATE_LPS,
    NEXT_STATE_MPS,
    init_state,
)
from hmtpu.io.bitstream import BitWriter


def test_state_transitions():
    # spec: from state 0, an LPS flips MPS; MPS path saturates at 62
    assert NEXT_STATE_LPS[0] == 1  # sigma 0 mps 0 -> sigma 0 mps 1
    assert NEXT_STATE_LPS[1] == 0
    assert NEXT_STATE_MPS[124] == 124  # sigma 62 stays
    assert NEXT_STATE_MPS[126] == 126  # sigma 63 stays


def test_init_state():
    # CNU (154) at qp 26 must give state 0 with mps... derive: slope
    # idx 9 -> m = 0, offset idx 10 -> n = 64; preCtxState = 64 ->
    # pState 0, mps 1
    assert init_state(154, 26) == 1
    # monotone in qp for a nonzero slope value
    states = [init_state(107, qp) for qp in range(0, 52)]
    assert all(0 <= s < 128 for s in states)


def _roundtrip(ops, seed=0):
    """ops: list of (kind, ...) run through encoder then decoder."""
    bw = BitWriter()
    enc = CabacEncoder(bw)
    n_ctx = 8
    enc_ctx = np.array([init_state(v, 27) for v in
                        (154, 107, 139, 183, 110, 122, 79, 149)],
                       dtype=np.uint8)
    dec_ctx = enc_ctx.copy()
    for op in ops:
        if op[0] == "bin":
            enc.encode_bin(enc_ctx, op[1] % n_ctx, op[2])
        elif op[0] == "ep":
            enc.encode_bin_ep(op[1])
        elif op[0] == "eps":
            enc.encode_bins_ep(op[1], op[2])
        elif op[0] == "trm":
            enc.encode_bin_trm(op[1])
    enc.encode_bin_trm(1)
    enc.finish()
    bw.write(1, 1)
    bw.align_zero()
    data = bw.get_bytes()

    dec = CabacDecoder(data)
    for op in ops:
        if op[0] == "bin":
            got = dec.decode_bin(dec_ctx, op[1] % n_ctx)
            assert got == op[2], op
        elif op[0] == "ep":
            assert dec.decode_bin_ep() == op[1], op
        elif op[0] == "eps":
            assert dec.decode_bins_ep(op[2]) == op[1], op
        elif op[0] == "trm":
            assert dec.decode_bin_trm() == op[1], op
    assert dec.decode_bin_trm() == 1
    assert np.array_equal(enc_ctx, dec_ctx)


def test_roundtrip_simple():
    _roundtrip([("bin", 0, 1), ("bin", 0, 0), ("ep", 1), ("ep", 0),
                ("eps", 0b1011, 4), ("trm", 0)])


@pytest.mark.parametrize("seed", range(6))
def test_roundtrip_random(seed):
    rng = np.random.RandomState(seed)
    ops = []
    for _ in range(3000):
        k = rng.randint(0, 4)
        if k == 0:
            ops.append(("bin", int(rng.randint(0, 8)), int(rng.randint(0, 2))))
        elif k == 1:
            ops.append(("ep", int(rng.randint(0, 2))))
        elif k == 2:
            nb = int(rng.randint(1, 17))
            ops.append(("eps", int(rng.randint(0, 1 << nb)), nb))
        else:
            ops.append(("trm", 0))
    _roundtrip(ops, seed)


def test_roundtrip_skewed():
    # heavily skewed bins drive the state machine to saturation and
    # exercise carry/renorm paths
    rng = np.random.RandomState(42)
    ops = [("bin", 1, int(rng.rand() < 0.02)) for _ in range(5000)]
    ops += [("bin", 2, 1) for _ in range(2000)]
    _roundtrip(ops)

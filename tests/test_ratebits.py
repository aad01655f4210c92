"""ops/ratebits.py vs the serialisation walk of entropy/residual.py.

The device TB rate estimator must reproduce the exact bin identities
of residual_coding() — validated by driving encode_residual through a
fake backend that prices each bin from the same fixed per-context
table, then requiring float equality with tb_bits.
"""
import numpy as np
import pytest

from hmtpu.entropy.contexts import NUM_CTX, make_contexts
from hmtpu.entropy.fracbits import ctx_bits_table
from hmtpu.entropy.residual import encode_residual
from hmtpu.common.constants import SliceType


class PriceEnc:
    """Backend accumulating fractional bits from a fixed table."""

    def __init__(self, cb):
        self.cb = cb
        self.bits = 0.0

    def encode_bin(self, ctx, idx, v):
        self.bits += float(self.cb[idx, v])

    def encode_bin_ep(self, v):
        self.bits += 1.0

    def encode_bins_ep(self, v, n):
        self.bits += float(n)


def _ref_bits(cb, lev, log2, is_luma, scan_idx, sdh):
    if not lev.any():
        return 0.0
    enc = PriceEnc(cb)
    encode_residual(enc, np.zeros(NUM_CTX, np.uint8), lev, log2,
                    is_luma, scan_idx, sdh)
    return enc.bits


def _rand_tb(rng, log2, density, mag):
    n = 1 << log2
    lev = np.zeros((n, n), np.int32)
    mask = rng.rand(n, n) < density
    lev[mask] = rng.randint(1, mag + 1, mask.sum()) * \
        rng.choice([-1, 1], mask.sum())
    return lev


def _sdh_ok(lev, log2, scan_idx):
    """Check the sign-hiding parity invariant holds for every CG."""
    from hmtpu.common.scan import scan_order
    flat = lev.reshape(-1)[scan_order(log2, scan_idx).reshape(-1)]
    for ci in range(flat.size // 16):
        cg = flat[ci * 16:(ci + 1) * 16]
        nz = np.nonzero(cg)[0]
        if nz.size and nz.max() - nz.min() > 3:
            if (np.abs(cg).sum() & 1) != (cg[nz.min()] < 0):
                return False
    return True


@pytest.mark.parametrize("log2,is_luma", [(2, True), (2, False),
                                          (3, True), (3, False),
                                          (4, True), (4, False),
                                          (5, True)])
def test_tb_bits_matches_walk(log2, is_luma):
    from hmtpu.ops.ratebits import tb_bits
    import jax.numpy as jnp

    rng = np.random.RandomState(log2 * 10 + is_luma)
    ctx = make_contexts(SliceType.P, 32)
    # mix in adapted-looking states
    ctx = ((ctx.astype(np.int32) * 7 + 13) % 128).astype(np.uint8)
    cb = ctx_bits_table(ctx)
    cbflat = jnp.asarray(cb.reshape(-1))

    tbs, refs = [], []
    for density in (0.02, 0.1, 0.4, 0.9):
        for mag in (1, 3, 40):
            for _ in range(4):
                lev = _rand_tb(rng, log2, density, mag)
                tbs.append(lev)
                refs.append(_ref_bits(cb, lev, log2, is_luma, 0, False))
    tbs.append(np.zeros((1 << log2, 1 << log2), np.int32))
    refs.append(0.0)
    batch = jnp.asarray(np.stack(tbs))
    got = np.asarray(tb_bits(batch, cbflat, log2, is_luma, 0, False))
    np.testing.assert_allclose(got, np.asarray(refs), rtol=1e-4,
                               atol=1e-3)


@pytest.mark.parametrize("scan_idx", [1, 2])
def test_tb_bits_hor_ver_scans(scan_idx):
    from hmtpu.ops.ratebits import tb_bits
    import jax.numpy as jnp

    rng = np.random.RandomState(scan_idx)
    ctx = make_contexts(SliceType.I, 27)
    cb = ctx_bits_table(ctx)
    cbflat = jnp.asarray(cb.reshape(-1))
    for log2, is_luma in ((2, True), (2, False), (3, True)):
        tbs, refs = [], []
        for _ in range(12):
            lev = _rand_tb(rng, log2, 0.3, 5)
            tbs.append(lev)
            refs.append(_ref_bits(cb, lev, log2, is_luma, scan_idx,
                                  False))
        got = np.asarray(tb_bits(jnp.asarray(np.stack(tbs)), cbflat,
                                 log2, is_luma, scan_idx, False))
        np.testing.assert_allclose(got, np.asarray(refs), rtol=1e-4,
                                   atol=1e-3)


def test_tb_bits_sdh():
    from hmtpu.ops.ratebits import tb_bits
    import jax.numpy as jnp

    rng = np.random.RandomState(99)
    ctx = make_contexts(SliceType.P, 22)
    cb = ctx_bits_table(ctx)
    cbflat = jnp.asarray(cb.reshape(-1))
    tbs, refs = [], []
    tries = 0
    while len(tbs) < 24 and tries < 4000:
        tries += 1
        lev = _rand_tb(rng, 3, rng.choice([0.1, 0.5]), 4)
        if not _sdh_ok(lev, 3, 0):
            continue
        tbs.append(lev)
        refs.append(_ref_bits(cb, lev, 3, True, 0, True))
    assert len(tbs) >= 10
    got = np.asarray(tb_bits(jnp.asarray(np.stack(tbs)), cbflat,
                             3, True, 0, True))
    np.testing.assert_allclose(got, np.asarray(refs), rtol=1e-4,
                               atol=1e-3)


def test_mode_syntax_bits():
    """MVD / merge-idx / ref-idx pricing vs the bin walks."""
    import jax.numpy as jnp

    from hmtpu.ops import ratebits as rb
    from hmtpu.entropy.contexts import OFF

    ctx = make_contexts(SliceType.P, 32)
    cb = ctx_bits_table(ctx)
    cbflat = jnp.asarray(cb.reshape(-1))

    def ref_mvd_one(v):
        bits = cb[OFF["MVD"], int(abs(v) > 0)]
        if abs(v) > 0:
            bits += cb[OFF["MVD"] + 1, int(abs(v) > 1)]
            if abs(v) > 1:
                u = abs(v) - 2
                # EG1 walk
                length = 1
                tmp = u
                while tmp >= (1 << length):
                    tmp -= 1 << length
                    length += 1
                bits += 2 * length
            bits += 1.0
        return bits

    vals = np.array([-37, -3, -2, -1, 0, 1, 2, 3, 9, 130], np.int32)
    got = np.asarray(rb.mvd_bits(cbflat, jnp.asarray(vals),
                                 jnp.zeros_like(vals)))
    want = [ref_mvd_one(int(v)) + cb[OFF["MVD"], 0] for v in vals]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    for mm in (2, 5):
        mi = jnp.arange(mm)
        got = np.asarray(rb.merge_idx_bits(cbflat, mi, mm))
        for i in range(mm):
            w = cb[OFF["MERGE_IDX"], int(i > 0)]
            if i > 0:
                w += (i - 1) + (1 if i < mm - 1 else 0)
            np.testing.assert_allclose(got[i], w, rtol=1e-5)

    for nr in (2, 4):
        r = jnp.arange(nr)
        got = np.asarray(rb.ref_idx_bits(cbflat, r, nr))
        for i in range(nr):
            w = cb[OFF["REF_PIC"], int(i > 0)]
            if i > 0 and nr > 2:
                w += cb[OFF["REF_PIC"] + 1, int(i > 1)]
                w += max(0, min(i, nr - 1) - 2) + \
                    (1 if 2 <= i < nr - 1 else 0)
            np.testing.assert_allclose(got[i], w, rtol=1e-5)

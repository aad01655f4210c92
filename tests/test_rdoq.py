"""ops/rdoq.py: RD improvement, decodability, SDH parity."""
import numpy as np
import pytest

from hmtpu.common.constants import SliceType
from hmtpu.entropy.contexts import make_contexts
from hmtpu.entropy.fracbits import ctx_bits_table


def _setup(qp=32):
    import jax.numpy as jnp

    cb = ctx_bits_table(make_contexts(SliceType.P, qp))
    return jnp.asarray(cb.reshape(-1))


def _rand_coefs(rng, log2, n, mag):
    """Plausible transform coefficients: low-frequency heavy."""
    size = 1 << log2
    yy, xx = np.mgrid[0:size, 0:size]
    decay = 1.0 / (1.0 + 0.6 * (xx + yy))
    c = rng.randn(n, size, size) * mag * decay
    return np.round(c).astype(np.int32)


@pytest.mark.parametrize("log2,is_luma", [(2, False), (3, True),
                                          (4, True), (5, True)])
def test_rdoq_improves_rd_cost(log2, is_luma):
    import jax.numpy as jnp

    from hmtpu.ops.quant import dequantize_np, quantize_np
    from hmtpu.ops.ratebits import tb_bits
    from hmtpu.ops.rdoq import rdoq_tb

    qp, bd = 32, 8
    lam = np.float32(0.57 * 2.0 ** ((qp - 12) / 3.0))
    cbflat = _setup(qp)
    rng = np.random.RandomState(log2)
    coefs = _rand_coefs(rng, log2, 48, 220.0)

    lev_plain = quantize_np(coefs, qp, log2, bd, is_intra=False)
    lev_rdoq = np.asarray(rdoq_tb(jnp.asarray(coefs), jnp.int32(qp),
                                  log2, bd, jnp.float32(lam), cbflat,
                                  is_luma))

    cscale = 2.0 ** (-2 * (15 - bd - log2))

    def rd(lev):
        deq = dequantize_np(lev, qp, log2, bd)
        d = ((coefs - deq).astype(np.float64) ** 2).sum((1, 2)) * cscale
        bits = np.asarray(tb_bits(jnp.asarray(lev), cbflat, log2,
                                  is_luma))
        cbf = (lev.reshape(len(lev), -1) != 0).any(1)
        return d + lam * (bits + cbf)     # + cbf flag proxy

    c_plain = rd(lev_plain)
    c_rdoq = rd(np.asarray(lev_rdoq))
    # aggregate RD must improve, and no catastrophic per-block loss
    # (per-block slack: rdoq prices contexts approximately, so single
    # blocks can regress while the population wins)
    assert c_rdoq.sum() < c_plain.sum() * 0.999
    assert (c_rdoq <= c_plain * 1.30 + 2.0).all()


def test_rdoq_levels_decodable():
    import jax.numpy as jnp

    from hmtpu.entropy.contexts import NUM_CTX
    from hmtpu.entropy.residual import encode_residual
    from hmtpu.ops.rdoq import rdoq_tb

    class NullEnc:
        def encode_bin(self, ctx, idx, v):
            assert 0 <= idx < NUM_CTX

        def encode_bin_ep(self, v):
            pass

        def encode_bins_ep(self, v, n):
            assert n >= 0

    qp = 27
    cbflat = _setup(qp)
    rng = np.random.RandomState(9)
    coefs = _rand_coefs(rng, 3, 32, 400.0)
    lev = np.asarray(rdoq_tb(jnp.asarray(coefs), jnp.int32(qp), 3, 8,
                             jnp.float32(30.0), cbflat, True))
    ctx = np.zeros(NUM_CTX, np.uint8)
    for tb in lev:
        if tb.any():
            encode_residual(NullEnc(), ctx, tb, 3, True, 0, False)


def test_rdoq_sdh_parity():
    import jax.numpy as jnp

    from hmtpu.common.scan import scan_order
    from hmtpu.ops.rdoq import rdoq_tb

    qp = 32
    cbflat = _setup(qp)
    rng = np.random.RandomState(5)
    coefs = _rand_coefs(rng, 3, 64, 300.0)
    lev = np.asarray(rdoq_tb(jnp.asarray(coefs), jnp.int32(qp), 3, 8,
                             jnp.float32(57.0), cbflat, True,
                             sdh=True))
    scans = scan_order(3, 0).reshape(-1)
    for tb in lev:
        flat = tb.reshape(-1)[scans]
        for ci in range(4):
            cg = flat[ci * 16:(ci + 1) * 16]
            nz = np.nonzero(cg)[0]
            if nz.size and nz.max() - nz.min() > 3:
                assert (np.abs(cg).sum() & 1) == (cg[nz.min()] < 0)

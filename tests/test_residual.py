import numpy as np
import pytest

from hmtpu.common.scan import SCAN_DIAG, SCAN_HOR, SCAN_VER, scan_order
from hmtpu.entropy.cabac import CabacDecoder, CabacEncoder
from hmtpu.entropy.contexts import make_contexts
from hmtpu.entropy.residual import decode_residual, encode_residual
from hmtpu.common.constants import SliceType
from hmtpu.io.bitstream import BitWriter


def _roundtrip_blocks(blocks, log2s, lumas, scans, sign_hiding=False):
    bw = BitWriter()
    enc = CabacEncoder(bw)
    ctx_e = make_contexts(SliceType.I, 27)
    ctx_d = ctx_e.copy()
    for blk, log2, luma, scan in zip(blocks, log2s, lumas, scans):
        encode_residual(enc, ctx_e, blk, log2, luma, scan, sign_hiding)
    enc.encode_bin_trm(1)
    enc.finish()
    bw.write(1, 1)
    bw.align_zero()
    dec = CabacDecoder(bw.get_bytes())
    for blk, log2, luma, scan in zip(blocks, log2s, lumas, scans):
        got = decode_residual(dec, ctx_d, log2, luma, scan, sign_hiding)
        assert np.array_equal(got, blk), f"log2={log2} luma={luma} scan={scan}"
    assert np.array_equal(ctx_e, ctx_d)


def _sparse_block(rng, size, density, mag):
    blk = np.zeros((size, size), dtype=np.int32)
    mask = rng.rand(size, size) < density
    vals = rng.randint(1, mag + 1, (size, size)) * \
        rng.choice([-1, 1], (size, size))
    blk[mask] = vals[mask]
    if not blk.any():
        blk[rng.randint(size), rng.randint(size)] = 1
    return blk


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
@pytest.mark.parametrize("luma", [True, False])
def test_roundtrip_sizes(log2, luma):
    rng = np.random.RandomState(log2 * 2 + luma)
    size = 1 << log2
    blocks, scans = [], []
    for density in (0.02, 0.1, 0.5, 1.0):
        for mag in (1, 3, 40, 30000):
            blocks.append(_sparse_block(rng, size, density, mag))
            scans.append(SCAN_DIAG)
    _roundtrip_blocks(blocks, [log2] * len(blocks), [luma] * len(blocks),
                      scans)


@pytest.mark.parametrize("scan", [SCAN_HOR, SCAN_VER])
def test_roundtrip_mode_scans(scan):
    rng = np.random.RandomState(scan)
    blocks = [_sparse_block(rng, 4, 0.3, 5) for _ in range(8)]
    blocks += [_sparse_block(rng, 8, 0.3, 5) for _ in range(8)]
    log2s = [2] * 8 + [3] * 8
    _roundtrip_blocks(blocks, log2s, [True] * 16, [scan] * 16)


def test_single_dc_coeff():
    blk = np.zeros((8, 8), dtype=np.int32)
    blk[0, 0] = -7
    _roundtrip_blocks([blk], [3], [True], [SCAN_DIAG])


def test_single_last_coeff():
    blk = np.zeros((16, 16), dtype=np.int32)
    blk[15, 15] = 2
    _roundtrip_blocks([blk], [4], [True], [SCAN_DIAG])


def test_sign_hiding_roundtrip():
    rng = np.random.RandomState(9)
    blocks = []
    for _ in range(20):
        blk = _sparse_block(rng, 8, 0.6, 6)
        # fix parity per CG so hidden sign is consistent
        scans = scan_order(3, SCAN_DIAG)
        flat = blk.reshape(-1)
        for ci in range(scans.shape[0]):
            idx = [i for i in scans[ci] if flat[i] != 0]
            if not idx:
                continue
            pos = [int(np.where(scans[ci] == i)[0][0]) for i in idx]
            if max(pos) - min(pos) > 3:
                first = scans[ci][min(pos)]
                total = int(np.abs(flat[scans[ci]]).sum())
                want_sign = 1 if flat[first] < 0 else 0
                if (total & 1) != want_sign:
                    # bump the first coeff's magnitude by 1
                    flat[first] += 1 if flat[first] > 0 else -1
        blocks.append(blk)
    _roundtrip_blocks(blocks, [3] * len(blocks), [True] * len(blocks),
                      [SCAN_DIAG] * len(blocks), sign_hiding=True)

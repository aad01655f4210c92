import numpy as np

from hmtpu.common import spec_tables as st
from hmtpu.common.scan import (
    SCAN_DIAG,
    SCAN_HOR,
    SCAN_VER,
    cg_scan_order,
    scan_order,
)


def test_dct_known_rows():
    assert st.DCT4.tolist() == [
        [64, 64, 64, 64],
        [83, 36, -36, -83],
        [64, -64, -64, 64],
        [36, -83, 83, -36],
    ]
    assert st.DCT8[1].tolist() == [89, 75, 50, 18, -18, -50, -75, -89]
    assert st.DCT32[1][:4].tolist() == [90, 90, 88, 85]
    assert st.DCT32[31][:4].tolist() == [4, -13, 22, -31]


def test_dct_near_orthogonal():
    # rows of the integer DCT are near-orthogonal with norm ~64*sqrt(N)
    for n in (4, 8, 16, 32):
        m = st.DCT[n].astype(np.int64)
        g = m @ m.T
        diag = np.diag(g).astype(float)
        off = g - np.diag(np.diag(g))
        assert np.all(np.abs(diag - diag.mean()) / diag.mean() < 0.01)
        assert np.max(np.abs(off)) / diag.mean() < 0.02


def test_dct_strided_subsampling():
    assert np.array_equal(st.DCT16, st.DCT32[::2, :16])
    assert np.array_equal(st.DCT8, st.DCT32[::4, :8])
    assert np.array_equal(st.DCT4, st.DCT32[::8, :4])


def test_dst4():
    assert st.DST4[1].tolist() == [74, 74, 0, -74]
    g = st.DST4.astype(np.int64) @ st.DST4.T.astype(np.int64)
    assert abs(np.diag(g).mean() - 64 * 64 * 4) / (64 * 64 * 4) < 0.05


def test_quant_scales():
    # f[k]*g[k] ~ 2^20 (spec invariant)
    prod = st.QUANT_SCALES * st.INV_QUANT_SCALES
    assert np.all(np.abs(prod - (1 << 20)) < (1 << 15))


def test_chroma_qp():
    assert st.chroma_qp_from_luma(20) == 20
    assert st.chroma_qp_from_luma(30) == 29
    assert st.chroma_qp_from_luma(43) == 37
    assert st.chroma_qp_from_luma(44) == 38
    assert st.chroma_qp_from_luma(51) == 45


def test_cabac_tables():
    assert st.RANGE_TAB_LPS.shape == (64, 4)
    assert st.RANGE_TAB_LPS[0].tolist() == [128, 176, 208, 240]
    assert st.RANGE_TAB_LPS[63].tolist() == [2, 2, 2, 2]
    assert st.TRANS_IDX_LPS[0] == 0
    assert st.TRANS_IDX_MPS[62] == 62 and st.TRANS_IDX_MPS[63] == 63
    assert st.RENORM_TABLE.tolist() == [
        6, 5, 4, 4, 3, 3, 3, 3, 2, 2, 2, 2, 2, 2, 2, 2,
        1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    ]


def test_ctx_init_shapes():
    for name, rows in st.CTX_INIT.items():
        assert len(rows) == 3
        assert len(rows[0]) == len(rows[1]) == len(rows[2])
    assert st.CTX_INIT["SPLIT_FLAG"][2] == (139, 141, 157)
    assert len(st.CTX_INIT["LAST"][0]) == 30
    assert len(st.CTX_INIT["SIG_FLAG"][0]) == 44


def test_scan_orders():
    s = scan_order(2, SCAN_DIAG)  # 4x4
    assert s.shape == (1, 16)
    # spec up-right diagonal for 4x4
    assert s[0].tolist() == [0, 4, 1, 8, 5, 2, 12, 9, 6, 3, 13, 10, 7, 14, 11, 15]
    sh = scan_order(2, SCAN_HOR)
    assert sh[0].tolist() == list(range(16))
    sv = scan_order(2, SCAN_VER)
    assert sv[0][:4].tolist() == [0, 4, 8, 12]
    # 8x8: 4 CGs, all 64 positions covered exactly once
    s8 = scan_order(3, SCAN_DIAG)
    assert s8.shape == (4, 16)
    assert sorted(s8.ravel().tolist()) == list(range(64))
    assert cg_scan_order(3, SCAN_DIAG).tolist() == [0, 2, 1, 3]
    # 32x32
    s32 = scan_order(5, SCAN_DIAG)
    assert s32.shape == (64, 16)
    assert sorted(s32.ravel().tolist()) == list(range(1024))

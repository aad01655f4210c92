"""Per-syntax bit accounting (the TPU build's answer to HM's
TComCodingStatistics, SURVEY §2.2 Debug/trace row): a counter backend
with the same surface as entropy/recorder.PyBackend that prices every
bin with the adaptive fractional-bit counter
(TEncBinCoderCABACCounter semantics) and attributes it to a syntax
category derived from the context index.  EP bins are attributed to
the category of the most recent context-coded bin, which is exact for
every HEVC binarisation used here (last-pos suffix, signs, remainders,
EG tails all follow their ctx-coded prefix).
"""
from __future__ import annotations

import numpy as np

from hmtpu.entropy import cabac
from hmtpu.entropy.contexts import NUM_CTX, OFF
from hmtpu.entropy.fracbits import ENTROPY_BITS
from hmtpu.entropy.residual import encode_residual

_CTX_CAT = None


def _cat_table():
    global _CTX_CAT
    if _CTX_CAT is not None:
        return _CTX_CAT
    spans = [
        ("sao", ("SAO_MERGE_FLAG", "SAO_TYPE_IDX")),
        ("split", ("SPLIT_FLAG",)),
        ("skip_flag", ("SKIP_FLAG",)),
        ("merge", ("MERGE_FLAG", "MERGE_IDX")),
        ("mode", ("PART_SIZE", "PRED_MODE")),
        ("intra_mode", ("INTRA_PRED_MODE", "CHROMA_PRED_MODE")),
        ("mvd", ("MVD",)),
        ("ref", ("REF_PIC",)),
        ("mvp", ("MVP_IDX",)),
        ("inter_dir", ("INTER_DIR",)),
        ("cbf", ("QT_CBF_LUMA", "QT_CBF_CHROMA", "QT_ROOT_CBF")),
        ("resid_y", ("LAST_X", "LAST_Y")),
        ("resid_c", ("LAST_X_C", "LAST_Y_C")),
    ]
    cat = {}
    sizes = {}
    # reconstruct block sizes from OFF ordering
    names = sorted(OFF, key=OFF.get)
    for i, n in enumerate(names):
        end = OFF[names[i + 1]] if i + 1 < len(names) else NUM_CTX
        sizes[n] = end - OFF[n]
    table = ["other"] * NUM_CTX
    for catname, blocks in spans:
        for b in blocks:
            for i in range(OFF[b], OFF[b] + sizes[b]):
                table[i] = catname
    # residual ctx split luma/chroma inside shared blocks
    for i in range(OFF["SIG_CG_FLAG"], OFF["SIG_CG_FLAG"] + 2):
        table[i] = "resid_y"
    for i in range(OFF["SIG_CG_FLAG"] + 2, OFF["SIG_CG_FLAG"] + 4):
        table[i] = "resid_c"
    for i in range(OFF["SIG_FLAG"], OFF["SIG_FLAG"] + 28):
        table[i] = "resid_y"
    for i in range(OFF["SIG_FLAG"] + 28, OFF["SIG_FLAG"] + 44):
        table[i] = "resid_c"
    for i in range(OFF["ONE_FLAG"], OFF["ONE_FLAG"] + 16):
        table[i] = "resid_y"
    for i in range(OFF["ONE_FLAG"] + 16, OFF["ONE_FLAG"] + 24):
        table[i] = "resid_c"
    for i in range(OFF["ABS_FLAG"], OFF["ABS_FLAG"] + 4):
        table[i] = "resid_y"
    for i in range(OFF["ABS_FLAG"] + 4, OFF["ABS_FLAG"] + 6):
        table[i] = "resid_c"
    _CTX_CAT = table
    return table


class AuditBackend:
    """Recorder-compatible backend: adaptive fracBits counter with
    per-category attribution instead of an arithmetic engine."""

    def __init__(self, ctx: np.ndarray):
        self.ctx = ctx.copy()
        self.by: dict[str, float] = {}
        self._cat = "other"
        self._table = _cat_table()

    def _add(self, cat, bits):
        self.by[cat] = self.by.get(cat, 0.0) + bits

    def encode_bin(self, idx: int, v: int) -> None:
        s = int(self.ctx[idx])
        self._cat = self._table[idx]
        self._add(self._cat, float(ENTROPY_BITS[s ^ v]) / 32768.0)
        self.ctx[idx] = (cabac.NEXT_STATE_MPS if v == (s & 1)
                         else cabac.NEXT_STATE_LPS)[s]

    def encode_bin_ep(self, v: int) -> None:
        self._add(self._cat, 1.0)

    def encode_bins_ep(self, v: int, n: int) -> None:
        self._add(self._cat, float(n))

    def encode_bin_trm(self, v: int) -> None:
        self._add("trm", 0.02)

    def residual(self, lev, log2, is_luma, scan_idx, sdh) -> None:
        outer = self

        class _Adapter:          # encode_residual speaks CabacEncoder
            def encode_bin(self, ctx, idx, v):
                outer.encode_bin(idx, v)

            def encode_bin_ep(self, v):
                outer.encode_bin_ep(v)

            def encode_bins_ep(self, v, n):
                outer.encode_bins_ep(v, n)

        encode_residual(_Adapter(), self.ctx, lev, log2, is_luma,
                        scan_idx, sdh)

    def finish(self) -> bytes:
        return b""

    def total(self) -> float:
        return sum(self.by.values())

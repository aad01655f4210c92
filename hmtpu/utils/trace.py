"""Symbol-level CABAC trace — the TPU build's ENC_DEC_TRACE
(reference TypeDef.h:71, DTRACE_CABAC_* TComRom.h:141-147): every
context-coded bin, EP bin and terminate bin is logged with its syntax
category (derived from the context index like utils/bitaudit.py) and
running counter.  Written by BOTH the encoder's Python backend and
the decoder, the two traces are line-identical for a conformant
stream — the first differing line pinpoints a divergence.

    from hmtpu.utils import trace
    with trace.tracing("/tmp/enc.trace"):
        enc.encode_sequence(frames)
    with trace.tracing("/tmp/dec.trace"):
        Decoder().decode_annexb(stream)
    # diff /tmp/enc.trace /tmp/dec.trace
"""
from __future__ import annotations

from contextlib import contextmanager

from hmtpu.entropy import cabac


class SymbolTrace:
    def __init__(self, path: str):
        self.f = open(path, "w")
        self.n = 0
        from hmtpu.utils.bitaudit import _cat_table
        self._cat = _cat_table()

    def ctx_bin(self, idx: int, val: int) -> None:
        cat = self._cat[idx] if idx < len(self._cat) else "?"
        self.f.write(f"{self.n:07d} {cat} ctx={idx} bin={val}\n")
        self.n += 1

    def ep(self, value: int, num: int) -> None:
        # one line per EP bin (MSB first): encoder batches EP bins
        # while the decoder may read them one at a time — per-bin
        # lines make the two traces grouping-insensitive
        for k in range(num - 1, -1, -1):
            self.f.write(f"{self.n:07d} ep bin={(value >> k) & 1}\n")
            self.n += 1

    def trm(self, val: int) -> None:
        self.f.write(f"{self.n:07d} trm bin={val}\n")
        self.n += 1

    def close(self) -> None:
        self.f.close()


@contextmanager
def tracing(path: str):
    """Enable the symbol trace for the duration of the block.  Forces
    the Python entropy backend (the native whole-slice walk does not
    speak the trace)."""
    t = SymbolTrace(path)
    prev = cabac.TRACE
    cabac.TRACE = t
    try:
        yield t
    finally:
        cabac.TRACE = prev
        t.close()

"""Adaptive-QP preanalyzer — the source-activity analysis of
TEncPreanalyzer::xPreanalyze (TEncPreanalyzer.cpp:64-150), vectorised:
per AQ partition the activity is 1 + the MINIMUM of the four
quadrant variances, and the per-CU QP offset is the x264-style
normalised log ratio against the picture average (TEncCu::xComputeQP).

The map is computed batched over the whole picture (one reshape +
reductions — no scalar loops).  Consumers: rate control scales each
picture's bit-budget share by its average activity relative to the
running mean (encoder/top.py -> ratectrl.pick(complexity=...)).  The
per-CU delta-QP *syntax* (cu_qp_delta) is not emitted yet, so the
per-partition offsets do not reach the coded stream — that is the
remaining half of SURVEY §2.1's preanalyzer row.
"""
from __future__ import annotations

import numpy as np


def activity_map(y: np.ndarray, part: int = 64):
    """Per-partition activity (1 + min quadrant variance) and the
    picture average, matching xPreanalyze's quadrant split."""
    h, w = y.shape
    ph, pw = -(-h // part) * part, -(-w // part) * part
    yp = np.pad(y.astype(np.float64), ((0, ph - h), (0, pw - w)),
                mode="edge")
    q = part // 2
    b = yp.reshape(ph // part, 2, q, pw // part, 2, q) \
        .transpose(0, 3, 1, 4, 2, 5) \
        .reshape(ph // part, pw // part, 4, q * q)
    mean = b.mean(axis=-1)
    var = (b * b).mean(axis=-1) - mean * mean
    act = 1.0 + var.min(axis=-1)
    return act, float(act.mean())


def qp_offset_map(act: np.ndarray, avg_act: float,
                  strength: float = 2.0,
                  qp_range: int = 6) -> np.ndarray:
    """TEncCu::xComputeQP's normalised-activity QP offset:
    6*log2((s*act + avg)/(act + s*avg)), clipped to the adaptation
    range (HM m_iQPAdaptationRange default 6)."""
    norm = (strength * act + avg_act) / (act + strength * avg_act)
    off = 6.0 * np.log2(norm)
    return np.clip(np.rint(off), -qp_range, qp_range).astype(np.int32)


def preanalyze(y: np.ndarray, part: int = 64, qp_range: int = 6):
    """Full xPreanalyze: (activity map, avg, per-partition QP offsets)."""
    act, avg = activity_map(y, part)
    return act, avg, qp_offset_map(act, avg, qp_range=qp_range)

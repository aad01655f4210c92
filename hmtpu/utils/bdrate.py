"""Bjontegaard-delta rate (BD-rate) between two RD curves.

The standard piecewise-cubic-in-log-rate formulation (as used around
HM's common test conditions; SURVEY §6 protocol): fit PSNR ->
log(rate) cubics for both curves, integrate over the overlapping PSNR
range, return the average rate difference in percent (negative =
the test curve needs fewer bits than the anchor).
"""
from __future__ import annotations

import numpy as np


def bd_rate(anchor_kbps, anchor_psnr, test_kbps, test_psnr) -> float:
    ra = np.log(np.asarray(anchor_kbps, np.float64))
    rt = np.log(np.asarray(test_kbps, np.float64))
    pa = np.asarray(anchor_psnr, np.float64)
    pt = np.asarray(test_psnr, np.float64)
    ca = np.polyfit(pa, ra, 3)
    ct = np.polyfit(pt, rt, 3)
    lo = max(pa.min(), pt.min())
    hi = min(pa.max(), pt.max())
    if hi <= lo:
        return float("nan")
    ia = np.polyint(ca)
    it = np.polyint(ct)
    va = np.polyval(ia, hi) - np.polyval(ia, lo)
    vt = np.polyval(it, hi) - np.polyval(it, lo)
    return float((np.exp((vt - va) / (hi - lo)) - 1.0) * 100.0)

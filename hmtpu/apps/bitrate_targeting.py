"""Bitrate-targeting helper: guess per-temporal-layer lambda modifiers
from previous encode results so a fixed-QP encode lands on target
bitrates.

Capability parity with the reference's BitrateTargeting utility
(source/App/utils/BitrateTargeting/GuessLambdaModifiers.cpp):
secant-extrapolation of the (lambda-modifier, bitrate) curve per GOP
position, with the same intra-dampening (log-compressed step) and
inter-dampening (upstream-layer-change attenuation) heuristics, fed by
the per-slice-type bitrates of prior runs instead of HM's meta-log
files.  Use with Encoder(gop_qp_factors=...) — a lambda modifier m
multiplies the position's lambda, i.e. qp_factor *= m.
"""
from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass
class Point:
    lambda_modifier: float
    bitrate: float


def _increment(adjustment: float, target: float, prev: Point) -> float:
    """Single-point proportional guess (no slope information yet)."""
    extrapolated = prev.lambda_modifier * target / prev.bitrate
    return prev.lambda_modifier \
        + adjustment * (extrapolated - prev.lambda_modifier)


def _polate(target: float, p1: Point, p2: Point) -> float:
    """Secant inter/extrapolation through the last two guesses."""
    return p1.lambda_modifier \
        + (p1.lambda_modifier - p2.lambda_modifier) \
        / (p1.bitrate - p2.bitrate) * (target - p1.bitrate)


def guess_lambda_modifier(adjustment: float, target: float,
                          points: list[Point],
                          inter_dampening: float = 1.0) -> float:
    """Next lambda-modifier guess for one temporal layer given its
    guess history (newest last)."""
    assert points and 0.0 < inter_dampening <= 1.0
    if len(points) < 2 or points[-1].lambda_modifier \
            == points[-2].lambda_modifier \
            or points[-1].bitrate == points[-2].bitrate:
        guess = _increment(adjustment, target, points[-1])
    else:
        guess = _polate(target, points[-1], points[-2])

    prev = points[-1].lambda_modifier
    # intra dampening: log-compress the relative step
    step = math.log(1.0 + abs(guess - prev) / prev)
    guess = prev * (1.0 - step if guess < prev else 1.0 + step)
    # inter dampening: attenuate, halving until the result is positive
    result = prev + inter_dampening * (guess - prev)
    while result <= 0.0:
        inter_dampening /= 2.0
        result = prev + inter_dampening * (guess - prev)
    return result


def guess_lambda_modifiers(targets: list[float],
                           history: list[list[Point]],
                           adjustment: float = 0.5,
                           inter_parameter: float = 50.0) -> list[float]:
    """Guess all layers' modifiers.  history[i] is layer i's (modifier,
    bitrate) points, oldest first (at most the last two are used, like
    the reference).  Layers whose upstream layers moved a lot are
    attenuated by 1 / (inter_parameter * cumulative_delta + 1)."""
    assert targets and all(history)
    cumulative_delta = 0.0
    out = []
    for i, target in enumerate(targets):
        pts = history[i][-2:]
        damp = 1.0 / (inter_parameter * cumulative_delta + 1.0)
        new = guess_lambda_modifier(adjustment, target, pts, damp)
        out.append(new)
        old = pts[-1].lambda_modifier
        cumulative_delta += abs(new - old) / old
    return out


def main(argv=None) -> int:
    """CLI mirroring GuessLambdaModifiersMain: read target bitrates and
    the guess history (JSON: [[{"m": ..., "kbps": ...}, ...], ...] per
    layer) and print the next lambda-modifier vector."""
    import argparse
    import json

    ap = argparse.ArgumentParser(
        prog="hmtpu-guess-lambda-modifiers",
        description="guess per-layer lambda modifiers for bitrate "
                    "targeting")
    ap.add_argument("targets", help="comma-separated kbps targets")
    ap.add_argument("history", help="JSON history file")
    ap.add_argument("--adjustment", type=float, default=0.5)
    a = ap.parse_args(argv)
    targets = [float(t) for t in a.targets.split(",")]
    hist = [[Point(p["m"], p["kbps"]) for p in layer]
            for layer in json.load(open(a.history))]
    mods = guess_lambda_modifiers(targets, hist, a.adjustment)
    print(" ".join(f"{m:.6f}" for m in mods))
    return 0


def extract_bitrates_per_layer(results, gop_size: int,
                               frame_rate: float) -> list[float]:
    """Per-GOP-position mean bitrate (kbps) from encoder FrameResults —
    the ExtractBitrates stage, fed by our per-frame log instead of
    HM's summary files.  Position = (poc - 1) % gop_size for non-IDR
    frames; IDR frames are excluded like the reference's per-layer
    accounting."""
    sums = [0.0] * gop_size
    counts = [0] * gop_size
    for r in results:
        if r.slice_type == "I":
            continue
        pos = (r.poc - 1) % gop_size
        sums[pos] += r.bits
        counts[pos] += 1
    return [s / c * frame_rate / 1000.0 if c else 0.0
            for s, c in zip(sums, counts)]


if __name__ == "__main__":
    import sys

    sys.exit(main())

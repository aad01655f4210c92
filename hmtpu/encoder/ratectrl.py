"""Rate control: the R-lambda model of HM's TEncRateCtrl
(TEncRateCtrl.cpp/h — TEncRCSeq TEncRateCtrl.h:97, TEncRCGOP :184,
TEncRCPic :217, xEstPicTargetBits :247), reduced to the picture level:

  R = alpha * bpp^beta  per update class (I frames / each GOP position),
  lambda = alpha * bpp_target^beta,
  QP = 4.2005 * ln(lambda) + 13.7122    (HM's lambda->QP fit),

with HM's post-picture model adaptation
  alpha += 0.10 * (ln lambda_used - ln lambda_comp) * alpha
  beta  += 0.05 * (ln lambda_used - ln lambda_comp) * ln bpp_real

and the usual smoothing window for distributing the remaining bit
budget.  Host-side (control decisions are scalar per picture); the
device pass receives the chosen (QP, lambda) pair.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field


# HM defaults (TEncRCSeq::initPicPara): alpha/beta seeds
INIT_ALPHA = 3.2003
INIT_BETA = -1.367
# GOP-position bit-allocation weights for low-delay GOP4
# (g_RCGOPWeights flavour: later/lower-QP frames get more bits)
LDP_GOP4_WEIGHTS = (1.0, 1.25, 1.0, 2.0)


@dataclass
class _Model:
    alpha: float = INIT_ALPHA
    beta: float = INIT_BETA

    def lam(self, bpp: float) -> float:
        return self.alpha * bpp ** self.beta

    def update(self, lam_used: float, bpp_real: float,
               gain: float = 1.0) -> None:
        """gain > 1 accelerates the cold start: the R-lambda seeds are
        HM's (TEncRCSeq::initPicPara) but this encoder's operating
        point differs, and at HM's 0.10/0.05 steps a short sequence
        ends before the model converges."""
        bpp_real = max(bpp_real, 1e-6)
        lam_comp = self.alpha * bpp_real ** self.beta
        d = math.log(lam_used) - math.log(lam_comp)
        d = min(max(d, -2.0), 2.0)      # HM clips the adaptation step
        self.alpha += min(0.10 * gain, 0.5) * d * self.alpha
        self.alpha = min(max(self.alpha, 0.05), 500.0)
        self.beta += min(0.05 * gain, 0.25) * d * math.log(bpp_real)
        self.beta = min(max(self.beta, -3.0), -0.1)


def lambda_to_qp(lam: float) -> int:
    return int(round(4.2005 * math.log(lam) + 13.7122))


@dataclass
class RateControl:
    """GOP + picture-level R-lambda rate control for one encode.

    GOP layer (TEncRCGOP::xEstGOPTargetBits): the sequence-level
    surplus/deficit is spread over a smoothing window (HM's
    g_RCSmoothWindowSize=40) rather than all remaining frames, the
    GOP budget is then split over its pictures by the GOP-position
    weights with causal re-balancing as pictures land."""

    target_kbps: float
    fps: float
    width: int
    height: int
    total_frames: int
    gop_weights: tuple = LDP_GOP4_WEIGHTS
    intra_ratio: float = 4.0        # I pictures get ~4x the P budget
    smooth_window: int = 40         # g_RCSmoothWindowSize

    bits_spent: int = 0
    frames_done: int = 0
    last_qp: int | None = None
    models: dict = field(default_factory=dict)
    # current GOP state: remaining bit budget + unencoded positions
    gop_bits_left: float = 0.0
    gop_pos_left: list = field(default_factory=list)

    @property
    def pixels(self) -> int:
        return self.width * self.height

    def _budget_left(self) -> float:
        total = self.target_kbps * 1000.0 / self.fps * self.total_frames
        return total - self.bits_spent

    def _gop_target(self, left_frames: int) -> float:
        """TEncRCGOP::xEstGOPTargetBits: per-pic target with the
        sequence deviation amortised over the smoothing window."""
        avg = self.target_kbps * 1000.0 / self.fps
        infl = min(self.smooth_window, left_frames)
        per_pic = (self._budget_left() - avg * left_frames) / infl \
            + avg
        n = min(len(self.gop_weights), left_frames)
        return max(per_pic * n, 200.0)

    def pick(self, is_intra: bool, gop_pos: int = 0,
             complexity: float | None = None):
        """Target bits, lambda and QP for the next picture.

        complexity: the preanalyzer's picture-average activity
        (encoder/preanalyze.py, TEncPreanalyzer::xPreanalyze) — the
        target is scaled by this picture's activity relative to the
        running mean, so busy pictures draw more of the budget (the
        picture-level form of HM's LCU bit allocation by complexity,
        TEncRCPic::xEstPicTargetBits)."""
        left_frames = max(self.total_frames - self.frames_done, 1)
        avg = self._budget_left() / left_frames
        cx_scale = 1.0
        if complexity is not None and complexity > 0:
            mean = getattr(self, "_cx_mean", None)
            if mean is None:
                mean = complexity
            self._cx_mean = 0.9 * mean + 0.1 * complexity
            cx_scale = min(max(complexity / max(mean, 1e-9), 0.5), 2.0)
        if is_intra:
            target = avg * self.intra_ratio
            key = "I"
            self.gop_pos_left = []          # restart GOP state at IRAP
        else:
            wn = len(self.gop_weights)
            pos = gop_pos % wn
            if pos == 0 or not self.gop_pos_left:
                self.gop_bits_left = self._gop_target(left_frames)
                self.gop_pos_left = list(range(wn))
            wsum = sum(self.gop_weights[p] for p in self.gop_pos_left)
            target = self.gop_bits_left \
                * self.gop_weights[pos] / max(wsum, 1e-9)
            if pos in self.gop_pos_left:
                self.gop_pos_left.remove(pos)
            # ONE shared P model: per-position targets already carry
            # the GOP weights, and per-position models would see only
            # total/4 adaptation steps — too few to converge on short
            # sequences (HM keeps per-level models but encodes
            # hundreds of frames)
            key = "P"
        target = max(target * cx_scale, 100.0)
        bpp = target / self.pixels
        m = self.models.setdefault(key, _Model())
        lam = min(max(m.lam(bpp), 0.1), 10000.0)
        qp = lambda_to_qp(lam)
        if self.last_qp is not None:
            qp = min(max(qp, self.last_qp - 3), self.last_qp + 3)
        qp = min(max(qp, 1), 51)
        self._pending = (key, lam)
        self.last_qp = qp
        return target, lam, qp

    def update(self, actual_bits: int) -> None:
        key, lam = self._pending
        # cold start: each per-class model's first few pictures adapt
        # 4x faster, decaying to HM's steady-state step
        seen = getattr(self, "_class_seen", None)
        if seen is None:
            seen = self._class_seen = {}
        n = seen.get(key, 0)
        seen[key] = n + 1
        gain = 2.0 if n < 2 else 1.0
        self.models[key].update(lam, actual_bits / self.pixels,
                                gain=gain)
        self.bits_spent += actual_bits
        self.frames_done += 1
        if key != "I":
            self.gop_bits_left -= actual_bits

"""Pass 2: bit allocation from first-pass stats.

TPU-native re-design of av1/encoder/pass2_strategy.c
(av1_get_second_pass_params :3664, define_gf_group :2441): per-frame
complexity weights from the stats drive both the GF-group ARF boost and
per-frame bit targets; the total budget is the exact sequence budget so
two-pass hits the target rate closed-form instead of through the
one-pass feedback loop.
"""

from __future__ import annotations

import numpy as np


class TwoPassAllocator:
    """Distributes the sequence bit budget over frames by complexity."""

    def __init__(self, stats, target_bps: float, fps: float,
                 kf_boost: float = 4.0, arf_boost: float = 2.0,
                 exponent: float = 0.7):
        self.stats = stats
        self.fps = fps
        n = len(stats)
        self.total_bits = target_bps * n / fps
        # complexity weight: coded error, compressed (frames with huge
        # error shouldn't swallow the whole budget — pass2's bit-per-MB
        # clamping analog)
        err = np.array([max(s.coded_error, 1.0) for s in stats])
        self.weights = err ** exponent
        self.kf_boost = kf_boost
        self.arf_boost = arf_boost
        self._spent = 0.0
        self._alloc_done = 0

    def frame_targets(self, kinds) -> np.ndarray:
        """kinds: per-frame 'key'|'arf'|'inter' labels in coding order
        mapped to display indices; returns per-frame bit targets."""
        w = self.weights.copy()
        for i, k in enumerate(kinds):
            if k == "key":
                w[i] *= self.kf_boost
            elif k == "arf":
                w[i] *= self.arf_boost
        return self.total_bits * w / w.sum()

    def gf_group_boost(self, start: int, length: int) -> float:
        """ARF boost from in-group motion coherence (define_gf_group
        flavor): low coded/intra ratio => strong prediction => boost."""
        s = self.stats[start:start + length]
        if not s:
            return self.arf_boost
        ratios = [max(x.coded_error, 1.0) / max(x.intra_error, 1.0)
                  for x in s]
        coherence = 1.0 - float(np.mean(ratios))   # 1 = perfectly predicted
        return float(np.clip(1.5 + 2.5 * coherence, 1.2, 4.0))

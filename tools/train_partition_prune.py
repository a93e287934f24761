"""Train the partition-prune MLP on this encoder's own RD decisions.

Runs the lossy all-intra RD search over synthetic clips, logging
(block features, split-chosen) pairs at every square recursion level,
then fits a 1-hidden-layer MLP by plain numpy gradient descent and
writes data/partition_prune.npz.

    python tools/train_partition_prune.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from aom_av1_lavish_tpu.bitstream import constants as c          # noqa: E402
from aom_av1_lavish_tpu.common import blockd                     # noqa: E402
from aom_av1_lavish_tpu.encoder.lossy import (                   # noqa: E402
    LossyAllIntraEncoder, make_lossy_frame_header,
    make_sequence_header)
from aom_av1_lavish_tpu.models.partition_prune import (          # noqa: E402
    N_FEATURES, block_features)


class LoggingEncoder(LossyAllIntraEncoder):
    samples = None

    def _search(self, mi_row, mi_col, bsize):
        cost, plan = super()._search(mi_row, mi_col, bsize)
        if (plan is not None and bsize >= c.BLOCK_16X16
                and self._fits(mi_row, mi_col, bsize)):
            size = blockd.block_wide(bsize)
            feats = block_features(self.src[0], mi_col * 4, mi_row * 4,
                                   size, self.fh.base_q_idx)
            self.samples.append((feats, float(plan[0] == "SPLIT")))
        return cost, plan


def make_clips(rng):
    clips = []
    for seed in range(6):
        r = np.random.default_rng(seed)
        h, w = 192, 256
        yy, xx = np.mgrid[0:h, 0:w]
        kind = seed % 3
        if kind == 0:      # smooth gradients + few edges
            y = (xx * 200 // w + yy * 40 // h).astype(np.uint8)
            y[h // 3:, w // 2:] = 220 - y[h // 3:, w // 2:]
        elif kind == 1:    # block texture
            y = np.kron(r.integers(0, 255, (h // 8, w // 8)),
                        np.ones((8, 8))).astype(np.uint8)
        else:              # mixed: smooth + noisy half
            y = (128 + 60 * np.sin(xx / 17.0)).astype(np.uint8)
            y[:, w // 2:] = r.integers(0, 256, (h, w // 2))
        u = np.full((h // 2, w // 2), 128, np.uint8)
        clips.append(((y, u, u.copy()), w, h))
    return clips


def collect():
    samples = []
    for (frame, w, h) in make_clips(np.random.default_rng(0)):
        for q in (40, 90, 140):
            sh = make_sequence_header(w, h)
            fh = make_lossy_frame_header(sh, q, deblock=False)
            enc = LoggingEncoder(sh, fh, trellis=False, rect_parts=False)
            enc.samples = samples
            enc.encode_frame(frame)
            print(f"clip q={q}: {len(samples)} samples total")
    return samples


def fit(samples, hidden=8, iters=3000, lr=0.05):
    X = np.stack([s[0] for s in samples]).astype(np.float64)
    yv = np.array([s[1] for s in samples])
    mu, sd = X.mean(0), X.std(0) + 1e-6
    Xn = (X - mu) / sd
    rng = np.random.default_rng(1)
    w1 = rng.normal(0, 0.5, (N_FEATURES, hidden))
    b1 = np.zeros(hidden)
    w2 = rng.normal(0, 0.5, (hidden, 1))
    b2 = np.zeros(1)
    n = len(Xn)
    for it in range(iters):
        h1 = np.maximum(Xn @ w1 + b1, 0)
        z = (h1 @ w2 + b2)[:, 0]
        p = 1 / (1 + np.exp(-z))
        g = (p - yv) / n
        gw2 = h1.T @ g[:, None]
        gb2 = g.sum(keepdims=True)
        gh = g[:, None] @ w2.T
        gh[h1 <= 0] = 0
        gw1 = Xn.T @ gh
        gb1 = gh.sum(0)
        w1 -= lr * gw1
        b1 -= lr * gb1
        w2 -= lr * gw2
        b2 -= lr * gb2
        if it % 500 == 0:
            loss = -(yv * np.log(p + 1e-9)
                     + (1 - yv) * np.log(1 - p + 1e-9)).mean()
            acc = ((p > 0.5) == yv).mean()
            print(f"iter {it}: loss {loss:.4f} acc {acc:.3f}")
    # fold normalization into the first layer
    w1_eff = (w1.T / sd).T
    b1_eff = b1 - (mu / sd) @ w1
    return w1_eff, b1_eff, w2, b2


def main():
    samples = collect()
    w1, b1, w2, b2 = fit(samples)
    out = os.path.join(os.path.dirname(__file__), "..", "data",
                       "partition_prune.npz")
    np.savez(out, w1=w1, b1=b1, w2=w2, b2=b2)
    print(f"wrote {out} ({len(samples)} samples)")


if __name__ == "__main__":
    main()

"""ALTREF temporal filtering — MC-weighted multi-frame denoise.

TPU-native re-design of av1_temporal_filter
(/root/reference/av1/encoder/temporal_filter.c:1284): before coding an
ARF (or key frame), replace its source with a motion-compensated
weighted average over a window of neighbor frames, so the boosted-q
anchor spends its bits on signal instead of noise.

Design inversion vs the reference: libaom walks 32x32 blocks serially
(mb loop, tf_do_filtering_row) with per-block subpel search and a
scalar per-pixel weight loop; here every (neighbor, block) pair is
scored in one batched SSD cost volume (lax.scan over the offset grid),
and the per-pixel weights for all neighbors are one fused elementwise
expression over (n, H, W) arrays — MXU/VPU-friendly, no Python in the
hot path.

Weight model (tf_compute_weight analog): w = exp(-D / (2 sigma_q^2))
where D is the 3x3-windowed mean squared alignment error and sigma_q
scales with the quantizer (noise at the target quality), matching the
reference's q-adaptive strength (temporal_filter.c:1040
tf_estimate_noise + adjust_filter_strength behavior).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

BLOCK = 16
RADIUS = 8          # full-pel search radius per neighbor


@lru_cache(maxsize=None)
def _tf_fn(key):
    import jax
    import jax.numpy as jnp

    H, W, n = key

    Hb, Wb = H // BLOCK, W // BLOCK

    def block_ssd(diff2):
        """(H, W) -> (Hb, Wb) block sums."""
        return diff2.reshape(Hb, BLOCK, Wb, BLOCK).sum(axis=(1, 3))

    def fn(center, neighbors):
        """center (H, W) f32; neighbors (n, H, W) f32.
        Returns (mvs (n, Hb, Wb, 2) int32, aligned (n, H, W) f32)."""
        pad = jnp.pad(neighbors, ((0, 0), (RADIUS, RADIUS),
                                  (RADIUS, RADIUS)), mode="edge")

        offs = jnp.stack(jnp.meshgrid(
            jnp.arange(-RADIUS, RADIUS + 1),
            jnp.arange(-RADIUS, RADIUS + 1), indexing="ij"),
            axis=-1).reshape(-1, 2)

        def scan_off(carry, off):
            best_cost, best_idx, idx = carry
            dy, dx = off[0], off[1]
            shifted = jax.lax.dynamic_slice(
                pad, (0, dy + RADIUS, dx + RADIUS), (n, H, W))
            cost = jax.vmap(block_ssd)((shifted - center[None]) ** 2)
            better = cost < best_cost
            best_cost = jnp.where(better, cost, best_cost)
            best_idx = jnp.where(better, idx, best_idx)
            return (best_cost, best_idx, idx + 1), None

        init = (jnp.full((n, Hb, Wb), jnp.inf, jnp.float32),
                jnp.zeros((n, Hb, Wb), jnp.int32), jnp.int32(0))
        (cost, idx, _), _ = jax.lax.scan(scan_off, init, offs)
        mvs = offs[idx]                       # (n, Hb, Wb, 2)

        # gather the aligned neighbor pixels per block
        mv_field = jnp.repeat(jnp.repeat(mvs, BLOCK, axis=1),
                              BLOCK, axis=2)  # (n, H, W, 2)
        yy, xx = jnp.meshgrid(jnp.arange(H), jnp.arange(W),
                              indexing="ij")
        ny = yy[None] + mv_field[..., 0] + RADIUS
        nx = xx[None] + mv_field[..., 1] + RADIUS
        aligned = jax.vmap(lambda p, iy, ix: p[iy, ix])(pad, ny, nx)
        return mvs, aligned

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _blend_fn(key):
    import jax
    import jax.numpy as jnp

    def fn(center, aligned, sigma2):
        d2 = (aligned - center[None]) ** 2
        # 3x3 windowed mean of the alignment error (tf per-pixel window)
        k = jnp.ones((3, 3), jnp.float32) / 9.0
        win = jax.vmap(lambda img: jax.scipy.signal.convolve2d(
            img, k, mode="same"))(d2)
        w = jnp.exp(-win / (2.0 * sigma2))
        num = center + (w * aligned).sum(axis=0)
        den = 1.0 + w.sum(axis=0)
        return num / den

    return jax.jit(fn)


def _filter_plane(center, neighbors, sigma2):
    """center (H, W) uint8, neighbors list of (H, W) uint8."""
    n = len(neighbors)
    H, W = center.shape
    Hc, Wc = (H // BLOCK) * BLOCK, (W // BLOCK) * BLOCK
    c32 = center[:Hc, :Wc].astype(np.float32)
    nb = np.stack([x[:Hc, :Wc] for x in neighbors]).astype(np.float32)
    _, aligned = _tf_fn((Hc, Wc, n))(c32, nb)
    out = _blend_fn((Hc, Wc))(c32, np.asarray(aligned),
                              np.float32(sigma2))
    res = center.astype(np.float32).copy()
    res[:Hc, :Wc] = np.asarray(out)
    return np.clip(np.round(res), 0, 255).astype(np.uint8)


def tf_sigma2(qindex: int) -> float:
    """Filter strength from target quality (adjust_filter_strength
    analog): more aggressive at higher q where coding noise dominates."""
    from ..common.quant import ac_quant_qtx
    qstep = ac_quant_qtx(qindex, 0) / 8.0
    return max(1.0, 0.5 * qstep) ** 2


def temporal_filter(frames, center_idx: int, qindex: int,
                    window: int = 2):
    """Filter frames[center_idx] against +/-window neighbors.

    frames: list of (y, u, v) uint8 planes; returns a filtered
    (y, u, v).  av1_temporal_filter entry analog."""
    lo = max(0, center_idx - window)
    hi = min(len(frames), center_idx + window + 1)
    neigh = [i for i in range(lo, hi) if i != center_idx]
    if not neigh:
        return frames[center_idx]
    s2 = tf_sigma2(qindex)
    out = []
    for p in range(3):
        center = frames[center_idx][p]
        nbs = [frames[i][p] for i in neigh]
        # chroma shares the luma strength; its own SSD drives alignment
        out.append(_filter_plane(center, nbs, s2))
    return tuple(out)

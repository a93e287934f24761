"""Quality metrics: PSNR, SSIM, fast MS-SSIM-style multiscale, PSNR-HVS.

TPU-native re-design of the reference metric kernels (aom_dsp/psnr.c,
aom_dsp/ssim.c:aom_ssim2 — 8x8 windows stepped by 4, aom_dsp/fastssim.c
— multiscale SSIM, aom_dsp/psnrhvs.c — 8x8 DCT with CSF weighting).
Implemented as vectorized numpy on host with jax-compatible math; these
score full frames (the per-SB variants for rdmult tuning live in
encoder/tune.py).
"""

from __future__ import annotations

import numpy as np


def sse(a, b) -> float:
    d = a.astype(np.int64) - b.astype(np.int64)
    return float((d * d).sum())


def psnr(a, b, peak: float = 255.0) -> float:
    m = sse(a, b) / a.size
    if m <= 0:
        return 100.0
    return float(10.0 * np.log10(peak * peak / m))


def frame_psnr(frames_a, frames_b, peak: float = 255.0) -> dict:
    """Per-plane + combined PSNR over (y, u, v) tuples
    (aom_calc_psnr semantics: combined uses total SSE over all planes)."""
    tot_sse = 0.0
    tot_n = 0
    out = {}
    for name, pa, pb in zip("yuv", frames_a, frames_b):
        s = sse(pa, pb)
        out[name] = psnr(pa, pb, peak) if s else 100.0
        tot_sse += s
        tot_n += pa.size
    m = tot_sse / tot_n
    out["all"] = 100.0 if m <= 0 else float(
        10.0 * np.log10(peak * peak / m))
    return out


def _windows(x, win: int, step: int):
    """(H, W) -> (n, win, win) sliding windows."""
    H, W = x.shape
    ys = range(0, H - win + 1, step)
    xs = range(0, W - win + 1, step)
    out = np.empty((len(ys) * len(xs), win, win), x.dtype)
    i = 0
    for y in ys:
        for xx in xs:
            out[i] = x[y:y + win, xx:xx + win]
            i += 1
    return out


def ssim(a, b, peak: float = 255.0) -> float:
    """aom_ssim2 semantics: 8x8 windows stepped by 4, k1=0.01, k2=0.03."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    c1 = (0.01 * peak) ** 2
    c2 = (0.03 * peak) ** 2
    wa = _windows(a, 8, 4)
    wb = _windows(b, 8, 4)
    mu_a = wa.mean((1, 2))
    mu_b = wb.mean((1, 2))
    var_a = wa.var((1, 2))
    var_b = wb.var((1, 2))
    cov = (wa * wb).mean((1, 2)) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2)
    return float((num / den).mean())


def fastssim(a, b, peak: float = 255.0, levels: int = 4) -> float:
    """Multiscale SSIM in the spirit of aom_dsp/fastssim.c: geometric
    mean of per-level SSIM over dyadic downscales."""
    vals = []
    ca, cb = a.astype(np.float64), b.astype(np.float64)
    for lv in range(levels):
        if min(ca.shape) < 8:
            break
        vals.append(max(ssim(ca, cb, peak), 1e-6))
        H2, W2 = (ca.shape[0] // 2) * 2, (ca.shape[1] // 2) * 2
        ca = ca[:H2, :W2].reshape(H2 // 2, 2, W2 // 2, 2).mean((1, 3))
        cb = cb[:H2, :W2].reshape(H2 // 2, 2, W2 // 2, 2).mean((1, 3))
    return float(np.exp(np.mean(np.log(vals))))


# 8x8 CSF (contrast sensitivity) weights in the spirit of psnrhvs.c
_CSF = np.array(
    [[1.608, 2.339, 2.574, 1.869, 1.312, 0.899, 0.616, 0.437],
     [2.339, 2.925, 2.726, 2.001, 1.363, 0.935, 0.617, 0.437],
     [2.574, 2.726, 2.299, 1.712, 1.245, 0.896, 0.606, 0.437],
     [1.869, 2.001, 1.712, 1.365, 1.058, 0.792, 0.569, 0.420],
     [1.312, 1.363, 1.245, 1.058, 0.867, 0.683, 0.508, 0.386],
     [0.899, 0.935, 0.896, 0.792, 0.683, 0.561, 0.437, 0.342],
     [0.616, 0.617, 0.606, 0.569, 0.508, 0.437, 0.350, 0.281],
     [0.437, 0.437, 0.437, 0.420, 0.386, 0.342, 0.281, 0.226]])


def _dct8(x):
    n = 8
    k = np.arange(n)
    basis = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    basis[0] *= np.sqrt(1 / n)
    basis[1:] *= np.sqrt(2 / n)
    return basis @ x @ basis.T


def psnrhvs(a, b, peak: float = 255.0) -> float:
    """PSNR-HVS: MSE of CSF-weighted 8x8 DCT coefficients."""
    wa = _windows(a.astype(np.float64), 8, 8)
    wb = _windows(b.astype(np.float64), 8, 8)
    acc = 0.0
    for i in range(wa.shape[0]):
        d = _dct8(wa[i]) - _dct8(wb[i])
        acc += float(((d * _CSF) ** 2).sum())
    m = acc / (wa.shape[0] * 64)
    if m <= 0:
        return 100.0
    return float(10.0 * np.log10(peak * peak / m))

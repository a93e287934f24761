"""Speed-feature presets: --cpu-used must trade quality for speed
monotonically and stay conformant at every level
(speed_features.c:2240 analog, encoder/speed.py)."""

import os
import subprocess
import time

import numpy as np
import pytest

from aom_av1_lavish_tpu.decoder import decode_ivf
from aom_av1_lavish_tpu.encoder.gop import encode_gop_ivf
from aom_av1_lavish_tpu.utils.y4m import read_y4m

AOMDEC = os.path.join(os.path.dirname(__file__), "..", ".oracle",
                      "build", "aomdec")
HAVE_ORACLE = os.path.exists(AOMDEC)


def _clip(n, w, h):
    rng = np.random.default_rng(4)
    yy, xx = np.mgrid[0:h + 8, 0:w + 4 * n]
    base = (128 + 55 * np.sin(yy / 10.0) * np.cos(xx / 17.0)
            + rng.normal(0, 4, yy.shape)).clip(0, 255).astype(np.uint8)
    return [(np.ascontiguousarray(base[i % 4:i % 4 + h,
                                       4 * i:4 * i + w]),
             np.full((h // 2, w // 2), 112, np.uint8),
             np.full((h // 2, w // 2), 140, np.uint8))
            for i in range(n)]


def test_cpu_used_speed_quality_ladder(tmp_path):
    w, h, n = 96, 64, 4
    frames = _clip(n, w, h)
    stats = {}
    for cpu in (0, 2, 4, 6, 9):
        ivf = str(tmp_path / f"c{cpu}.ivf")
        t0 = time.perf_counter()
        encode_gop_ivf(ivf, frames, w, h, qindex=100, gf_length=n,
                       enable_cdef=False, cpu_used=cpu)
        dt = time.perf_counter() - t0
        dec = decode_ivf(ivf)
        assert len(dec) == n
        mse = np.mean([np.mean((d[0].astype(float)
                                - f[0].astype(float)) ** 2)
                       for d, f in zip(dec, frames)])
        psnr = 10 * np.log10(255 ** 2 / max(mse, 1e-9))
        stats[cpu] = (dt, psnr, os.path.getsize(ivf))
        if HAVE_ORACLE:
            out = str(tmp_path / f"c{cpu}.y4m")
            subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                           capture_output=True)
            golden = read_y4m(out)[0]
            for a, b in zip(dec, golden):
                for pa, pb in zip(a, b):
                    np.testing.assert_array_equal(pa, pb)
    # the fast end must be much faster than the slow end
    assert stats[9][0] < stats[0][0] * 0.55, stats
    # every level must stay usable (equal-q psnr floor; rate shifts
    # with pruning so strict monotone psnr is not well-posed here)
    for cpu, (dt, psnr, size) in stats.items():
        assert psnr > 33.0, (cpu, stats[cpu])


def test_framesize_and_qindex_adjust():
    """Framesize/q-dependent speed adjustments only ever prune
    (speed_features.c:2202/:2385 analog)."""
    from aom_av1_lavish_tpu.encoder.speed import (adjust_framesize,
                                                  adjust_qindex,
                                                  speed_features_for)
    for cpu in range(10):
        sf = speed_features_for(cpu)
        big = adjust_framesize(sf, 1920, 1080)
        assert big.search_range <= sf.search_range
        assert big.min_block >= sf.min_block
        assert (not big.ext_parts) or sf.ext_parts
        coarse = adjust_qindex(sf, 220)
        assert (not coarse.trellis) or sf.trellis
        assert (not coarse.tx_search) or sf.tx_search
        assert adjust_framesize(sf, 352, 288) == sf

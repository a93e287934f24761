"""Within-frame tile-parallel decode: bit-identical to serial and to
stock aomdec on a multi-tile inter stream (decode_multithreaded_test.cc
analog).  Also regression-pins the tile-scoped warp-sample availability
(av1_findSamples uses xd->up_available, i.e. tile bounds)."""

import os
import subprocess

import numpy as np
import pytest

from aom_av1_lavish_tpu.decoder import decode_ivf
from aom_av1_lavish_tpu.utils.y4m import read_y4m, write_y4m

ORACLE = os.path.join(os.path.dirname(__file__), "..", ".oracle", "build")
AOMENC = os.path.join(ORACLE, "aomenc")
AOMDEC = os.path.join(ORACLE, "aomdec")


@pytest.mark.skipif(not os.path.exists(AOMENC), reason="oracle not built")
def test_tile_parallel_decode_multitile_inter(tmp_path):
    rng = np.random.default_rng(4)
    W, H, N = 192, 128, 3
    yy, xx = np.mgrid[0:H + 24, 0:W + 24]
    base = (120 + 70 * np.sin(yy / 9.0) * np.cos(xx / 7.0)).clip(0, 255)
    frames = []
    for i in range(N):
        y = (base[2 * i:2 * i + H, 3 * i:3 * i + W]
             + rng.normal(0, 5, (H, W))).clip(0, 255).astype(np.uint8)
        frames.append((y,
                       rng.integers(90, 170, (H // 2, W // 2),
                                    dtype=np.int64).astype(np.uint8),
                       rng.integers(90, 170, (H // 2, W // 2),
                                    dtype=np.int64).astype(np.uint8)))
    src = str(tmp_path / "src.y4m")
    ivf = str(tmp_path / "mt.ivf")
    write_y4m(src, frames, W, H)
    subprocess.run(
        [AOMENC, "--cpu-used=8", "--threads=1", "--tile-columns=1",
         "--tile-rows=1", "--cq-level=60", "--end-usage=q", "--passes=1",
         "--lag-in-frames=0", "-o", ivf, src],
        check=True, capture_output=True)
    out = str(tmp_path / "gold.y4m")
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    gold = read_y4m(out)[0]
    serial = decode_ivf(ivf)
    par = decode_ivf(ivf, tile_workers=4)
    assert len(serial) == len(par) == len(gold) == N
    for a, b, g in zip(serial, par, gold):
        for pa, pb, pg in zip(a, b, g):
            np.testing.assert_array_equal(pa, pg)   # serial conformance
            np.testing.assert_array_equal(pb, pg)   # parallel == golden

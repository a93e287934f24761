"""Decoder inspection + accounting (inspection.c / accounting.c analog)."""

import os
import subprocess

import numpy as np
import pytest

from aom_av1_lavish_tpu.bitstream import constants as c
from aom_av1_lavish_tpu.decoder.inspect import inspect_ivf
from aom_av1_lavish_tpu.utils.y4m import write_y4m

AOMENC = os.path.join(os.path.dirname(__file__), "..", ".oracle", "build",
                      "aomenc")

pytestmark = pytest.mark.skipif(not os.path.exists(AOMENC),
                                reason="aomenc oracle not built")


def test_inspect_grids_and_accounting(tmp_path):
    rng = np.random.default_rng(1)
    w, h = 176, 144
    frames = []
    for i in range(3):
        y = np.kron(rng.integers(0, 255, (h // 16, w // 16)),
                    np.ones((16, 16))).astype(np.uint8)
        u = rng.integers(90, 170, (h // 2, w // 2)).astype(np.uint8)
        frames.append((y, u, u.copy()))
    src = str(tmp_path / "s.y4m")
    ivf = str(tmp_path / "i.ivf")
    write_y4m(src, frames, w, h)
    subprocess.run(
        [AOMENC, "--enable-chroma-deltaq=0", "--aq-mode=0", "--codec=av1",
         "--ivf", "-o", ivf, "--cpu-used=5", "--end-usage=q",
         "--cq-level=30", "--passes=1", "--lag-in-frames=0",
         "--threads=1", src],
        check=True, capture_output=True)

    infos = inspect_ivf(ivf)
    assert len(infos) == 3
    key = infos[0]
    assert key.frame_type == c.KEY_FRAME
    assert key.mi_rows == (h + 3) // 4 and key.mi_cols == (w + 3) // 4
    assert key.mode_grid.shape == (key.mi_rows, key.mi_cols)
    assert (key.ref_grid == 0).all()           # intra frame
    assert key.base_qindex > 0
    assert (key.qindex_grid == key.base_qindex).all()
    # tx sizes populated everywhere
    assert (key.tx_wide_grid >= 4).all()

    p = infos[1]
    assert p.frame_type == c.INTER_FRAME
    assert (p.ref_grid > 0).any()              # inter blocks present
    assert np.abs(p.mv_grid).max() >= 0

    # accounting: coeff bits dominate on a keyframe; totals consistent
    a = key.accounting
    assert a["total"] > 0
    assert 0 < a["coeffs_y"] < a["total"]
    assert a["overhead"] > 0
    assert a["coeffs_y"] + a["coeffs_uv"] + a["overhead"] \
        == pytest.approx(a["total"])

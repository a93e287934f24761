"""Optical flow (dsp/flow.py): pyramidal disflow / Lucas-Kanade /
Horn-Schunck (reference behavior: aom_dsp/flow_estimation/disflow.c,
av1/encoder/optical_flow.c)."""

import numpy as np
import pytest

from aom_av1_lavish_tpu.dsp.flow import (compute_flow,
                                         flow_correspondences,
                                         gaussian_pyramid)


def _texture(h, w, pad=32):
    yy, xx = np.mgrid[0:h + pad, 0:w + pad]
    return (128 + 60 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
            + 20 * np.sin((xx + yy) / 5.0))


def test_pyramid_shapes():
    img = np.zeros((96, 128))
    pyr = gaussian_pyramid(img, 4)
    assert [p.shape for p in pyr] == [(96, 128), (48, 64), (24, 32),
                                      (12, 16)]


@pytest.mark.parametrize("method,tol", [("disflow", 0.2),
                                        ("lucaskanade", 0.2),
                                        ("horn_schunck", 2.5)])
def test_flow_recovers_translation(method, tol):
    base = _texture(128, 160)
    cur = base[8:8 + 128, 8:8 + 160]
    ref = base[5:5 + 128, 5:5 + 160]
    u, v = compute_flow(ref, cur, method=method)
    assert abs(float(np.median(u)) - 3.0) < tol
    assert abs(float(np.median(v)) - 3.0) < tol


def test_flow_global_motion_integration():
    """disflow correspondences drive the affine IRLS fit
    (GLOBAL_MOTION_METHOD_DISFLOW)."""
    from aom_av1_lavish_tpu.bitstream import constants as c
    from aom_av1_lavish_tpu.encoder.global_motion import \
        estimate_global_motion
    base = _texture(144, 176).clip(0, 255).astype(np.uint8)
    cur = base[8:8 + 128, 8:8 + 160]
    ref = base[2:2 + 128, 2:2 + 160]
    wmtype, mat, invalid = estimate_global_motion(cur, ref,
                                                  method="disflow")
    assert not invalid
    assert wmtype == c.TRANSLATION
    # mv = +6 px in both axes at 1/64-pel grid precision
    assert abs(mat[0] / (1 << 16) - 6.0) < 1.0
    assert abs(mat[1] / (1 << 16) - 6.0) < 1.0


def test_flow_correspondence_grid():
    base = _texture(96, 128)
    pts, mvs = flow_correspondences(base[4:100, 4:132],
                                    base[:96, :128], stride=16)
    assert len(pts) > 10 and pts.shape[1] == 2 and mvs.shape == pts.shape

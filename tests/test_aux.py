"""Aux subsystems: external partition API, saliency map, profiler."""

import os
import subprocess

import numpy as np
import pytest

from aom_av1_lavish_tpu.bitstream import constants as c
from aom_av1_lavish_tpu.decoder import decode_ivf
from aom_av1_lavish_tpu.encoder.lossy import (LossyAllIntraEncoder,
                                              encode_lossy_ivf,
                                              make_lossy_frame_header,
                                              make_sequence_header)
from aom_av1_lavish_tpu.utils import profiler

AOMDEC = os.path.join(os.path.dirname(__file__), "..", ".oracle", "build",
                      "aomdec")


def _frame(w, h, seed=0):
    rng = np.random.default_rng(seed)
    y = np.kron(rng.integers(0, 255, (h // 16, w // 16)),
                np.ones((16, 16))).astype(np.uint8)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    return (y, u, u.copy())


@pytest.mark.skipif(not os.path.exists(AOMDEC),
                    reason="aomdec oracle not built")
def test_external_partition_api(tmp_path):
    """aom_ext_part_funcs analog: a callback drives the partition tree
    and the stream stays conformant."""
    w, h = 128, 128   # SB-aligned so the model sees every node
    frame = _frame(w, h)
    calls = []

    def model(mi_row, mi_col, bsize, feats):
        calls.append((mi_row, mi_col, bsize, feats["block_size_px"]))
        # force fixed 32x32 leaves
        return "SPLIT" if bsize > c.BLOCK_32X32 else "NONE"

    sh = make_sequence_header(w, h)
    fh = make_lossy_frame_header(sh, 60)
    enc = LossyAllIntraEncoder(sh, fh)
    enc.ext_partition = model
    payload = enc.encode_frame(frame)
    assert calls and all(f == s for *_, s, f in
                         [(0, 0, x[3], x[3]) for x in calls])
    from aom_av1_lavish_tpu.bitstream.ivf import write_ivf
    ivf = str(tmp_path / "e.ivf")
    write_ivf(ivf, [(payload, 0)], w, h, 30, 1)
    out = str(tmp_path / "e.y4m")
    subprocess.run([AOMDEC, "-o", out, ivf], check=True,
                   capture_output=True)
    ours = decode_ivf(ivf)
    # every coded block must be exactly 32x32 (model was obeyed)
    from aom_av1_lavish_tpu.decoder.inspect import inspect_ivf
    info = inspect_ivf(ivf)[0]
    assert (info.bsize_grid == c.BLOCK_32X32).all(), \
        np.unique(info.bsize_grid)
    assert ours[0][0].shape == (h, w)


def test_saliency_map_rdmult():
    from aom_av1_lavish_tpu.encoder.tune import (saliency_map,
                                                 saliency_rdmult_map)
    rng = np.random.default_rng(0)
    y = np.full((128, 192), 128, np.uint8)
    y[48:80, 96:128] = rng.integers(0, 256, (32, 32))  # salient patch
    sal = saliency_map(y, 16)
    # the textured patch out-salients the flat background
    patch = sal[3:5, 6:8].mean()
    bg = np.delete(sal.ravel(), [3 * 12 + 6, 3 * 12 + 7,
                                 4 * 12 + 6, 4 * 12 + 7]).mean()
    assert patch > 2 * bg
    m = saliency_rdmult_map(y, 16)
    assert m[3:5, 6:8].mean() < 1.0      # salient -> lower lambda
    assert abs(m.mean() - 1.0) < 0.05    # rate-neutral


def test_profiler(tmp_path):
    profiler.reset()
    profiler.enable()
    try:
        w, h = 64, 64
        ivf = str(tmp_path / "p.ivf")
        encode_lossy_ivf(ivf, [_frame(w, h)], w, h, qindex=60)
        decode_ivf(ivf)
    finally:
        profiler.enable(False)
    t = profiler.times()
    assert t.get("encode/tile_walk", 0) > 0
    assert t.get("decode/tile", 0) > 0
    assert t.get("decode/filters", 0) >= 0
    assert "encode/tile_walk" in profiler.report()
    profiler.reset()


def test_frame_parallel_decode(tmp_path):
    """Keyframe-segment frame-parallel decode == serial decode."""
    from aom_av1_lavish_tpu.decoder.parallel import (decode_ivf_parallel,
                                                     split_segments)
    from aom_av1_lavish_tpu.encoder.gop import GopEncoder
    from aom_av1_lavish_tpu.bitstream.ivf import read_ivf, write_ivf

    w, h = 96, 64
    rng = np.random.default_rng(2)
    frames = []
    for i in range(6):
        y = np.kron(rng.integers(0, 255, (h // 16, w // 16)),
                    np.ones((16, 16))).astype(np.uint8)
        u = np.full((h // 2, w // 2), 120, np.uint8)
        frames.append((y, u, u.copy()))
    enc = GopEncoder(w, h, qindex=80, kf_interval=2, gf_length=2,
                     use_arf=False, enable_cdef=False)
    payloads = enc.encode_sequence(frames)
    ivf = str(tmp_path / "g.ivf")
    write_ivf(ivf, [(p, i) for i, p in enumerate(payloads)], w, h, 30, 1)

    tus = [p for p, _ in read_ivf(ivf)]
    assert len(split_segments(tus)) == 3     # kf every 2 frames

    serial = decode_ivf(ivf)
    par = decode_ivf_parallel(ivf, workers=3)
    assert len(par) == len(serial) == 6
    for a, b in zip(par, serial):
        for pa, pb in zip(a, b):
            np.testing.assert_array_equal(pa, pb)


def test_psnrhvs_and_fastssim_metrics():
    """dsp/metrics.py psnrhvs (CSF-weighted DCT MSE + masking,
    aom_dsp/psnrhvs.c) and fastssim (multiscale, aom_dsp/fastssim.c):
    identity = perfect score, monotone in distortion."""
    import numpy as np
    from aom_av1_lavish_tpu.dsp.metrics import fastssim, psnrhvs
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:144, 0:176]
    a = (128 + 60 * np.sin(xx / 9.0) * np.cos(yy / 11.0)).astype(np.uint8)
    assert psnrhvs(a, a) >= 99.0
    assert abs(fastssim(a, a) - 1.0) < 1e-9
    last_p, last_f = 1e9, 2.0
    for amp in (2, 6, 20):
        b = (a.astype(int)
             + rng.integers(-amp, amp + 1, a.shape)).clip(0, 255) \
            .astype(np.uint8)
        p = psnrhvs(a, b)
        f = fastssim(a, b)
        assert p < last_p and f < last_f, (amp, p, f)
        last_p, last_f = p, f

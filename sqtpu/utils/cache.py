"""Persistent XLA compilation cache setup.

Compiles through the axon TPU tunnel take minutes (remote compile); the
persistent cache turns warm restarts of any entry point into seconds.
Called by every CLI before first compilation.
"""

from __future__ import annotations

import os

import jax

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(path: str | None = None,
                             min_secs: float = 5.0) -> str:
    """min_secs: cache-worthiness threshold. 5 s suits the remote-compile
    tunnel; CPU dryruns pass 1.0 (fast compiles, still worth caching for
    the driver's multichip gate)."""
    path = path or os.environ.get("SQTPU_JAX_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_secs)
    return path

"""Persistent XLA compilation cache.

Compiles over the remote TPU link cost 30-300 s per program; the persistent
cache makes them one-time per machine (verified working across processes in
this environment). Enabled by every CLI entry point.
"""

from __future__ import annotations

import os
import os.path as osp


def enable_persistent_cache(path: str = None) -> str:
    import jax

    # CPU AOT cache entries are machine-feature specific and can SIGILL when
    # the compile service and execution host differ — cache only for TPU.
    if jax.default_backend() != "tpu":
        return ""

    path = path or os.environ.get(
        "TEPOSE_JAX_CACHE",
        osp.join(osp.dirname(osp.dirname(osp.dirname(
            osp.abspath(__file__)))), ".jax_cache"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path

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
    # the compile service and execution host differ — default to caching only
    # for TPU. An EXPLICIT path (argument or TEPOSE_JAX_CACHE env) opts in
    # anyway: callers that compile and execute on the same host (the test
    # suite's spawned multi-process/CLI subprocesses, see tests/conftest.py
    # for the same reasoning) set it to the suite's host-local cache so
    # repeat runs skip their dominant compile cost.
    explicit = path or os.environ.get("TEPOSE_JAX_CACHE")
    if jax.default_backend() != "tpu" and not explicit:
        return ""

    path = explicit or osp.join(osp.dirname(osp.dirname(osp.dirname(
        osp.abspath(__file__)))), ".jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path

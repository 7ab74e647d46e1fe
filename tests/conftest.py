"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests run on fake CPU devices per SURVEY.md §4(d); the real
TPU chip is exercised by bench.py / __graft_entry__.py, not the unit suite.
Env vars must be set before jax is imported anywhere.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Make the repo root importable without installation.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var, so force the CPU
# backend explicitly — unit tests must be hermetic and fast; the real chip is
# exercised by bench.py.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

# Persistent XLA compile cache for the suite (VERDICT r3 #8): the heavy tier
# is dominated by re-compiles of identical flagship-shaped programs across
# runs. utils/cache.py gates its cache to TPU because CPU AOT artifacts are
# machine-feature-specific — but here compile and execution happen on THIS
# host in the same process, so a host-local cache dir is safe. Keyed per
# suite (separate dir from the TPU cache) and gitignored.
_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache_cpu")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Two-tier suite (VERDICT r2 #8): `pytest -m "not heavy"` is the ~5-min
# pre-commit tier; the full run (~40 min) adds the compile-heavy engine/CLI/
# multichip suites and the reference-parity suites (which import the
# reference's own torch modules). Classification from measured durations
# (2026-08, --durations=50): every module here has tests >=15 s, dominated
# by jit compiles of flagship-shaped programs.
HEAVY_MODULES = {
    "test_multichip_train", "test_nan_guard", "test_engine",
    "test_golden_model", "test_trainer", "test_evaluate_cli",
    "test_evaluator", "test_strict_precision", "test_preprocess",
    "test_smplify", "test_disc_converter", "test_parity_extras",
    "test_loss", "test_gcn", "test_packing", "test_backbone", "test_models",
    "test_reference_parity", "test_reference_eval_parity",
    "test_reference_grad_parity", "test_reference_data_parity",
    "test_reference_fullscale_parity",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (item.module.__name__ in HEAVY_MODULES
                or "end_to_end" in item.name):
            item.add_marker(pytest.mark.heavy)


@pytest.fixture
def rng():
    return np.random.RandomState(0)

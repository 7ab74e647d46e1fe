"""tepose_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for live-stream
temporally-embedded 3D human body pose and shape estimation.

Re-designed from scratch with the capabilities of the reference PyTorch system
(ostadabbas/TePose): monocular video -> per-frame SMPL parameters (cam 3 +
pose 72 + shape 10 = 85-dim "theta") and derived outputs (6890 mesh vertices,
3D/2D joints), via a causal sliding-window model whose previous predictions are
fed back into the next window ("temporal embedding").

Architecture is idiomatic JAX: pure-functional model cores, pytree parameter
containers, `lax.scan` for all temporal recursion, explicit RNG threading, and
`jax.sharding`/`pjit` for multi-chip scaling. The PyTorch reference is cited in
docstrings as `ref: <file>:<line>` (paths relative to the reference repo root).
"""

__version__ = "0.1.0"

from tepose_tpu import ops  # noqa: F401

"""Multi-chip scaling: mesh construction and sharding helpers.

The reference is strictly single-GPU (SURVEY.md §2.6); the TPU-native design
scales by data-parallel batch sharding over an ICI mesh — model weights are
replicated (the generator is ~50M params) and XLA's GSPMD inserts the psum
collectives for loss/gradient reductions and the discriminator's cross-batch
BatchNorm statistics.
"""

from tepose_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
)

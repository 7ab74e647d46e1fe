"""Low-level math / geometry kernels (layer L0).

ref: lib/utils/geometry.py, lib/utils/eval_utils.py, lib/graph/tools.py
"""

from tepose_tpu.ops.geometry import (  # noqa: F401
    batch_rodrigues,
    quat_to_rotmat,
    rot6d_to_rotmat,
    rotmat_to_rot6d,
    rotmat_to_quat,
    quat_to_angle_axis,
    rotmat_to_angle_axis,
)
from tepose_tpu.ops.procrustes import (  # noqa: F401
    similarity_transform,
    batch_similarity_transform,
)

"""Neural-network models and the SMPL body model (layers L1/L2).

ref: lib/models/ (tepose.py, spin.py, vibe.py, smpl.py,
motion_discriminator_gcn.py + GCN blocks), lib/graph/.
"""

from tepose_tpu.models.smpl import SmplModel, load_smpl_assets  # noqa: F401

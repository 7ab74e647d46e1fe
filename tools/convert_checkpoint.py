#!/usr/bin/env python
"""Convert released PyTorch checkpoints (.pth.tar) to tepose_tpu .npz.

Covers (ref: SURVEY.md §7 stage 3):
  * TePose checkpoints: {'gen_state_dict', 'disc_motion_state_dict',
    'performance', 'epoch', ...} (ref: trainer.py:392-401)
  * VIBE checkpoints: {'gen_state_dict', 'performance'}
  * SPIN checkpoints: {'model': HMR state_dict} — the regressor head and the
    ResNet-50 backbone (spin_model_checkpoint.pth.tar)

Usage:
  python tools/convert_checkpoint.py in.pth.tar out.npz \
      --kind {tepose,vibe,spin}
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--kind", choices=["tepose", "vibe", "spin"],
                    default="tepose")
    args = ap.parse_args()

    import torch  # CPU torch, only needed for conversion

    from tepose_tpu.train.checkpoint import (
        convert_torch_discriminator, convert_torch_generator, save_checkpoint,
        strip_module_prefix)

    ckpt = torch.load(args.src, map_location="cpu", weights_only=False)

    trees = {}
    scalars = {}
    if args.kind in ("tepose", "vibe"):
        sd = ckpt["gen_state_dict"] if "gen_state_dict" in ckpt else ckpt
        trees["gen"] = convert_torch_generator(sd)
        if "disc_motion_state_dict" in ckpt:
            dp, ds = convert_torch_discriminator(
                ckpt["disc_motion_state_dict"])
            trees["disc"] = dp
            trees["disc_state"] = ds
        for k in ("performance", "epoch"):
            if k in ckpt:
                scalars[k] = float(np.asarray(ckpt[k]))
    else:  # spin
        sd = ckpt["model"] if "model" in ckpt else ckpt
        # DataParallel-era checkpoints carry 'module.' prefixes
        # (ref: lib/utils/utils.py:40-45); the tepose/vibe branch strips
        # them inside convert_torch_generator/discriminator
        sd = strip_module_prefix(sd)
        # regressor head (keys fc1/fc2/dec*/init_* at top level in HMR)
        gen = {"regressor": {}}
        for key, val in sd.items():
            parts = key.split(".")
            if parts[0] in ("fc1", "fc2", "decpose", "decshape", "deccam"):
                gen["regressor"].setdefault(parts[0], {})[parts[1]] = \
                    np.asarray(val.cpu().numpy(), np.float32)
            elif parts[0] in ("init_pose", "init_shape", "init_cam"):
                gen["regressor"][parts[0]] = np.asarray(
                    val.cpu().numpy(), np.float32)
        trees["gen"] = gen
        # ResNet-50 backbone for the feature extractor
        from tepose_tpu.models.backbone import convert_torch_resnet50
        trees["backbone"] = convert_torch_resnet50(sd)

    save_checkpoint(args.dst, trees, scalars)
    print(f"wrote {args.dst} ({len(trees)} trees)")


if __name__ == "__main__":
    main()

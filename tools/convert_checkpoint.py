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

Reverse direction (our .npz -> a reference-layout .pth.tar, so weights
trained here can be evaluated/resumed in the reference codebase):
  python tools/convert_checkpoint.py in.npz out.pth.tar --reverse \
      [--like reference_ckpt.pth.tar]
`--like` seeds the output with an existing reference checkpoint's extra
entries (the `regressor.smpl.*` constant buffers the torch module carries,
optimizer/scheduler states) so the reference's STRICT `load_state_dict`
(ref: evaluate.py:124, trainer.py:423) accepts the file; without it the
state dicts contain only the learned weights (load with strict=False).

`convert_forward` / `convert_reverse` are importable (used by
tools/verify_release.py's one-command release verification).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def convert_reverse(src: str, dst: str, like: str = "") -> None:
    """Our .npz checkpoint -> a reference-layout .pth.tar."""
    import torch  # CPU torch, only needed for conversion

    from tepose_tpu.train.checkpoint import (
        export_torch_discriminator, export_torch_generator, load_checkpoint)

    trees, scalars = load_checkpoint(src)

    def to_torch(flat):
        # explicit copy: exported leaves can be views of torch storage
        return {k: torch.from_numpy(np.array(v))
                for k, v in flat.items()}

    base = (torch.load(like, map_location="cpu", weights_only=False)
            if like else {})
    out = dict(base)
    gen_sd = dict(base.get("gen_state_dict", {}))
    gen_sd.update(to_torch(export_torch_generator(trees["gen"])))
    out["gen_state_dict"] = gen_sd
    if "disc" in trees:
        disc_sd = dict(base.get("disc_motion_state_dict", {}))
        disc_sd.update(to_torch(export_torch_discriminator(
            trees["disc"], trees.get("disc_state", {}))))
        out["disc_motion_state_dict"] = disc_sd
    for k in ("performance", "epoch"):
        if k in scalars:
            # the reference stores epoch as an int (trainer.py:394)
            out[k] = int(scalars[k]) if k == "epoch" else scalars[k]
    torch.save(out, dst)
    print(f"wrote {dst} (reference layout"
          f"{', seeded from ' + like if like else ''})")


def convert_forward(src: str, dst: str, kind: str = "tepose") -> None:
    """A reference .pth.tar -> our .npz checkpoint."""
    import torch  # CPU torch, only needed for conversion

    from tepose_tpu.train.checkpoint import (
        convert_torch_discriminator, convert_torch_generator,
        save_checkpoint, strip_module_prefix)

    ckpt = torch.load(src, map_location="cpu", weights_only=False)

    trees = {}
    scalars = {}
    if kind in ("tepose", "vibe"):
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

    save_checkpoint(dst, trees, scalars)
    print(f"wrote {dst} ({len(trees)} trees)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--kind", choices=["tepose", "vibe", "spin"],
                    default="tepose")
    ap.add_argument("--reverse", action="store_true",
                    help="convert our .npz back to a reference .pth.tar")
    ap.add_argument("--like", default="",
                    help="reference checkpoint seeding the reverse output's "
                         "extra entries (smpl buffers, optimizer states)")
    args = ap.parse_args()

    if args.reverse:
        convert_reverse(args.src, args.dst, args.like)
    else:
        convert_forward(args.src, args.dst, args.kind)


if __name__ == "__main__":
    main()

"""Epoch-level training orchestration (the host-side loop around the
device-compiled train segments).

ref: lib/core/trainer.py:362-435 (fit / save_model / resume). Per epoch:
  outer loop over (2D batch, 3D batch) pairs -> one device-resident
  train_segment call of NUM_ITERS_PER_EPOCH windows each; then validation,
  ReduceLROnPlateau on PA-MPJPE, checkpoint + best-copy.
"""

from __future__ import annotations

import os.path as osp
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tepose_tpu.parallel import distributed
from tepose_tpu.train import checkpoint as ckpt
from tepose_tpu.train.optim import ReduceLROnPlateau, get_lr, set_lr
from tepose_tpu.train.validate import validate_epoch
from tepose_tpu.utils.logging import AverageMeter, MetricWriter, create_logger
from tepose_tpu.utils.profiling import NaNGuard


def _as_device(f):
    """Stage a packed flat on device. MeshTreePlacer flats are already
    placed (possibly multi-process global arrays, which device_put must not
    touch — they are not fully addressable); FlatPacker flats are host
    numpy buffers."""
    return f if hasattr(f, "sharding") else jax.device_put(jnp.asarray(f))


class TrainLoop:
    """Host orchestration state; all heavy compute lives in the jitted
    packed train segment (train.trainer.make_packed_train_segment). The
    training carry (params + optimiser states + BN state) lives on device as
    flat packed buffers; the host only unpacks it for validation and
    checkpointing (see utils.packing for why)."""

    def __init__(self, *, cfg, segment_factory, smpl, model_cfg, hp,
                 gen_params, disc_params, disc_state, gen_tx, disc_tx,
                 loaders, j_regressor, logdir: str,
                 num_iters_per_epoch: int, seed: int = 0, faces=None):
        self.cfg = cfg
        self.segment_factory = segment_factory
        self.segment = None           # built lazily at first batch
        self._segment_exec = None     # AOT executable (see train_epoch)
        self._exec_of = None          # the segment the executable came from
        self.carry_packer = None
        self.data_packer = None
        self.carry_flats = None
        self.smpl = smpl
        self.model_cfg = model_cfg
        self.hp = hp
        self.gen_params = gen_params
        self.disc_params = disc_params
        self.disc_state = disc_state
        self.gen_tx, self.disc_tx = gen_tx, disc_tx
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            self.gen_opt = jax.jit(gen_tx.init)(gen_params)
            self.disc_opt = jax.jit(disc_tx.init)(disc_params)
        self.train_2d, self.train_3d, self.disc_loader, self.valid = loaders
        self.j_regressor = j_regressor
        self.faces = faces
        self.logdir = logdir
        self.num_iters = num_iters_per_epoch
        self.writer = MetricWriter(logdir)
        self.logger = create_logger(logdir)

        self.gen_sched = ReduceLROnPlateau(patience=cfg.TRAIN.LR_PATIENCE)
        self.disc_sched = ReduceLROnPlateau(patience=cfg.TRAIN.LR_PATIENCE)
        self.nan_guard = NaNGuard(patience=3)
        self.best_performance = float("inf")
        self.start_epoch = cfg.TRAIN.START_EPOCH
        self.rng = jax.random.PRNGKey(max(seed, 0))
        self.global_step = 0

        if cfg.TRAIN.RESUME:
            self.resume(cfg.TRAIN.RESUME)

    # ---------------------------------------------------------------- epoch

    def _amass_windows(self, disc_iter, num_iters: int,
                       batch_size: int) -> np.ndarray:
        """Pre-sample (num_iters, B, S, 85) real-motion windows for a segment
        (the reference draws one AMASS batch per inner step,
        trainer.py:165-176).

        Multi-process: the disc loader is per-host sharded, so this process
        holds only its `batch_size/P` rows — the mesh placer assembles the
        global (num_iters, B, S, 85) array from all hosts' slices."""
        local = batch_size // distributed.process_count()
        out = np.zeros((num_iters, local, self.hp.seqlen, 85), np.float32)
        for i in range(num_iters):
            batch = next(disc_iter)["theta"]
            out[i] = batch[:local]
        return out

    def _ensure_segment(self, b2, b3, amass) -> None:
        if self.segment is not None:
            return
        carry_template = (self.gen_params, self.disc_params, self.disc_state,
                          self.gen_opt, self.disc_opt)
        data_template = {"batch_2d": b2, "batch_3d": b3, "amass": amass}
        self.segment, self.carry_packer, self.data_packer =             self.segment_factory(carry_template, data_template)
        self.carry_flats = tuple(
            _as_device(f) for f in self.carry_packer.pack_np(carry_template))

    def _push_carry_to_device(self) -> None:
        """Re-pack the (possibly host-mutated) trees into the device carry —
        needed after LR changes or checkpoint restore."""
        if self.carry_packer is None:
            return
        carry = (self.gen_params, self.disc_params, self.disc_state,
                 self.gen_opt, self.disc_opt)
        self.carry_flats = tuple(
            _as_device(f) for f in self.carry_packer.pack_np(carry))

    def _sync_carry_to_host(self) -> None:
        """Fetch the device carry and refresh the host-side pytrees."""
        if self.carry_flats is None:
            return
        flats = [np.asarray(f) for f in self.carry_flats]
        (self.gen_params, self.disc_params, self.disc_state,
         self.gen_opt, self.disc_opt) = self.carry_packer.unpack_np(flats)

    def train_epoch(self, epoch: int, num_outer: int) -> Dict[str, float]:
        it2d = iter(self.train_2d)
        it3d = iter(self.train_3d)
        itd = iter(self.disc_loader)
        losses = AverageMeter()
        t0 = time.time()
        last_metrics = {}

        for i in range(num_outer):
            b2 = next(it2d)
            b3 = next(it3d)
            amass = self._amass_windows(
                itd, self.num_iters, self.hp.n_2d + self.hp.n_3d)
            self._ensure_segment(b2, b3, amass)
            data_flats = tuple(
                _as_device(f) for f in self.data_packer.pack_np(
                    {"batch_2d": b2, "batch_3d": b3, "amass": amass}))
            self.rng, k = jax.random.split(self.rng)
            if self._segment_exec is None or self._exec_of is not self.segment:
                # AOT-compile, line up over the coordination service, THEN
                # execute: the first execution creates the cross-process
                # gloo communicators, whose rendezvous has a hard 30 s
                # deadline — with warm compile caches one process can
                # otherwise reach it while a sibling is still compiling
                # (single-process: the barrier is a no-op and the AOT
                # compile is just the normal first-call compile). Segment
                # stand-ins without .lower (tests) are called directly.
                if hasattr(self.segment, "lower"):
                    self._segment_exec = self.segment.lower(
                        self.carry_flats, data_flats, k).compile()
                    distributed.service_barrier("first_train_segment")
                else:
                    self._segment_exec = self.segment
                self._exec_of = self.segment
            self.carry_flats, mvec = self._segment_exec(self.carry_flats,
                                                        data_flats, k)
            mvec = np.asarray(mvec)
            names = self.segment.metric_names()
            last_metrics = dict(zip(names, mvec.tolist()))
            if np.isfinite(last_metrics["gen_loss"]):
                # a single NaN segment would poison the meter for the rest
                # of the epoch even after NaNGuard rolls back successfully
                losses.update(last_metrics["gen_loss"])
            self.writer.add_scalars(last_metrics, self.global_step,
                                    prefix="train_loss/")
            if self.cfg.DEBUG and \
                    self.global_step % max(self.cfg.DEBUG_FREQ, 1) == 0:
                self._debug_visualize(b3, epoch)
            self.global_step += 1
            if not self.nan_guard.check(float(last_metrics["gen_loss"]),
                                        self.global_step):
                self.logger.info(
                    f"NaNGuard: {self.nan_guard.consecutive} consecutive "
                    f"non-finite segments ({last_metrics}) — rolling back")
                self._rollback()
            elif not np.isfinite(last_metrics["gen_loss"]):
                self.logger.info(f"NaN loss at segment {i}: {last_metrics}")
        self.logger.info(
            f"Epoch {epoch + 1} train: loss {losses.avg:.2f} "
            f"({time.time() - t0:.1f}s, {num_outer} segments x "
            f"{self.num_iters} windows)")
        return last_metrics

    def _debug_visualize(self, batch_3d, epoch: int) -> None:
        """Prediction-mesh debug grid for the current 3D batch: run the
        *current* generator over the batch's first windows and overlay the
        predicted skeleton + mesh with the GT skeleton (ref: trainer.py:
        272-279 -> vis.py:330-382; without image crops in the feature-based
        batches, overlays draw on blank canvases)."""
        if not distributed.is_primary():
            return  # debug artifacts are primary-owned files
        try:
            import cv2

            from tepose_tpu.models.tepose import tepose_apply
            from tepose_tpu.utils.vis import batch_visualize_vid_preds

            self._sync_carry_to_host()
            gen = jax.tree_util.tree_map(jnp.asarray, self.gen_params)
            S = self.hp.seqlen
            n = min(4, int(np.asarray(batch_3d["features"]).shape[0]))
            feats = np.asarray(batch_3d["features"])[:n]
            pseu = np.asarray(batch_3d["theta_pseu"])[:n]
            kp2d_gt = np.asarray(batch_3d["kp_2d"])[:n]
            W = min(8, feats.shape[1] - S + 1)

            preds = {"theta": [], "kp_2d": [], "verts": []}
            for j in range(W):  # pseudo-theta feedback: debug-only rollout
                fb = np.concatenate(
                    [pseu[:, j:j + S - 1], np.zeros((n, 1, 85), np.float32)],
                    axis=1)
                x = np.concatenate([feats[:, j:j + S], fb], axis=-1)
                out = tepose_apply(gen, self.smpl, jnp.asarray(x),
                                   self.model_cfg)
                for k in preds:
                    preds[k].append(np.asarray(out[k]))
            preds = {k: np.stack(v, axis=1) for k, v in preds.items()}

            video = np.zeros((n, W, 224, 224, 3), np.uint8)
            target = {"kp_2d": kp2d_gt[:, S - 1:S - 1 + W]}
            grid = batch_visualize_vid_preds(video, preds, target,
                                             self.faces, max_items=n)

            path = osp.join(self.logdir,
                            f"debug_epoch{epoch:03d}_"
                            f"step{self.global_step:06d}.mp4")
            h, w = grid.shape[1:3]
            wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 5,
                                 (w, h))
            for f in grid:
                wr.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
            wr.release()
        except Exception as e:  # visualization must never kill training
            self.logger.info(f"debug visualization failed: {e}")

    def _rollback(self) -> None:
        """Restore the last saved checkpoint after persistent non-finite
        losses (the reference only prints on NaN, trainer.py:285-287).
        Raises if no checkpoint exists yet — better to halt than to keep
        training a poisoned model."""
        path = osp.join(self.logdir, "checkpoint.npz")
        if not osp.isfile(path):
            raise RuntimeError(
                "NaNGuard: losses stayed non-finite for "
                f"{self.nan_guard.consecutive} segments and no checkpoint "
                "exists to roll back to — halting")
        trees, _ = ckpt.load_checkpoint(path)
        self.gen_params = jax.tree_util.tree_map(jnp.asarray, trees["gen"])
        self.disc_params = jax.tree_util.tree_map(jnp.asarray, trees["disc"])
        self.disc_state = jax.tree_util.tree_map(jnp.asarray,
                                                 trees["disc_state"])
        if "gen_opt" in trees:
            self.gen_opt = _tree_to_opt(trees["gen_opt"], self.gen_opt)
            self.disc_opt = _tree_to_opt(trees["disc_opt"], self.disc_opt)
        self._push_carry_to_device()
        self.nan_guard = NaNGuard(self.nan_guard.patience)
        self.logger.info(f"NaNGuard: restored parameters from '{path}'")

    def validate(self) -> Dict[str, float]:
        self._sync_carry_to_host()
        gen = jax.tree_util.tree_map(jnp.asarray, self.gen_params)
        it = iter(self.valid)
        n_batches = len(self.valid)
        return validate_epoch(
            gen, self.smpl, self.model_cfg,
            (next(it) for _ in range(n_batches)),
            self.j_regressor, self.hp.seqlen)

    # ---------------------------------------------------------------- fit

    def fit(self, end_epoch: int, num_outer: int) -> None:
        for epoch in range(self.start_epoch, end_epoch):
            self.train_epoch(epoch, num_outer)
            perf_dict = self.validate()
            performance = perf_dict["pa-mpjpe"]
            self.writer.add_scalars(perf_dict, epoch, prefix="error/")
            self.logger.info(
                "Epoch %d eval: %s",
                epoch + 1,
                " ".join(f"{k.upper()}: {v:.4f}," for k, v in
                         perf_dict.items()))

            old_lr = get_lr(self.gen_opt)
            lr = self.gen_sched.step(performance, old_lr)
            dlr = self.disc_sched.step(performance, get_lr(self.disc_opt))
            if lr != old_lr or dlr != get_lr(self.disc_opt):
                self.gen_opt = set_lr(self.gen_opt, lr)
                self.disc_opt = set_lr(self.disc_opt, dlr)
                self._push_carry_to_device()
            self.writer.add_scalar("lr/gen_lr", lr, epoch)
            self.writer.add_scalar("lr/dis_lr", dlr, epoch)

            self.save(epoch, performance)
        self.writer.close()

    # ---------------------------------------------------------------- ckpt

    def save(self, epoch: int, performance: float) -> None:
        self._sync_carry_to_host()
        path = osp.join(self.logdir, "checkpoint.npz")
        # update best BEFORE the (single) save so the written metadata is
        # final — a second full-npz rewrite just to refresh one scalar
        # would double the checkpoint I/O on every improving epoch.
        # Every process tracks best_performance (metrics are replicated),
        # but only the primary writes the shared-filesystem artifacts.
        is_best = performance < self.best_performance
        if is_best:
            self.best_performance = performance
        if distributed.is_primary():
            ckpt.save_checkpoint(
                path,
                {"gen": self.gen_params, "disc": self.disc_params,
                 "disc_state": self.disc_state,
                 "gen_opt": _opt_to_tree(self.gen_opt),
                 "disc_opt": _opt_to_tree(self.disc_opt)},
                {"epoch": epoch, "performance": self.best_performance,
                 "gen_sched": self.gen_sched.state_dict(),
                 "disc_sched": self.disc_sched.state_dict()})
            if is_best:
                self.logger.info("Best performance achieved, saving it!")
                ckpt.mark_best(self.logdir)
                with open(osp.join(self.logdir, "best.txt"), "w") as f:
                    f.write(str(float(performance)))
        # readers (NaNGuard rollback on any process) must never see a
        # half-written checkpoint
        distributed.barrier("checkpoint_saved")

    def resume(self, path: str) -> None:
        if not osp.isfile(path):
            self.logger.info(f"=> no checkpoint found at '{path}'")
            return
        trees, scalars = ckpt.load_checkpoint(path)
        self.gen_params = jax.tree_util.tree_map(jnp.asarray, trees["gen"])
        self.disc_params = jax.tree_util.tree_map(jnp.asarray, trees["disc"])
        self.disc_state = jax.tree_util.tree_map(jnp.asarray,
                                                 trees["disc_state"])
        if "gen_opt" in trees:
            self.gen_opt = _tree_to_opt(trees["gen_opt"], self.gen_opt)
            self.disc_opt = _tree_to_opt(trees["disc_opt"], self.disc_opt)
        # force re-pack of the device carry from the restored host trees
        self.segment = None
        self._segment_exec = None
        self.carry_flats = None
        self.start_epoch = int(scalars.get("epoch", -1)) + 1
        self.best_performance = float(scalars.get("performance",
                                                  float("inf")))
        if "gen_sched" in scalars:
            self.gen_sched.load_state_dict(scalars["gen_sched"])
            self.disc_sched.load_state_dict(scalars["disc_sched"])
        self.logger.info(
            f"=> loaded checkpoint '{path}' (epoch {self.start_epoch}, "
            f"performance {self.best_performance})")


def _opt_to_tree(opt_state):
    """Serialise an optax inject_hyperparams state to a plain pytree."""
    flat, _ = jax.tree_util.tree_flatten(opt_state)
    return {"leaves": list(flat)}


def _tree_to_opt(tree, template):
    flat_t, treedef = jax.tree_util.tree_flatten(template)
    leaves = [jnp.asarray(x) for x in tree["leaves"]]
    assert len(leaves) == len(flat_t), "optimizer state shape mismatch"
    return jax.tree_util.tree_unflatten(treedef, leaves)

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

from tepose_tpu.train import checkpoint as ckpt
from tepose_tpu.train.optim import ReduceLROnPlateau, get_lr, set_lr
from tepose_tpu.train.validate import validate_epoch
from tepose_tpu.utils.logging import AverageMeter, MetricWriter, create_logger


class TrainLoop:
    """Host orchestration state; all heavy compute lives in the jitted
    train_segment built by train.trainer.make_train_segment."""

    def __init__(self, *, cfg, train_segment, smpl, model_cfg, hp,
                 gen_params, disc_params, disc_state, gen_tx, disc_tx,
                 loaders, j_regressor, logdir: str,
                 num_iters_per_epoch: int, seed: int = 0):
        self.cfg = cfg
        self.segment = train_segment
        self.smpl = smpl
        self.model_cfg = model_cfg
        self.hp = hp
        self.gen_params = gen_params
        self.disc_params = disc_params
        self.disc_state = disc_state
        self.gen_tx, self.disc_tx = gen_tx, disc_tx
        self.gen_opt = jax.jit(gen_tx.init)(gen_params)
        self.disc_opt = jax.jit(disc_tx.init)(disc_params)
        self.train_2d, self.train_3d, self.disc_loader, self.valid = loaders
        self.j_regressor = j_regressor
        self.logdir = logdir
        self.num_iters = num_iters_per_epoch
        self.writer = MetricWriter(logdir)
        self.logger = create_logger(logdir)

        self.gen_sched = ReduceLROnPlateau(patience=cfg.TRAIN.LR_PATIENCE)
        self.disc_sched = ReduceLROnPlateau(patience=cfg.TRAIN.LR_PATIENCE)
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
        trainer.py:165-176)."""
        out = np.zeros((num_iters, batch_size, self.hp.seqlen, 85),
                       np.float32)
        for i in range(num_iters):
            batch = next(disc_iter)["theta"]
            out[i] = batch[:batch_size]
        return out

    def train_epoch(self, epoch: int, num_outer: int) -> Dict[str, float]:
        it2d = iter(self.train_2d)
        it3d = iter(self.train_3d)
        itd = iter(self.disc_loader)
        losses = AverageMeter()
        t0 = time.time()
        last_metrics = {}

        for i in range(num_outer):
            b2 = {k: jnp.asarray(v) for k, v in next(it2d).items()}
            b3 = {k: jnp.asarray(v) for k, v in next(it3d).items()}
            amass = jnp.asarray(self._amass_windows(
                itd, self.num_iters, self.hp.n_2d + self.hp.n_3d))
            self.rng, k = jax.random.split(self.rng)
            (self.gen_params, self.disc_params, self.disc_state,
             self.gen_opt, self.disc_opt, metrics) = self.segment(
                self.gen_params, self.disc_params, self.disc_state,
                self.gen_opt, self.disc_opt, b2, b3, amass, k)
            last_metrics = {k_: float(v) for k_, v in metrics.items()}
            losses.update(last_metrics["gen_loss"])
            self.writer.add_scalars(last_metrics, self.global_step,
                                    prefix="train_loss/")
            self.global_step += 1
            if not np.isfinite(last_metrics["gen_loss"]):
                self.logger.info(f"NaN loss at segment {i}: {last_metrics}")
        self.logger.info(
            f"Epoch {epoch + 1} train: loss {losses.avg:.2f} "
            f"({time.time() - t0:.1f}s, {num_outer} segments x "
            f"{self.num_iters} windows)")
        return last_metrics

    def validate(self) -> Dict[str, float]:
        it = iter(self.valid)
        n_batches = len(self.valid)
        return validate_epoch(
            self.gen_params, self.smpl, self.model_cfg,
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

            lr = self.gen_sched.step(performance, get_lr(self.gen_opt))
            self.gen_opt = set_lr(self.gen_opt, lr)
            dlr = self.disc_sched.step(performance, get_lr(self.disc_opt))
            self.disc_opt = set_lr(self.disc_opt, dlr)
            self.writer.add_scalar("lr/gen_lr", lr, epoch)
            self.writer.add_scalar("lr/dis_lr", dlr, epoch)

            self.save(epoch, performance)
        self.writer.close()

    # ---------------------------------------------------------------- ckpt

    def save(self, epoch: int, performance: float) -> None:
        path = osp.join(self.logdir, "checkpoint.npz")
        ckpt.save_checkpoint(
            path,
            {"gen": self.gen_params, "disc": self.disc_params,
             "disc_state": self.disc_state,
             "gen_opt": _opt_to_tree(self.gen_opt),
             "disc_opt": _opt_to_tree(self.disc_opt)},
            {"epoch": epoch, "performance": self.best_performance,
             "gen_sched": self.gen_sched.state_dict(),
             "disc_sched": self.disc_sched.state_dict()})
        if performance < self.best_performance:
            self.logger.info("Best performance achieved, saving it!")
            self.best_performance = performance
            # refresh metadata before copying
            ckpt.save_checkpoint(
                path,
                {"gen": self.gen_params, "disc": self.disc_params,
                 "disc_state": self.disc_state,
                 "gen_opt": _opt_to_tree(self.gen_opt),
                 "disc_opt": _opt_to_tree(self.disc_opt)},
                {"epoch": epoch, "performance": self.best_performance,
                 "gen_sched": self.gen_sched.state_dict(),
                 "disc_sched": self.disc_sched.state_dict()})
            ckpt.mark_best(self.logdir)
            with open(osp.join(self.logdir, "best.txt"), "w") as f:
                f.write(str(float(performance)))

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

"""The TePose training engine, TPU-first.

ref: lib/core/trainer.py:39-503. The reference's Python inner loop over
sliding windows (trainer.py:163-247) — window assembly, scheduled sampling,
theta ring-buffer feedback, generator backprop and cadenced discriminator
updates — is compiled into a single `lax.scan` over the window index, so one
device launch executes a whole (outer-batch x NUM_ITERS_PER_EPOCH) training
segment with zero host round-trips.

Design notes:
  * One combined backward pass serves both nets: the generator's adversarial
    term sees stop-gradient(disc params) and the discriminator terms see
    stop-gradient(fake motion), so `jax.grad` of the summed scalar w.r.t.
    (gen_params, disc_params) yields exactly the two updates the reference
    computes with two separate `.backward()` calls (trainer.py:235-242).
  * Dynamic row filtering (window validity, w_smpl gating) is masked-mean
    arithmetic (see train.loss) + row-masked BatchNorm stats (see
    models.gcn.bn_apply) — numerically identical, statically shaped.
  * The discriminator update fires only when `j % update_steps == 0` AND the
    motion loss is nonzero (ref: trainer.py:239), via `lax.cond` so skipped
    steps leave optimiser state untouched like the reference.
  * Scheduled sampling draws (`bernoulli(update_theta_rate)`,
    trainer.py:135,183) use the carried PRNG key; 2D rows are forced to
    pseudo-theta across clip-channel switches (trainer.py:185-186).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from tepose_tpu.models.gcn import BN_MOMENTUM, motion_discriminator_apply
from tepose_tpu.models.smpl import SmplModel
from tepose_tpu.models.tepose import TePoseConfig, tepose_apply
from tepose_tpu.train.loss import LossWeights, tepose_loss


@dataclasses.dataclass(frozen=True)
class TrainHyper:
    """Static training hyperparameters baked into the compiled step."""

    seqlen: int = 6
    n_2d: int = 19               # 2D rows per batch (BATCH_SIZE*DATA_2D_RATIO)
    n_3d: int = 13
    update_theta_rate: float = 0.9
    disc_update_steps: int = 1
    num_gcn_scales: int = 13
    num_g3d_scales: int = 6
    # Mixed-precision compute: "bfloat16" casts both nets' params and the
    # window inputs to bf16 for the fused forward+backward while master
    # weights, optimiser state, theta feedback and BN running stats stay
    # f32 (grads come back f32 through the cast's transpose). Keypoint/SMPL
    # loss reductions run f32 via promotion against the f32 targets; the
    # LSGAN scalar reductions and the discriminator GAP run in bf16 (their
    # scalars are cast back afterwards — bounded by the gradient-parity
    # test). At batch 32 the GRU/GCN matmuls are weight-streaming bound,
    # so halving weight bytes is the measured throughput knob; the f32
    # default is exact reference parity.
    compute_dtype: Optional[str] = None
    # Share the fake-motion discriminator FORWARD between the generator's
    # adversarial pass and the discriminator's fake pass via a
    # cotangent-routing custom_vjp (gradients mathematically identical,
    # pinned by test_shared_fake_disc_grad_parity; BN running stats get
    # the reference's double-EMA update via an exact affine composition).
    # Motivation: XLA's CPU cost model shows the duplicated fake forward
    # is NOT CSE'd (2 passes compile to 2.03x the FLOPs of 1). MEASURED
    # OUTCOME on the v5e, fast tier: 64.05 vs 64.18 wps — a no-op; the
    # saved forward hides entirely under the step's other latency (the
    # same effect that makes the generator backward ~free there, see
    # BENCH_NOTES fast-tier attribution). Default OFF: the two-call
    # structure mirrors the reference and costs nothing measurable.
    share_fake_disc: bool = False


def _slice_t(x: jnp.ndarray, j, size: int, axis: int) -> jnp.ndarray:
    return jax.lax.dynamic_slice_in_dim(x, j, size, axis=axis)


def _make_shared_fake_disc(num_gcn_scales: int, num_g3d_scales: int):
    """One discriminator forward serving both fake-motion loss terms.

    Returns shared(disc_params, x, state, mask) -> (v_gen, v_disc, new_state)
    where v_gen and v_disc are the SAME forward value, but backward routes
    v_gen's cotangent to `x` only (the generator's adversarial path, ref
    loss.py:143-147 with frozen disc) and v_disc's cotangent to
    `disc_params` only (the discriminator's fake term, ref loss.py:150 with
    detached input). Equivalent to calling the discriminator twice with the
    respective stop_gradients — which is what the reference executes — at
    one forward instead of two. state/mask receive zero cotangents (BN
    running stats and data masks are not differentiated, matching torch
    buffer semantics).
    """

    def apply_(dp, x, state, mask):
        return motion_discriminator_apply(
            dp, state, x, num_gcn_scales=num_gcn_scales,
            num_g3d_scales=num_g3d_scales, train=True, row_mask=mask)

    @jax.custom_vjp
    def shared(dp, x, state, mask):
        v, new_s = apply_(dp, x, state, mask)
        return v, v, new_s

    def shared_fwd(dp, x, state, mask):
        (v, new_s), vjp_fn = jax.vjp(apply_, dp, x, state, mask)
        zeros = jax.tree_util.tree_map(jnp.zeros_like, (state, mask))
        return (v, v, new_s), (vjp_fn, zeros)

    def shared_bwd(res, cts):
        vjp_fn, (zstate, zmask) = res
        ct_gen, ct_disc, ct_state = cts
        zeros_state = jax.tree_util.tree_map(jnp.zeros_like, ct_state)
        # adversarial path: only the input's gradient survives (XLA DCEs
        # the unused dW matmuls), exactly like the frozen-params call
        _, dx, _, _ = vjp_fn((ct_gen, zeros_state))
        # fake path: only the params' gradient survives
        ddp, _, _, _ = vjp_fn((ct_disc, ct_state))
        return ddp, dx, zstate, zmask

    shared.defvjp(shared_fwd, shared_bwd)
    return shared


def assemble_window(batch_2d: Dict, batch_3d: Dict, theta_buf: jnp.ndarray,
                    j, hp: TrainHyper, rng: jax.Array):
    """Build the (B, S, 2133) window input for step j.

    ref: trainer.py:178-199. Returns (inp, new_theta_buf, update_mask, valid,
    targets dict).
    """
    S = hp.seqlen

    # ---- 2D rows: two parallel clip channels, pick the active one ----------
    # switch_id (B2, 2, VIDLEN) marks the active channel per frame.
    sel = jax.lax.dynamic_index_in_dim(
        batch_2d["switch_id"], j + S - 1, axis=2, keepdims=False)  # (B2, 2)
    feats2_win = _slice_t(batch_2d["features"], j, S, axis=2)  # (B2,2,S,2048)
    feats2 = jnp.einsum("bc,bcsf->bsf", sel, feats2_win)
    pseu2_full = _slice_t(batch_2d["theta_pseu"], j, S - 1, axis=2)
    pseu2 = jnp.einsum("bc,bcsf->bsf", sel, pseu2_full)        # (B2,S-1,85)

    # scheduled sampling is forced OFF at channel switches (trainer.py:185)
    prev_idx = jnp.maximum(j + S - 2, S - 1)
    sw_now = jax.lax.dynamic_index_in_dim(
        batch_2d["switch_id"][:, 0], j + S - 1, axis=1, keepdims=False)
    sw_prev = jax.lax.dynamic_index_in_dim(
        batch_2d["switch_id"][:, 0], prev_idx, axis=1, keepdims=False)
    switch_2d = 1.0 - jnp.abs(sw_now - sw_prev)                # (B2,)

    # ---- 3D rows ----------------------------------------------------------
    feats3 = _slice_t(batch_3d["features"], j, S, axis=1)      # (B3,S,2048)
    pseu3 = _slice_t(batch_3d["theta_pseu"], j, S - 1, axis=1)  # (B3,S-1,85)

    feats = jnp.concatenate([feats2, feats3], axis=0)          # (B,S,2048)
    pseu = jnp.concatenate([pseu2, pseu3], axis=0)             # (B,S-1,85)

    # ---- scheduled sampling draw (trainer.py:183-186) ---------------------
    bern = jax.random.bernoulli(
        rng, hp.update_theta_rate, (hp.n_2d + hp.n_3d,)).astype(jnp.float32)
    force = jnp.concatenate([switch_2d, jnp.ones((hp.n_3d,))])
    update = bern * force                                      # (B,)

    # rows with update==0 fall back to pseudo-theta AND reset the ring buffer
    # (trainer.py:193,196)
    u = update[:, None, None]
    theta_buf = jnp.where(u > 0, theta_buf, pseu)

    inp = jnp.concatenate(
        [feats,
         jnp.concatenate([theta_buf,
                          jnp.zeros_like(theta_buf[:, :1])], axis=1)],
        axis=-1)                                               # (B,S,2133)

    vidlen = jnp.concatenate(
        [batch_2d["vidlen_each"], batch_3d["vidlen_each"]]).reshape(-1)
    valid = (j < (vidlen - S + 1)).astype(jnp.float32)         # (B,)

    # ---- last-frame supervision targets (trainer.py:205-213) --------------
    t = j + S - 1
    kp2d_2 = jax.lax.dynamic_index_in_dim(batch_2d["kp_2d"], t, 1, False)
    kp2d_3 = jax.lax.dynamic_index_in_dim(batch_3d["kp_2d"], t, 1, False)
    kp_2d_gt = jnp.concatenate([kp2d_2, kp2d_3], axis=0)       # (B,49,3)
    targets = {
        "kp_2d": jnp.tile(kp_2d_gt[:, None], (1, 2, 1, 1)),
        "kp_3d": jnp.tile(jax.lax.dynamic_index_in_dim(
            batch_3d["kp_3d"], t, 1, False)[:, None], (1, 2, 1, 1)),
        "theta": jnp.tile(jax.lax.dynamic_index_in_dim(
            batch_3d["theta"], t, 1, False)[:, None], (1, 2, 1)),
        "w_3d": jax.lax.dynamic_index_in_dim(batch_3d["w_3d"], t, 1, False),
        "w_smpl": jax.lax.dynamic_index_in_dim(
            batch_3d["w_smpl"], t, 1, False),
    }
    return inp, theta_buf, update, valid, targets


def make_train_segment(
    smpl: SmplModel,
    model_cfg: TePoseConfig,
    hp: TrainHyper,
    gen_tx: optax.GradientTransformation,
    disc_tx: optax.GradientTransformation,
    weights: LossWeights,
    num_iters: int,
    mode: str = "full",
    ablate: Optional[str] = None,
):
    """Build the jitted function running `num_iters` windows of GAN training
    over one (2D batch, 3D batch) pair entirely on device.

    Returns fn(gen_params, disc_params, disc_state, gen_opt, disc_opt,
               batch_2d, batch_3d, amass_theta, rng)
        -> (gen_params, disc_params, disc_state, gen_opt, disc_opt, metrics)

    amass_theta: (num_iters, B, S, 85) pre-sampled real-motion windows
    (the reference draws a fresh AMASS batch per inner step, trainer.py:165).

    mode: "full" (train), or the measurement ablations used by
    tools/bench_notes.py's train-time breakdown — "forward" runs only the
    loss values (no backward, no updates) and "grad" runs forward+backward
    but skips the optimizer (gradients kept alive by a full square-reduce
    so XLA can neither dead-code nor slice-through the backward — see the
    mode=="grad" comment below). Both keep the exact window assembly and
    theta-ring recurrence of the real step.

    ablate: measurement-only component excision for the per-component
    attribution (bench_notes `breakdown_fast`): "disc" replaces the
    3 motion-discriminator passes with a zero surrogate (XLA dead-codes
    the whole GCN, forward AND backward; the LSGAN scalar plumbing, window
    assembly and every other component stay live) so full-vs-ablated
    interleaved deltas measure the discriminator's in-situ cost. Never
    used for real training.
    """
    if mode not in ("full", "grad", "forward"):
        raise ValueError(f"unknown mode {mode!r}")
    if ablate not in (None, "disc"):
        raise ValueError(f"unknown ablate {ablate!r}")
    S = hp.seqlen
    cd = jnp.dtype(hp.compute_dtype) if hp.compute_dtype else None

    def _cast_floats(tree, dtype):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

    def losses_fn(gen_params, disc_params, disc_state, inp, targets, valid,
                  theta_buf, amass, rng):
        if cd is not None:
            # differentiating THROUGH the casts returns f32 grads for the
            # f32 master params; inputs to every big matmul go bf16 so the
            # weights stream at half width. theta_buf/amass feed the
            # bf16 discriminator via concat, so they must match its dtype
            # or promotion silently upcasts the GCN back to f32.
            gen_params = _cast_floats(gen_params, cd)
            disc_params = _cast_floats(disc_params, cd)
            inp = inp.astype(cd)
            theta_buf = theta_buf.astype(cd)
            amass = amass.astype(cd)
        # vertex-free joints: the loss never reads verts (loss.py:59-171).
        # Step time is unchanged (XLA already DCE'd the unused skinning
        # tensor through jax.grad — measured 101.8 vs 104.0 windows/s on
        # v5e), but the explicit reduced path keeps the training graph
        # honest and independent of compiler pruning.
        preds = tepose_apply(gen_params, smpl, inp, model_cfg, train=True,
                             rng=rng, compute_verts=False)

        # Threaded discriminator state across the 3 passes (enc, fake, real),
        # in the reference's order (loss.py:143-150).
        state_box = {"s": disc_state}

        def disc_fn_gen(x, mask):
            # generator pass: no grads into disc params
            frozen = jax.tree_util.tree_map(jax.lax.stop_gradient, disc_params)
            val, new_s = motion_discriminator_apply(
                frozen, state_box["s"], x,
                num_gcn_scales=hp.num_gcn_scales,
                num_g3d_scales=hp.num_g3d_scales, train=True, row_mask=mask)
            state_box["s"] = new_s
            return val

        def disc_fn_disc(x, mask):
            val, new_s = motion_discriminator_apply(
                disc_params, state_box["s"], x,
                num_gcn_scales=hp.num_gcn_scales,
                num_g3d_scales=hp.num_g3d_scales, train=True, row_mask=mask)
            state_box["s"] = new_s
            return val

        calls = {"n": 0}

        if ablate == "disc":
            def disc_fn(x, mask):
                return x[:, 0, 0] * 0.0
        elif hp.share_fake_disc:
            shared = _make_shared_fake_disc(hp.num_gcn_scales,
                                            hp.num_g3d_scales)
            cache = {}

            def disc_fn(x, mask):
                calls["n"] += 1
                if calls["n"] == 1:
                    # one forward serves the adversarial AND fake terms;
                    # the 2nd call's argument is stop_gradient(pred_motion)
                    # == this x by value (loss.py builds both from
                    # pred_motion), so returning the cached twin is exact
                    v_gen, v_disc, s1 = shared(disc_params, x,
                                               state_box["s"], mask)
                    # the reference pushes the fake batch through BN twice,
                    # so running stats advance by TWO EMA steps of the same
                    # batch mean/var: s2 = s1 + (1-m)(s1-s0), exactly s1
                    # for untouched leaves (the adjacency constants)
                    s0 = state_box["s"]
                    state_box["s"] = jax.tree_util.tree_map(
                        lambda a1, a0: a1 + (1.0 - BN_MOMENTUM) * (a1 - a0),
                        s1, s0)
                    cache["v_disc"] = v_disc
                    return v_gen
                if calls["n"] == 2:
                    return cache.pop("v_disc")
                return disc_fn_disc(x, mask)
        else:
            def disc_fn(x, mask):
                calls["n"] += 1
                # 1st call = generator adversarial pass; 2nd/3rd = disc
                # update
                return disc_fn_gen(x, mask) if calls["n"] == 1 \
                    else disc_fn_disc(x, mask)

        gen_loss, dis_loss, ld = tepose_loss(
            preds, kp_2d_gt=targets["kp_2d"], kp_3d_gt=targets["kp_3d"],
            theta_gt=targets["theta"], w_3d=targets["w_3d"],
            w_smpl=targets["w_smpl"], valid=valid, n_2d=hp.n_2d,
            prev_thetas=jax.lax.stop_gradient(theta_buf),
            real_motion=amass, disc_fn=disc_fn, weights=weights)

        mean_theta = jax.lax.stop_gradient(preds["theta"].mean(axis=1))
        if cd is not None:
            # back to f32 at the boundary: mean_theta feeds the f32 theta
            # ring buffer (scan carry), and the pure-GAN scalars
            # (dis_loss, ld's d_* entries) are bf16 — the keypoint/SMPL
            # terms are already f32 by promotion against f32 targets, and
            # bn_apply keeps running stats f32, so disc_state needs no
            # cast.
            mean_theta = mean_theta.astype(jnp.float32)
            gen_loss = gen_loss.astype(jnp.float32)
            dis_loss = dis_loss.astype(jnp.float32)
            ld = _cast_floats(ld, jnp.float32)
        combined = (gen_loss + dis_loss).astype(jnp.float32)
        return combined, (gen_loss, dis_loss, ld, state_box["s"], mean_theta)

    grad_fn = jax.grad(losses_fn, argnums=(0, 1), has_aux=True)

    def window_step(carry, xs):
        (gen_params, disc_params, disc_state, gen_opt, disc_opt, theta_buf,
         batch_2d, batch_3d) = carry
        j, amass, rng = xs
        k_samp, k_drop = jax.random.split(rng)

        inp, theta_buf, _, valid, targets = assemble_window(
            batch_2d, batch_3d, theta_buf, j, hp, k_samp)

        metrics_extra = {}
        if mode == "forward":
            _, (gen_loss, dis_loss, ld, disc_state, mean_theta) = losses_fn(
                gen_params, disc_params, disc_state, inp, targets, valid,
                theta_buf, amass, k_drop)
        else:
            (g_gen, g_disc), (gen_loss, dis_loss, ld, disc_state,
                              mean_theta) = \
                grad_fn(gen_params, disc_params, disc_state, inp, targets,
                        valid, theta_buf, amass, k_drop)

        if mode == "full":
            any_valid = valid.sum() > 0

            # generator step (skipped entirely when no window is valid,
            # ref: trainer.py:201)
            def gen_update(args):
                gp, go = args
                updates, go = gen_tx.update(g_gen, go, gp)
                return optax.apply_updates(gp, updates), go

            gen_params, gen_opt = jax.lax.cond(
                any_valid, gen_update, lambda a: a, (gen_params, gen_opt))

            # discriminator step on cadence with nonzero loss
            # (trainer.py:239-242)
            do_disc = (any_valid & (j % hp.disc_update_steps == 0)
                       & (dis_loss != 0))

            def disc_update(args):
                dp, do = args
                updates, do = disc_tx.update(g_disc, do, dp)
                return optax.apply_updates(dp, updates), do

            disc_params, disc_opt = jax.lax.cond(
                do_disc, disc_update, lambda a: a, (disc_params, disc_opt))
        elif mode == "grad":
            # Keep the backward alive with a full square-reduce over every
            # gradient leaf. The previous barrier + one-element read was
            # UNFALSIFIABLE: dW[0,0] = x[:,0].dy[:,0] needs only one
            # column, so XLA slicing through the barrier could not be
            # ruled out when the measured backward came out near-zero.
            # The square-reduce provably materializes every gradient
            # element; the fast-tier no-disc backward delta STAYED ~free
            # (0.19 -> 0.05 ms) under it, turning "suspicious" into a
            # finding: the generator backward genuinely hides in the
            # MXU idle time of the latency-bound forward (BENCH_NOTES
            # fast-tier attribution). Costs one param-sized HBM read
            # (~260 MB f32 ~= 0.3-0.4 ms at flagship size) which callers
            # of train_time_breakdown must treat as an upper-bias on the
            # backward attribution.
            metrics_extra["grad_keepalive"] = sum(
                jnp.sum(jnp.square(g.astype(jnp.float32)))
                for t in (g_gen, g_disc)
                for g in jax.tree_util.tree_leaves(t))

        # ring-buffer shift for still-running videos (trainer.py:245-247)
        shifted = jnp.concatenate([theta_buf[:, 1:], mean_theta[:, None]],
                                  axis=1)
        theta_buf = jnp.where(valid[:, None, None] > 0, shifted, theta_buf)

        metrics = {"gen_loss": gen_loss, "dis_loss": dis_loss,
                   **ld, **metrics_extra}
        return (gen_params, disc_params, disc_state, gen_opt, disc_opt,
                theta_buf, batch_2d, batch_3d), metrics

    def _segment_body(gen_params, disc_params, disc_state, gen_opt, disc_opt,
                      batch_2d, batch_3d, amass_theta, rng):
        # init theta feedback from pseudo-thetas at j=0 (trainer.py:178-181)
        sel0 = batch_2d["switch_id"][:, :, S - 1]
        pseu2 = jnp.einsum("bc,bcsf->bsf", sel0,
                           batch_2d["theta_pseu"][:, :, :S - 1])
        pseu3 = batch_3d["theta_pseu"][:, :S - 1]
        theta_buf = jnp.concatenate([pseu2, pseu3], axis=0)

        rngs = jax.random.split(rng, num_iters)
        xs = (jnp.arange(num_iters), amass_theta, rngs)
        carry = (gen_params, disc_params, disc_state, gen_opt, disc_opt,
                 theta_buf, batch_2d, batch_3d)
        carry, metrics = jax.lax.scan(window_step, carry, xs)
        (gen_params, disc_params, disc_state, gen_opt, disc_opt,
         _, _, _) = carry
        # per-segment means for logging
        metrics = {k: v.mean() for k, v in metrics.items()}
        return (gen_params, disc_params, disc_state, gen_opt, disc_opt,
                metrics)

    train_segment = functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4))(
        _segment_body)
    train_segment.body = _segment_body
    return train_segment


def make_packed_train_segment(smpl, model_cfg, hp, gen_tx, disc_tx, weights,
                              num_iters, carry_template, data_template,
                              mode: str = "full",
                              ablate: Optional[str] = None):
    """Packed-IO variant of make_train_segment for the remote-TPU link.

    The training carry (both nets' params, optimiser states, BN state —
    hundreds of leaves) and the per-segment data batches travel as ONE buffer
    per dtype (see utils.packing.FlatPacker): the tunnel charges ~150 ms per
    used input buffer per call, so unpacked pytrees would cost minutes per
    segment. The carry flats are donated, so params update in place on device.

    Returns (fn, carry_packer, data_packer, metric_names) where
      fn(carry_flats, data_flats, rng) -> (carry_flats, metrics_vector)
      data = {"batch_2d": ..., "batch_3d": ..., "amass": ...}
    """
    from tepose_tpu.utils.packing import FlatPacker

    base = make_train_segment(smpl, model_cfg, hp, gen_tx, disc_tx, weights,
                              num_iters, mode=mode, ablate=ablate)
    carry_packer = FlatPacker(carry_template)
    data_packer = FlatPacker(data_template)

    # fix the metric ordering once (dict insertion order of the body output)
    metric_names_box = {}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def packed(carry_flats, data_flats, rng):
        gen_params, disc_params, disc_state, gen_opt, disc_opt =             carry_packer.unpack(carry_flats)
        data = data_packer.unpack(data_flats)
        out = base.body(gen_params, disc_params, disc_state, gen_opt,
                        disc_opt, data["batch_2d"], data["batch_3d"],
                        data["amass"], rng)
        metrics = out[5]
        metric_names_box.setdefault("names", sorted(metrics.keys()))
        mvec = jnp.stack([metrics[k] for k in sorted(metrics.keys())])
        return carry_packer.pack(out[:5]), mvec

    def metric_names():
        return metric_names_box.get("names")

    packed.metric_names = metric_names
    return packed, carry_packer, data_packer

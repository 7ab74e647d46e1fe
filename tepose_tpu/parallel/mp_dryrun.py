"""Multi-process dryrun payload: one deterministic tiny training+eval
problem that runs identically in the single-process (N local devices) and
multi-process (P processes x N/P devices each) runtimes, so the two can be
compared numerically.

The problem mirrors __graft_entry__.dryrun_multichip's train-segment and
eval-scan stages: replicated weights, batch sharded over the global mesh's
data axis. In the multi-process runtime every process GENERATES the full
global batch from the shared seed, then keeps only its host-local rows
(distributed.host_slice_tree) — exactly the per-host data loading contract
of data/loaders.BatchLoader(num_shards=...). GSPMD compiles the same
partitioned HLO either way; the only difference is that cross-process
collectives ride gloo (CPU rig) / ICI (pod) instead of intra-process
streams, so metrics must agree to float tolerance (pinned bit-for-bit on
the CPU rig by tests/test_multiprocess.py).

Run as a module to act as one worker process:

  python -m tepose_tpu.parallel.mp_dryrun --out ref.json \
      --local-devices 8                                    # single-process
  python -m tepose_tpu.parallel.mp_dryrun --out w0.json \
      --coordinator localhost:9911 --num-processes 2 --process-id 0 \
      --local-devices 4                                    # pod worker

ref: the reference has no multi-host story (its only distributed vestige
is the unused DataParallel prefix stripper, lib/utils/utils.py:40-45);
SURVEY.md §2.6 names per-host data loading as the TPU-native bar.
"""

from __future__ import annotations

import functools
import json


def run_payload() -> dict:
    """Run the deterministic train-segment + eval-scan problem over ALL
    global devices; return a JSON-able dict of metrics and outputs.

    Must be called after the runtime is configured (platform, device count,
    distributed.maybe_initialize). Every returned array is replicated, so
    the dict is identical on every process.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tepose_tpu.models.gcn import motion_discriminator_init
    from tepose_tpu.models.smpl import synthetic_smpl_model
    from tepose_tpu.models.tepose import (
        TePoseConfig, VibeConfig, tepose_init, vibe_init)
    from tepose_tpu.parallel import distributed
    from tepose_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from tepose_tpu.train.loss import LossWeights
    from tepose_tpu.train.optim import make_optimizer
    from tepose_tpu.train.trainer import TrainHyper, make_train_segment

    mesh = make_mesh()  # all global devices (pod-wide after initialize)
    n_dev = int(mesh.devices.size)
    rep = NamedSharding(mesh, P())

    hp = TrainHyper(seqlen=6, n_2d=n_dev, n_3d=n_dev,
                    num_gcn_scales=3, num_g3d_scales=2)
    model_cfg = TePoseConfig(seqlen=6, n_layers=1, hidden_size=32)
    smpl = synthetic_smpl_model(seed=0, num_verts=64)

    gen_params = tepose_init(jax.random.PRNGKey(0), model_cfg)
    disc_params, disc_state = motion_discriminator_init(
        jax.random.PRNGKey(1), num_gcn_scales=3, num_g3d_scales=2)
    gen_tx = make_optimizer("adam", 5e-5)
    disc_tx = make_optimizer("adam", 1e-4, weight_decay=1e-4)
    gen_opt = gen_tx.init(gen_params)
    disc_opt = disc_tx.init(disc_params)

    gen_params = replicate(gen_params, mesh)
    disc_params = replicate(disc_params, mesh)
    disc_state = replicate(disc_state, mesh)
    gen_opt = replicate(gen_opt, mesh)
    disc_opt = replicate(disc_opt, mesh)
    smpl = dataclasses.replace(smpl, **replicate(
        {"v_template": smpl.v_template, "shapedirs": smpl.shapedirs,
         "posedirs": smpl.posedirs, "j_regressor": smpl.j_regressor,
         "lbs_weights": smpl.lbs_weights,
         "j_regressor_extra": smpl.j_regressor_extra}, mesh))

    # ---- global batches from the shared seed; keep only host-local rows --
    VIDLEN, NUM_ITERS, S = 12, 2, hp.seqlen
    rng = np.random.RandomState(0)
    switch = np.zeros((hp.n_2d, 2, VIDLEN), np.float32)
    switch[:, 0, :VIDLEN // 2] = 1
    switch[:, 1, VIDLEN // 2:] = 1
    batch_2d = {
        "features": rng.randn(hp.n_2d, 2, VIDLEN, 2048).astype(np.float32),
        "theta_pseu": rng.randn(hp.n_2d, 2, VIDLEN, 85).astype(np.float32),
        "kp_2d": rng.randn(hp.n_2d, VIDLEN, 49, 3).astype(np.float32),
        "switch_id": switch,
        "vidlen_each": np.full((hp.n_2d,), VIDLEN, np.float32),
    }
    batch_3d = {
        "features": rng.randn(hp.n_3d, VIDLEN, 2048).astype(np.float32),
        "theta_pseu": rng.randn(hp.n_3d, VIDLEN, 85).astype(np.float32),
        "kp_2d": rng.randn(hp.n_3d, VIDLEN, 49, 3).astype(np.float32),
        "kp_3d": rng.randn(hp.n_3d, VIDLEN, 49, 3).astype(np.float32),
        "theta": rng.randn(hp.n_3d, VIDLEN, 85).astype(np.float32),
        "w_3d": np.ones((hp.n_3d, VIDLEN), np.float32),
        "w_smpl": np.ones((hp.n_3d, VIDLEN), np.float32),
        "vidlen_each": np.full((hp.n_3d,), VIDLEN, np.float32),
    }
    amass = rng.randn(NUM_ITERS, hp.n_2d + hp.n_3d, S, 85).astype(np.float32)

    batch_2d = shard_batch(distributed.host_slice_tree(batch_2d), mesh)
    batch_3d = shard_batch(distributed.host_slice_tree(batch_3d), mesh)
    # amass is (iters, B, S, 85): sharded on axis 1, host-sliced on axis 1
    amass = distributed.put_global(
        amass[:, distributed.host_local_rows(amass.shape[1])],
        NamedSharding(mesh, P(None, "data")))

    base = make_train_segment(smpl, model_cfg, hp, gen_tx, disc_tx,
                              LossWeights(), NUM_ITERS)
    names_box = {}

    # replicated out_shardings so every process can read the results back
    # directly (sharded outputs are not fully addressable off-process)
    @functools.partial(jax.jit, out_shardings=rep)
    def train_metrics(gp, dp_, ds, go, do, b2, b3, am, key):
        out = base.body(gp, dp_, ds, go, do, b2, b3, am, key)
        m = out[5]
        names_box.setdefault("names", sorted(m))
        return jnp.stack([m[k] for k in sorted(m)]), out[0]

    with mesh:
        # AOT-compile, THEN meet at a coordination-service barrier, THEN
        # execute: the first execution creates the gloo communicators,
        # whose rendezvous has a hard 30 s deadline — with warm compile
        # caches a fast process can otherwise reach it and time out while
        # a sibling is still importing/compiling on a contended host
        compiled = train_metrics.lower(
            gen_params, disc_params, disc_state, gen_opt, disc_opt,
            batch_2d, batch_3d, amass, jax.random.PRNGKey(0)).compile()
        distributed.service_barrier("train_gloo_warm")
        mvec, new_gen = compiled(
            gen_params, disc_params, disc_state, gen_opt, disc_opt,
            batch_2d, batch_3d, amass, jax.random.PRNGKey(0))
    metrics = {k: float(v) for k, v in
               zip(names_box["names"], np.asarray(mvec))}
    assert all(np.isfinite(v) for v in metrics.values()), metrics

    # ---- sharded eval scan over the post-step generator -------------------
    from tepose_tpu.eval.evaluator import make_sharded_eval_scan

    vcfg = VibeConfig(seqlen=S, n_layers=1, hidden_size=32, add_linear=True)
    vibe = replicate(vibe_init(jax.random.PRNGKey(2), vcfg), mesh)
    jreg = replicate(jnp.asarray(rng.rand(17, 64).astype(np.float32)), mesh)
    efn, _, _ = make_sharded_eval_scan(
        smpl, model_cfg, vcfg, num_windows=VIDLEN - S + 1,
        use_j_regressor=True, mesh=mesh)
    edata = {
        "feats": rng.randn(n_dev, VIDLEN, 2048).astype(np.float32),
        "pseu": rng.randn(n_dev, S - 1, 85).astype(np.float32),
        "gt": rng.randn(n_dev, VIDLEN, 85).astype(np.float32)}
    edata = shard_batch(distributed.host_slice_tree(edata), mesh)

    efn_rep = jax.jit(lambda *a: efn(*a), out_shardings=rep)
    with mesh:
        eargs = (new_gen, vibe, edata["feats"], edata["pseu"],
                 edata["gt"], jreg)
        ecompiled = efn_rep.lower(*eargs).compile()
        distributed.service_barrier("eval_gloo_warm")
        pj, pt, mp = ecompiled(*eargs)
    pt = np.asarray(pt)
    assert np.isfinite(pt).all()

    return {
        "n_devices": n_dev,
        "process_count": int(jax.process_count()),
        "train_metrics": metrics,
        "pred_theta": pt.tolist(),
        "mpvpe": np.asarray(mp).tolist(),
    }


def worker_main(argv=None) -> None:
    """One process of the dryrun: configure the runtime, join the
    coordination service (if multi-process), run the payload, dump JSON."""
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--local-devices", type=int, default=8)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.local_devices)

    from tepose_tpu.parallel import distributed

    # join the coordination service BEFORE anything (incl. the compile
    # cache) can initialise the XLA backend
    if args.coordinator:
        distributed.maybe_initialize(args.coordinator, args.num_processes,
                                     args.process_id)
    try:
        from tepose_tpu.utils.cache import enable_persistent_cache

        enable_persistent_cache()
    except Exception:
        pass
    result = run_payload()
    with open(args.out, "w") as f:
        json.dump(result, f)
    print(f"mp_dryrun p{args.process_id}: ok "
          f"({result['process_count']} processes, "
          f"{result['n_devices']} global devices)")


def compare_runs(ref: dict, runs: list) -> None:
    """Assert every multi-process run reproduces the single-process one."""
    import numpy as np

    for i, r in enumerate(runs):
        assert r["n_devices"] == ref["n_devices"], (i, r["n_devices"])
        for k, v in ref["train_metrics"].items():
            dv = abs(r["train_metrics"][k] - v)
            assert dv <= 1e-5 * max(1.0, abs(v)), (
                f"worker {i} metric {k}: {r['train_metrics'][k]} vs {v}")
        np.testing.assert_allclose(
            np.asarray(r["pred_theta"]), np.asarray(ref["pred_theta"]),
            rtol=2e-5, atol=2e-6,
            err_msg=f"worker {i} eval pred_theta diverged")
        np.testing.assert_allclose(
            np.asarray(r["mpvpe"]), np.asarray(ref["mpvpe"]),
            rtol=2e-5, atol=2e-6)


def spawn_and_compare(num_processes: int = 2, total_devices: int = 8,
                      timeout: float = 900.0, verbose: bool = True) -> dict:
    """Full harness: run the payload single-process (total_devices local
    CPU devices) and as `num_processes` coordinated processes of
    total_devices/num_processes each; assert identical results.

    Every stage runs in a fresh subprocess so backends never collide (the
    calling process keeps its own JAX runtime untouched)."""
    import os
    import socket
    import subprocess
    import sys
    import tempfile

    assert total_devices % num_processes == 0
    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    def launch(out, extra):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        # workers compile and execute on THIS host, so the suite's
        # host-local CPU compile cache is safe and saves the workers'
        # dominant cost on repeat runs (utils/cache.py opt-in)
        env.setdefault("TEPOSE_JAX_CACHE",
                       os.path.join(repo, ".jax_cache_cpu"))
        return subprocess.Popen(
            [sys.executable, "-m", "tepose_tpu.parallel.mp_dryrun",
             "--out", out] + extra,
            cwd=repo, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)

    with tempfile.TemporaryDirectory() as td:
        logs = {}

        def drain(procs):
            for name, proc in procs:
                logs[name], _ = proc.communicate(timeout=timeout)
                if proc.returncode:
                    raise RuntimeError(
                        f"mp_dryrun {name} failed "
                        f"(rc={proc.returncode}):\n{logs[name][-4000:]}")

        # the single-process reference runs to COMPLETION before the
        # coordinated workers start: it shares no runtime with them, and
        # on a small CPU rig running all three concurrently skews the
        # workers' startup enough to blow gloo's 30 s first-collective
        # rendezvous (observed once warm compile caches made worker
        # startup fast relative to the contended reference)
        ref_out = os.path.join(td, "ref.json")
        drain([("ref", launch(ref_out,
                              ["--local-devices", str(total_devices)]))])
        worker_outs = []
        workers = []
        for p in range(num_processes):
            out = os.path.join(td, f"w{p}.json")
            worker_outs.append(out)
            workers.append((f"w{p}", launch(out, [
                "--coordinator", f"localhost:{port}",
                "--num-processes", str(num_processes),
                "--process-id", str(p),
                "--local-devices", str(total_devices // num_processes)])))
        drain(workers)
        with open(ref_out) as f:
            ref = json.load(f)
        runs = []
        for out in worker_outs:
            with open(out) as f:
                runs.append(json.load(f))
    compare_runs(ref, runs)
    if verbose:
        print(f"multiprocess dryrun OK: {num_processes} processes x "
              f"{total_devices // num_processes} devices == 1 process x "
              f"{total_devices} devices "
              f"(gen_loss {ref['train_metrics'].get('gen_loss'):.6f})")
    return ref


if __name__ == "__main__":
    worker_main()

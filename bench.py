#!/usr/bin/env python
"""Streaming-inference benchmark on the real TPU chip.

Measures the flagship TePose live-stream path (the demo.py/evaluate.py hot
loop: sliding window + theta feedback, ref: demo.py:238-252, FPS print at
demo.py:350-355) as a batched multi-stream scan — the TPU-native way to
serve many concurrent video streams per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference publishes no FPS figure (BASELINE.md "Runtime").
Its real-time claim and the demo measurement hook imply ~30 FPS per stream on
the paper-era GPU; vs_baseline is reported against the north-star target of
4 x 30 = 120 frames/sec/chip (BASELINE.json: ">= 4x PyTorch-GPU streaming
FPS per v5e chip").
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from tepose_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tepose_tpu.models.smpl import synthetic_smpl_model  # noqa: E402
from tepose_tpu.models.tepose import (  # noqa: E402
    TePoseConfig, tepose_init, tepose_apply)
from tepose_tpu.utils.packing import (  # noqa: E402
    FlatPacker, pack_smpl, unpack_smpl)

BASELINE_TARGET_FPS = 120.0  # 4 x assumed 30 FPS reference streaming rate


def main() -> None:
    cfg = TePoseConfig(seqlen=6, n_layers=2, hidden_size=1024)
    smpl = synthetic_smpl_model(seed=0)  # full 6890-vertex mesh

    # init on host CPU (per-op PRNG compiles over the TPU tunnel are slow)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = tepose_init(jax.random.PRNGKey(0), cfg)

    # one packed buffer instead of ~56 leaves: the tunnel charges ~150 ms per
    # used input buffer per call (see utils/packing.py), so packing is the
    # difference between 360 FPS and 37k FPS on this link.
    packer = FlatPacker((params, pack_smpl(smpl)))
    flats = jax.device_put(packer.pack((params, pack_smpl(smpl))))

    B = 256           # concurrent streams (measured throughput optimum)
    frames = 485      # frames per stream (long segments amortize host sync)
    S = cfg.seqlen
    W = frames - S + 1

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, frames, 2048).astype(np.float32) * 0.1)
    theta0 = jnp.zeros((B, S - 1, 85))

    @jax.jit
    def stream(flats, feats, theta_buf):
        params, smpl_t = packer.unpack(flats)
        model = unpack_smpl(smpl, smpl_t)

        def step(buf, k):
            win = jax.lax.dynamic_slice_in_dim(feats, k, S, axis=1)
            fb = jnp.concatenate([buf, jnp.zeros_like(buf[:, :1])], axis=1)
            out = tepose_apply(params, model, jnp.concatenate([win, fb], -1),
                               cfg)
            theta = out["theta"]
            return (jnp.concatenate([buf[:, 1:], theta[:, None]], 1),
                    (theta, out["kp_3d"]))

        _, (thetas, j3d) = jax.lax.scan(step, theta_buf, jnp.arange(W))
        return thetas, j3d

    # warmup/compile; NOTE: block_until_ready is unreliable over the axon
    # tunnel — a host readback (np.asarray) is the only true barrier.
    thetas, j3d = stream(flats, feats, theta0)
    np.asarray(thetas)

    reps = 5
    t0 = time.time()
    for _ in range(reps):
        thetas, j3d = stream(flats, feats, theta0)
        np.asarray(thetas[-1, 0, :1])  # per-rep sync (tiny readback)
    dt = (time.time() - t0) / reps

    fps = B * W / dt
    assert np.all(np.isfinite(np.asarray(thetas))), "non-finite outputs"

    print(json.dumps({
        "metric": "streaming_fps_per_chip",
        "value": round(fps, 1),
        "unit": "frames/sec (256 concurrent streams, seqlen-6 windows, "
                "full SMPL output)",
        "vs_baseline": round(fps / BASELINE_TARGET_FPS, 2),
    }))


if __name__ == "__main__":
    main()

"""Per-frame live streaming inference — the T+1=6 low-latency serving mode.

TePose's design argument over VIBE/TCMR/MEVA is latency: one prediction
needs only 6 input frames (T+1 column of the README tables; SURVEY §6), yet
the reference only ever runs offline over whole videos (demo.py:171-252
batches full tracklets). `LiveSession` turns the same models into a true
frame-at-a-time engine: device-resident carry (VIBE bootstrap GRU hidden
state, the fast-encoder projection ring, the theta feedback ring), one
jitted step per arriving frame, outputs for frame t emitted the moment
frame t lands.

Exact-output property (pinned in tests/test_live.py): pushing frames
0..T-1 produces, frame for frame, the same predictions as the offline
`StreamingEngine.run_tracklet` on the whole clip — the VIBE bootstrap is
unidirectional (VibeConfig.bidirectional=False, ref: evaluate.py:89-98) so
its first S-1 outputs are causal, and from frame S-1 on the offline scan's
window k = t-S+1 sees exactly the frames the live ring holds.

ref: demo.py:229-252 (the per-window loop this replaces), vibe.py:102-117.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tepose_tpu.models import layers as L
from tepose_tpu.models.fast_encoder import (
    fast_encoder_window, pack_fast_encoder, project_frame_features)
from tepose_tpu.models.regressor import regressor_apply
from tepose_tpu.models.smpl import SmplModel
from tepose_tpu.models.tepose import TePoseConfig, VibeConfig
from tepose_tpu.utils.packing import FlatPacker, pack_smpl, unpack_smpl

LIVE_OUTPUTS = ("theta", "verts", "kp_2d", "kp_3d")


def _vibe_gru_step(gru_params: Dict, n_layers: int, h_stack: jnp.ndarray,
                   x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One timestep of the (unidirectional) multi-layer VIBE GRU.

    h_stack (n_layers, B, H); x (B, F). Running layer-by-layer per timestep
    with carried per-layer hidden is equivalent to torch's layer-by-layer
    over the whole sequence (standard stacked-RNN identity), so this matches
    `layers.gru_apply` output at every position.
    """
    hs = []
    y = x
    for layer in range(n_layers):
        w_ih = gru_params[f"weight_ih_l{layer}"]
        w_hh = gru_params[f"weight_hh_l{layer}"]
        b_ih = gru_params[f"bias_ih_l{layer}"]
        b_hh = gru_params[f"bias_hh_l{layer}"]
        x_proj = y @ w_ih.T + b_ih
        h_new = L._gru_cell(x_proj, h_stack[layer], w_hh, b_hh,
                            w_hh.shape[1])
        hs.append(h_new)
        y = h_new
    return jnp.stack(hs), y


class LiveSession:
    """Frame-at-a-time streaming over `n_streams` concurrent tracklets.

    push() accepts either per-stream features (B, 2048) or raw crops
    (B, 3, S, S) u8/f32 (with `backbone_params`), runs ONE jitted device
    step, and returns {"valid": (B,) bool, **outputs} — `valid` is False
    while that stream's theta window is still filling (frames 0..S-2
    return the causal VIBE bootstrap predictions, exactly the offline
    engine's boot frames).

    Streams are independent slots: push(..., reset=mask) re-seeds the
    masked slots to fresh-session state before the frame, so a slot can be
    handed to a new person mid-session (multi-person live with tracklet
    churn); validity is tracked per stream on device.

    Single-chip, a push moves exactly TWO buffers over the host link: the
    uploaded frame, and ONE downloaded f32 buffer holding every requested
    output plus the per-stream live mask (the step packs them on device;
    each separate `np.asarray` readback costs a full link RTT, so the
    pre-r4 per-output fetches dominated latency — BENCH_NOTES §live,
    VERDICT r3 weak #4). The rest of the state — weights, SMPL tensors,
    AND the per-stream carry (ages ride as exact small-integer floats) —
    folds into ONE donated device-resident f32 buffer that never visits
    the host: the weights pass through the step unchanged (donation
    aliases them in place), and keeping them out of the HLO (vs baking
    them in as closure constants) keeps the program small enough for the
    tunnel's remote-compile request cap. The rare reset push ships one
    extra bool mask.

    Multi-chip: pass `mesh` (a 1-D jax.sharding.Mesh) to shard the
    `n_streams` slots over the data axis — weights replicate, the carry
    pytree and every push/output shard per stream, and GSPMD needs no
    collectives (streams are independent), so live serving scales linearly
    in streams per chip. 1-dev == N-dev pinned in
    tests/test_live.py::test_live_session_mesh_matches_single.
    """

    def __init__(self, smpl: SmplModel, tepose_params: Dict,
                 vibe_params: Dict, model_cfg: TePoseConfig,
                 vibe_cfg: VibeConfig, n_streams: int = 1,
                 backbone_params: Optional[Dict] = None,
                 outputs: Tuple[str, ...] = ("theta", "kp_3d"),
                 theta_pseu: Optional[np.ndarray] = None,
                 mesh=None, backbone_dtype=None, preset=None):
        # the composed serving preset (streaming.engine.ENGINE_PRESETS):
        # for the live path it means the bf16 backbone — outputs already
        # default to joints-only, and the readback is ONE packed f32
        # buffer whose cost is the link RTT, not its bytes (f16 packing
        # would change nothing; see the output-packer note below)
        if preset not in (None, "parity", "serving", "serving-joints"):
            from tepose_tpu.streaming.engine import ENGINE_PRESETS

            raise ValueError(
                f"unknown preset {preset!r}; choose from {ENGINE_PRESETS}")
        if preset in ("serving", "serving-joints") and backbone_dtype is None:
            backbone_dtype = jnp.bfloat16
        if not outputs:
            raise ValueError("outputs must be non-empty")  # as in the engine
        bad = set(outputs) - set(LIVE_OUTPUTS)
        if bad:
            raise ValueError(f"unknown outputs {sorted(bad)}; "
                             f"choose from {LIVE_OUTPUTS}")
        S = model_cfg.seqlen
        B = n_streams
        self.model_cfg = model_cfg
        self.vibe_cfg = vibe_cfg
        self.n_streams = B
        self.outputs = tuple(outputs)
        if vibe_cfg.bidirectional:
            raise ValueError("live mode needs a causal (unidirectional) "
                             "VIBE bootstrap")

        fast = pack_fast_encoder(tepose_params["encoder"], model_cfg.n_layers)
        n_lanes, lane_dim = fast["layers"][0]["w_feat"].shape[:2]

        weights = {"fast": fast, "reg": tepose_params["regressor"],
                   "vibe": vibe_params, "smpl": pack_smpl(smpl)}
        if backbone_params is not None:
            weights["bb"] = backbone_params

        if theta_pseu is None:
            theta_ring0 = np.zeros((B, S - 1, 85), np.float32)
            theta_ring0[:, :, 0] = 1.0  # identity cam, engine's default
        else:
            theta_ring0 = np.broadcast_to(
                np.asarray(theta_pseu, np.float32), (B, S - 1, 85)).copy()
        vh = int(vibe_params["encoder"]["gru"]["weight_hh_l0"].shape[1])
        carry0 = {
            "vibe_h": np.zeros((vibe_cfg.n_layers, B, vh), np.float32),
            "proj_ring": np.zeros((B, S - 1, n_lanes, lane_dim), np.float32),
            "theta_ring": theta_ring0,
            # per-stream frame count: validity is per stream so a slot can
            # be reset mid-session (tracklet churn in multi-person live).
            # f32 on purpose: small-int counting is exact in f32 (< 2^24
            # frames = 7.7 days at 25 fps) and a uniform-dtype carry
            # flat-packs into ONE donatable buffer (one fewer per-step arg
            # over the per-buffer-charging dev link).
            "age": np.zeros((B,), np.float32),
        }
        self._carry0 = carry0  # kept for recovery after an interrupted step
        theta_ring_init = jnp.asarray(theta_ring0)

        out_keys = self.outputs
        has_bb = backbone_params is not None

        def core(w, carry, x, reset):
            # SMPL tensors ride in w (flat-packed / replicated like the
            # other weights — same pattern as the offline engine), only the
            # static template fields come from the closure
            smpl_t = unpack_smpl(smpl, w["smpl"])
            if reset is not None:
                # re-seed the chosen streams to their fresh-session state
                # BEFORE processing: a reset slot's first frame behaves
                # exactly like frame 0 of a new session (pinned in
                # tests/test_live.py::test_live_per_stream_reset)
                carry = {
                    "vibe_h": jnp.where(reset[None, :, None], 0.0,
                                        carry["vibe_h"]),
                    "proj_ring": jnp.where(reset[:, None, None, None], 0.0,
                                           carry["proj_ring"]),
                    "theta_ring": jnp.where(reset[:, None, None],
                                            theta_ring_init,
                                            carry["theta_ring"]),
                    "age": jnp.where(reset, 0.0, carry["age"]),
                }
            if has_bb and x.ndim == 4:
                # same normalise+cast+backbone op as the offline engine
                # (incl. the bf16 conv-stack option, `--precision bf16`)
                from tepose_tpu.streaming.engine import _backbone_chunk
                feat = _backbone_chunk(w["bb"], x, backbone_dtype)  # (B,2048)
            else:
                feat = x

            # --- causal VIBE bootstrap step (boot frames t < S-1) ----------
            vibe_h, y = _vibe_gru_step(w["vibe"]["encoder"]["gru"],
                                       vibe_cfg.n_layers,
                                       carry["vibe_h"], feat)
            if "linear" in w["vibe"]["encoder"]:
                y = L.linear(w["vibe"]["encoder"]["linear"], jax.nn.relu(y))
            if vibe_cfg.use_residual and y.shape[-1] == 2048:
                y = y + feat
            vibe_out = regressor_apply(w["vibe"]["regressor"], smpl_t, y)

            # --- TePose window step (frames t >= S-1) ----------------------
            proj = project_frame_features(w["fast"], feat[:, None])[:, 0]
            proj_win = jnp.concatenate(
                [carry["proj_ring"], proj[:, None]], axis=1)       # (B,S,...)
            thetas = jnp.concatenate(
                [carry["theta_ring"],
                 jnp.zeros_like(carry["theta_ring"][:, :1])], axis=1)
            feature = fast_encoder_window(w["fast"], proj_win, thetas)
            win_out = regressor_apply(w["reg"], smpl_t, feature)

            live = carry["age"] >= S - 1  # per stream (B,)
            outs = {k: jnp.where(
                live.reshape((B,) + (1,) * (win_out[k].ndim - 1)),
                win_out[k], vibe_out[k]) for k in out_keys}

            # ring updates: the theta feedback only advances once the
            # window is live (before that the offline scan hasn't started
            # and the ring must keep holding the pseudo-thetas)
            new_theta_ring = jnp.where(
                live[:, None, None],
                jnp.concatenate([carry["theta_ring"][:, 1:],
                                 win_out["theta"][:, None]], axis=1),
                carry["theta_ring"])
            new_carry = {
                "vibe_h": vibe_h,
                "proj_ring": jnp.concatenate(
                    [carry["proj_ring"][:, 1:], proj[:, None]], axis=1),
                "theta_ring": new_theta_ring,
                "age": carry["age"] + 1.0,
            }
            return new_carry, outs, live

        self._mesh = mesh
        if mesh is None:
            # single-chip path: weights + SMPL tensors + carry flat-pack
            # into ONE donated f32 buffer, so the only per-step uploaded
            # input buffer is the frame itself (~150 ms per used input
            # buffer over the dev tunnel — utils/packing.py). The weight
            # region passes through the step unchanged (donation aliases it
            # in place); keeping weights OUT of the HLO avoids the tunnel's
            # remote-compile request-size cap that closure-constant weights
            # hit at flagship scale.
            self._s_packer = FlatPacker({"w": weights, "c": carry0})
            s_packer = self._s_packer
            assert s_packer.num_buffers == 1, "state must be all-f32"
            self._place_carry = lambda c0: tuple(
                jax.device_put(jnp.asarray(f))
                for f in s_packer.pack_np({"w": weights, "c": c0}))
            self._carry = self._place_carry(carry0)
            self._x_place = jnp.asarray

            # output packer: every requested output + the live mask leave
            # the device as ONE f32 buffer (each separate readback is a
            # full link RTT). Shapes come from an eval_shape trace — free.
            outs_sds, live_sds = jax.eval_shape(
                lambda c, x: core(weights, c, x, None)[1:],
                carry0, np.zeros((B, 2048), np.float32))
            self._o_packer = FlatPacker(
                {"outs": {k: np.zeros(v.shape, np.float32)
                          for k, v in outs_sds.items()},
                 "live": np.zeros((B,), np.float32)})
            o_packer = self._o_packer
            assert o_packer.num_buffers == 1

            def one_step(s_flats, x, reset):
                st = s_packer.unpack(s_flats)
                new_carry, outs, live = core(st["w"], st["c"], x, reset)
                out_flat = o_packer.pack(
                    {"outs": {k: outs[k].astype(jnp.float32)
                              for k in outs},
                     "live": live.astype(jnp.float32)})
                return s_packer.pack({"w": st["w"], "c": new_carry}), out_flat

            self._step = jax.jit(
                functools.partial(one_step, reset=None), donate_argnums=(0,))
            self._step_reset = jax.jit(one_step, donate_argnums=(0,))
            self._call_step = lambda c, x: self._step(c, x)
            self._call_step_reset = \
                lambda c, x, r: self._step_reset(c, x, r)

            def fetch(out_flat):
                host = o_packer.unpack_np(np.asarray(out_flat[0]))
                res = dict(host["outs"])
                res["valid"] = host["live"] > 0.5
                return res

            self._fetch = fetch
        else:
            # mesh path: streams shard over the data axis, weights
            # replicate — GSPMD then runs each stream's step on its own
            # chip with no cross-device collectives (the math has no
            # cross-stream coupling). The carry stays an unpacked sharded
            # pytree: flat-packing would interleave per-stream state in one
            # buffer and defeat the sharding, and a real multi-chip host
            # does not pay the dev tunnel's per-buffer cost.
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            ndev = int(np.prod(mesh.devices.shape))
            if B % ndev:
                raise ValueError(f"n_streams={B} must divide the "
                                 f"{ndev}-device mesh")

            def ns(spec):
                return NamedSharding(mesh, spec)

            specs = {"vibe_h": P(None, axis), "proj_ring": P(axis),
                     "theta_ring": P(axis), "age": P(axis)}
            # device_put host arrays straight onto the mesh — staging via
            # jnp.asarray would land them on device 0 first and transfer
            # twice (the per-frame _x_place is the latency-critical one)
            self._w_arg = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, ns(P())), weights)
            self._place_carry = lambda c0: {
                k: jax.device_put(v, ns(specs[k])) for k, v in c0.items()}
            self._carry = self._place_carry(carry0)
            x_sh, r_sh = ns(P(axis)), ns(P(axis))
            self._x_place = lambda x: jax.device_put(np.asarray(x), x_sh)
            self._r_place = lambda r: jax.device_put(r, r_sh)

            def one_step(w, carry, x, reset):
                new_carry, outs, live = core(w, carry, x, reset)
                new_carry = {
                    k: jax.lax.with_sharding_constraint(v, ns(specs[k]))
                    for k, v in new_carry.items()}
                return new_carry, (outs, live)

            self._step = jax.jit(
                functools.partial(one_step, reset=None), donate_argnums=(1,))
            self._step_reset = jax.jit(one_step, donate_argnums=(1,))
            self._call_step = lambda c, x: self._step(self._w_arg, c, x)
            self._call_step_reset = \
                lambda c, x, r: self._step_reset(self._w_arg, c, x, r)

            def fetch(out):
                outs, live = out
                res = {k: np.asarray(v) for k, v in outs.items()}
                res["valid"] = np.asarray(live)
                return res

            self._fetch = fetch

        # two jit variants so the common no-reset push ships no extra
        # buffer over the link; the reset one only runs on tracklet churn
        self._reset_warm = False

    def _warm_reset_step(self, x: jnp.ndarray) -> None:
        """Compile the reset-step variant off the hot path.

        The first tracklet churn would otherwise trace+compile mid-session
        — a multi-second stall at exactly the latency-critical moment. Run
        the reset jit once on throwaway carry buffers (donation consumes
        them, not the live carry) during the first push, whose latency the
        callers already exclude as the compile step.
        """
        dummy_c = jax.tree_util.tree_map(
            lambda f: jax.device_put(jnp.zeros(f.shape, f.dtype), f.sharding),
            self._carry)
        self._call_step_reset(dummy_c, x,
                              self._place_reset(jnp.zeros((self.n_streams,),
                                                          bool)))
        self._reset_warm = True

    def _place_reset(self, r: jnp.ndarray) -> jnp.ndarray:
        return self._r_place(r) if self._mesh is not None else r

    def push(self, x: np.ndarray,
             reset: Optional[np.ndarray] = None) -> Dict[str, np.ndarray]:
        """Feed one frame per stream; returns this frame's predictions.

        x: (B, 2048) features, or (B, 3, S, S) crops when the session was
        built with backbone_params. `valid` is a per-stream (B,) bool:
        False = that stream's theta window is still filling (outputs are
        the causal VIBE bootstrap for those frames).

        reset: optional (B,) bool — streams to re-seed to fresh-session
        state BEFORE this frame (a new person entered the slot); their
        current frame is processed as the new tracklet's frame 0.

        If the device step raises (KeyboardInterrupt, transient device
        error), the donated carry cannot be recovered: all streams are
        re-seeded to fresh-session state and the exception propagates —
        the session object itself stays usable.
        """
        if x.shape[0] != self.n_streams:
            raise ValueError(f"expected {self.n_streams} streams, "
                             f"got {x.shape[0]}")
        xd = self._x_place(x)
        if not self._reset_warm:
            self._warm_reset_step(xd)
        try:
            if reset is not None and np.any(reset):
                r = self._place_reset(np.asarray(reset, bool))
                self._carry, out = self._call_step_reset(self._carry, xd, r)
            else:
                self._carry, out = self._call_step(self._carry, xd)
        except BaseException:
            # the step donates the carry; an exception mid-dispatch
            # (KeyboardInterrupt — the documented live-session exit — or a
            # transient device error) would otherwise leave self._carry
            # pointing at donated buffers and brick every later push.
            # Re-seed all streams to fresh-session state so the session
            # object stays usable, then surface the original error.
            self._carry = self._place_carry(self._carry0)
            raise
        return self._fetch(out)

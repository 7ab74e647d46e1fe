"""Analytic FLOP formulas pinned against XLA's own cost model.

Each formula in utils/flops.py must agree with `cost_analysis()['flops']`
of the corresponding compiled program — XLA counts the same 2-FLOPs-per-MAC
convention plus the small elementwise tail the formulas ignore, so the
analytic number must sit slightly BELOW XLA's and within a few percent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tepose_tpu.utils import flops as F


def _close_below(analytic, xla, rel=0.06):
    # symmetric band: XLA excludes padded conv positions (analytic sits a
    # few % above on padded convs) but counts elementwise tails the
    # formulas ignore (analytic sits below on matmul-light programs)
    assert xla * (1 - rel) <= analytic <= xla * (1 + rel), \
        f"analytic {analytic:.3e} vs xla {xla:.3e} ({analytic / xla:.3f})"


def test_resnet50_flops_vs_xla():
    from tepose_tpu.models.backbone import resnet50_features, resnet50_init

    params = resnet50_init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 3, 224, 224), jnp.float32)
    xla = F.xla_flops(lambda p, x: resnet50_features(p, x), params, x)
    _close_below(F.resnet50_flops(), xla)
    # the canonical "~4.1 GMACs" figure for a 224^2 crop
    assert 7.5e9 < F.resnet50_flops() < 8.5e9


def test_gru_flops_vs_xla():
    from tepose_tpu.models import layers as L

    T, B, IN, H, NL = 7, 1, 96, 64, 2
    params = L.gru_init(jax.random.PRNGKey(0), IN, H, NL,
                        bidirectional=True)
    x = jnp.zeros((B, T, IN), jnp.float32)
    xla = F.xla_flops(
        lambda p, x: L.gru_apply(p, x, num_layers=NL, bidirectional=True),
        params, x)
    _close_below(F.gru_flops(T, IN, H, NL, True), xla)


def test_encoder_window_flops_vs_xla():
    from tepose_tpu.models.temporal import (
        temporal_encoder_apply, temporal_encoder_init)

    S, NL, H = 6, 2, 64
    params = temporal_encoder_init(jax.random.PRNGKey(0), n_layers=NL,
                                   hidden_size=H)
    x = jnp.zeros((1, S, 2048 + 85), jnp.float32)
    xla = F.xla_flops(
        lambda p, x: temporal_encoder_apply(p, x, n_layers=NL),
        params, x)
    _close_below(F.encoder_window_flops(S, NL, H), xla)


def test_ief_and_smpl_flops_vs_xla():
    from tepose_tpu.models.regressor import regressor_apply, regressor_init
    from tepose_tpu.models.smpl import synthetic_smpl_model

    smpl = synthetic_smpl_model(seed=0)  # full 6890 verts
    params = regressor_init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 2048), jnp.float32)
    xla = F.xla_flops(
        lambda p, x: regressor_apply(p, smpl, x), params, x)
    # SMPL runs ONCE after the IEF loop (regressor.py:168-171); the
    # rodrigues/chain tails are approximated, so allow a wider band
    analytic = F.regressor_ief_flops() + F.smpl_flops(smpl.num_verts)
    assert 0.85 * xla < analytic < 1.1 * xla, (analytic, xla)


def test_peak_flops_table():
    class FakeDev:
        device_kind = "TPU v5 lite"

    assert F.peak_flops(FakeDev()) == 197e12

    class FakeV5p:
        device_kind = "TPU v5"

    assert F.peak_flops(FakeV5p()) == 459e12  # prefix must not over-match

    class Cpu:
        device_kind = "cpu"

    assert F.peak_flops(Cpu()) is None


def test_model_flops_per_frame_composition():
    parts = F.model_flops_per_frame()
    assert parts["total"] == pytest.approx(
        parts["backbone"] + parts["encoder_window"] + parts["ief"]
        + parts["smpl"])
    # backbone dominates the per-frame cost (sanity of relative scale)
    assert parts["backbone"] > 0.7 * parts["total"]
    assert parts["total"] > 8e9


def test_fast_scan_window_flops_bounds():
    """The projection-reuse scan must cost less than the naive encoder
    window (that's the whole point) but more than the pure hidden
    projections — a sanity band, since the scan bodies are invisible to
    XLA's loop-body-once cost model."""
    full = F.encoder_window_flops(6, 2, 1024)
    fast = F.fast_scan_window_flops(6, 2, 1024)
    assert fast < full
    assert fast > 0.4 * full
    # the saved work is the S-fold feature-projection reuse: ~1/3 of the
    # naive window cost at these shapes
    assert 0.55 < fast / full < 0.85, fast / full

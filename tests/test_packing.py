"""FlatPacker roundtrip + in-jit unpack tests."""

import numpy as np
import jax
import jax.numpy as jnp

from tepose_tpu.models.smpl import synthetic_smpl_model
from tepose_tpu.models.tepose import TePoseConfig, tepose_init, tepose_apply
from tepose_tpu.utils.packing import FlatPacker, pack_smpl, unpack_smpl


def test_roundtrip_mixed_dtypes(rng):
    tree = {
        "a": rng.randn(3, 4).astype(np.float32),
        "b": [rng.randn(7).astype(np.float32),
              np.int32(5) * np.ones((2, 2), np.int32)],
        "c": {"d": rng.randn(1).astype(np.float32)},
    }
    packer = FlatPacker(tree)
    assert packer.num_buffers == 2  # f32 + i32
    flats = packer.pack(tree)
    back = packer.unpack(flats)
    np.testing.assert_array_equal(np.asarray(back["a"]), tree["a"])
    np.testing.assert_array_equal(np.asarray(back["b"][1]), tree["b"][1])
    np.testing.assert_array_equal(np.asarray(back["c"]["d"]), tree["c"]["d"])


def test_unpack_inside_jit_matches_direct(rng):
    cfg = TePoseConfig(seqlen=6, n_layers=1, hidden_size=32)
    smpl = synthetic_smpl_model(seed=0, num_verts=64)
    params = tepose_init(jax.random.PRNGKey(0), cfg)

    template = (params, pack_smpl(smpl))
    packer = FlatPacker(template)
    flats = packer.pack(template)

    x = jnp.asarray(rng.randn(2, 6, 2133).astype(np.float32) * 0.1)

    @jax.jit
    def flat_fn(flats, x):
        p, smpl_t = packer.unpack(flats)
        model = unpack_smpl(smpl, smpl_t)
        return tepose_apply(p, model, x, cfg)["theta"]

    direct = tepose_apply(params, smpl, x, cfg)["theta"]
    packed = flat_fn(flats, x)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(direct),
                               atol=1e-5)


def test_pack_optimizer_state(rng):
    """The training carry (params + optax state) packs and unpacks."""
    from tepose_tpu.train.optim import make_optimizer

    params = {"w": rng.randn(4, 4).astype(np.float32),
              "b": rng.randn(4).astype(np.float32)}
    tx = make_optimizer("adam", 1e-3)
    opt = tx.init(params)
    packer = FlatPacker((params, opt))
    flats = packer.pack((params, opt))
    p2, opt2 = packer.unpack(flats)
    np.testing.assert_array_equal(np.asarray(p2["w"]), params["w"])
    # the unpacked optimizer state still drives an update
    upd, _ = tx.update(params, opt2, p2)
    assert np.all(np.isfinite(np.asarray(upd["w"])))

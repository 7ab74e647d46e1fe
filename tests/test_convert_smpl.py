"""Round-trip test for the SMPL pkl converter using a synthetic pickle that
mimics the official file layout (chumpy-wrapped arrays, sparse regressor)."""

import pickle

import numpy as np
import pytest


def _fake_smpl_pkl(path, num_verts=100):
    import scipy.sparse as sp

    rs = np.random.RandomState(0)
    kintree = np.zeros((2, 24), np.int64)
    from tepose_tpu.models.smpl import SMPL_PARENTS

    kintree[0] = np.where(np.array(SMPL_PARENTS) < 0, 4294967295,
                          SMPL_PARENTS)

    data = {
        "v_template": rs.randn(num_verts, 3).astype(np.float64),
        "shapedirs": rs.randn(num_verts, 3, 10).astype(np.float64),
        "posedirs": rs.randn(num_verts, 3, 207).astype(np.float64),
        "J_regressor": sp.csc_matrix(
            np.abs(rs.rand(24, num_verts)).astype(np.float64)),
        "weights": np.abs(rs.rand(num_verts, 24)).astype(np.float64),
        "kintree_table": kintree,
        "f": rs.randint(0, num_verts, (50, 3)).astype(np.uint32),
    }
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return data


def test_convert_smpl_roundtrip(tmp_path):
    import sys
    import os.path as osp

    sys.path.insert(0, osp.join(osp.dirname(osp.dirname(
        osp.abspath(__file__))), "tools"))
    import convert_smpl

    pkl = str(tmp_path / "SMPL_TEST.pkl")
    ref = _fake_smpl_pkl(pkl)
    jre = str(tmp_path / "jre.npy")
    np.save(jre, np.random.rand(9, 100).astype(np.float32))
    out = str(tmp_path / "smpl_test.npz")
    convert_smpl.convert(pkl, out, j_regressor_extra=jre)

    with np.load(out) as z:
        np.testing.assert_allclose(z["v_template"],
                                   ref["v_template"].astype(np.float32))
        assert z["posedirs"].shape == (207, 300)
        # layout: pose_feature @ posedirs must equal the einsum on the
        # original (V, 3, 207) tensor
        pf = np.random.RandomState(1).randn(207).astype(np.float32)
        ours = (pf @ z["posedirs"]).reshape(100, 3)
        expect = np.einsum("vck,k->vc",
                           ref["posedirs"].astype(np.float32), pf)
        np.testing.assert_allclose(ours, expect, atol=1e-4)
        np.testing.assert_allclose(
            z["j_regressor"], ref["J_regressor"].toarray(), atol=1e-6)
        assert z["parents"][0] == -1
        assert z["parents"][1] == 0
        assert z["j_regressor_extra"].shape == (9, 100)

    # loads through the framework loader
    from tepose_tpu.models.smpl import load_smpl_assets, smpl_forward
    import jax.numpy as jnp

    model = load_smpl_assets(out)
    o = smpl_forward(model, jnp.zeros((1, 10)),
                     jnp.broadcast_to(jnp.eye(3), (1, 24, 3, 3)))
    assert o["verts"].shape == (1, 100, 3)
    assert np.all(np.isfinite(np.asarray(o["verts"])))

"""tools/verify_release.py — one-command release verification.

Light tier: the expected-table/gating logic and the RUNS table vs
BASELINE.md. Heavy tier: the full self-test subprocess — fabricate a
reference-layout release (6890-vert SMPL pkl, .pth.tar checkpoints keyed
like the reference trainer saves them, joblib eval DBs), convert it with
the production converters, evaluate through the production evaluate stack
on all three dataset branches, and verify the PA-MPJPE gate both ways.

ref: /root/reference/evaluate.py:68-462, /root/reference/README.md:72-100.
"""

import json
import os
import os.path as osp
import subprocess
import sys

import pytest

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from tools import verify_release as VR  # noqa: E402

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def test_runs_table_matches_baseline():
    """Six runs, one per BASELINE.md reproduction command; every expected
    row carries the PA gate metric, and 3dpw rows carry mpvpe (Table 1/2
    publish MPVPE only for 3dpw)."""
    assert len(VR.RUNS) == 6
    keys = {VR._run_key(r) for r in VR.RUNS}
    assert keys == {
        "3dpw:repr_wpw_3dpw_model", "3dpw:repr_wopw_3dpw_model",
        "h36m:repr_wpw_h36m_mpii3d_model", "h36m:repr_wopw_h36m_model",
        "mpii3d:repr_wpw_h36m_mpii3d_model",
        "mpii3d:repr_wopw_mpii3d_model"}
    for r in VR.RUNS:
        assert "pa_mpjpe" in r["expected"]
        assert ("mpvpe" in r["expected"]) == (r["dataset"] == "3dpw")
    # spot-pin the transcribed table values (BASELINE.md)
    by = {VR._run_key(r): r["expected"] for r in VR.RUNS}
    assert by["3dpw:repr_wpw_3dpw_model"]["pa_mpjpe"] == 52.3
    assert by["h36m:repr_wopw_h36m_model"]["mpjpe"] == 61.6
    assert by["mpii3d:repr_wpw_h36m_mpii3d_model"]["accel_err"] == 16.7


def test_check_run_gates_on_pa_only():
    run = {"dataset": "3dpw", "title": "t",
           "expected": {"pa_mpjpe": 52.3, "mpjpe": 84.6}}
    ok, rows = VR.check_run(run, {"pa_mpjpe": 52.35, "mpjpe": 90.0},
                            tol_pa=0.1, tol_other=0.15)
    assert ok  # PA within 0.1; mpjpe informational only
    assert not rows["mpjpe"]["within"]
    ok, rows = VR.check_run(run, {"pa_mpjpe": 52.45, "mpjpe": 84.6},
                            tol_pa=0.1, tol_other=0.15)
    assert not ok
    ok, _ = VR.check_run(run, {"mpjpe": 84.6}, 0.1, 0.15)
    assert not ok  # missing PA metric cannot pass


def test_ckpt_names_follow_configs():
    """Converted checkpoint filenames come from the configs' PRETRAINED
    entries, so the released .pth.tar mapping is 1:1 by stem."""
    assert VR._ckpt_npz_name("repr_wpw_3dpw_model") == \
        "tepose_wpw_3dpw_test.npz"
    assert VR._ckpt_npz_name("repr_wpw_h36m_mpii3d_model").endswith(".npz")


@pytest.mark.heavy
def test_self_test_end_to_end(tmp_path):
    """The full fabricate->convert->evaluate->gate flow in a fresh CPU
    subprocess (the tool's own --self-test), exit code 0 + report."""
    report = tmp_path / "report.json"
    script = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import sys\n"
        f"sys.argv = ['verify_release.py', '--self-test', "
        f"'--workdir', {str(tmp_path / 'work')!r}, "
        f"'--report', {str(report)!r}]\n"
        "from tools import verify_release\n"
        "sys.exit(verify_release.main())\n")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # same-host compile+execute: share the suite's CPU compile cache so
    # repeat runs skip the subprocess's compile cost (utils/cache.py opt-in)
    env["TEPOSE_JAX_CACHE"] = os.path.join(str(REPO), ".jax_cache_cpu")
    out = subprocess.run([sys.executable, "-c", script], cwd=REPO, env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, timeout=2400)
    assert out.returncode == 0, out.stdout[-4000:]
    rep = json.loads(report.read_text())
    assert rep["self_test"] == "ok"
    assert set(rep["runs"]) == set(VR.SELFTEST_KEYS)
    for rr in rep["runs"].values():
        for row in rr["metrics"].values():
            assert row["measured"] is not None

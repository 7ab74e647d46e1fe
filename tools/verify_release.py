#!/usr/bin/env python
"""One-command release verification: released torch assets in, pass/fail out.

Given the reference release's assets — the five TePose checkpoints
(`tepose_*_test.pth.tar`), the VIBE bootstrap checkpoint, the licensed SMPL
neutral pkl (+ SPIN's J_regressor_extra.npy / J_regressor_h36m.npy) and the
preprocessed eval DBs — this tool converts everything once and runs all six
BASELINE.md reproduction evaluations, checking the measured metrics against
the transcribed paper tables. The north-star gate is PA-MPJPE within
``--tol-pa`` (default 0.1 mm, BASELINE.md) on every run; the other table
metrics are reported with their own within-tolerance flags but do not gate.

ref: /root/reference/evaluate.py:68-462 (the reproduction loop),
/root/reference/README.md:72-100 (the six commands; tables transcribed in
BASELINE.md).

Usage (real assets):

  python tools/verify_release.py \\
      --ckpt-dir   ~/tepose_release/pretrained_models \\
      --vibe       ~/tepose_release/vibe_model_wo_3dpw.pth.tar \\
      --smpl       ~/smpl/SMPL_NEUTRAL.pkl \\
      --j-regressor-extra ~/spin_data/J_regressor_extra.npy \\
      --j-regressor-h36m  ~/spin_data/J_regressor_h36m.npy \\
      --db-dir     ~/tepose_release/preprocessed_data \\
      [--workdir W] [--only 3dpw:repr_wpw_3dpw_model] [--tol-pa 0.1] \\
      [--report report.json]

Exit code 0 iff every selected run passes the PA-MPJPE gate.

Self-test (no real assets needed; fabricates reference-layout inputs —
full-size 6890-vert SMPL pkl, reference-layout .pth.tar checkpoints, joblib
eval DBs — and exercises the identical convert→evaluate→gate flow):

  python tools/verify_release.py --self-test [--workdir W]
"""

import argparse
import json
import os
import os.path as osp
import pickle
import shutil
import sys
import time
from types import SimpleNamespace

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

# The six reproduction runs (BASELINE.md "Reproduction commands") with the
# expected metrics transcribed from the reference README's result tables
# (BASELINE.md Tables 1-2; all mm, lower is better).
RUNS = [
    {"dataset": "3dpw", "title": "repr_wpw_3dpw_model",
     "expected": {"pa_mpjpe": 52.3, "mpjpe": 84.6, "mpvpe": 100.3,
                  "accel_err": 11.4}},
    {"dataset": "3dpw", "title": "repr_wopw_3dpw_model",
     "expected": {"pa_mpjpe": 56.1, "mpjpe": 93.9, "mpvpe": 115.9,
                  "accel_err": 11.7}},
    {"dataset": "h36m", "title": "repr_wpw_h36m_mpii3d_model",
     "expected": {"pa_mpjpe": 47.1, "mpjpe": 68.6, "accel_err": 12.1}},
    {"dataset": "h36m", "title": "repr_wopw_h36m_model",
     "expected": {"pa_mpjpe": 41.2, "mpjpe": 61.6, "accel_err": 12.0}},
    {"dataset": "mpii3d", "title": "repr_wpw_h36m_mpii3d_model",
     "expected": {"pa_mpjpe": 63.1, "mpjpe": 96.2, "accel_err": 16.7}},
    {"dataset": "mpii3d", "title": "repr_wopw_mpii3d_model",
     "expected": {"pa_mpjpe": 62.9, "mpjpe": 99.5, "accel_err": 17.2}},
]


def _run_key(run) -> str:
    return f"{run['dataset']}:{run['title']}"


def _point_data_dirs(base_data: str, db_dir: str) -> None:
    """Repoint the package's data directories at the workdir, both for this
    process (rebinding the already-imported module constants) and any
    subprocesses (env vars, read at tepose_tpu.config import)."""
    os.environ["TEPOSE_BASE_DATA_DIR"] = base_data
    os.environ["TEPOSE_DB_DIR"] = db_dir
    import tepose_tpu.config as C

    C.BASE_DATA_DIR = base_data
    C.TePose_DB_DIR = db_dir
    import tepose_tpu.data.db as db_mod  # module-level by-value import

    db_mod.TePose_DB_DIR = db_dir


def _ckpt_npz_name(title: str) -> str:
    """The converted checkpoint filename a config expects, from the config
    itself (configs/*.yaml TRAIN.PRETRAINED)."""
    from tepose_tpu.config import update_cfg

    cfg = update_cfg(osp.join(REPO, "configs", f"{title}.yaml"))
    return osp.basename(cfg.TRAIN.PRETRAINED)


def convert_assets(args, workdir: str, titles) -> dict:
    """Convert the release's torch/pkl assets into the workdir layout the
    evaluate stack reads (base_data/ + pretrained_models/). Returns
    title -> converted checkpoint path."""
    from tools.convert_checkpoint import convert_forward
    from tools.convert_smpl import convert as convert_smpl

    base = osp.join(workdir, "base_data")
    pret = osp.join(workdir, "pretrained_models")
    os.makedirs(base, exist_ok=True)
    os.makedirs(pret, exist_ok=True)

    print("== converting assets ==")
    convert_smpl(args.smpl, osp.join(base, "smpl_neutral.npz"),
                 args.j_regressor_extra)
    shutil.copyfile(args.j_regressor_h36m,
                    osp.join(base, "J_regressor_h36m.npy"))
    convert_forward(args.vibe, osp.join(base, "vibe_wo_3dpw.npz"),
                    kind="vibe")

    out = {}
    for title in titles:
        npz_name = _ckpt_npz_name(title)
        src = osp.join(args.ckpt_dir,
                       npz_name.replace(".npz", ".pth.tar"))
        if not osp.isfile(src):
            raise FileNotFoundError(
                f"{src} not found — expected the released checkpoint for "
                f"{title} under --ckpt-dir (named after the config's "
                f"TRAIN.PRETRAINED with a .pth.tar suffix)")
        dst = osp.join(pret, npz_name)
        convert_forward(src, dst, kind="tepose")
        out[title] = dst
    return out


def evaluate_run(run, ckpt_path: str, eval_batch=None, eval_bucket=None):
    """One BASELINE.md reproduction evaluation through the production
    evaluate stack; returns its metrics dict (mm)."""
    import evaluate as ev
    from tepose_tpu.config import update_cfg

    cfg = update_cfg(osp.join(REPO, "configs", f"{run['title']}.yaml"))
    cfg.TRAIN.PRETRAINED = ckpt_path
    ns = SimpleNamespace(dataset=run["dataset"], seq="", render=False,
                         render_plain=False, filter=False, plot=False,
                         frame=0, eval_batch=eval_batch,
                         eval_bucket=eval_bucket)
    with ev.precision_scope("tensorfloat32"):
        return ev.run_eval(cfg, ns, synthetic=False)


def check_run(run, res: dict, tol_pa: float, tol_other: float):
    """Gate a run's measured metrics against its expected table row.
    Pass/fail rides on PA-MPJPE alone (the BASELINE.md north star); the
    other metrics carry informational within-tolerance flags."""
    rows = {}
    ok = True
    for k, exp in run["expected"].items():
        got = res.get(k)
        tol = tol_pa if k == "pa_mpjpe" else tol_other
        within = got is not None and abs(got - exp) <= tol
        rows[k] = {"expected": exp, "measured": got, "tol": tol,
                   "within": bool(within)}
        if k == "pa_mpjpe" and not within:
            ok = False
    return ok, rows


def verify(args, runs) -> dict:
    workdir = args.workdir or osp.join(REPO, "verify_release_work")
    os.makedirs(workdir, exist_ok=True)
    _point_data_dirs(osp.join(workdir, "base_data"), args.db_dir)

    titles = sorted({r["title"] for r in runs})
    ckpts = convert_assets(args, workdir, titles)

    report = {"runs": {}, "tol_pa": args.tol_pa, "tol_other": args.tol_other,
              "workdir": workdir, "time": time.time()}
    all_ok = True
    for run in runs:
        key = _run_key(run)
        print(f"\n== evaluate {key} ==")
        res = evaluate_run(run, ckpts[run["title"]],
                           eval_batch=args.eval_batch,
                           eval_bucket=args.eval_bucket)
        ok, rows = check_run(run, res, args.tol_pa, args.tol_other)
        all_ok &= ok
        report["runs"][key] = {"pass": ok, "metrics": rows,
                               "raw": {k: float(v) for k, v in res.items()}}
        verdict = "PASS" if ok else "FAIL"
        pa = rows["pa_mpjpe"]
        print(f"{verdict} {key}: PA-MPJPE {pa['measured']:.4f} vs "
              f"{pa['expected']} (tol {pa['tol']} mm)")
        for k, row in rows.items():
            if k != "pa_mpjpe" and not row["within"]:
                print(f"  note: {k} {row['measured']:.4f} vs "
                      f"{row['expected']} outside ±{row['tol']} mm "
                      "(informational)")
    report["pass"] = bool(all_ok)
    return report


# ---------------------------------------------------------------------------
# Self-test: fabricate reference-layout assets, run the identical flow
# ---------------------------------------------------------------------------

# one run per eval-dataset branch (3dpw mpvpe path, h36m J14 regression,
# mpii3d validity masking) — the other three runs reuse the same code paths
SELFTEST_KEYS = ("3dpw:repr_wpw_3dpw_model", "h36m:repr_wopw_h36m_model",
                 "mpii3d:repr_wopw_mpii3d_model")


def _fabricate_smpl_pkl(dirpath: str):
    """A full-size (6890-vert) SMPL pickle in the official layout
    (ref: lib/models/smpl.py:61-84 field names), numerically the package's
    synthetic model so conversion round-trips are checkable."""
    from tepose_tpu.models.smpl import synthetic_smpl_model

    m = synthetic_smpl_model(seed=0)
    V = m.num_verts
    posedirs = np.asarray(m.posedirs)            # ours: (207, V*3)
    parents = np.asarray(m.parents, np.int64)
    kintree = np.stack([parents, np.arange(24, dtype=np.int64)])
    kintree[0, 0] = 2 ** 32 - 1                  # official root marker
    idx = np.arange(V - 2)
    faces = np.stack([idx, idx + 1, idx + 2], 1)[::7].astype(np.int32)
    data = {
        "v_template": np.asarray(m.v_template),
        "shapedirs": np.asarray(m.shapedirs),
        "posedirs": posedirs.T.reshape(V, 3, 207),
        "J_regressor": np.asarray(m.j_regressor),
        "weights": np.asarray(m.lbs_weights),
        "kintree_table": kintree,
        "f": faces,
    }
    pkl = osp.join(dirpath, "SMPL_NEUTRAL.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(data, f)
    jre = osp.join(dirpath, "J_regressor_extra.npy")
    np.save(jre, np.asarray(m.j_regressor_extra))
    rs = np.random.RandomState(7)
    jh = (rs.rand(17, V) ** 8).astype(np.float32)
    jh /= jh.sum(1, keepdims=True)
    jh36m = osp.join(dirpath, "J_regressor_h36m.npy")
    np.save(jh36m, jh)
    return pkl, jre, jh36m


def _fabricate_checkpoints(dirpath: str, titles):
    """Reference-layout .pth.tar checkpoints (gen_state_dict keyed the way
    the reference trainer saves them, ref: lib/core/trainer.py:392-401) from
    fresh random inits of the real config shapes."""
    import jax
    import torch

    from tepose_tpu.config import update_cfg
    from tepose_tpu.models.tepose import (
        TePoseConfig, VibeConfig, tepose_init, vibe_init)
    from tepose_tpu.train.checkpoint import export_torch_generator

    cpu = jax.local_devices(backend="cpu")[0]

    def save(params, path, performance):
        sd = {k: torch.from_numpy(np.array(v))
              for k, v in export_torch_generator(params).items()}
        torch.save({"gen_state_dict": sd, "performance": performance,
                    "epoch": 30}, path)

    for i, title in enumerate(titles):
        cfg = update_cfg(osp.join(REPO, "configs", f"{title}.yaml"))
        mcfg = TePoseConfig(seqlen=cfg.DATASET.SEQLEN,
                            n_layers=cfg.MODEL.TGRU.NUM_LAYERS,
                            hidden_size=cfg.MODEL.TGRU.HIDDEN_SIZE)
        with jax.default_device(cpu):
            gen = tepose_init(jax.random.PRNGKey(10 + i), mcfg)
        save(gen, osp.join(
            dirpath, _ckpt_npz_name(title).replace(".npz", ".pth.tar")),
            performance=52.3)

    vcfg = VibeConfig(seqlen=16, n_layers=2, hidden_size=1024,
                      add_linear=True)
    with jax.default_device(cpu):
        vibe = vibe_init(jax.random.PRNGKey(99), vcfg)
    vibe_path = osp.join(dirpath, "vibe_model_wo_3dpw.pth.tar")
    save(vibe, vibe_path, performance=56.5)
    return vibe_path


def _fabricate_eval_dbs(db_dir: str, runs):
    """Joblib eval DBs in the reference's preprocessed layout (flat
    frame-major arrays + per-frame vid_name; ref: evaluate.py:146-207) for
    every stem the selected runs read."""
    import joblib

    from tepose_tpu.data.db import eval_db_paths

    os.makedirs(db_dir, exist_ok=True)
    made = set()
    for run in runs:
        db_file, pse_file = eval_db_paths(run["dataset"], run["title"],
                                          db_dir=db_dir)
        if db_file in made:
            continue
        made.add(db_file)
        rs = np.random.RandomState(len(made))
        chunks, names = [], []
        for v in range(3):
            n = int(rs.randint(36, 60))
            names += [f"fab_{run['dataset']}_vid{v}"] * n
            chunks.append(n)
        N = len(names)
        db = {
            "vid_name": np.array(names),
            "features": (rs.randn(N, 2048) * 0.1).astype(np.float32),
            "joints3D": (rs.randn(N, 49, 3) * 0.2).astype(np.float32),
            "bbox": np.tile([120.0, 120, 80, 80],
                            (N, 1)).astype(np.float32),
        }
        if run["dataset"] == "mpii3d":
            valid_i = np.ones((N, 1), np.int64)
            valid_i[5:8] = 0  # exercise the validity mask
            db["valid_i"] = valid_i
        else:
            db["pose"] = (rs.randn(N, 72) * 0.2).astype(np.float32)
            db["shape"] = (rs.randn(N, 10) * 0.2).astype(np.float32)
        joblib.dump(db, db_file)
        pse = np.concatenate(
            [np.tile([1.0, 0, 0], (N, 1)),
             rs.randn(N, 82) * 0.1], axis=1).astype(np.float32)
        joblib.dump(pse, pse_file)


def self_test(args) -> dict:
    """Fabricate a complete reference-layout release and run the identical
    convert→evaluate→gate flow end-to-end, then check the gating logic in
    both directions. Random weights can't reproduce the paper tables, so
    the evaluation gates are checked against the MEASURED numbers (pass)
    and a 1 mm perturbation (fail)."""
    workdir = args.workdir or osp.join(REPO, "verify_release_selftest")
    shutil.rmtree(workdir, ignore_errors=True)
    fab = osp.join(workdir, "fabricated")
    os.makedirs(fab, exist_ok=True)

    runs = [r for r in RUNS if _run_key(r) in SELFTEST_KEYS]
    titles = sorted({r["title"] for r in runs})

    print("== fabricating reference-layout release assets ==")
    smpl_pkl, jre, jh36m = _fabricate_smpl_pkl(fab)
    vibe = _fabricate_checkpoints(fab, titles)
    db_dir = osp.join(fab, "preprocessed_data")
    _fabricate_eval_dbs(db_dir, runs)

    st_args = SimpleNamespace(
        ckpt_dir=fab, vibe=vibe, smpl=smpl_pkl, j_regressor_extra=jre,
        j_regressor_h36m=jh36m, db_dir=db_dir, workdir=workdir,
        tol_pa=args.tol_pa, tol_other=args.tol_other,
        # tiny buckets: the fabricated videos are <60 frames; production
        # defaults would pad them to 128/256 for nothing
        eval_batch=4, eval_bucket=32)
    report = verify(st_args, runs)

    # random weights vs paper tables: the flow must COMPLETE and measure
    # finite metrics; the expected-table gates necessarily read FAIL
    for key, rr in report["runs"].items():
        for k, row in rr["metrics"].items():
            assert row["measured"] is not None and \
                np.isfinite(row["measured"]), (key, k, row)
        assert not rr["pass"], f"{key} passed with random weights?"

    # gate logic: measured==expected passes; a 1 mm PA offset fails
    run0 = dict(runs[0])
    measured = {k: report["runs"][_run_key(run0)]["metrics"][k]["measured"]
                for k in run0["expected"]}
    run0["expected"] = measured
    ok, _ = check_run(run0, measured, args.tol_pa, args.tol_other)
    assert ok, "gate rejected exact-match metrics"
    shifted = dict(measured)
    shifted["pa_mpjpe"] += 1.0
    ok, _ = check_run(run0, shifted, args.tol_pa, args.tol_other)
    assert not ok, "gate accepted a 1 mm PA-MPJPE deviation"

    report["self_test"] = "ok"
    print("\nself-test OK: convert→evaluate→gate flow ran end-to-end on "
          f"{len(runs)} fabricated runs; gating verified both directions")
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--ckpt-dir", help="dir of released tepose_*_test.pth.tar")
    ap.add_argument("--vibe", help="released VIBE checkpoint "
                                   "(vibe_model_wo_3dpw.pth.tar)")
    ap.add_argument("--smpl", help="licensed SMPL neutral .pkl")
    ap.add_argument("--j-regressor-extra", help="SPIN J_regressor_extra.npy")
    ap.add_argument("--j-regressor-h36m", help="SPIN J_regressor_h36m.npy")
    ap.add_argument("--db-dir", help="preprocessed eval DB dir "
                                     "(*_db.pt / *_pseudotheta.pt)")
    ap.add_argument("--workdir", default="",
                    help="where converted assets land (reused across runs)")
    ap.add_argument("--only", action="append", default=[],
                    help="restrict to dataset:title runs (repeatable); "
                         f"choices: {[_run_key(r) for r in RUNS]}")
    ap.add_argument("--tol-pa", type=float, default=0.1,
                    help="PA-MPJPE pass gate in mm (BASELINE.md north star)")
    ap.add_argument("--tol-other", type=float, default=0.15,
                    help="informational tolerance for the other table "
                         "metrics (the tables round to 0.1 mm)")
    ap.add_argument("--eval-batch", type=int, default=None)
    ap.add_argument("--eval-bucket", type=int, default=None)
    ap.add_argument("--report", default="",
                    help="write the JSON report here")
    ap.add_argument("--self-test", action="store_true",
                    help="fabricate reference-layout assets and verify the "
                         "whole flow without real data")
    args = ap.parse_args(argv)

    if args.self_test:
        report = self_test(args)
    else:
        missing = [f for f in ("ckpt_dir", "vibe", "smpl",
                               "j_regressor_extra", "j_regressor_h36m",
                               "db_dir")
                   if not getattr(args, f)]
        if missing:
            ap.error("missing required inputs: "
                     + ", ".join("--" + m.replace("_", "-")
                                 for m in missing)
                     + " (or run --self-test)")
        runs = RUNS
        if args.only:
            bad = set(args.only) - {_run_key(r) for r in RUNS}
            if bad:
                ap.error(f"unknown --only {sorted(bad)}")
            runs = [r for r in RUNS if _run_key(r) in set(args.only)]
        report = verify(args, runs)

    if args.report:
        with open(args.report, "w") as f:
            json.dump(report, f, indent=2)
        print(f"report written to {args.report}")
    if not args.self_test:
        print("\n== RELEASE VERIFICATION "
              + ("PASSED" if report["pass"] else "FAILED") + " ==")
    return 0 if (args.self_test or report["pass"]) else 1


if __name__ == "__main__":
    sys.exit(main())

"""Multi-process (multi-host pod) runtime tests.

The reference has no multi-host story (its only distributed vestige is the
unused DataParallel prefix stripper, ref: lib/utils/utils.py:40-45); the
rebuild's bar is SURVEY.md §2.6: jax.distributed coordination + per-host
data loading, with multi-process numerics identical to single-process.

Light tier: per-host BatchLoader sharding and the distributed.* helpers in
the single-process runtime. Heavy tier: real 2-process x 4-CPU-device runs
(fresh subprocesses — the suite's own 8-device runtime is untouched):

- mp_dryrun.spawn_and_compare: sharded GAN train step + eval scan, results
  pinned against the 1-process 8-device run.
- train.py CLI with TEPOSE_COORDINATOR env: end-to-end fit() across two
  coordinated processes, primary-only artifact ownership.
"""

import json
import os
import os.path as osp
import socket
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from tepose_tpu.data.loaders import BatchLoader  # noqa: E402
from tepose_tpu.parallel import distributed  # noqa: E402

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


class _ToyDataset:
    def __init__(self, n=32):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((3,), float(i), np.float32),
                "idx": np.int64(i)}


def _take(loader, k):
    it = iter(loader)
    out = [next(it) for _ in range(k)]
    loader.close()
    return out


# ---------------------------------------------------------------- loaders

def test_batchloader_shards_concatenate_to_global_batch():
    """Process-major concatenation of per-shard batches == the unsharded
    batch, for every batch of several epochs (same seed => same epoch
    permutation on every 'process')."""
    k = 9  # spans > 2 epochs of 4 batches
    full = _take(BatchLoader(_ToyDataset(), 8, seed=5), k)
    shard0 = _take(BatchLoader(_ToyDataset(), 8, seed=5,
                               num_shards=2, shard_index=0), k)
    shard1 = _take(BatchLoader(_ToyDataset(), 8, seed=5,
                               num_shards=2, shard_index=1), k)
    for b, s0, s1 in zip(full, shard0, shard1):
        assert s0["x"].shape == (4, 3) and s1["x"].shape == (4, 3)
        np.testing.assert_array_equal(
            np.concatenate([s0["x"], s1["x"]]), b["x"])
        np.testing.assert_array_equal(
            np.concatenate([s0["idx"], s1["idx"]]), b["idx"])


def test_batchloader_shard_validation():
    with pytest.raises(ValueError, match="does not divide"):
        BatchLoader(_ToyDataset(), 6, num_shards=4)
    with pytest.raises(ValueError, match="out of range"):
        BatchLoader(_ToyDataset(), 8, num_shards=2, shard_index=2)
    with pytest.raises(ValueError, match="drop_last"):
        BatchLoader(_ToyDataset(), 8, num_shards=2, drop_last=False)


def test_get_data_loaders_sharded_split(tmp_path):
    """get_data_loaders threads num_shards into the three TRAIN loaders but
    leaves the valid loader whole."""
    from tests.test_datasets import synthetic_2d_db, synthetic_3d_db
    from tepose_tpu.config import get_cfg_defaults
    from tepose_tpu.data.loaders import get_data_loaders

    rs = np.random.RandomState(0)
    db3, pse3 = synthetic_3d_db(
        rs, videos=tuple((30, f"v{i}") for i in range(6)))
    db2, pse2 = synthetic_2d_db(
        rs, clips=tuple((16, f"c{i}") for i in range(40)))
    amass = {"vid_name": np.array(["m"] * 200),
             "theta": rs.randn(200, 82).astype(np.float32) * 0.2}
    over = {"mpii3d": (db3, pse3), "3dpw": (db3, pse3),
            "threedpw": (db3, pse3), "posetrack": (db2, pse2),
            "insta": (db2, pse2), "amass": (amass, None)}
    cfg = get_cfg_defaults()
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TRAIN.DATA_2D_RATIO = 0.5
    cfg.DATASET.VIDLEN = 24
    t2, t3, disc, valid = get_data_loaders(cfg, db_overrides=over,
                                           num_shards=2, shard_index=1)
    assert (t2.num_shards, t2.shard_index) == (2, 1)
    assert (t3.num_shards, t3.shard_index) == (2, 1)
    assert (disc.num_shards, disc.shard_index) == (2, 1)
    assert valid.num_shards == 1  # every process evaluates the full set
    b3 = _take(t3, 1)[0]
    assert b3["features"].shape[0] == 2  # 4 global 3D rows / 2 shards
    for ld in (t2, disc, valid):
        ld.close()


# ------------------------------------------------- single-process helpers

def test_distributed_helpers_single_process():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tepose_tpu.parallel.mesh import make_mesh

    assert distributed.process_count() == 1
    assert distributed.is_primary()
    assert distributed.host_local_rows(8) == slice(0, 8)
    assert distributed.broadcast_str("abc") == "abc"
    distributed.barrier("noop")  # must be a no-op

    tree = {"a": np.arange(8.0), "s": np.float32(3.0)}
    sliced = distributed.host_slice_tree(tree)
    np.testing.assert_array_equal(sliced["a"], tree["a"])

    mesh = make_mesh()
    x = distributed.put_global(np.arange(16.0).reshape(8, 2),
                               NamedSharding(mesh, P("data")))
    assert isinstance(x, jax.Array)
    np.testing.assert_array_equal(distributed.fetch_global(x),
                                  np.arange(16.0).reshape(8, 2))


# ------------------------------------------------------------- heavy tier

def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.heavy
def test_mp_dryrun_two_processes_match_single_process():
    """2 coordinated processes x 4 devices reproduce the 1-process
    8-device sharded train step + eval scan (the VERDICT r4 #1 'done'
    criterion)."""
    from tepose_tpu.parallel.mp_dryrun import spawn_and_compare

    ref = spawn_and_compare(num_processes=2, total_devices=8, verbose=False)
    assert ref["process_count"] == 1 and ref["n_devices"] == 8
    assert np.isfinite(ref["train_metrics"]["gen_loss"])


@pytest.mark.heavy
def test_train_cli_two_processes(tmp_path):
    """train.py --synthetic across 2 coordinated processes: fit() completes
    on both, and the primary alone owns logdir artifacts (checkpoint,
    metrics.jsonl, config snapshot, log file)."""
    out_dir = tmp_path / "out"
    cfg_file = tmp_path / "tiny.yaml"
    cfg_file.write_text(
        "DEBUG: false\n"
        f"OUTPUT_DIR: {out_dir}\n"
        "TRAIN:\n"
        "  BATCH_SIZE: 16\n"  # n_2d=n_3d=8, divisible by the 8-device mesh
        "  DATA_2D_RATIO: 0.5\n"
        "  END_EPOCH: 1\n"
        "  NUM_ITERS_PER_EPOCH: 2\n"
        "  MOT_DISCR:\n"
        "    GCN:\n"
        "      num_gcn_scales: 3\n"
        "      num_g3d_scales: 2\n"
        "MODEL:\n"
        "  TGRU:\n"
        "    NUM_LAYERS: 1\n"
        "    HIDDEN_SIZE: 32\n"
        "DATASET:\n"
        "  SEQLEN: 6\n"
        "  VIDLEN: 12\n")

    port = _free_port()
    script = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_num_cpu_devices', 4)\n"
        "import sys\n"
        f"sys.argv = ['train.py', '--cfg', {str(cfg_file)!r}, "
        "'--synthetic', '--smoke-verts', '64']\n"
        "import train\n"
        "train.main()\n")
    procs = []
    for p in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env.update({
            "TEPOSE_COORDINATOR": f"localhost:{port}",
            "TEPOSE_NUM_PROCESSES": "2",
            "TEPOSE_PROCESS_ID": str(p),
            # same-host compile+execute: share the suite's CPU compile
            # cache so repeat runs skip the workers' compile cost
            "TEPOSE_JAX_CACHE": os.path.join(str(REPO), ".jax_cache_cpu"),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", script], cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    logs = []
    for p, proc in enumerate(procs):
        out, _ = proc.communicate(timeout=900)
        logs.append(out)
        assert proc.returncode == 0, f"worker {p} failed:\n{out[-4000:]}"

    # exactly ONE experiment dir (the broadcast logdir), primary-owned
    exps = [d for d in out_dir.iterdir() if d.is_dir()]
    assert len(exps) == 1, exps
    exp = exps[0]
    for artifact in ("checkpoint.npz", "metrics.jsonl", "config.yaml",
                     "train_log.txt"):
        assert (exp / artifact).exists(), (artifact, list(exp.iterdir()))
    # metrics are a single uncorrupted JSONL stream (one writer)
    with open(exp / "metrics.jsonl") as f:
        rows = [json.loads(line) for line in f]
    assert rows and any(r["tag"] == "train_loss/gen_loss" for r in rows)
    # non-primary console lines carry the process prefix
    assert "[p1]" in logs[1]

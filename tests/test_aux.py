"""Aux subsystems: checkpoint/resume, profiling, mesh helpers, config."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from gaussianip_tpu.model.gaussians import create_from_pcd
from gaussianip_tpu.parallel.mesh import make_data_mesh, put_sharded
from gaussianip_tpu.system.stage1 import init_train_state
from gaussianip_tpu.utils.checkpoint import (
    load_train_state,
    load_train_state_npz,
    save_train_state,
    save_train_state_npz,
)
from gaussianip_tpu.utils.config import C, load_config
from gaussianip_tpu.utils.profiling import Counters, StageTimer


def _ts(rng):
    pts = rng.normal(size=(12, 3)).astype(np.float32)
    gs = create_from_pcd(pts, np.full((12, 3), 0.5, np.float32), 16,
                         rng.uniform(0.001, 0.01, 12))
    return init_train_state(gs)


def test_checkpoint_roundtrip_orbax(tmp_path, rng):
    ts = _ts(rng)
    p = save_train_state(str(tmp_path / "ck"), ts)
    ts2 = load_train_state(p, ts)
    for a, b in zip(jax.tree_util.tree_leaves(ts),
                    jax.tree_util.tree_leaves(ts2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip_npz(tmp_path, rng):
    ts = _ts(rng)
    p = save_train_state_npz(str(tmp_path / "ck.npz"), ts)
    ts2 = load_train_state_npz(p, ts)
    for a, b in zip(jax.tree_util.tree_leaves(ts),
                    jax.tree_util.tree_leaves(ts2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_profiling_utils(tmp_path):
    c = Counters()
    c.add("loss", 2.0)
    c.add("loss", 4.0)
    assert c.mean("loss") == 3.0
    out = c.dump(str(tmp_path / "c.json"))
    assert out["loss"]["n"] == 2
    manifest = {}
    t = StageTimer(lambda **kw: manifest.update(kw))
    with t.stage("s1"):
        pass
    assert "wall_s_s1" in manifest


def test_code_snapshot(tmp_path):
    from gaussianip_tpu.utils.saving import RunDirs

    dirs = RunDirs(str(tmp_path), "run1")
    commit = dirs.snapshot_code()  # repo root is a git checkout
    assert commit is not None and len(commit) == 40
    with open(os.path.join(dirs.root, "code", "COMMIT")) as f:
        assert f.read().strip() == commit
    assert dirs.manifest()["code_commit"] == commit
    # non-repo dir degrades to None, no crash
    assert RunDirs(str(tmp_path), "run2").snapshot_code(
        repo_dir=str(tmp_path)) is None


def test_mesh_helpers():
    mesh = make_data_mesh(8)
    x = np.zeros((8, 4), np.float32)
    xs = put_sharded(mesh, {"a": x})
    assert xs["a"].sharding.spec == jax.sharding.PartitionSpec("data", None)


def test_config_interpolation(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        "a:\n  b: hello world\nref: ${a.b}\n"
        "tag: ${rmspace:${a.b},_}\nnum: 5\n"
    )
    cfg = load_config(str(p), "num=7", "a.c=new")
    assert cfg["ref"] == "hello world"
    assert cfg["tag"] == "hello_world"
    assert cfg["num"] == 7 and cfg["a"]["c"] == "new"


def test_scheduled_scalar():
    assert C(2.5, 100) == 2.5
    # [start_step, start_val, end_val, end_step]
    assert C([0, 0.0, 1.0, 100], 50) == 0.5
    assert C([100, 1.0, 3.0, 200], 0) == 1.0
    assert C([100, 1.0, 3.0, 200], 300) == 3.0
    # legacy 3-element form [start_val, end_val, end_step]
    assert C([0.0, 1.0, 10], 5) == 0.5

"""End-to-end product-CLI run on the 8-virtual-device CPU mesh.

Drives launch.run_stage1 -> run_stage2 -> run_stage3 exactly as
`python launch.py --train` would (stub guidance, tiny shapes), with the
data mesh auto-built from the visible devices — validating that the
SHIPPED CLI shards all three stages (the reference pins one GPU,
reference: launch.py:135-137; our product path must not).
"""

import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _args(**kw):
    a = types.SimpleNamespace(
        stub_guidance=True, max_steps=None, devices="auto", train=True)
    for k, v in kw.items():
        setattr(a, k, v)
    return a


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    from gaussianip_tpu.utils.config import load_config

    log_path = str(tmp_path_factory.mktemp("logs"))
    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs", "exp.yaml"),
        "system.height=32", "system.width=32",
        "system.ori_height=32", "system.ori_width=32",
        "system.stub_image_size=32",
        "system.pts_num=256", "system.capacity=1024",
        "data.eval_height=32", "data.eval_width=32",
        "data.n_test_views=2",
        "system.exporter.resolution=48", "system.exporter.density_thresh=0.1",
        "system.exporter.texture_size=128",
        f"system.log_path={log_path}",
    )
    return cfg, log_path


@pytest.mark.slow  # ~6 min on a single-core host (8 SPMD threads share it)
def test_launch_all_stages_sharded(tiny_cfg):
    import jax

    import launch
    from gaussianip_tpu.utils.saving import RunDirs

    cfg, log_path = tiny_cfg
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = launch.resolve_mesh(_args())
    assert mesh is not None and mesh.devices.size == 8

    dirs = RunDirs(log_path, "e2e")
    dirs.manifest(config="exp.yaml", stage_requested="stage1", prompt="p")

    launch.run_stage1(cfg, dirs, _args(max_steps=2))
    man = dirs.manifest()
    assert man.get("stage1") == "done"
    assert os.path.exists(man["ply"])
    assert os.path.exists(dirs.path("before_refine.npz"))

    launch.run_stage2(cfg, dirs, _args())
    assert dirs.manifest().get("stage2") == "done"
    small = np.load(dirs.path("after_refine.npz"))["refined_rgbs_small"]
    assert small.shape[0] == 32 and np.isfinite(small).all()

    launch.run_stage3(cfg, dirs, _args(max_steps=2))
    man = dirs.manifest()
    assert man.get("stage3") == "done"
    assert os.path.exists(man["final_ply"])

    # `--export`: trained ply -> textured obj/mtl (reference:
    # threestudio/models/exporters/mesh_exporter.py via `--export`)
    launch.run_export(cfg, dirs, _args(resume_from=None))
    exp = dirs.manifest()["export"]
    assert os.path.exists(exp["obj"]) and os.path.exists(exp["mtl"])


def test_resolve_mesh_flags():
    import launch

    assert launch.resolve_mesh(_args(devices="1")) is None
    m2 = launch.resolve_mesh(_args(devices="2"))
    assert m2 is not None and m2.devices.size == 2
    assert launch._scale_batch(4, m2) == 4
    m8 = launch.resolve_mesh(_args(devices="auto"))
    assert launch._scale_batch(4, m8) == 8
    assert launch._scale_batch(9, m8) == 16
    # --recipe_batch: keep batch 4 exact -> mesh capped to its largest
    # divisor (4 of 8); batch 6 -> 6-device mesh; no flag -> unchanged
    m4 = launch.resolve_mesh(_args(recipe_batch=True), recipe_batch=4)
    assert m4.devices.size == 4 and launch._scale_batch(4, m4) == 4
    m6 = launch.resolve_mesh(_args(recipe_batch=True), recipe_batch=6)
    assert m6.devices.size == 6
    assert launch.resolve_mesh(_args(), recipe_batch=4).devices.size == 8

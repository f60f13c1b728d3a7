"""End-to-end stage-1 slice: SMPL-X-initialized gaussians optimized with stub
guidance through the full jitted train step (sampling + render + pose maps +
losses + Adam) and the densify/prune schedule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianip_tpu.data.sampler import CameraSamplerConfig
from gaussianip_tpu.guidance.stub import make_stub_guidance
from gaussianip_tpu.human.skeleton import Skeleton
from gaussianip_tpu.human.smplx_jax import make_test_model
from gaussianip_tpu.model.adam import AdamHyper
from gaussianip_tpu.model.gaussians import create_from_pcd
from gaussianip_tpu.ops.knn import mean_dist2_3nn
from gaussianip_tpu.render.render import RenderConfig
from gaussianip_tpu.system.stage1 import (
    Stage1Config,
    densify_due,
    init_train_state,
    prune_due,
    train_stage1,
)


@pytest.mark.slow
def test_stage1_smoke(rng):
    sk = Skeleton(_test_model=make_test_model(rng, n_verts=300, n_faces=200))
    sk.forward_smplx()
    sk.scale(-10)
    pts = sk.sample_smplx_points(400)
    d2 = mean_dist2_3nn(jnp.asarray(pts), block=128)
    gs = create_from_pcd(pts, np.full((400, 3), 0.5, np.float32), 1024, d2)
    ts = init_train_state(gs)

    cfg = Stage1Config(
        render_height=64, render_width=64, max_steps=12,
        densify_prune_start_step=4, densify_prune_end_step=10,
        densify_prune_interval=6, prune_only_start_step=10,
        prune_only_end_step=12, prune_only_interval=11,
        # the 400-point test scene has much larger splats than the 100k real
        # recipe; keep world-size pruning out of the way
        densify_prune_world_size_threshold=2.0,
        prune_world_size_threshold=2.0,
    )
    cam_cfg = CameraSamplerConfig(height=64, width=64, batch_size=2,
                                  head_start_step=0, back_start_step=0)
    tgt = jnp.zeros((32, 32, 3)).at[8:24, 8:24].set(0.8)
    guidance = make_stub_guidance(target_rgb=tgt, noise_scale=0.01)

    logs = []
    ts = train_stage1(
        ts, cfg, cam_cfg, RenderConfig(backend="reference"), AdamHyper(),
        guidance, sk.points3d, jax.random.PRNGKey(0), n_steps=12,
        log_every=4, log_fn=lambda i, m: logs.append((i, m)),
    )
    assert int(ts.step) == 12
    assert len(logs) == 3
    for _, m in logs:
        assert np.isfinite(m["loss"])
    assert int(ts.gaussians.n_active) > 0
    # params actually moved
    assert float(jnp.abs(ts.gaussians.f_dc).max()) > 0


def test_schedules():
    cfg = Stage1Config()
    # reference schedule: densify every 500 in (200, 1700)
    assert densify_due(cfg, 500) and densify_due(cfg, 1500)
    assert not densify_due(cfg, 200) and not densify_due(cfg, 1700)
    assert not densify_due(cfg, 400)
    # prune-only: every 300 in (1700, 1900) -> only 1800
    assert prune_due(cfg, 1800)
    assert not prune_due(cfg, 1700) and not prune_due(cfg, 1500)


@pytest.mark.slow
def test_stage1_checkpoint_resume(rng, tmp_path):
    from gaussianip_tpu.utils.checkpoint import (load_train_state_npz,
                                                 save_train_state_npz)

    sk = Skeleton(_test_model=make_test_model(rng, n_verts=200, n_faces=150))
    sk.forward_smplx()
    sk.scale(-10)
    pts = sk.sample_smplx_points(200)
    d2 = mean_dist2_3nn(jnp.asarray(pts), block=128)
    gs = create_from_pcd(pts, np.full((200, 3), 0.5, np.float32), 512, d2)
    cfg = Stage1Config(render_height=32, render_width=32, max_steps=6,
                       densify_prune_start_step=100,
                       densify_prune_end_step=100,
                       prune_only_start_step=100, prune_only_end_step=100)
    cam_cfg = CameraSamplerConfig(height=32, width=32, batch_size=2,
                                  head_start_step=0, back_start_step=0)
    guidance = make_stub_guidance(target_rgb=jnp.zeros((16, 16, 3)),
                                  noise_scale=0.01)
    saved = {}

    def ckpt(i, ts_state):
        saved["path"] = save_train_state_npz(
            str(tmp_path / "ck.npz"), jax.device_get(ts_state))
        saved["step"] = i

    ts = train_stage1(gsinit := init_train_state(gs), cfg, cam_cfg,
                      RenderConfig(backend="reference"), AdamHyper(),
                      guidance, sk.points3d, jax.random.PRNGKey(0),
                      n_steps=4, ckpt_every=3, ckpt_fn=ckpt)
    assert saved["step"] == 3 and int(ts.step) == 4
    # resume from the step-3 checkpoint and run to 6 total
    ts2 = init_train_state(gs)
    ts2 = load_train_state_npz(saved["path"], ts2)
    assert int(ts2.step) == 4  # ckpt fires after the step-3 update
    ts2 = train_stage1(ts2, cfg, cam_cfg, RenderConfig(backend="reference"),
                       AdamHyper(), guidance, sk.points3d,
                       jax.random.PRNGKey(0), n_steps=2)
    assert int(ts2.step) == 6
    assert np.isfinite(np.asarray(ts2.gaussians.xyz)).all()

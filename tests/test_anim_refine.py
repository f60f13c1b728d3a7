import jax
import jax.numpy as jnp
import numpy as np

from gaussianip_tpu.data.sampler import CameraSamplerConfig
from gaussianip_tpu.guidance.stub import make_stub_guidance
from gaussianip_tpu.human.smplx_jax import make_test_model, smplx_forward
from gaussianip_tpu.model.adam import AdamHyper
from gaussianip_tpu.model.gaussians import create_from_pcd
from gaussianip_tpu.render.render import RenderConfig
from gaussianip_tpu.system.anim_refine import (
    AnimRefineConfig,
    make_anim_refine_step,
)
from gaussianip_tpu.system.stage1 import init_train_state


def test_anim_refine_step(rng):
    params = make_test_model(rng, n_verts=120, n_faces=100)
    out_a = smplx_forward(params)
    canonical = {
        "a_verts": out_a.vertices,
        "inv_T_t2a": jnp.linalg.inv(out_a.vertex_transforms),
        "canonical_offsets": out_a.shape_offsets + out_a.pose_offsets,
    }
    pts = np.asarray(out_a.vertices[:60]).astype(np.float32)
    gs = create_from_pcd(pts, np.full((60, 3), 0.5, np.float32), 64,
                         rng.uniform(1e-4, 1e-3, 60))
    ts = init_train_state(gs)
    motion = rng.normal(0, 0.1, (5, 21, 3)).astype(np.float32)
    cfg = AnimRefineConfig(render_height=48, render_width=48, max_steps=3)
    cam_cfg = CameraSamplerConfig(height=48, width=48, batch_size=1)
    guidance = make_stub_guidance(target_rgb=jnp.zeros((16, 16, 3)),
                                  noise_scale=0.01)
    step = make_anim_refine_step(cfg, cam_cfg, RenderConfig(backend="reference"),
                                 AdamHyper(), guidance, params, motion,
                                 canonical)
    key = jax.random.PRNGKey(0)
    for i in range(3):
        key, k = jax.random.split(key)
        ts, m = step(ts, k)
        assert np.isfinite(float(m["loss"]))
    assert int(ts.step) == 3
    # canonical params received gradient through the deformation
    assert float(jnp.abs(ts.opt.m["xyz"][:60]).max()) > 0

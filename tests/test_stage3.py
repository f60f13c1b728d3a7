import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianip_tpu.data.sampler import refine_orbit_batch
from gaussianip_tpu.diffusion.lpips import LPIPS
from gaussianip_tpu.model.adam import AdamHyper
from gaussianip_tpu.model.gaussians import create_from_pcd
from gaussianip_tpu.ops.knn import mean_dist2_3nn
from gaussianip_tpu.render.render import RenderConfig, render
from gaussianip_tpu.data.cameras import camera_from_c2w
from gaussianip_tpu.system.refine import CROP_X, CROP_Y
from gaussianip_tpu.system.stage1 import init_train_state
from gaussianip_tpu.system.stage3 import Stage3Config, train_stage3


def test_lpips_properties(rng):
    from gaussianip_tpu.utils.fast_init import fast_init

    # narrow 2-stage plan: same code path (normalize/tap/lin heads), compiles
    # in seconds on 1-core CPU; the full VGG16 plan runs under -m slow e2e
    m = LPIPS(stages=((8, 1), (16, 2)))
    x = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    params = fast_init(m, jax.random.PRNGKey(0), x, y)
    d_same = m.apply(params, x, x)
    d_diff = m.apply(params, x, y)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    assert (np.asarray(d_diff) > 0).all()
    # differentiable
    g = jax.grad(lambda a: jnp.sum(m.apply(params, a, y)))(x)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0


@pytest.mark.slow
def test_stage3_converges_toward_targets(rng):
    # small-scale stage 3: the "refined targets" are renders of a
    # color-shifted state; L1(+LPIPS) should pull the colors toward it
    n, cap, res = 500, 1024, 64
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = (v * 0.4).astype(np.float32)
    gs = create_from_pcd(pts, np.full((n, 3), 0.5, np.float32), cap,
                         mean_dist2_3nn(jnp.asarray(pts), block=256))
    gs = gs.replace(opacity=jnp.full((cap, 1), 2.0))
    cy = (CROP_Y[0] * res // 1024, CROP_Y[1] * res // 1024)
    cx = (CROP_X[0] * res // 1024, CROP_X[1] * res // 1024)
    cfg = Stage3Config(height=res, width=res, train_bs=2, max_steps=10,
                       densify_at_global_step=2405,
                       densify_world_size_threshold=5.0,
                       crop_y=cy, crop_x=cx)
    orbit = refine_orbit_batch(8, 17.0, 1.5, 70.0, res, res)
    rcfg = RenderConfig(backend="reference")

    # targets: render a red-shifted copy, crop+downsample like the pipeline
    gs_t = gs.replace(f_dc=gs.f_dc.at[:, 0, 0].add(1.0))
    cams = jax.vmap(lambda m, f: camera_from_c2w(m, f, res, res))(
        orbit.c2w, orbit.fovy)
    tgt_full = render(gs_t, cams, jnp.zeros(3), rcfg).rgb
    if True:
        crop = tgt_full[:, cy[0]:cy[1], cx[0]:cx[1], :]
        tgt = jax.image.resize(
            crop, (8, crop.shape[1] // 2, crop.shape[2] // 2, 3), "linear")

        ts = init_train_state(gs)
        hyper = AdamHyper(feature_lr=0.1)
        losses = []
        ts = train_stage3(
            ts, cfg, rcfg, hyper, orbit, tgt, jax.random.PRNGKey(0),
            lpips_fn=None, n_steps=10, log_every=1,
            log_fn=lambda i, m: losses.append(float(m["loss"])),
        )
        assert losses[-1] < losses[0]
        assert int(ts.step) == 10

"""Stage-3 LPIPS wiring: launch must run 10*L1 + 15*LPIPS when the VGG /
lpips checkpoints resolve (reference: GaussianIP.py:432-436), and fall back
to L1-only with a loud warning when they don't (VERDICT r02 missing #5)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def lpips_ckpts(tmp_path_factory):
    """Tiny-but-real torch state dicts in the torchvision vgg16 / lpips
    linear-head layouts that convert_lpips_weights expects."""
    d = tmp_path_factory.mktemp("lpips")
    conv_layers = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    chans = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    vgg = {}
    cin = 3
    g = torch.Generator().manual_seed(0)
    for tl, c in zip(conv_layers, chans):
        vgg[f"features.{tl}.weight"] = torch.randn(c, cin, 3, 3,
                                                   generator=g) * 0.02
        vgg[f"features.{tl}.bias"] = torch.zeros(c)
        cin = c
    lin = {}
    for i, c in enumerate([64, 128, 256, 512, 512]):
        lin[f"lin{i}.model.1.weight"] = torch.rand(1, c, 1, 1, generator=g)
    vp = d / "vgg16.pth"
    lp = d / "lpips_vgg.pth"
    torch.save(vgg, vp)
    torch.save(lin, lp)
    return str(vp), str(lp)


@pytest.mark.slow
def test_load_lpips_resolves(lpips_ckpts):
    from gaussianip_tpu.system.pipeline import load_lpips

    vp, lp = lpips_ckpts
    fn = load_lpips({"lpips_vgg_path": vp, "lpips_lin_path": lp})
    assert fn is not None
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    d_same = np.asarray(fn(x, x))
    d_diff = np.asarray(fn(x, y))
    np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
    assert (d_diff > 0).all()
    g = jax.grad(lambda a: jnp.sum(fn(a, y)))(x)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0


def test_load_lpips_absent_warns_none(caplog):
    import logging

    from gaussianip_tpu.system.pipeline import load_lpips

    with caplog.at_level(logging.WARNING, logger="gaussianip_tpu"):
        fn = load_lpips({"lpips_vgg_path": "/nonexistent/vgg.pth",
                         "lpips_lin_path": "/nonexistent/lin.pth"})
    assert fn is None
    assert "L1 ONLY" in caplog.text


def test_stage3_step_uses_lpips(lpips_ckpts):
    """The loaded lpips_fn changes the stage-3 loss (i.e. it is actually in
    the optimized objective, not just constructed)."""
    import jax
    import jax.numpy as jnp

    from gaussianip_tpu.data.sampler import refine_orbit_batch
    from gaussianip_tpu.model.adam import AdamHyper
    from gaussianip_tpu.model.gaussians import create_from_pcd
    from gaussianip_tpu.ops.knn import mean_dist2_3nn
    from gaussianip_tpu.render.render import RenderConfig
    from gaussianip_tpu.system.pipeline import load_lpips
    from gaussianip_tpu.system.stage1 import init_train_state
    from gaussianip_tpu.system.stage3 import Stage3Config, make_stage3_step

    vp, lp = lpips_ckpts
    fn = load_lpips({"lpips_vgg_path": vp, "lpips_lin_path": lp})

    rng = np.random.default_rng(1)
    pts = rng.normal(0, 0.3, (200, 3)).astype(np.float32)
    d2 = mean_dist2_3nn(jnp.asarray(pts), block=128)
    res = 32
    orbit = refine_orbit_batch(8, 17.0, 1.5, 70.0, res, res)
    # targets >= 16 px per side: VGG16's 4 max-pools need the room
    tgt = jnp.asarray(rng.uniform(0, 1, (8, 24, 16, 3)).astype(np.float32))
    cfg = Stage3Config(height=res, width=res, train_bs=2,
                       crop_y=(4, 28), crop_x=(8, 24))
    rcfg = RenderConfig(backend="reference")

    def run(lpips_fn):
        # fresh state per run: the step DONATES its TrainState argument
        gs = create_from_pcd(pts, np.full((200, 3), 0.5, np.float32), 256, d2)
        step = make_stage3_step(cfg, rcfg, AdamHyper(), orbit, tgt,
                                lpips_fn=lpips_fn)
        _, m = step(init_train_state(gs), jax.random.PRNGKey(0))
        return jax.device_get(m)

    m_l1 = run(None)
    m_lp = run(fn)
    assert m_lp["lpips"] > 0.0
    assert m_lp["loss"] != m_l1["loss"]

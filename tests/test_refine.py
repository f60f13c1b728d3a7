"""Stage-2 VCR refinement on tiny models: full 32-view anchor->key->dense
schedule, cache threading, canonical-order output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianip_tpu.diffusion.unet import (
    ControlNetModel,
    UNet2DConditionModel,
    tiny_unet_config,
)
from gaussianip_tpu.diffusion.vae import AutoencoderKL, tiny_vae_config
from gaussianip_tpu.system.refine import (
    KEY_VIEW_NAME_PAIR,
    VIEW_IDX_ALL,
    VIEW_NAME_ALL,
    RefineModels,
    crop_and_downsample,
    refine_views,
)


def test_view_topology():
    assert sorted(VIEW_IDX_ALL) == list(range(32))
    assert VIEW_NAME_ALL[0] == "front" and VIEW_IDX_ALL[0] == 24
    # dense neighbors reference only stored views
    stored = {"front", "back", "left", "right", "k0", "k1", "k2", "k3"}
    for v, (l, r) in KEY_VIEW_NAME_PAIR.items():
        assert l in stored and r in stored


@pytest.mark.slow
def test_refine_views_tiny(rng):
    ucfg = tiny_unet_config(ip_tokens=0)
    unet = UNet2DConditionModel(ucfg)
    cn = ControlNetModel(ucfg, conditioning_embed_channels=(8, 16))
    vcfg = tiny_vae_config()
    vae = AutoencoderKL(vcfg)
    key = jax.random.PRNGKey(0)
    lat = jnp.zeros((2, 16, 16, 4))
    ctx = jnp.zeros((2, 7, 32))
    up = unet.init(key, lat, jnp.array([1, 1]), ctx)
    cp = cn.init(key, lat, jnp.array([1, 1]), ctx, jnp.zeros((2, 32, 32, 3)))
    vp = vae.init(key, jnp.zeros((1, 32, 32, 3)))
    models = RefineModels(unet, up, cn, cp, vae, vp)

    imgs = jnp.asarray(rng.uniform(0, 1, (32, 32, 32, 3)).astype(np.float32))
    ctrl = jnp.zeros((32, 32, 32, 3))
    contexts = {}
    for n_ in VIEW_NAME_ALL:
        contexts[n_] = jnp.asarray(
            rng.normal(0, 0.02, (2, 7, 32)).astype(np.float32))

    out = refine_views(models, imgs, ctrl, contexts, jax.random.PRNGKey(1),
                       num_steps=2, dense_batch=8)
    assert out.shape == (32, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # every view actually refined (no None holes / zero images from init)
    assert (np.asarray(out).reshape(32, -1).std(1) > 0).all()


def test_crop_and_downsample(rng):
    x = jnp.asarray(rng.uniform(0, 1, (2, 1024, 1024, 3)).astype(np.float32))
    y = crop_and_downsample(x)
    assert y.shape == (2, 415, 290, 3)


@pytest.mark.slow
def test_refine_dense_phase_sharded_matches_single(rng):
    """The mesh-sharded dense phase must produce identical images to the
    unsharded run (VCR sharding is a layout change, not a math change)."""
    from gaussianip_tpu.parallel.mesh import make_data_mesh

    ucfg = tiny_unet_config(ip_tokens=0)
    unet = UNet2DConditionModel(ucfg)
    cn = ControlNetModel(ucfg, conditioning_embed_channels=(8, 16))
    vcfg = tiny_vae_config()
    vae = AutoencoderKL(vcfg)
    key = jax.random.PRNGKey(0)
    lat = jnp.zeros((2, 16, 16, 4))
    ctx = jnp.zeros((2, 7, 32))
    up = unet.init(key, lat, jnp.array([1, 1]), ctx)
    cp = cn.init(key, lat, jnp.array([1, 1]), ctx, jnp.zeros((2, 32, 32, 3)))
    vp = vae.init(key, jnp.zeros((1, 32, 32, 3)))
    models = RefineModels(unet, up, cn, cp, vae, vp)

    imgs = jnp.asarray(rng.uniform(0, 1, (32, 32, 32, 3)).astype(np.float32))
    ctrl = jnp.zeros((32, 32, 32, 3))
    contexts = {n_: jnp.asarray(rng.normal(0, 0.02, (2, 7, 32))
                                .astype(np.float32)) for n_ in VIEW_NAME_ALL}

    single = refine_views(models, imgs, ctrl, contexts, jax.random.PRNGKey(1),
                          num_steps=1, dense_batch=8)
    mesh = make_data_mesh(len(jax.devices()))
    sharded = refine_views(models, imgs, ctrl, contexts, jax.random.PRNGKey(1),
                           num_steps=1, dense_batch=8, mesh=mesh)
    d = np.abs(np.asarray(single) - np.asarray(sharded))
    assert d.max() < 1e-5, f"sharded dense phase diverged: max {d.max()}"

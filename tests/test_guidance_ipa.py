"""AHDS guidance end-to-end on tiny random models: gradient flow through the
VAE into the renderer, ANPG 3-way batch, IP tokens, view-dependent prompts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianip_tpu.diffusion.ip_adapter import ProjPlusModel
from gaussianip_tpu.diffusion.unet import (
    ControlNetModel,
    UNet2DConditionModel,
    tiny_unet_config,
)
from gaussianip_tpu.diffusion.vae import AutoencoderKL, tiny_vae_config
from gaussianip_tpu.guidance.ipa import (
    AHDSGuidance,
    GuidanceConfig,
    GuidanceModels,
    ImageEmbeds,
    compute_image_embeds,
)
from gaussianip_tpu.guidance.prompts import (
    PromptEmbeddings,
    direction_index,
    fake_text_encoder,
    make_prompt_embeddings,
)


@pytest.fixture(scope="module")
def tiny_guidance():
    ucfg = tiny_unet_config(ip_tokens=4, lora_rank=4)
    unet = UNet2DConditionModel(ucfg)
    # 2-level cond pyramid (2x downsample) to match the tiny VAE's 2x
    cn = ControlNetModel(ucfg, conditioning_embed_channels=(8, 16))
    vcfg = tiny_vae_config()
    vae = AutoencoderKL(vcfg)
    key = jax.random.PRNGKey(0)
    lat = jnp.zeros((1, 32, 32, 4))  # tiny VAE downsamples 64 -> 32
    t = jnp.array([1])
    ctx = jnp.zeros((1, 77 + 4, 32))
    # shape-only init: real Module.init compiles a full forward (~60 s on a
    # single-core host); these tests only need random finite weights
    from gaussianip_tpu.utils.fast_init import fast_init

    up = fast_init(unet, key, lat, t, ctx)
    cp = fast_init(cn, key, lat, t, ctx[:, :77], jnp.zeros((1, 64, 64, 3)))
    vp = fast_init(vae, key, jnp.zeros((1, 64, 64, 3)))
    models = GuidanceModels(unet, up, cn, cp, vae, vp)
    pe = make_prompt_embeddings(
        fake_text_encoder(77, 32), "a person", "bad quality", ""
    )
    img = ImageEmbeds(
        pos=jnp.ones((1, 4, 32)) * 0.01,
        null=jnp.zeros((1, 4, 32)),
        neg=jnp.zeros((1, 4, 32)),
    )
    cfg = GuidanceConfig(latent_size=8, image_size=64)
    return AHDSGuidance(models, pe, img, cfg)


def _aux(b):
    return {
        "all_vis": jnp.zeros((b,)),
        "elevation": jnp.zeros((b,)),
        "azimuth": jnp.linspace(-170, 170, b),
        "center": jnp.zeros((b,)),
        "camera_distances": jnp.full((b,), 1.5),
    }


def test_guidance_loss_and_grad(tiny_guidance, rng):
    g = tiny_guidance
    rgb = jnp.asarray(rng.uniform(0, 1, (2, 48, 48, 3)).astype(np.float32))
    ctrl = jnp.zeros((2, 48, 48, 3))

    def loss(rgb):
        out = g(jnp.int32(100), jax.random.PRNGKey(1), rgb, ctrl, _aux(2))
        return out["loss_sds"]

    l, dr = jax.value_and_grad(loss)(rgb)
    assert np.isfinite(float(l))
    assert np.isfinite(np.asarray(dr)).all()
    assert float(jnp.abs(dr).max()) > 0  # gradient flows through the VAE


@pytest.mark.slow
def test_guidance_jits(tiny_guidance, rng):
    g = tiny_guidance
    rgb = jnp.asarray(rng.uniform(0, 1, (2, 48, 48, 3)).astype(np.float32))
    ctrl = jnp.zeros((2, 48, 48, 3))
    f = jax.jit(lambda r, k: g(jnp.int32(1500), k, r, ctrl, _aux(2))["loss_sds"])
    v1 = float(f(rgb, jax.random.PRNGKey(0)))
    v2 = float(f(rgb, jax.random.PRNGKey(1)))
    assert np.isfinite(v1) and np.isfinite(v2) and v1 != v2


def test_direction_index_table():
    # reference semantics: front is azi in (45, 135); overhead overrides
    e = jnp.zeros((6,))
    azi = jnp.array([90.0, -90.0, 20.0, -170.0, 90.0, 30.0])
    vis = jnp.array([0.0, 0.0, 1.0, 0.0, 1.0, 0.0])
    cz = jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.65])
    d = jnp.full((6,), 1.5)
    idx = np.asarray(direction_index(e, azi, cz, vis, d))
    assert idx[0] == 4  # front (not all visible)
    assert idx[1] == 5  # back
    assert idx[2] == 6  # left front, full body
    assert idx[3] == 3  # right back
    assert idx[4] == 10  # front, full body
    assert idx[5] == 12  # overhead wins (center==head_offset, azi>0)


def test_compute_image_embeds(rng):
    proj = ProjPlusModel(cross_attention_dim=64, id_embeddings_dim=32,
                         clip_embeddings_dim=48, num_tokens=4)
    idE = jnp.asarray(rng.normal(size=(1, 32)).astype(np.float32))
    clipH = jnp.asarray(rng.normal(size=(1, 9, 48)).astype(np.float32))
    params = proj.init(jax.random.PRNGKey(0), idE, clipH)
    out = compute_image_embeds(
        proj, params, idE, idE * 0.5, clipH, clipH * 0.5,
        jnp.zeros_like(clipH), s_scale=0.4, shortcut=True,
    )
    assert out.pos.shape == (1, 4, 64)
    assert float(jnp.abs(out.pos - out.null).max()) > 0
    assert float(jnp.abs(out.pos - out.neg).max()) > 0


def test_resampler_plus(rng):
    from gaussianip_tpu.diffusion.ip_adapter import Resampler

    r = Resampler(dim=32, depth=2, dim_head=8, heads=4, num_queries=16,
                  embedding_dim=24, output_dim=32)
    x = jnp.asarray(rng.normal(size=(2, 9, 24)).astype(np.float32))
    params = r.init(jax.random.PRNGKey(0), x)
    out = r.apply(params, x)
    assert out.shape == (2, 16, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_classic_direction_and_prompt_library(tmp_path):
    from gaussianip_tpu.guidance.prompts import (
        classic_direction_index, preprocess_prompt)
    import json

    azi = jnp.array([90.0, -90.0, 10.0, 30.0])
    cz = jnp.array([0.0, 0.0, 0.0, 0.65])
    idx = np.asarray(classic_direction_index(
        jnp.zeros(4), azi, cz, jnp.full((4,), 1.5)))
    assert list(idx) == [1, 2, 0, 3]  # front, back, side, overhead

    lib = tmp_path / "lib.json"
    lib.write_text(json.dumps({"dreamfusion": [
        "a zoomed out DSLR photo of a corgi", "a photo of a cat"]}))
    assert preprocess_prompt("lib:corgi", str(lib)).endswith("corgi")
    assert preprocess_prompt("plain prompt", str(lib)) == "plain prompt"
    import pytest as _pt
    with _pt.raises(ValueError):
        preprocess_prompt("lib:photo", str(lib))  # ambiguous

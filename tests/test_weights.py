"""Round-trip validation of the torch<->flax weight mapping on tiny modules:
flax init -> export to diffusers-style names -> convert back -> identical
trees. Catches naming/transform mismatches without the gated checkpoints."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussianip_tpu.diffusion.unet import UNet2DConditionModel, tiny_unet_config
from gaussianip_tpu.diffusion.vae import AutoencoderKL, tiny_vae_config
from gaussianip_tpu.diffusion.weights import (
    convert_unet,
    convert_vae,
    export_unet,
    export_vae,
)


def _tree_paths(t):
    return {
        "/".join(str(getattr(k, "key", k)) for k in path): leaf.shape
        for path, leaf in jax.tree_util.tree_leaves_with_path(t)
    }


def _assert_same_tree(a, b):
    pa, pb = _tree_paths(a), _tree_paths(b)
    assert pa.keys() == pb.keys(), (
        f"missing: {sorted(set(pa) - set(pb))[:6]} "
        f"extra: {sorted(set(pb) - set(pa))[:6]}"
    )
    for k in pa:
        assert pa[k] == pb[k], f"shape mismatch at {k}: {pa[k]} vs {pb[k]}"


def test_unet_weight_roundtrip():
    cfg = tiny_unet_config(ip_tokens=4, lora_rank=4)
    model = UNet2DConditionModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.array([1]),
        jnp.zeros((1, 11, 32)),
    )
    sd, lora = export_unet(params, cfg.block_out_channels, cfg.layers_per_block)
    assert len(lora) > 0  # LoRA + IP projections exported
    params2 = convert_unet(sd, cfg.block_out_channels, cfg.layers_per_block,
                           ipa_state=lora)
    _assert_same_tree(params, params2)
    for (p1, l1), (p2, l2) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(params2),
    ):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2),
                                      err_msg=str(p1))


def test_unet_weight_roundtrip_no_ipa():
    cfg = tiny_unet_config()
    model = UNet2DConditionModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.array([1]),
        jnp.zeros((1, 7, 32)),
    )
    sd, _ = export_unet(params, cfg.block_out_channels, cfg.layers_per_block)
    params2 = convert_unet(sd, cfg.block_out_channels, cfg.layers_per_block)
    _assert_same_tree(params, params2)


def test_vae_weight_roundtrip():
    cfg = tiny_vae_config()
    vae = AutoencoderKL(cfg)
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    sd = export_vae(params, cfg.block_out_channels, cfg.layers_per_block)
    params2 = convert_vae(sd, cfg.block_out_channels, cfg.layers_per_block)
    _assert_same_tree(params, params2)
    for (p1, l1), (p2, l2) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(params2),
    ):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2),
                                      err_msg=str(p1))


def test_fold_lora_matches_runtime_lora():
    # fold_lora(W + A@B) on a rank-0 module must reproduce the runtime-LoRA
    # forward exactly (static scale; load_guidance_models ships the folded
    # tree, system/pipeline.py)
    cfg = tiny_unet_config(ip_tokens=4, lora_rank=4, dtype=jnp.float32)
    model = UNet2DConditionModel(cfg)
    key = jax.random.PRNGKey(0)
    lat = jnp.zeros((2, 8, 8, 4))
    ctx = jnp.zeros((2, 11, 32))
    params = model.init(key, lat, jnp.array([1, 2]), ctx)
    # randomize lora_up (zero-init by default -> fold would be a no-op)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    rng = np.random.default_rng(3)
    rand = [
        jnp.asarray(rng.normal(0, 0.05, l.shape).astype(np.float32))
        if any(getattr(k, "key", k) == "lora_up" for k in path) else l
        for path, l in leaves
    ]
    params = jax.tree_util.tree_unflatten(treedef, rand)

    from gaussianip_tpu.diffusion.weights import fold_lora

    folded = fold_lora(
        params["params"] if "params" in params else params)
    if "params" in params:
        folded = {"params": folded}
    model0 = UNet2DConditionModel(
        tiny_unet_config(ip_tokens=4, lora_rank=0, dtype=jnp.float32))

    lat_r = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 4)).astype(np.float32))
    ctx_r = jnp.asarray(rng.normal(0, 1, (2, 11, 32)).astype(np.float32))
    ts = jnp.array([3, 77])
    out_lora, _ = model.apply(params, lat_r, ts, ctx_r)
    out_fold, _ = model0.apply(folded, lat_r, ts, ctx_r)
    np.testing.assert_allclose(np.asarray(out_fold), np.asarray(out_lora),
                               rtol=2e-5, atol=2e-5)

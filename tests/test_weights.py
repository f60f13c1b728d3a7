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

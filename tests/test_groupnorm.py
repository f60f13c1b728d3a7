"""FastGroupNorm (custom VJP) must match flax.linen.GroupNorm: forward,
input gradient, and parameter gradients, in f32 and bf16, 3D and 4D."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from gaussianip_tpu.diffusion.norm import FastGroupNorm


@pytest.mark.parametrize("shape,groups", [
    ((2, 8, 8, 32), 8),
    ((1, 5, 7, 16), 4),   # non-pow2 spatial
    ((3, 12, 24), 6),     # 3D channels-last
])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_matches_flax_groupnorm(shape, groups, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 2.0, shape), dtype)
    ref = nn.GroupNorm(groups, epsilon=1e-5, dtype=dtype)
    fast = FastGroupNorm(groups, epsilon=1e-5, dtype=dtype)
    key = jax.random.PRNGKey(0)
    pr = ref.init(key, x)
    pf = fast.init(key, x)
    # identical param tree (names + shapes) so converted weights drop in
    assert jax.tree_util.tree_structure(pr) == jax.tree_util.tree_structure(pf)
    # non-trivial scale/bias
    c = shape[-1]
    sc = jnp.asarray(rng.normal(1.0, 0.3, (c,)), jnp.float32)
    bi = jnp.asarray(rng.normal(0.0, 0.5, (c,)), jnp.float32)
    params = {"params": {"scale": sc, "bias": bi}}

    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    ya = ref.apply(params, x)
    yb = fast.apply(params, x)
    assert ya.dtype == yb.dtype
    np.testing.assert_allclose(np.asarray(ya, np.float32),
                               np.asarray(yb, np.float32), atol=tol, rtol=tol)

    tgt = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)

    def loss(mod):
        def f(p, xx):
            y = mod.apply(p, xx).astype(jnp.float32)
            return jnp.sum((y - tgt) ** 2) + jnp.sum(jnp.sin(y))
        return f

    ga_p, ga_x = jax.grad(loss(ref), argnums=(0, 1))(params, x)
    gb_p, gb_x = jax.grad(loss(fast), argnums=(0, 1))(params, x)
    gtol = 1e-4 if dtype == jnp.float32 else 1e-1
    np.testing.assert_allclose(np.asarray(ga_x, np.float32),
                               np.asarray(gb_x, np.float32),
                               atol=gtol, rtol=gtol)
    for k in ("scale", "bias"):
        np.testing.assert_allclose(
            np.asarray(ga_p["params"][k]), np.asarray(gb_p["params"][k]),
            atol=gtol, rtol=gtol, err_msg=k)

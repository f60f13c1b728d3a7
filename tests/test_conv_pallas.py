"""Pallas fused 3x3 conv vs lax.conv (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianip_tpu.ops.conv_pallas import (Conv3x3, _conv3x3_pallas,
                                            _use_pallas, _xla_conv, conv3x3)


@pytest.mark.parametrize(
    "shape",
    [
        (2, 16, 16, 128, 128),  # aligned, square
        (1, 13, 16, 128, 256),  # non-pow2 H (divisor row blocking)
        (2, 8, 24, 256, 128),   # wide co block
    ],
)
def test_conv_pallas_matches_xla(rng, shape):
    b, h, w, ci, co = shape
    x = jnp.asarray(rng.normal(0, 1, (b, h, w, ci)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.05, (3, 3, ci, co)).astype(np.float32))
    y0 = _xla_conv(x, k)
    y1 = _conv3x3_pallas(x, k, interpret=True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=2e-5, rtol=1e-5)


def test_conv_pallas_gradients(rng):
    b, h, w, ci, co = 1, 8, 16, 128, 128
    x = jnp.asarray(rng.normal(0, 1, (b, h, w, ci)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.05, (3, 3, ci, co)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 1, (co,)).astype(np.float32))

    def loss(fn):
        return jax.grad(
            lambda x, k, bb: jnp.sum(fn(x, k, bb) ** 2), argnums=(0, 1, 2))

    g0 = loss(lambda x, k, bb: _xla_conv(x, k) + bb)(x, k, bias)
    g1 = loss(lambda x, k, bb: conv3x3(x, k, bb, interpret=True))(x, k, bias)
    for a, c in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=2e-3, rtol=1e-4)


def test_conv_pallas_gate():
    x128 = jnp.zeros((1, 16, 16, 128))
    k = jnp.zeros((3, 3, 128, 128))
    # CPU backend: never pallas (but the decision logic is shape-driven)
    assert not _use_pallas(jnp.zeros((1, 16, 16, 320)),
                           jnp.zeros((3, 3, 320, 320)), 1)  # unaligned chans
    assert not _use_pallas(x128, k, 2)  # stride 2
    assert not _use_pallas(jnp.zeros((1, 16, 12, 128)),
                           jnp.zeros((3, 3, 128, 128)), 1)  # 8 !| w


def test_conv3x3_module_matches_nn_conv(rng):
    import flax.linen as nn

    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 32)).astype(np.float32))
    m1 = Conv3x3(48)
    m2 = nn.Conv(48, (3, 3), padding=1)
    p = m2.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(m1.apply(p, x)), np.asarray(m2.apply(p, x)),
        atol=1e-5, rtol=1e-5)
    # stride-2 variant must match nn.Conv(strides=2, padding=((1,1),(1,1)))
    m3 = Conv3x3(48, stride=2)
    m4 = nn.Conv(48, (3, 3), strides=2, padding=((1, 1), (1, 1)))
    np.testing.assert_allclose(
        np.asarray(m3.apply(p, x)), np.asarray(m4.apply(p, x)),
        atol=1e-5, rtol=1e-5)

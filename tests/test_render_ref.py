import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianip_tpu.render.composite_ref import composite_reference
from golden import composite_golden, random_scene


def test_composite_matches_golden(rng):
    h = w = 24
    sc = random_scene(rng, 300, h, w)
    rgb, z, a = composite_reference(
        jnp.asarray(sc["mean2d"]), jnp.asarray(sc["conic"]),
        jnp.asarray(sc["color"]), jnp.asarray(sc["opacity"]),
        jnp.asarray(sc["depth"]), jnp.asarray(sc["valid"]), h, w, chunk=64,
    )
    g_rgb, g_z, g_a = composite_golden(
        sc["mean2d"], sc["conic"], sc["color"], sc["opacity"], sc["depth"],
        sc["valid"], h, w,
    )
    np.testing.assert_allclose(np.asarray(rgb), g_rgb, atol=2e-5)
    np.testing.assert_allclose(np.asarray(z), g_z, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a), g_a, atol=2e-5)


def test_composite_opaque_early_stop(rng):
    # a stack of fully opaque gaussians: far ones must not contribute
    h = w = 8
    n = 50
    mean2d = np.tile(np.array([[4.0, 4.0]], np.float32), (n, 1))
    conic = np.tile(np.array([[0.05, 0.0, 0.05]], np.float32), (n, 1))
    color = np.zeros((n, 3), np.float32)
    color[0] = [1, 0, 0]
    # 0.93 keeps the T=1e-4 early-stop boundary away from an exact float tie
    opacity = np.full((n,), 0.93, np.float32)
    depth = np.arange(n, dtype=np.float32) + 1
    valid = np.ones((n,), bool)
    rgb, _, a = composite_reference(
        *(jnp.asarray(x) for x in (mean2d, conic, color, opacity, depth, valid)),
        h, w, chunk=16,
    )
    g_rgb, _, g_a = composite_golden(mean2d, conic, color, opacity, depth, valid, h, w)
    np.testing.assert_allclose(np.asarray(rgb), g_rgb, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a), g_a, atol=1e-5)
    assert np.asarray(rgb)[4, 4, 0] > 0.9


def test_composite_gradients_finite_diff(rng):
    h = w = 12
    sc = random_scene(rng, 40, h, w, r_px=(2.0, 5.0))
    tgt = jnp.asarray(rng.uniform(0, 1, (h, w, 3)).astype(np.float32))

    def loss(mean2d, color, opacity):
        rgb, _, _ = composite_reference(
            mean2d, jnp.asarray(sc["conic"]), color, opacity,
            jnp.asarray(sc["depth"]), jnp.asarray(sc["valid"]), h, w, chunk=16,
        )
        return jnp.sum((rgb - tgt) ** 2)

    args = (jnp.asarray(sc["mean2d"]), jnp.asarray(sc["color"]),
            jnp.asarray(sc["opacity"]))
    grads = jax.grad(loss, argnums=(0, 1, 2))(*args)
    for ai, g in zip((0, 1, 2), grads):
        assert np.all(np.isfinite(np.asarray(g)))

    # spot-check a few coordinates with central differences
    eps = 1e-3
    for (argn, idx) in [(1, (3, 0)), (1, (7, 2)), (2, (5,)), (0, (2, 0))]:
        a = [jnp.asarray(x) for x in args]
        ap = a.copy()
        ap[argn] = a[argn].at[idx].add(eps)
        am = a.copy()
        am[argn] = a[argn].at[idx].add(-eps)
        fd = (loss(*ap) - loss(*am)) / (2 * eps)
        an = grads[argn][idx]
        np.testing.assert_allclose(np.asarray(an), np.asarray(fd), rtol=0.05,
                                   atol=5e-3)

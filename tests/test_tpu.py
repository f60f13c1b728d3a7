"""Real-hardware correctness gate (`pytest -m tpu`).

Run on a TPU host as:

    GIP_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

Promotes the ad-hoc probe-script checks into a repeatable tier (VERDICT r3
item 5): compiled Pallas fwd/bwd vs the pure-JAX reference compositor
on-device, bit-equality of the gated kernel variants (pack_mode,
table_gather), precision of the split2 triangular matmul, the image-level
cost of the q16 depth-key approximation, and one mesh-sharded train-ish
step. The reference exercises its CUDA kernel on every run (reference:
gaussiansplatting/gaussian_renderer/__init__.py:85-93); this is our
equivalent pre-flight.

Timing note: the axon tunnel makes per-call host timing meaningless
(NOTES.md gotcha 1) — this tier checks CORRECTNESS only; speed lives in
bench.py.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

jax = pytest.importorskip("jax")
if jax.default_backend() != "tpu":  # pragma: no cover
    pytest.skip("not on TPU hardware (set GIP_TPU_TESTS=1 on a TPU host)",
                allow_module_level=True)

import jax.numpy as jnp  # noqa: E402

from gaussianip_tpu.data.cameras import camera_from_c2w  # noqa: E402
from gaussianip_tpu.model.gaussians import create_from_pcd  # noqa: E402
from gaussianip_tpu.ops.camera_math import look_at_c2w  # noqa: E402
from gaussianip_tpu.render.render import RenderConfig, render  # noqa: E402

N, RES, BATCH = 20_000, 256, 2


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    z = rng.uniform(-0.8, 0.8, N)
    th = rng.uniform(0, 2 * np.pi, N)
    r = 0.25 * np.sqrt(np.maximum(0.0, 1 - (z / 0.9) ** 2)) + 0.03
    pts = np.stack([r * np.cos(th), r * np.sin(th), z], 1).astype(np.float32)
    pts += rng.normal(0, 0.01, pts.shape).astype(np.float32)
    cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
    state = create_from_pcd(pts, cols, N, np.full(N, 4e-4, np.float32))
    state = state.replace(opacity=jnp.asarray(
        rng.uniform(-1.0, 2.5, (N, 1)).astype(np.float32)))
    az = jnp.linspace(0, 2 * jnp.pi, BATCH, endpoint=False)
    eye = jnp.stack([1.8 * jnp.cos(az), 1.8 * jnp.sin(az),
                     jnp.full((BATCH,), 0.2)], -1)
    c2w = look_at_c2w(eye, jnp.zeros((BATCH, 3)),
                      jnp.tile(jnp.array([[0.0, 0, 1]]), (BATCH, 1)))
    cams = jax.vmap(
        lambda m: camera_from_c2w(m, jnp.float32(1.0), RES, RES))(c2w)
    return state, cams, jnp.zeros(3)


def _rgb(scene, **cfg_kw):
    state, cams, bg = scene
    cfg = RenderConfig(**cfg_kw)
    out = jax.jit(lambda s: render(s, cams, bg, cfg).rgb)(state)
    return np.asarray(jax.device_get(out))


def _grads(scene, **cfg_kw):
    state, cams, bg = scene
    cfg = RenderConfig(**cfg_kw)

    def loss(st, off):
        out = render(st, cams, bg, cfg, mean2d_offset=off)
        return jnp.sum(out.rgb ** 2) + jnp.sum(out.alpha)

    off = jnp.zeros((BATCH, N, 2))
    g = jax.jit(jax.grad(loss, argnums=(0, 1), allow_int=True))(state, off)
    return (np.asarray(jax.device_get(g[0].xyz)),
            np.asarray(jax.device_get(g[0].f_dc)),
            np.asarray(jax.device_get(g[0].opacity)),
            np.asarray(jax.device_get(g[1])))


def test_pallas_matches_reference_fwd_on_device(scene):
    """Compiled Pallas compositor vs the pure-JAX oracle, both on the chip."""
    a = _rgb(scene, backend="pallas")
    b = _rgb(scene, backend="reference")
    assert np.isfinite(a).all() and np.isfinite(b).all()
    d = np.abs(a - b)
    assert np.quantile(d, 0.999) < 1e-3, f"q999 {np.quantile(d, 0.999):.2e}"
    assert d.max() < 5e-2, f"max {d.max():.2e} (alpha-gate boundary?)"


def test_pallas_matches_reference_grads_on_device(scene):
    ga = _grads(scene, backend="pallas")
    gb = _grads(scene, backend="reference")
    for x, y, name in zip(ga, gb, ("xyz", "f_dc", "opacity", "mean2d")):
        assert np.isfinite(x).all(), name
        scale = np.abs(y).max() + 1e-8
        rel = np.abs(x - y).max() / scale
        assert rel < 2e-3, f"{name}: rel {rel:.2e}"


def test_gated_variants_bit_equal_on_device(scene):
    """pack_mode / table_gather are behavior-neutral switches: their
    compiled outputs must be BITWISE equal to the default before either
    default may flip (the CPU interpret-mode tests already assert this;
    here it holds for the real Mosaic lowering)."""
    base = _rgb(scene, backend="pallas")
    for kw in ({"pack_mode": "stack"}, {"table_gather": "i32"}):
        v = _rgb(scene, backend="pallas", **kw)
        assert (v == base).all(), f"{kw} not bit-equal"


def test_tri_split2_matches_highest_on_device(scene):
    """split2 (two bf16 passes on a hi+lo split) vs 6-pass f32 triangular
    transmittance: approximation must stay below perceptual noise."""
    a = _rgb(scene, backend="pallas", tri="split2")
    b = _rgb(scene, backend="pallas", tri="highest")
    assert np.abs(a - b).max() < 2e-2
    assert np.quantile(np.abs(a - b), 0.999) < 2e-3


def test_q16_depth_key_image_cost(scene):
    """q16 approximate within-tile depth ordering vs exact2 lexicographic:
    the PSNR of the default against the exact ordering must be effectively
    lossless (VERDICT r3 weak #5 / item 8)."""
    a = _rgb(scene, backend="pallas", depth_key="q16", sort_stable=False)
    b = _rgb(scene, backend="pallas", depth_key="exact2")
    mse = float(np.mean((a - b) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 45.0, f"q16-vs-exact2 PSNR {psnr:.1f} dB"


def test_mesh_sharded_render_grad_step():
    """One jitted render+grad step with the camera batch sharded over the
    real device mesh (all visible chips; 1 on a single-chip host — the
    multi-chip topology is covered by __graft_entry__.dryrun_multichip)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.asarray(jax.devices())
    mesh = Mesh(devs, ("data",))
    b = max(2 * devs.size, 2)
    rng = np.random.default_rng(1)
    n = 4096
    pts = rng.normal(0, 0.2, (n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = create_from_pcd(pts, cols, n, np.full(n, 1e-3, np.float32))
    az = jnp.linspace(0, 2 * jnp.pi, b, endpoint=False)
    eye = jnp.stack([1.8 * jnp.cos(az), 1.8 * jnp.sin(az),
                     jnp.full((b,), 0.2)], -1)
    c2w = look_at_c2w(eye, jnp.zeros((b, 3)),
                      jnp.tile(jnp.array([[0.0, 0, 1]]), (b, 1)))
    cams = jax.vmap(
        lambda m: camera_from_c2w(m, jnp.float32(1.0), 128, 128))(c2w)
    shard = NamedSharding(mesh, P("data"))
    cams = jax.tree.map(
        lambda x: jax.device_put(x, shard) if x.ndim else x, cams)
    cfg = RenderConfig(backend="pallas")

    def loss(st):
        out = render(st, cams, jnp.zeros(3), cfg)
        return jnp.mean(out.rgb ** 2)

    val, g = jax.jit(jax.value_and_grad(loss, allow_int=True))(state)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(jax.device_get(g.xyz))).all()

import jax
import jax.numpy as jnp
import numpy as np

from gaussianip_tpu.model.adam import (
    AdamHyper,
    adam_step,
    field_lrs,
    init_adam,
)
from gaussianip_tpu.model.densify import (
    add_stats,
    densify_and_prune,
    init_stats,
    prune_only,
)
from gaussianip_tpu.model.gaussians import create_from_pcd
from gaussianip_tpu.ops.transforms import inverse_sigmoid


def _state(rng, n=20, cap=64):
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return create_from_pcd(pts, cols, cap, rng.uniform(0.001, 0.01, n))


def test_adam_matches_torch(rng):
    import torch

    st = _state(rng)
    hyper = AdamHyper()
    opt = init_adam(st)
    lrs = field_lrs(hyper, 0)

    tparams = {}
    for f in ("xyz", "f_dc", "opacity", "scaling", "rotation"):
        tparams[f] = torch.tensor(np.asarray(getattr(st, f)), requires_grad=True)
    topt = torch.optim.Adam(
        [
            {"params": [tparams["xyz"]], "lr": float(lrs["xyz"])},
            {"params": [tparams["f_dc"]], "lr": float(lrs["f_dc"])},
            {"params": [tparams["opacity"]], "lr": float(lrs["opacity"])},
            {"params": [tparams["scaling"]], "lr": float(lrs["scaling"])},
            {"params": [tparams["rotation"]], "lr": float(lrs["rotation"])},
        ],
        lr=0.0,
        eps=1e-15,
    )

    for step in range(3):
        grads = {
            f: jnp.asarray(rng.normal(size=getattr(st, f).shape).astype(np.float32))
            for f in ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation")
        }
        topt.zero_grad()
        for f, p in tparams.items():
            p.grad = torch.tensor(np.asarray(grads[f]))
        # freeze xyz lr at step-0 value on the torch side for comparability
        st, opt = adam_step(st, grads, opt, hyper, 0)
        topt.step()

    for f, p in tparams.items():
        np.testing.assert_allclose(
            np.asarray(getattr(st, f)), p.detach().numpy(), rtol=2e-5, atol=1e-6,
            err_msg=f,
        )


def test_stats_accumulation(rng):
    stats = init_stats(8)
    g = jnp.zeros((8, 2)).at[1].set(jnp.array([3.0, 4.0]))
    vis = jnp.array([True, True, False, False, False, False, False, False])
    radii = jnp.array([5, 2, 9, 0, 0, 0, 0, 0], jnp.int32)
    stats = add_stats(stats, g, radii, vis)
    assert float(stats.xyz_grad_accum[1]) == 5.0
    assert float(stats.denom[0]) == 1.0 and float(stats.denom[2]) == 0.0
    assert float(stats.max_radii2d[0]) == 5.0 and float(stats.max_radii2d[2]) == 0.0


def test_densify_clone_and_split(rng):
    st = _state(rng, n=10, cap=64)
    # entry 0: small + hot -> clone; entry 1: big + hot -> split
    st = st.replace(
        scaling=st.scaling.at[0].set(jnp.log(jnp.array([0.001] * 3)))
        .at[1].set(jnp.log(jnp.array([0.3] * 3)))
    )
    opt = init_adam(st)
    opt = opt.replace(m={**opt.m, "xyz": opt.m["xyz"].at[2].set(7.0)})
    stats = init_stats(64)
    stats = stats.replace(
        xyz_grad_accum=stats.xyz_grad_accum.at[0].set(1.0).at[1].set(1.0),
        denom=stats.denom.at[:10].set(1.0),
    )
    st2, opt2, stats2, dropped = densify_and_prune(
        st, opt, stats, jax.random.PRNGKey(0),
        max_grad=0.5, min_opacity=0.01, extent=4.0, max_world_size=1.0,
    )
    # 10 - 1 split + 1 clone + 2 children = 12
    assert int(st2.n_active) == 12
    assert int(dropped) == 0
    # order: [kept originals (9: all but idx1)], [clone of 0], [2 children]
    np.testing.assert_array_equal(np.asarray(st2.xyz[0]), np.asarray(st.xyz[0]))
    np.testing.assert_array_equal(np.asarray(st2.xyz[9]), np.asarray(st.xyz[0]))
    # children near original 1, scale shrunk by 1.6
    d = np.linalg.norm(np.asarray(st2.xyz[10:12]) - np.asarray(st.xyz[1]), axis=1)
    assert (d < 2.0).all()
    np.testing.assert_allclose(
        np.asarray(st2.scaling[10]), np.asarray(st.scaling[1]) - np.log(1.6),
        rtol=1e-5,
    )
    # adam moments: survivor idx2 (now at row 1) keeps its m; new rows zero
    np.testing.assert_allclose(np.asarray(opt2.m["xyz"][1]), 7.0)
    assert float(jnp.abs(opt2.m["xyz"][9:]).max()) == 0.0
    # stats reset
    assert float(stats2.denom.max()) == 0.0


def test_densify_prunes_low_opacity(rng):
    st = _state(rng, n=10, cap=32)
    st = st.replace(opacity=st.opacity.at[3].set(inverse_sigmoid(0.001)))
    opt = init_adam(st)
    st2, *_ = densify_and_prune(
        st, opt, init_stats(32), jax.random.PRNGKey(0),
        max_grad=0.5, min_opacity=0.01, extent=4.0, max_world_size=1.0,
    )
    assert int(st2.n_active) == 9


def test_prune_only(rng):
    st = _state(rng, n=10, cap=32)
    st = st.replace(
        opacity=st.opacity.at[2].set(inverse_sigmoid(0.001)),
        scaling=st.scaling.at[5].set(jnp.log(jnp.array([0.5] * 3))),
    )
    opt = init_adam(st)
    stats = init_stats(32).replace(denom=jnp.ones((32,)))
    st2, opt2, stats2 = prune_only(st, opt, stats, 0.05, 0.1)
    assert int(st2.n_active) == 8
    # stats carried through compaction (not reset)
    assert float(stats2.denom[:8].min()) == 1.0
    assert float(stats2.denom[8:].max()) == 0.0

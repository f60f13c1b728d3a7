import jax
import jax.numpy as jnp
import numpy as np

from gaussianip_tpu.diffusion.scheduler import (
    add_noise,
    ddim_step,
    make_ddim_schedule,
    refine_timestep_ladder,
)
from gaussianip_tpu.guidance.ahds import (
    anpg_grad,
    chosen_t_schedule,
    dual_gaussian_pdf,
    fit_dual_gaussian,
    make_ahds_schedule,
    sample_timesteps,
    sds_loss,
)


def test_ddim_schedule_matches_diffusers_formula():
    s = make_ddim_schedule()
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000) ** 2
    ref = np.cumprod(1 - betas)
    np.testing.assert_allclose(np.asarray(s.alphas_cumprod), ref, rtol=2e-5)
    assert float(s.final_alpha_cumprod) == float(s.alphas_cumprod[0])


def test_add_noise_endpoints(rng):
    s = make_ddim_schedule()
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 8)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    x0 = add_noise(s, x, eps, jnp.array([0, 0]))
    # at t=0 nearly all signal
    assert float(jnp.abs(x0 - x).mean()) < 0.05
    x999 = add_noise(s, x, eps, jnp.array([999, 999]))
    assert float(jnp.abs(x999 - eps).mean()) < 0.3


def test_ddim_step_recovers_x0(rng):
    s = make_ddim_schedule()
    x0 = jnp.asarray(rng.normal(size=(1, 4, 8, 8)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=x0.shape).astype(np.float32))
    t = jnp.array([500])
    xt = add_noise(s, x0, eps, t)
    # with the true eps, stepping to prev_t = -1 gives the exact DDIM map
    x_prev = ddim_step(s, eps, t, jnp.array([-1]), xt)
    a_prev = float(s.final_alpha_cumprod)
    expect = np.sqrt(a_prev) * np.asarray(x0) + np.sqrt(1 - a_prev) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(x_prev), expect, atol=2e-5)
    # and it is close to x0 (final alpha ~0.99915)
    assert float(jnp.abs(x_prev - x0).mean()) < 0.05


def test_refine_ladder():
    t = np.asarray(refine_timestep_ladder())
    assert t.shape == (50,)
    assert t[0] == 999 and t[-1] == 0
    assert (np.diff(t) < 0).all()
    # last 8 of the ladder — stage-2 uses timesteps[-8:]
    assert t[-8] == int(round(7 * 999 / 49))


def test_dual_gaussian_fit_hits_targets():
    pdf, params = fit_dual_gaussian()
    assert abs(pdf.sum() - 1) < 1e-9
    sums = [pdf[lo:hi].sum() for lo, hi in ((0, 350), (350, 450), (450, 800))]
    for s, tgt in zip(sums, (0.41, 0.21, 0.375)):
        assert abs(s - tgt) < 0.02, (sums, params)


def test_chosen_t_is_suffix_quantile():
    pdf, _ = fit_dual_gaussian()
    ts = chosen_t_schedule(pdf, n=100)
    suffix = np.cumsum(pdf[::-1])[::-1]
    # brute-force argmin for a few i
    for i in [0, 5, 37, 60, 99]:
        errs = np.abs(suffix - i / 100)
        assert errs[ts[i]] <= errs.min() + 1e-12
    # annealing: t decreases with step
    assert (np.diff(ts) <= 0).all()
    assert ts[0] >= 700  # early steps use high t


def test_sample_timesteps_windows():
    sched = make_ahds_schedule(n=2400)
    key = jax.random.PRNGKey(0)
    t_early = np.asarray(sample_timesteps(sched, key, jnp.int32(100), 64))
    assert (t_early >= 500).all() and (t_early < 800).all()
    t_mid = np.asarray(sample_timesteps(sched, key, jnp.int32(1000), 64))
    cur = int(sched.chosen_t[1000])
    assert (t_mid >= 150).all() and (t_mid < cur + 50).all()
    t_late = np.asarray(sample_timesteps(sched, key, jnp.int32(2300), 64))
    assert (t_late >= 20).all()


def test_anpg_grad_shapes_and_mask(rng):
    from gaussianip_tpu.diffusion.scheduler import make_ddim_schedule

    s = make_ddim_schedule()
    shape = (4, 4, 8, 8)
    e_neg, e_text, e_null = (
        jnp.asarray(rng.normal(size=shape).astype(np.float32)) for _ in range(3)
    )
    t_low = jnp.full((4,), 100)
    g_low = anpg_grad(e_neg, e_text, e_null, t_low, s.alphas_cumprod,
                      grad_clip_pixel=False)
    # t < 170: delta_d = e_null
    w = (1 - s.alphas_cumprod[t_low]).reshape(-1, 1, 1, 1)
    expect = w * (7.5 * (e_text - e_null) + e_null)
    np.testing.assert_allclose(np.asarray(g_low), np.asarray(expect), rtol=1e-4)
    t_hi = jnp.full((4,), 400)
    g_hi = anpg_grad(e_neg, e_text, e_null, t_hi, s.alphas_cumprod,
                     grad_clip_pixel=False)
    w = (1 - s.alphas_cumprod[t_hi]).reshape(-1, 1, 1, 1)
    expect = w * (7.5 * (e_text - e_null) + e_null - e_neg)
    np.testing.assert_allclose(np.asarray(g_hi), np.asarray(expect), rtol=1e-4)
    # pixel clip bounds the channel norm
    g_clip = anpg_grad(e_neg * 100, e_text * 100, e_null * 100, t_hi,
                       s.alphas_cumprod, grad_clip_pixel=True,
                       grad_clip_threshold=1.0)
    norms = np.linalg.norm(np.asarray(g_clip), axis=-1)
    assert norms.max() <= 1.0 + 1e-4


def test_sds_loss_gradient_is_grad(rng):
    lat = jnp.asarray(rng.normal(size=(2, 4, 8, 8)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=lat.shape).astype(np.float32))
    dl = jax.grad(lambda l: sds_loss(l, g))(lat)
    np.testing.assert_allclose(np.asarray(dl), np.asarray(g) / 2, atol=1e-6)

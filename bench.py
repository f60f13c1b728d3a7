"""Benchmark: differentiable splat rendering on real TPU hardware.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...extras}.

Headline metric (BASELINE.md tracked set): 1024^2 splat renders/sec
forward+backward at 100k gaussians (the stage-1 hot kernel; the reference's
CUDA diff-gaussian-rasterization does this per camera per training step).
vs_baseline uses 100 fwd+bwd FPS as the reference estimate for the CUDA
rasterizer at this workload on the reference's V100/3090 class hardware
(the reference publishes no kernel-level number — only the ~40 min full
pipeline, README.md:104; 100 FPS is a conservative literature estimate).
"""

import json
import os
import time

import numpy as np


def main():
    t_start = time.time()
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "520"))

    # watchdog: a hung TPU tunnel (device init / remote compile never
    # returning) must produce a diagnosable JSON line, not an empty file
    # (r3: the axon relay went down mid-round and every probe hung forever)
    import threading

    def _panic():
        print(json.dumps({
            "metric": "splat_render_fwd_bwd_1024px_100k",
            "value": 0.0, "unit": "renders/s", "vs_baseline": 0.0,
            "error": f"watchdog: no result within {budget_s + 300:.0f}s "
                     "(TPU tunnel hung?)"}), flush=True)
        os._exit(2)

    # +300 s margin: a slow-but-healthy cold-cache run (unet subprocess
    # slice + two 1024^2 compiles) can legitimately overshoot the budget;
    # only a genuinely hung tunnel should trip this
    watchdog = threading.Timer(budget_s + 300, _panic)
    watchdog.daemon = True
    watchdog.start()

    import jax
    import jax.numpy as jnp

    # persistent compilation cache: reruns skip the 1-2 min compiles
    try:
        os.makedirs(".jax_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    def time_left():
        return budget_s - (time.time() - t_start)

    import sys

    def mark(label):
        # stderr progress stamps: the JSON contract is stdout-only, and the
        # r3 budget overruns were undiagnosable without per-section timing
        print(f"[bench {time.time() - t_start:6.1f}s] {label}",
              file=sys.stderr, flush=True)

    from gaussianip_tpu.data.cameras import camera_from_c2w
    from gaussianip_tpu.model.gaussians import create_from_pcd
    from gaussianip_tpu.ops.camera_math import look_at_c2w
    from gaussianip_tpu.ops.knn import mean_dist2_3nn
    from gaussianip_tpu.render.render import (RenderConfig,
                                              count_live_instances, render)

    extras = {}

    # UNet+ControlNet denoise rate FIRST (r02 lost this metric to a timeout
    # when it ran last on a cold cache): subprocess with its own slice of
    # the budget; its compiles land in the shared persistent cache either
    # way, so a late retry (below) is cheap
    def run_unet_bench(slice_s):
        import subprocess
        import sys

        try:
            r = subprocess.run(
                [sys.executable, "bench_unet.py"], capture_output=True,
                text=True, timeout=slice_s,
            )
            for line in reversed(r.stdout.strip().splitlines()):
                if line.startswith("{"):
                    return json.loads(line)
            return {"unet_denoise_error":
                    (r.stderr.strip().splitlines() or ["no output"])[-1][:80]}
        except subprocess.TimeoutExpired as e:
            # e.stderr carries the partial output (the section stamps) — the
            # whole point of the stamps is diagnosing this exact case
            tail = ""
            if e.stderr:
                err = e.stderr if isinstance(e.stderr, str) else \
                    e.stderr.decode("utf-8", "replace")
                lines = err.strip().splitlines()
                tail = ": " + lines[-1][:70] if lines else ""
            return {"unet_denoise_error": "timeout" + tail}
        except Exception as e:
            return {"unet_denoise_error": str(e)[:80]}

    # slice sized so the splat headline + train-step sections always get
    # their share even when this subprocess uses its whole slice (r03: the
    # 45%/234s slice starved train_step_render_512_b4_ms out of the JSON)
    mark("unet subprocess start")
    extras.update(run_unet_bench(min(max(budget_s * 0.35, 60), 200)))
    mark("unet subprocess done")

    rng = np.random.default_rng(0)
    n = 100_000
    res = 1024
    batch = 1

    # human-ish scene: points on a capsule, mildly opaque
    z = rng.uniform(-0.85, 0.85, n)
    th = rng.uniform(0, 2 * np.pi, n)
    r = 0.25 * np.sqrt(np.maximum(0.0, 1 - (z / 0.9) ** 2)) + 0.03
    pts = np.stack([r * np.cos(th), r * np.sin(th), z], 1).astype(np.float32)
    pts += rng.normal(0, 0.01, pts.shape).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    mark("scene build")
    d2 = mean_dist2_3nn(jnp.asarray(pts), block=4096)
    state = create_from_pcd(pts, cols, n, d2)
    mark("knn+pcd done")
    state = state.replace(
        opacity=jnp.asarray(rng.uniform(-1.0, 2.5, (n, 1)).astype(np.float32))
    )

    az = jnp.linspace(0, 2 * jnp.pi, batch, endpoint=False)
    eye = jnp.stack(
        [1.8 * jnp.cos(az), 1.8 * jnp.sin(az), jnp.full((batch,), 0.2)], -1
    )
    c2w = look_at_c2w(eye, jnp.zeros((batch, 3)),
                      jnp.tile(jnp.array([[0.0, 0, 1]]), (batch, 1)))
    cams = jax.vmap(lambda m: camera_from_c2w(m, jnp.float32(1.0), res, res))(c2w)
    bg = jnp.zeros(3)
    cfg = RenderConfig(backend="pallas")

    # The axon tunnel makes per-call host timing unreliable (~25 ms RPC
    # latency, async completion): iterate INSIDE one jit via lax.scan and
    # read back a scalar, subtracting the fixed RPC overhead measured with a
    # trivial program.
    K = 3

    def loss(st, off):
        out = render(st, cams, bg, cfg, mean2d_offset=off)
        return jnp.sum(out.rgb ** 2) + jnp.sum(out.alpha) + jnp.sum(out.depth)

    @jax.jit
    def fwd_k(state):
        # unrolled chain: carry feeds the next iteration so XLA cannot CSE.
        # Perturb XYZ — every stage (projection, binning, compositing) must
        # depend on the carry, or XLA hoists the invariant stages out of the
        # chain and the per-iteration time underreports them (an opacity
        # perturbation left the whole binning hoisted: ~4x flattering)
        carry = jnp.float32(0.0)
        for _ in range(K):
            st = state.replace(xyz=state.xyz + carry * 1e-12)
            out = render(st, cams, bg, cfg)
            carry = jnp.sum(out.rgb)
        return carry

    @jax.jit
    def fwdbwd_k(state):
        carry = jnp.float32(0.0)
        off = jnp.zeros((batch, n, 2))
        for _ in range(K):
            st = state.replace(xyz=state.xyz + carry * 1e-12)
            g = jax.grad(loss, argnums=(0, 1), allow_int=True)(st, off)
            carry = jnp.sum(g[1]) + jnp.sum(g[0].xyz)
        return carry

    @jax.jit
    def trivial(state):
        return jnp.sum(state.opacity)

    def timeit(f, *args, reps=3):
        float(f(*args))  # compile
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(f(*args))
            ts.append(time.time() - t0)
        return min(ts)

    mark("splat fwd compile+time")
    t_rpc = timeit(trivial, state)
    t_fwd = max(timeit(fwd_k, state) - t_rpc, 1e-9) / K
    mark("splat fwd done")
    t_fb = max(timeit(fwdbwd_k, state) - t_rpc, 1e-9) / K
    mark("splat fwd+bwd done")

    # measured live instance count on THIS scene (roofline inputs; ADVICE
    # r02: the old hard-coded 400k was wrong for any other scene)
    n_live = int(jax.device_get(count_live_instances(state, cams, cfg))[0])
    mark("n_live done")

    # stage-1 training shape: 512^2, camera batch 4 (the hot loop)
    res2, b2 = 512, 4
    az2 = jnp.linspace(0, 2 * jnp.pi, b2, endpoint=False)
    eye2 = jnp.stack([1.5 * jnp.cos(az2), 1.5 * jnp.sin(az2),
                      jnp.full((b2,), 0.1)], -1)
    c2w2 = look_at_c2w(eye2, jnp.zeros((b2, 3)),
                       jnp.tile(jnp.array([[0.0, 0, 1]]), (b2, 1)))
    cams2 = jax.vmap(lambda m: camera_from_c2w(m, jnp.float32(1.0), res2, res2))(c2w2)

    # stage-1 recipe uses d_max=16 at 512^2 (exact at that scale; launch.py)
    cfg2 = RenderConfig(d_max=16)

    def loss2(st, off):
        out = render(st, cams2, bg, cfg2, mean2d_offset=off)
        return jnp.sum(out.rgb ** 2) + jnp.sum(out.alpha)

    @jax.jit
    def fwdbwd2_k(state):
        # single iteration: the K-chain compile at this shape overruns the
        # bench budget; RPC overhead dominates less at ~100ms scale anyway
        off = jnp.zeros((b2, n, 2))
        g = jax.grad(loss2, argnums=(0, 1), allow_int=True)(state, off)
        return jnp.sum(g[1]) + jnp.sum(g[0].xyz)

    # warm-cache compile of this step is seconds; only skip when the budget
    # is truly gone (a 150 s guard silently dropped this tracked metric)
    if time_left() > 45:
        try:
            reps = 5 if time_left() > 120 else 3
            t_fb2 = max(timeit(fwdbwd2_k, state, reps=reps) - t_rpc, 1e-9)
            extras["train_step_render_512_b4_ms"] = round(t_fb2 * 1000, 2)
            mark("train_step done")
        except Exception as e:
            extras["train_step_render_512_b4_error"] = str(e)[:80]

    # retry the unet metric if the first slice timed out: its compiles are
    # now in the persistent cache, so a short second slice usually lands it
    if "unet_denoise_error" in extras and time_left() > 90:
        retry = run_unet_bench(max(time_left() - 20, 60))
        if "unet_denoise_error" not in retry:
            extras.pop("unet_denoise_error")
        extras.update(retry)

    fps_fb = batch / t_fb
    baseline_fps = 100.0
    # hardware-roofline view (VERDICT r1 #9): traffic/FLOPs the fwd+bwd pass
    # actually moves/computes vs v5e peaks (~820 GB/s HBM, 197 TF/s bf16 /
    # ~98 TF/s f32). The compositor is gather/sort/HBM-bound, not MXU-bound.
    # n_live measured above via count_live_instances on this exact scene.
    from gaussianip_tpu.render.render import _auto_pool
    e_univ = cfg.inline * n + _auto_pool(n, cfg.chunk, res, res, cfg.inline,
                                         cfg.tile, cfg.d_max)
    bytes_moved = (
        n_live * (10 + 16 + 16 + 16) * 4  # gather + data + dgrad rw (f32)
        + e_univ * 4 * 2 * 2              # sort universe (keys+gid), r/w
        #                                   (the r5 deletion dropped the
        #                                   emission payload + inverse sort)
        + 4096 * 8 * 256 * 4 * 3          # tile accumulators out+bwd reads
    )
    hbm_gbs = bytes_moved / t_fb / 1e9
    # MXU work: power + triangular + feature matmuls over live chunks,
    # fwd (3) + bwd (5 passes), f32 (HIGHEST)
    chunks = n_live / 128 * 1.3
    mxu_flops = chunks * (2 * 8 * 128 * 256 * 2 + 2 * 128 * 128 * 256) * (3 + 5) / 3
    watchdog.cancel()
    print(json.dumps({
        "metric": "splat_render_fwd_bwd_1024px_100k",
        "value": round(fps_fb, 2),
        "unit": "renders/s",
        "vs_baseline": round(fps_fb / baseline_fps, 3),
        "baseline_note": "denominator 100 fwd+bwd FPS is a literature "
                         "ESTIMATE for CUDA diff-gaussian-rasterization at "
                         "1024^2/100k (reference publishes no kernel number)",
        "fwd_ms": round(t_fwd * 1000 / batch, 2),
        "fwd_bwd_ms": round(t_fb * 1000 / batch, 2),
        "hbm_traffic_gb_s": round(hbm_gbs, 1),
        "hbm_util_of_820": round(hbm_gbs / 820.0, 3),
        "mxu_tflops": round(mxu_flops / t_fb / 1e12, 1),
        "n_live_instances": n_live,
        **extras,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()

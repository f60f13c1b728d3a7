"""Cost of jnp.searchsorted(800k sorted, 4096 queries) by method, plus the
remaining in-context binning overhead suspects."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs(".jax_cache", exist_ok=True)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

dev = jax.devices()[0]
E, NT = 800_000, 4096
rng = np.random.default_rng(0)
tile_sorted = jax.device_put(jnp.asarray(
    np.sort(rng.integers(0, NT + 1, E)).astype(np.int32)), dev)
tids = jax.device_put(jnp.arange(NT, dtype=jnp.int32), dev)


def timeit(f, *args, reps=3):
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(f(*args))
        ts.append(time.time() - t0)
    return min(ts)


@jax.jit
def trivial(x):
    return jnp.sum(x[:8]).astype(jnp.float32)


t_rpc = timeit(trivial, tile_sorted)
print(f"rpc={t_rpc*1000:.1f}ms")
K = 6

for method in ("scan", "scan_unrolled", "sort", "compare_all"):
    @jax.jit
    def f(ts_arr):
        s = jnp.int32(0)
        for _ in range(K):
            st = jnp.searchsorted(ts_arr ^ (s & 1), tids, side="left",
                                  method=method)
            s = st.sum()
        return s.astype(jnp.float32)

    try:
        t = max(timeit(f, tile_sorted) - t_rpc, 1e-9) / K
        print(f"searchsorted[{method:14s}] {t*1000:7.2f} ms")
    except Exception as e:
        print(f"searchsorted[{method}] failed: {str(e)[:60]}")

# alternative: histogram via bincount-style scatter-add (counts directly)
@jax.jit
def hist(ts_arr):
    s = jnp.int32(0)
    for _ in range(K):
        h = jnp.zeros((NT + 1,), jnp.int32).at[
            jnp.minimum(ts_arr ^ (s & 1), NT)].add(1)
        s = h.sum() + h[0]
    return s.astype(jnp.float32)


t = max(timeit(hist, tile_sorted) - t_rpc, 1e-9) / K
print(f"scatter-add histogram 800k  {t*1000:7.2f} ms")

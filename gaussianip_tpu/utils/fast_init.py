"""Shape-only flax parameter init for stubs and tests.

`Module.init` runs a real forward pass, which XLA compiles — for the tiny
stub diffusion stack that is 30-80 s on the CPU backend (NOTES gotcha #7),
dwarfing the smoke runs it enables. `fast_init` instead traces the init with
`jax.eval_shape` (no compile, milliseconds) and fills the parameter pytree
host-side: 'scale' leaves get ones (Layer/GroupNorm identity), 'bias' zeros,
everything else small Gaussian noise.

For random-weight stubs and structure-only uses (e.g. weight-converter
round-trip tests) only — real checkpoints load through diffusion/weights.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def fast_init(module, key, *args, scale: float = 0.05, **kwargs):
    shapes = jax.eval_shape(lambda *a: module.init(key, *a, **kwargs), *args)
    seed = int(np.asarray(jax.random.key_data(key)).ravel()[-1]) & 0x7FFFFFFF
    rng = np.random.default_rng(seed)

    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    leaves = []
    for path, leaf in flat:
        name = ""
        for p in reversed(path):
            if hasattr(p, "key"):
                name = str(p.key)
                break
        if not jnp.issubdtype(leaf.dtype, jnp.floating):
            v = np.zeros(leaf.shape, jax.dtypes.canonicalize_dtype(leaf.dtype))
        elif name == "scale":
            v = np.ones(leaf.shape, np.float32)
        elif name == "bias":
            v = np.zeros(leaf.shape, np.float32)
        else:
            v = rng.normal(0.0, scale, leaf.shape).astype(np.float32)
        leaves.append(jnp.asarray(v, leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)

"""Adan optimizer (Adaptive Nesterov Momentum) as an optax transform.

Behavioral rebuild of the reference's vendored Adan (reference:
threestudio/systems/optimizers.py:23-315, the no-restart path):

  m_t = (1 - b1) m_{t-1} + b1 g
  diff = g - g_{t-1}
  v_t = (1 - b2) v_{t-1} + b2 diff
  n_t = (1 - b3) n_{t-1} + b3 (g + (1 - b2) diff)^2
  update = (m_t / bc1 + (1 - b2) v_t / bc2) / (sqrt(n_t / bc3) + eps)
  p_t = (p_{t-1} - lr * update) / (1 + lr * weight_decay)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class AdanState(NamedTuple):
    count: jnp.ndarray
    m: optax.Updates
    v: optax.Updates
    n: optax.Updates
    prev_grad: optax.Updates


def adan(learning_rate: float = 1e-3, b1: float = 0.02, b2: float = 0.08,
         b3: float = 0.01, eps: float = 1e-8, weight_decay: float = 0.0):
    """Note: the reference parametrizes betas as (1 - beta) relative to the
    paper; defaults here match its defaults betas=(0.98, 0.92, 0.99) ->
    b = 1 - beta."""

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdanState(jnp.zeros([], jnp.int32), z, z,
                         jax.tree_util.tree_map(jnp.zeros_like, params), z)

    def update(grads, state, params):
        count = state.count + 1
        t = count.astype(jnp.float32)
        bc1 = 1 - (1 - b1) ** t
        bc2 = 1 - (1 - b2) ** t
        bc3 = 1 - (1 - b3) ** t
        first = state.count == 0

        def per_leaf(g, m, v, n, pg):
            diff = jnp.where(first, 0.0, g - pg)
            m_t = (1 - b1) * m + b1 * g
            v_t = (1 - b2) * v + b2 * diff
            u = g + (1 - b2) * diff
            n_t = (1 - b3) * n + b3 * (u * u)
            denom = jnp.sqrt(n_t / bc3) + eps
            upd = (m_t / bc1 + (1 - b2) * v_t / bc2) / denom
            return m_t, v_t, n_t, upd

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_m = treedef.flatten_up_to(state.m)
        flat_v = treedef.flatten_up_to(state.v)
        flat_n = treedef.flatten_up_to(state.n)
        flat_pg = treedef.flatten_up_to(state.prev_grad)
        outs = [per_leaf(g, m, v, n, pg) for g, m, v, n, pg in
                zip(flat_g, flat_m, flat_v, flat_n, flat_pg)]
        new_m = treedef.unflatten([o[0] for o in outs])
        new_v = treedef.unflatten([o[1] for o in outs])
        new_n = treedef.unflatten([o[2] for o in outs])
        upds = treedef.unflatten([o[3] for o in outs])

        flat_p = treedef.flatten_up_to(params) if params is not None else None

        def final(u, p):
            if weight_decay > 0 and p is not None:
                # decoupled decay: p' = (p - lr u)/(1 + lr wd) =>
                # delta = p' - p
                newp = (p - learning_rate * u) / (1 + learning_rate * weight_decay)
                return newp - p
            return -learning_rate * u

        flat_u = treedef.flatten_up_to(upds)
        deltas = treedef.unflatten([
            final(u, p) for u, p in zip(
                flat_u, flat_p if flat_p is not None else [None] * len(flat_u))
        ])
        return deltas, AdanState(count, new_m, new_v, new_n, grads)

    return optax.GradientTransformation(init, update)

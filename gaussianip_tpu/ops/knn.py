"""Exact k-nearest-neighbor ops, TPU-native.

Replaces the reference's CUDA kernels:
  * simple-knn `distCUDA2` (mean squared distance to the 3 nearest neighbors,
    used once for initial splat scales — reference:
    gaussiansplatting/submodules/simple-knn/spatial.cu:15-26, consumed at
    gaussian_model.py:123);
  * pytorch3d `knn_points` (K=6 gaussian->SMPL-X vertex binding, reference:
    avatar/__init__.py:42).

Design: blocked brute force. Pairwise distances ride the MXU via the
|x|^2 + |y|^2 - 2 x.y expansion; a running top-k merge keeps memory at
O(N * block). Exact (no Morton approximation needed — the reference's
box-culled scan is itself approximate; exact is both simpler and correct).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "block"))
def knn_dist2(queries, points, k: int = 3, block: int = 4096):
    """Squared distances from each query to its k nearest `points`.

    Excludes exact self-matches by masking zero-distance pairs ONLY when the
    arrays are the same object semantics is not detectable — callers doing
    self-KNN should pass `exclude_self=True` via knn_self_dist2 instead.

    Returns [Nq, k] squared distances (ascending) and [Nq, k] indices.
    """
    return _knn(queries, points, k, block, exclude_self=False)


@functools.partial(jax.jit, static_argnames=("k", "block"))
def knn_self_dist2(points, k: int = 3, block: int = 4096):
    """k-NN of a point set to itself, excluding each point's own index."""
    return _knn(points, points, k, block, exclude_self=True)


def _knn(queries, points, k, block, exclude_self):
    q = jnp.asarray(queries, jnp.float32)
    p = jnp.asarray(points, jnp.float32)
    nq, np_ = q.shape[0], p.shape[0]
    nblocks = -(-np_ // block)
    pad = nblocks * block - np_
    p_pad = jnp.pad(p, ((0, pad), (0, 0)))
    q2 = jnp.sum(q * q, axis=1, keepdims=True)  # [Nq, 1]

    def body(carry, i):
        best_d, best_i = carry
        start = i * block
        pb = jax.lax.dynamic_slice_in_dim(p_pad, start, block, axis=0)
        idx = start + jnp.arange(block)
        d2 = (
            q2
            + jnp.sum(pb * pb, axis=1)[None, :]
            - 2.0 * q @ pb.T
        )  # [Nq, block]
        invalid = idx >= np_
        if exclude_self:
            invalid = invalid[None, :] | (idx[None, :] == jnp.arange(nq)[:, None])
        else:
            invalid = jnp.broadcast_to(invalid[None, :], d2.shape)
        d2 = jnp.where(invalid, jnp.inf, d2)
        cat_d = jnp.concatenate([best_d, d2], axis=1)
        cat_i = jnp.concatenate([best_i, jnp.broadcast_to(idx[None, :], d2.shape)], 1)
        neg_top, arg = jax.lax.top_k(-cat_d, k)
        return (-neg_top, jnp.take_along_axis(cat_i, arg, axis=1)), None

    init = (
        jnp.full((nq, k), jnp.inf, jnp.float32),
        jnp.zeros((nq, k), jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(body, init, jnp.arange(nblocks))
    best_d = jnp.maximum(best_d, 0.0)  # clamp matmul-expansion negatives
    return best_d, best_i


def mean_dist2_3nn(points, block: int = 4096):
    """distCUDA2 equivalent: mean squared distance to the 3 nearest neighbors
    (self excluded). [N] float32."""
    d2, _ = knn_self_dist2(points, k=3, block=block)
    return jnp.mean(d2, axis=1)

"""GaussianState: the 3D Gaussian-splat avatar as a functional pytree.

TPU-first redesign of the reference's mutable GaussianModel (reference:
gaussiansplatting/scene/gaussian_model.py:13-136). Parameters live in
fixed-capacity padded arrays with an `n_active` scalar so every jitted
computation keeps static shapes; densify/prune are pure functions over this
pytree (see gaussianip_tpu/model/densify.py).

Field layouts match the reference exactly so .ply files are interchangeable:
  xyz       [CAP, 3]      world positions
  f_dc      [CAP, 1, 3]   SH DC coeffs   (torch _features_dc is [N, 1, 3])
  f_rest    [CAP, R, 3]   SH rest coeffs (R = (deg+1)^2 - 1)
  scaling   [CAP, 3]      log-scale      (activation: exp)
  rotation  [CAP, 4]      raw quaternion wxyz (activation: L2 normalize)
  opacity   [CAP, 1]      logit          (activation: sigmoid)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.sh import rgb_to_sh
from ..ops.transforms import inverse_sigmoid

PAD_XYZ = 1e8  # padding slots parked far outside every frustum
PAD_OPACITY = -30.0  # sigmoid(-30) ~ 1e-13, far below the 1/255 alpha cutoff


@struct.dataclass
class GaussianState:
    xyz: jnp.ndarray
    f_dc: jnp.ndarray
    f_rest: jnp.ndarray
    scaling: jnp.ndarray
    rotation: jnp.ndarray
    opacity: jnp.ndarray
    n_active: jnp.ndarray  # int32 scalar
    max_sh_degree: int = struct.field(pytree_node=False, default=0)
    active_sh_degree: int = struct.field(pytree_node=False, default=0)

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    def active_mask(self):
        return jnp.arange(self.capacity) < self.n_active

    # -- activated views ----------------------------------------------------
    def get_scaling(self):
        return jnp.exp(self.scaling)

    def get_opacity(self):
        return jax.nn.sigmoid(self.opacity)

    def get_features(self):
        """[CAP, (deg+1)^2, 3] — dc then rest, coeff-major like the reference's
        get_features (reference: gaussian_model.py:96-100)."""
        return jnp.concatenate([self.f_dc, self.f_rest], axis=1)


def empty_state(capacity: int, max_sh_degree: int = 0) -> GaussianState:
    n_rest = (max_sh_degree + 1) ** 2 - 1
    return GaussianState(
        xyz=jnp.full((capacity, 3), PAD_XYZ, jnp.float32),
        f_dc=jnp.zeros((capacity, 1, 3), jnp.float32),
        f_rest=jnp.zeros((capacity, n_rest, 3), jnp.float32),
        scaling=jnp.full((capacity, 3), -10.0, jnp.float32),
        rotation=jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (capacity, 1)),
        opacity=jnp.full((capacity, 1), PAD_OPACITY, jnp.float32),
        n_active=jnp.int32(0),
        max_sh_degree=max_sh_degree,
        active_sh_degree=0,
    )


def pad_to_capacity(state: GaussianState, arrays: dict, n: int) -> GaussianState:
    """Write n rows of per-field arrays into the front of a fresh padded state."""
    cap = state.capacity
    assert n <= cap, f"{n} points exceed capacity {cap}"
    upd = {}
    for name, arr in arrays.items():
        base = getattr(state, name)
        upd[name] = base.at[:n].set(arr.astype(base.dtype))
    return state.replace(n_active=jnp.int32(n), **upd)


def create_from_pcd(
    points, colors, capacity: int, mean_dist2, max_sh_degree: int = 0
) -> GaussianState:
    """Initialize from a point cloud (reference: gaussian_model.py:113-136).

    scale init: log(sqrt(mean 3-NN squared distance)), isotropic;
    rotation: identity quat; opacity: logit(0.1); colors -> SH DC.
    `mean_dist2` is the per-point mean squared 3-NN distance (see ops/knn.py,
    the distCUDA2 equivalent)."""
    n = points.shape[0]
    points = jnp.asarray(points, jnp.float32)
    colors = jnp.asarray(colors, jnp.float32)
    dist2 = jnp.maximum(jnp.asarray(mean_dist2, jnp.float32), 1e-7)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
    rots = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
    opacities = inverse_sigmoid(0.1 * jnp.ones((n, 1), jnp.float32))
    f_dc = rgb_to_sh(colors)[:, None, :]
    state = empty_state(capacity, max_sh_degree)
    return pad_to_capacity(
        state,
        {
            "xyz": points,
            "f_dc": f_dc,
            "scaling": scales,
            "rotation": rots,
            "opacity": opacities,
        },
        n,
    )

"""Camera pytree for the splat renderer.

Functional equivalent of the reference's Camera / MiniCam (reference:
gaussiansplatting/scene/cameras.py:17-66): stores the transposed world-view and
full-projection matrices (row-vector convention) plus the camera center.
Height/width are static pytree aux data so jitted renders specialize on
resolution.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..ops.camera_math import camera_matrices


@struct.dataclass
class Camera:
    world_view_t: jnp.ndarray  # [4, 4] transposed w2c (p_row @ M)
    full_proj_t: jnp.ndarray  # [4, 4] transposed view-proj
    camera_center: jnp.ndarray  # [3]
    fovx: jnp.ndarray  # scalar, radians
    fovy: jnp.ndarray  # scalar, radians
    height: int = struct.field(pytree_node=False, default=512)
    width: int = struct.field(pytree_node=False, default=512)

    @property
    def tan_fovx(self):
        return jnp.tan(self.fovx * 0.5)

    @property
    def tan_fovy(self):
        return jnp.tan(self.fovy * 0.5)


def camera_from_c2w(c2w, fovy, height: int, width: int, znear=0.01, zfar=100.0):
    """Build a Camera from a c2w matrix + vertical FoV (radians), mirroring
    reference gaussiansplatting/scene/cameras.py:18-51."""
    world_view_t, full_proj_t, center, fovx = camera_matrices(
        jnp.asarray(c2w, jnp.float32), jnp.asarray(fovy, jnp.float32), height, width,
        znear, zfar,
    )
    return Camera(
        world_view_t=world_view_t,
        full_proj_t=full_proj_t,
        camera_center=center,
        fovx=fovx,
        fovy=jnp.asarray(fovy, jnp.float32),
        height=height,
        width=width,
    )

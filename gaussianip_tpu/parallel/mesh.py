"""Device-mesh helpers: the TPU-native scaling layer.

The reference is single-GPU with inert torch.distributed hooks (SURVEY.md
§2.4); the rebuild scales the camera/view batch over a 1-D 'data' mesh:
gaussian params and diffusion weights stay replicated, per-view rendering /
pose maps / UNet CFG rows shard over ICI, and XLA inserts the psum on
parameter gradients. These helpers centralize mesh construction and the
batch-axis sharding constraint used by system/stage1 and __graft_entry__."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("data",))


def shard_over_data(mesh: Mesh, tree):
    """Constrain axis 0 of every array leaf to the 'data' axis."""

    def constrain(a):
        spec = P(*(("data",) + (None,) * (a.ndim - 1)))
        return jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(constrain, tree)


def replicated(mesh: Mesh, tree):
    def constrain(a):
        return jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(constrain, tree)


def put_sharded(mesh: Mesh, tree):
    """Device_put a host pytree with axis-0 'data' sharding."""

    def put(a):
        spec = P(*(("data",) + (None,) * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)

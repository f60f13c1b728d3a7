"""Binary PLY I/O for Gaussian splats, bitwise-compatible with the reference.

Attribute layout (reference: gaussiansplatting/scene/gaussian_model.py:185-216):
  x y z nx ny nz f_dc_0..2 f_rest_0..(3R-1) opacity scale_0..2 rot_0..3
all float32 little-endian, one 'vertex' element, written with the same header
plyfile produces. f_dc/f_rest are flattened channel-major ([N, R, 3] ->
transpose -> [N, 3R]), matching the torch `.transpose(1, 2).flatten(1)`.
"""

from __future__ import annotations

import os

import numpy as np


def _header(n_vertex: int, n_rest_props: int) -> bytes:
    props = ["x", "y", "z", "nx", "ny", "nz"]
    props += [f"f_dc_{i}" for i in range(3)]
    props += [f"f_rest_{i}" for i in range(n_rest_props)]
    props += ["opacity"]
    props += [f"scale_{i}" for i in range(3)]
    props += [f"rot_{i}" for i in range(4)]
    lines = ["ply", "format binary_little_endian 1.0", f"element vertex {n_vertex}"]
    lines += [f"property float {p}" for p in props]
    lines += ["end_header"]
    return ("\n".join(lines) + "\n").encode("ascii")


def save_ply(path, xyz, f_dc, f_rest, opacity, scaling, rotation):
    """Write raw (pre-activation) splat attributes; inputs are [N, ...] numpy
    or jax arrays with the GaussianState layouts."""
    xyz = np.asarray(xyz, np.float32)
    n = xyz.shape[0]
    f_dc = np.asarray(f_dc, np.float32).transpose(0, 2, 1).reshape(n, -1)
    f_rest = np.asarray(f_rest, np.float32).transpose(0, 2, 1).reshape(n, -1)
    opacity = np.asarray(opacity, np.float32).reshape(n, 1)
    scaling = np.asarray(scaling, np.float32)
    rotation = np.asarray(rotation, np.float32)
    normals = np.zeros_like(xyz)
    data = np.concatenate(
        [xyz, normals, f_dc, f_rest, opacity, scaling, rotation], axis=1
    ).astype("<f4")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(_header(n, f_rest.shape[1]))
        f.write(np.ascontiguousarray(data).tobytes())


def load_ply(path):
    """Read a 3DGS ply -> dict of numpy arrays with GaussianState layouts.
    Mirrors reference gaussian_model.py:223-264 (sorted f_rest/scale/rot names,
    channel-major reshape)."""
    with open(path, "rb") as f:
        raw = f.read()
    end = raw.index(b"end_header\n") + len(b"end_header\n")
    header = raw[:end].decode("ascii").splitlines()
    n = None
    props = []
    fmt = None
    for line in header:
        t = line.split()
        if not t:
            continue
        if t[0] == "format":
            fmt = t[1]
        elif t[0] == "element" and t[1] == "vertex":
            n = int(t[2])
        elif t[0] == "property" and n is not None:
            assert t[1] in ("float", "float32"), f"unsupported property type {t[1]}"
            props.append(t[2])
    assert fmt == "binary_little_endian", f"unsupported ply format {fmt}"
    arr = np.frombuffer(
        raw, dtype=np.dtype([(p, "<f4") for p in props]), count=n, offset=end
    )

    def col(name):
        return np.asarray(arr[name], np.float32)

    xyz = np.stack([col("x"), col("y"), col("z")], axis=1)
    opacity = col("opacity")[:, None]
    f_dc = np.stack([col("f_dc_0"), col("f_dc_1"), col("f_dc_2")], axis=1)[
        :, None, :
    ].transpose(0, 2, 1)  # [N, 3, 1] channel-major
    rest_names = sorted(
        (p for p in props if p.startswith("f_rest_")),
        key=lambda s: int(s.split("_")[-1]),
    )
    if rest_names:
        f_rest = np.stack([col(p) for p in rest_names], axis=1)
        f_rest = f_rest.reshape(n, 3, -1)  # [N, 3, R] channel-major
    else:
        f_rest = np.zeros((n, 3, 0), np.float32)
    scale_names = sorted(
        (p for p in props if p.startswith("scale_")),
        key=lambda s: int(s.split("_")[-1]),
    )
    rot_names = sorted(
        (p for p in props if p.startswith("rot_")), key=lambda s: int(s.split("_")[-1])
    )
    scaling = np.stack([col(p) for p in scale_names], axis=1)
    rotation = np.stack([col(p) for p in rot_names], axis=1)
    return {
        "xyz": xyz,
        # back to GaussianState coeff-major layouts [N, R, 3]
        "f_dc": f_dc.transpose(0, 2, 1),
        "f_rest": f_rest.transpose(0, 2, 1),
        "opacity": opacity,
        "scaling": scaling,
        "rotation": rotation,
    }


def state_to_ply(state, path):
    """Save the active slice of a GaussianState."""
    import jax

    n = int(jax.device_get(state.n_active))
    save_ply(
        path,
        jax.device_get(state.xyz[:n]),
        jax.device_get(state.f_dc[:n]),
        jax.device_get(state.f_rest[:n]),
        jax.device_get(state.opacity[:n]),
        jax.device_get(state.scaling[:n]),
        jax.device_get(state.rotation[:n]),
    )


def state_from_ply(path, capacity=None, max_sh_degree=0):
    """Load a .ply into a padded GaussianState (capacity defaults to next
    multiple of 4096 >= N)."""
    from .gaussians import empty_state, pad_to_capacity
    import jax.numpy as jnp

    d = load_ply(path)
    n = d["xyz"].shape[0]
    if capacity is None:
        capacity = max(4096, -(-n // 4096) * 4096)
    n_rest = d["f_rest"].shape[1]
    deg = int(round((n_rest + 1) ** 0.5)) - 1
    assert (deg + 1) ** 2 - 1 == n_rest, f"bad f_rest count {n_rest}"
    state = empty_state(capacity, max(deg, max_sh_degree))
    if deg < state.max_sh_degree:
        pad = (state.max_sh_degree + 1) ** 2 - 1 - n_rest
        d["f_rest"] = np.concatenate(
            [d["f_rest"], np.zeros((n, pad, 3), np.float32)], axis=1
        )
    state = pad_to_capacity(state, {k: jnp.asarray(v) for k, v in d.items()}, n)
    return state.replace(active_sh_degree=state.max_sh_degree)

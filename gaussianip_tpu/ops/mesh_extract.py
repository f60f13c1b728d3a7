"""Splat -> mesh extraction: density grid + marching tetrahedra + OBJ export.

Behavioral rebuild of the reference's mesh extraction utilities (reference:
gs_renderer.py:240-361 extract_fields / extract_mesh,
threestudio/models/isosurface.py marching-tetrahedra helper,
threestudio/models/exporters mesh export):

  * density field: sum over gaussians of opacity * exp(-0.5 d^T Sigma^-1 d),
    gaussians pre-filtered at opacity 0.005, scene normalized to ~[-1, 1]
    (1.8 / max extent);
  * TPU-first evaluation: instead of the reference's per-block gaussian
    culling loop, each gaussian scatter-adds its contribution on a local
    K^3 voxel patch around its center (one vectorized scatter — footprints
    beyond the patch are truncated, negligible at extraction scale);
  * isosurface via marching tetrahedra (6-tet cube split) on the host;
  * OBJ/PLY mesh export."""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .transforms import build_covariance


def gaussian_3d_coeff(d, cov6):
    """exp(-0.5 d^T Sigma^-1 d) from packed upper-tri cov (xx,xy,xz,yy,yz,zz)
    (reference: gs_renderer gaussian_3d_coeff)."""
    xx, xy, xz, yy, yz, zz = (cov6[..., i] for i in range(6))
    det = (xx * yy * zz + 2 * xy * yz * xz
           - xx * yz ** 2 - yy * xz ** 2 - zz * xy ** 2)
    det = jnp.maximum(det, 1e-24)
    ixx = (yy * zz - yz ** 2) / det
    iyy = (xx * zz - xz ** 2) / det
    izz = (xx * yy - xy ** 2) / det
    ixy = (xz * yz - xy * zz) / det
    ixz = (xy * yz - xz * yy) / det
    iyz = (xy * xz - yz * xx) / det
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    power = -0.5 * (ixx * x * x + iyy * y * y + izz * z * z) \
        - ixy * x * y - ixz * x * z - iyz * y * z
    return jnp.exp(jnp.minimum(power, 0.0))


@functools.partial(jax.jit, static_argnames=("resolution", "patch"))
def _splat_density(xyz, cov6, opacity, resolution: int, patch: int):
    """Scatter-add each gaussian's local patch into a [R, R, R] grid over
    [-1, 1]^3."""
    n = xyz.shape[0]
    r = resolution
    cell = 2.0 / (r - 1)
    center_idx = jnp.round((xyz + 1.0) / cell).astype(jnp.int32)  # [N, 3]
    half = patch // 2
    off = jnp.arange(patch) - half
    ox, oy, oz = jnp.meshgrid(off, off, off, indexing="ij")
    offs = jnp.stack([ox, oy, oz], -1).reshape(-1, 3)  # [P^3, 3]
    vox = center_idx[:, None, :] + offs[None, :, :]  # [N, P^3, 3]
    pts = vox.astype(jnp.float32) * cell - 1.0
    d = pts - xyz[:, None, :]
    w = gaussian_3d_coeff(d, cov6[:, None, :]) * opacity[:, None]
    in_bounds = ((vox >= 0) & (vox < r)).all(-1)
    flat_idx = jnp.where(
        in_bounds,
        (vox[..., 0] * r + vox[..., 1]) * r + vox[..., 2],
        r ** 3,
    )
    grid = jnp.zeros((r ** 3 + 1,), jnp.float32).at[flat_idx.reshape(-1)].add(
        jnp.where(in_bounds, w, 0.0).reshape(-1), mode="drop"
    )
    return grid[: r ** 3].reshape(r, r, r)


def extract_density_grid(gaussians, resolution: int = 128, patch: int = 8,
                         opacity_threshold: float = 0.005):
    """Returns (grid [R,R,R], center [3], scale scalar) — field in the
    normalized frame, denormalize points by pts / scale + center."""
    n = int(gaussians.n_active)
    op = np.asarray(gaussians.get_opacity()[:n, 0])
    keep = op > opacity_threshold
    xyz = np.asarray(gaussians.xyz[:n])[keep]
    scales = np.asarray(gaussians.get_scaling()[:n])[keep]
    rots = np.asarray(gaussians.rotation[:n])[keep]
    op = op[keep]

    mn, mx = xyz.min(0), xyz.max(0)
    center = (mn + mx) / 2
    scale = 1.8 / (mx - mn).max()
    xyz_n = (xyz - center) * scale
    scales_n = scales * scale
    cov = build_covariance(jnp.asarray(scales_n), jnp.asarray(rots))
    cov6 = jnp.stack([cov[:, 0, 0], cov[:, 0, 1], cov[:, 0, 2],
                      cov[:, 1, 1], cov[:, 1, 2], cov[:, 2, 2]], -1)
    grid = _splat_density(jnp.asarray(xyz_n), cov6, jnp.asarray(op),
                          resolution, patch)
    return np.asarray(grid), center, float(scale)


# 6-tetrahedra decomposition of a cube (corner indices 0..7, z fastest)
_TETS = np.array([
    [0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
    [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6],
], np.int32)


def marching_tetrahedra(grid: np.ndarray, iso: float):
    """Host-side marching tetrahedra. Returns (verts [V, 3] in grid index
    coords, faces [F, 3])."""
    r = grid.shape[0]
    # cube corner offsets (x, y, z), matching bit order 0..7
    corners = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                        [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.int32)
    base = np.stack(np.meshgrid(np.arange(r - 1), np.arange(r - 1),
                                np.arange(r - 1), indexing="ij"), -1
                    ).reshape(-1, 3)  # [C, 3]
    corner_pos = base[:, None, :] + corners[None, :, :]  # [C, 8, 3]
    vals = grid[corner_pos[..., 0], corner_pos[..., 1], corner_pos[..., 2]]

    verts = []
    faces = []
    vert_cache = {}

    def edge_vertex(p0, p1, v0, v1):
        key = (tuple(p0), tuple(p1)) if tuple(p0) < tuple(p1) else (
            tuple(p1), tuple(p0))
        if key not in vert_cache:
            t = (iso - v0) / (v1 - v0 + 1e-12)
            t = min(max(t, 0.0), 1.0)
            vert_cache[key] = len(verts)
            verts.append(p0 + t * (p1 - p0))
        return vert_cache[key]

    inside = vals > iso
    # only cubes crossing the isosurface
    cross = inside.any(1) & (~inside.all(1))
    for ci in np.nonzero(cross)[0]:
        cp = corner_pos[ci].astype(np.float64)
        cv = vals[ci]
        for tet in _TETS:
            ti = inside[ci][tet]
            n_in = int(ti.sum())
            if n_in == 0 or n_in == 4:
                continue
            ins = [tet[k] for k in range(4) if ti[k]]
            outs = [tet[k] for k in range(4) if not ti[k]]
            if n_in == 1:
                a = ins[0]
                e = [edge_vertex(cp[a], cp[o], cv[a], cv[o]) for o in outs]
                faces.append(e)
            elif n_in == 3:
                a = outs[0]
                e = [edge_vertex(cp[i_], cp[a], cv[i_], cv[a]) for i_ in ins]
                faces.append(e[::-1])
            else:  # 2 in, 2 out -> quad as two triangles
                a, b_ = ins
                c, d = outs
                e_ac = edge_vertex(cp[a], cp[c], cv[a], cv[c])
                e_ad = edge_vertex(cp[a], cp[d], cv[a], cv[d])
                e_bc = edge_vertex(cp[b_], cp[c], cv[b_], cv[c])
                e_bd = edge_vertex(cp[b_], cp[d], cv[b_], cv[d])
                faces.append([e_ac, e_ad, e_bd])
                faces.append([e_ac, e_bd, e_bc])
    if not verts:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int32)
    return np.stack(verts), np.asarray(faces, np.int32)


def extract_mesh(gaussians, resolution: int = 128, density_thresh: float = 1.0,
                 patch: int = 8):
    """Splats -> (verts [V, 3] world coords, faces) (reference:
    gs_renderer.extract_mesh)."""
    grid, center, scale = extract_density_grid(gaussians, resolution, patch)
    verts, faces = marching_tetrahedra(grid, density_thresh)
    if len(verts):
        cell = 2.0 / (resolution - 1)
        verts = (verts * cell - 1.0) / scale + center
    return verts, faces


def save_obj(path: str, verts, faces):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        for v in np.asarray(verts):
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for tri in np.asarray(faces):
            f.write(f"f {tri[0] + 1} {tri[1] + 1} {tri[2] + 1}\n")
    return path

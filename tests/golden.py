"""Hand-written numpy golden implementations (slow, loopy, obviously correct)
used to validate the JAX/Pallas renderer. Semantics follow the CUDA tile
renderer consumed by the reference (diff-gaussian-rasterization forward loop):
front-to-back in depth order, alpha cap 0.99, skip below 1/255, break when
transmittance would drop below 1e-4."""

import numpy as np


def composite_golden(mean2d, conic, color, opacity, depth, valid, height, width):
    n = mean2d.shape[0]
    order = np.argsort(np.where(valid, depth, np.inf), kind="stable")
    rgb = np.zeros((height, width, 3), np.float64)
    zimg = np.zeros((height, width), np.float64)
    aimg = np.zeros((height, width), np.float64)
    for yy in range(height):
        for xx in range(width):
            T = 1.0
            for i in order:
                if not valid[i]:
                    continue
                dx = mean2d[i, 0] - xx
                dy = mean2d[i, 1] - yy
                power = (
                    -0.5 * (conic[i, 0] * dx * dx + conic[i, 2] * dy * dy)
                    - conic[i, 1] * dx * dy
                )
                alpha = min(0.99, opacity[i] * np.exp(power))
                if alpha < 1.0 / 255.0:
                    continue
                next_T = T * (1 - alpha)
                if next_T < 1e-4:
                    break
                w = alpha * T
                rgb[yy, xx] += w * color[i]
                zimg[yy, xx] += w * depth[i]
                aimg[yy, xx] += w
                T = next_T
    return rgb, zimg, aimg


def random_scene(rng, n, height, width, z_range=(0.5, 4.0), r_px=(1.0, 6.0)):
    """Random 2D-projected gaussian soup exercising compositor edge cases."""
    mean2d = np.stack(
        [
            rng.uniform(-5, width + 5, n),
            rng.uniform(-5, height + 5, n),
        ],
        1,
    ).astype(np.float32)
    # random SPD 2x2 covariances from scales + rotation
    s = rng.uniform(r_px[0], r_px[1], (n, 2)).astype(np.float32) ** 2
    theta = rng.uniform(0, np.pi, n).astype(np.float32)
    c, si = np.cos(theta), np.sin(theta)
    R = np.stack([np.stack([c, -si], -1), np.stack([si, c], -1)], -2)
    cov = R @ (s[..., None] * np.eye(2)[None]) @ np.swapaxes(R, -1, -2)
    det = cov[:, 0, 0] * cov[:, 1, 1] - cov[:, 0, 1] ** 2
    conic = np.stack(
        [cov[:, 1, 1] / det, -cov[:, 0, 1] / det, cov[:, 0, 0] / det], 1
    ).astype(np.float32)
    color = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opacity = rng.uniform(0.02, 1.0, n).astype(np.float32)
    depth = rng.uniform(*z_range, n).astype(np.float32)
    valid = rng.uniform(0, 1, n) > 0.1
    radius = np.ceil(3.0 * np.sqrt(np.maximum(s.max(1), 0.3))).astype(np.int32)
    radius = np.where(valid, radius, 0)
    return dict(
        mean2d=mean2d, conic=conic, color=color, opacity=opacity,
        depth=depth, valid=valid, radius=radius,
    )

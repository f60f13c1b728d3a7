"""Forward-only render of a saved avatar .ply (BASELINE config 1: SH eval +
rasterize, single camera — CPU-runnable with the oracle backend).

  python scripts/render_ply.py --ply logs/<id>/save/last.ply \
      --azimuth 30 --elevation 5 --radius 1.8 --size 512 --out render.png
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ply", required=True)
    p.add_argument("--azimuth", type=float, default=0.0)
    p.add_argument("--elevation", type=float, default=5.0)
    p.add_argument("--radius", type=float, default=1.8)
    p.add_argument("--fovy", type=float, default=70.0)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--out", default="render.png")
    p.add_argument("--cpu", action="store_true", help="force the CPU oracle")
    p.add_argument("--bg", type=float, nargs=3, default=[0.0, 0.0, 0.0])
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from gaussianip_tpu.data.cameras import camera_from_c2w
    from gaussianip_tpu.model.ply import state_from_ply
    from gaussianip_tpu.ops.camera_math import (
        deg2rad,
        look_at_c2w,
        spherical_to_position,
    )
    from gaussianip_tpu.render.render import RenderConfig, render
    from gaussianip_tpu.utils.saving import save_image

    gs = state_from_ply(args.ply)
    print(f"loaded {int(gs.n_active)} gaussians (sh degree "
          f"{gs.max_sh_degree}) from {args.ply}")
    eye = spherical_to_position(
        deg2rad(jnp.asarray([args.elevation])),
        deg2rad(jnp.asarray([args.azimuth])),
        jnp.asarray([args.radius]),
    )
    c2w = look_at_c2w(eye, jnp.zeros((1, 3)), jnp.array([[0.0, 0, 1]]))
    cams = jax.vmap(
        lambda m: camera_from_c2w(m, jnp.float32(np.deg2rad(args.fovy)),
                                  args.size, args.size))(c2w)
    out = render(gs, cams, jnp.asarray(args.bg), RenderConfig())
    save_image(args.out, np.asarray(out.rgb[0]))
    print(f"wrote {args.out} (alpha coverage "
          f"{float(out.alpha.mean()):.3f})")


if __name__ == "__main__":
    main()

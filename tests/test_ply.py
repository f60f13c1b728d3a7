import numpy as np
import jax.numpy as jnp

from gaussianip_tpu.model.gaussians import create_from_pcd
from gaussianip_tpu.model import ply


def _rand_state(rng, n=37, cap=64, deg=0):
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    st = create_from_pcd(pts, cols, cap, rng.uniform(0.01, 0.1, n), max_sh_degree=deg)
    return st


def test_ply_roundtrip(tmp_path, rng):
    st = _rand_state(rng)
    p = str(tmp_path / "a.ply")
    ply.state_to_ply(st, p)
    st2 = ply.state_from_ply(p)
    n = int(st.n_active)
    assert int(st2.n_active) == n
    for f in ("xyz", "f_dc", "f_rest", "scaling", "rotation", "opacity"):
        np.testing.assert_array_equal(
            np.asarray(getattr(st, f)[:n]), np.asarray(getattr(st2, f)[:n]),
            err_msg=f,
        )


def test_ply_header_layout(tmp_path, rng):
    st = _rand_state(rng, n=5, cap=8)
    p = str(tmp_path / "h.ply")
    ply.state_to_ply(st, p)
    raw = open(p, "rb").read()
    head = raw[: raw.index(b"end_header")].decode()
    assert "element vertex 5" in head
    # exact property order of the reference layout
    order = [l.split()[-1] for l in head.splitlines() if l.startswith("property")]
    assert order == [
        "x", "y", "z", "nx", "ny", "nz", "f_dc_0", "f_dc_1", "f_dc_2",
        "opacity", "scale_0", "scale_1", "scale_2",
        "rot_0", "rot_1", "rot_2", "rot_3",
    ]
    # binary payload is exactly N * 17 float32
    body = raw[raw.index(b"end_header\n") + len(b"end_header\n"):]
    assert len(body) == 5 * 17 * 4


def test_ply_roundtrip_sh3(tmp_path, rng):
    st = _rand_state(rng, n=9, cap=16, deg=3)
    st = st.replace(
        f_rest=st.f_rest.at[:9].set(
            jnp.asarray(rng.normal(size=(9, 15, 3)).astype(np.float32)))
    )
    p = str(tmp_path / "s3.ply")
    ply.state_to_ply(st, p)
    st2 = ply.state_from_ply(p)
    assert st2.max_sh_degree == 3
    np.testing.assert_array_equal(np.asarray(st.f_rest[:9]),
                                  np.asarray(st2.f_rest[:9]))

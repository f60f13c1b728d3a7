import urllib.request

import numpy as np

from gaussianip_tpu.human.subdivide import subdivide, subdivide_n
from gaussianip_tpu.model.gaussians import create_from_pcd
from gaussianip_tpu.utils.viewer import ViewerState, start_viewer


def test_subdivide_counts_and_midpoints():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], float)
    faces = np.array([[0, 1, 2], [1, 3, 2]])
    nv, nf = subdivide(verts, faces)
    assert len(nf) == 8
    # shared edge (1,2) midpoint created once: 4 + 9 edges... unique edges = 9
    assert len(nv) == 4 + 5  # 5 unique edges
    # attrs interpolate
    attrs = np.arange(4, dtype=float)[:, None]
    nv2, nf2, na = subdivide(verts, faces, attrs)
    assert len(na) == len(nv2)
    # midpoint of edge (0,1) has attr 0.5
    mid_01 = 0.5 * (verts[0] + verts[1])
    i = np.argmin(np.linalg.norm(nv2 - mid_01, axis=1))
    assert abs(na[i, 0] - 0.5) < 1e-9
    nv3, nf3 = subdivide_n(verts, faces, n=2)
    assert len(nf3) == 32


def test_viewer_serves_render(rng):
    state = ViewerState()
    pts = (rng.normal(size=(100, 3)) * 0.3).astype(np.float32)
    gs = create_from_pcd(pts, np.full((100, 3), 0.7, np.float32), 128,
                         rng.uniform(0.005, 0.02, 100))
    state.update(gs)
    server = start_viewer(state, port=0)  # ephemeral port
    try:
        port = server.server_address[1]
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30).read()
        assert b"gaussianip-tpu viewer" in page
        png = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/render?size=32&radius=2.0",
            timeout=120).read()
        assert png[:4] == b"\x89PNG"
    finally:
        server.shutdown()

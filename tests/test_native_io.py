"""Native async artifact writer: PLY bit-compat with the Python codec, valid
PNG output, queue draining."""

import numpy as np
import pytest

from gaussianip_tpu.model import ply as ply_io
from gaussianip_tpu.utils import native_io


pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native writer did not build"
)


def test_native_ply_matches_python(tmp_path, rng):
    n = 23
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    f_dc = rng.normal(size=(n, 1, 3)).astype(np.float32)
    f_rest = np.zeros((n, 0, 3), np.float32)
    op = rng.normal(size=(n, 1)).astype(np.float32)
    sc = rng.normal(size=(n, 3)).astype(np.float32)
    rot = rng.normal(size=(n, 4)).astype(np.float32)

    p_py = str(tmp_path / "py.ply")
    ply_io.save_ply(p_py, xyz, f_dc, f_rest, op, sc, rot)

    rows = np.concatenate(
        [xyz, np.zeros_like(xyz), f_dc.transpose(0, 2, 1).reshape(n, -1),
         op, sc, rot], axis=1)
    p_nat = str(tmp_path / "nat.ply")
    assert native_io.write_ply_async(p_nat, rows)
    native_io.flush()

    assert open(p_py, "rb").read() == open(p_nat, "rb").read()
    # loads back identically through the Python reader
    d = ply_io.load_ply(p_nat)
    np.testing.assert_array_equal(d["xyz"], xyz)


def test_native_png_roundtrip(tmp_path, rng):
    from PIL import Image

    img = rng.integers(0, 255, (33, 47, 3)).astype(np.uint8)
    p = str(tmp_path / "a.png")
    assert native_io.write_png_async(p, img)
    native_io.flush()
    back = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(back, img)


def test_queue_drains(tmp_path, rng):
    img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    for i in range(20):
        native_io.write_png_async(str(tmp_path / f"{i}.png"), img)
    native_io.flush()
    assert native_io.pending() == 0
    import os

    assert len(os.listdir(tmp_path)) == 20

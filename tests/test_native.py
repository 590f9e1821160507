"""Native C++ COLMAP parser vs the pure-Python readers."""
import os

import numpy as np
import pytest

from gs_tpu import native
from gs_tpu.data import colmap
from test_data import make_colmap_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    rng = np.random.default_rng(11)
    root = str(tmp_path_factory.mktemp("ds"))
    make_colmap_dataset(root, rng, n_images=12)
    return os.path.join(root, "sparse", "0")


def test_native_builds():
    assert native.available(), "native library failed to build"


def test_points3d_matches_python(dataset):
    path = os.path.join(dataset, "points3D.bin")
    nx, nr, ne = native.read_points3d_bin(path)

    # force the pure-Python path for comparison
    import gs_tpu.native as nat
    orig = nat.available
    nat.available = lambda: False
    try:
        px, pr, pe = colmap.read_points3D_binary(path)
    finally:
        nat.available = orig
    np.testing.assert_allclose(nx, px)
    np.testing.assert_array_equal(nr, pr)
    np.testing.assert_allclose(ne, pe)


def test_images_cameras_match_python(dataset):
    import gs_tpu.native as nat
    ipath = os.path.join(dataset, "images.bin")
    cpath = os.path.join(dataset, "cameras.bin")
    n_images = colmap.read_extrinsics_binary(ipath)     # native path
    n_cams = colmap.read_intrinsics_binary(cpath)
    orig = nat.available
    nat.available = lambda: False
    try:
        p_images = colmap.read_extrinsics_binary(ipath)
        p_cams = colmap.read_intrinsics_binary(cpath)
    finally:
        nat.available = orig
    assert set(n_images) == set(p_images)
    for k in p_images:
        a, b = n_images[k], p_images[k]
        np.testing.assert_allclose(a.qvec, b.qvec)
        np.testing.assert_allclose(a.tvec, b.tvec)
        assert a.name == b.name and a.camera_id == b.camera_id
    assert set(n_cams) == set(p_cams)
    for k in p_cams:
        a, b = n_cams[k], p_cams[k]
        assert (a.model, a.width, a.height) == (b.model, b.width, b.height)
        np.testing.assert_allclose(a.params, b.params)

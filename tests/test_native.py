"""Native host-ops library vs cv2/numpy oracles."""
import numpy as np
import pytest

from cocosnet_tpu.data import native as N


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not N.available():
        import subprocess, os
        root = os.path.join(os.path.dirname(__file__), "..", "native")
        subprocess.run(["make", "-C", root], check=False)
        N._TRIED = False
    if not N.available():
        pytest.skip("native library not built and no toolchain")


def test_distance_transform_matches_cv2():
    import cv2
    rs = np.random.RandomState(0)
    edge = (rs.rand(64, 48) > 0.97).astype(np.uint8)
    want = cv2.distanceTransform(255 - edge * 255, cv2.DIST_L1, 3)
    want = np.clip(want / 3, 0, 255).astype(np.uint8)
    got = N.distance_transform_map(edge)
    np.testing.assert_array_equal(got, want)


def test_distance_transform_empty_edge():
    edge = np.zeros((16, 16), np.uint8)
    got = N.distance_transform_map(edge)
    assert got.max() == 255  # saturates at the clip


def test_mask_edges_matches_numpy():
    from cocosnet_tpu.data.edges import mask_edges as oracle
    rs = np.random.RandomState(1)
    labels = (rs.randint(0, 3, (32, 32)) * 100).astype(np.uint8)
    base = np.zeros((32, 32), np.uint8)
    want = oracle(base.copy(), labels)
    got = N.mask_edges(base.copy(), labels)
    np.testing.assert_array_equal(got, want)


def test_normalize():
    rs = np.random.RandomState(2)
    img = rs.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    got = N.normalize_to_f32(img)
    want = img.astype(np.float32) / 255.0 * 2 - 1
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_resize_nearest_matches_ops_image():
    rs = np.random.RandomState(3)
    src = rs.randint(0, 256, (37, 53)).astype(np.uint8)
    got = N.resize_nearest(src, 64, 64)
    ys = np.minimum(np.arange(64) * 37 // 64, 36)
    xs = np.minimum(np.arange(64) * 53 // 64, 52)
    want = src[ys][:, xs]
    np.testing.assert_array_equal(got, want)


def test_canny_matches_python_reference():
    """C++ canny_u8 vs the scipy implementation (data/edges.py): identical
    double-precision op order, so the maps should agree everywhere except
    exact threshold ties (none observed on these fixtures)."""
    if not hasattr(N._load(), "canny_u8"):
        pytest.skip("libcocosnet_host.so predates canny_u8; make -C native")
    from scipy import ndimage as ndi

    from cocosnet_tpu.data.edges import canny as oracle
    for seed in range(3):
        rs = np.random.RandomState(seed)
        img = ndi.gaussian_filter(rs.rand(96, 128) * 255, 3)
        img[24:72, 32:96] += 60
        img = np.clip(img, 0, 255).astype(np.uint8)
        got = N.canny(img)
        want = oracle(img)
        assert got.dtype == np.bool_ and got.shape == want.shape
        mismatch = float((got != want).mean())
        assert mismatch < 2e-3, mismatch
        assert want.mean() > 0.001  # fixture actually has edges


def test_canny_flat_image_no_edges():
    if not hasattr(N._load(), "canny_u8"):
        pytest.skip("libcocosnet_host.so predates canny_u8")
    flat = np.full((32, 32), 7, np.uint8)
    assert not N.canny(flat).any()

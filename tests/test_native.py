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

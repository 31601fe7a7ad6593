"""Native C++ extension vs the Python fallbacks."""

import numpy as np
import pytest

from brush_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def brute_force_knn(pts, k=3):
    d2 = np.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
    part = np.sort(d2, axis=1)[:, :k]
    return np.sqrt(np.sum(part, axis=1)) / k


def test_knn_matches_brute_force():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    got = native.knn_distances(pts, 3)
    want = brute_force_knn(pts, 3)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_knn_degenerate_duplicates():
    pts = np.zeros((10, 3), np.float32)
    got = native.knn_distances(pts, 3)
    np.testing.assert_allclose(got, 0.0)


def test_knn_large_is_fast():
    import time

    rng = np.random.default_rng(1)
    pts = rng.normal(size=(200_000, 3)).astype(np.float32)
    t0 = time.time()
    out = native.knn_distances(pts, 3)
    dt = time.time() - t0
    assert np.isfinite(out).all()
    assert dt < 10.0, f"kd-tree too slow: {dt:.1f}s for 200k points"


def test_colmap_points3d_native_matches_python():
    import struct

    from brush_tpu.datasets.colmap import _read_points3d_bin

    rng = np.random.default_rng(2)
    n = 100
    data = struct.pack("<Q", n)
    for i in range(n):
        data += struct.pack("<q", i)
        data += struct.pack("<3d", *rng.normal(size=3))
        data += struct.pack("<3B", i % 256, (2 * i) % 256, 30)
        data += struct.pack("<d", 0.5)
        track = i % 4
        data += struct.pack("<Q", track)
        data += b"\x00" * (8 * track)

    pos_n, rgb_n = native.read_points3d_bin(data)
    pos_p, rgb_p = _read_points3d_bin(data)
    np.testing.assert_allclose(pos_n, pos_p, rtol=1e-6)
    np.testing.assert_allclose(rgb_n, rgb_p, rtol=1e-6)


def test_colmap_truncated_raises():
    import struct

    data = struct.pack("<Q", 5) + b"\x00" * 10
    with pytest.raises(ValueError):
        native.read_points3d_bin(data)


def test_splats_init_uses_native_path():
    from brush_tpu.splats import knn_mean_distance

    rng = np.random.default_rng(3)
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    got = knn_mean_distance(pts, 3)
    want = brute_force_knn(pts, 3)
    np.testing.assert_allclose(got, want, rtol=1e-5)

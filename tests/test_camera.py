import numpy as np

from brush_tpu.camera import (
    Camera,
    focal_to_fov,
    fov_to_focal,
    quat_to_rotmat,
    rotmat_to_quat,
)


def test_fov_focal_roundtrip():
    for fov in [0.3, 0.8, 1.5]:
        for pixels in [100, 640, 1024]:
            focal = fov_to_focal(fov, pixels)
            assert np.isclose(focal_to_fov(focal, pixels), fov)


def test_quat_rotmat_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        r = quat_to_rotmat(q)
        assert np.allclose(r @ r.T, np.eye(3), atol=1e-12)
        assert np.isclose(np.linalg.det(r), 1.0)
        q2 = rotmat_to_quat(r)
        assert np.allclose(q, q2, atol=1e-10) or np.allclose(q, -q2, atol=1e-10)


def test_world_to_local_is_inverse():
    rng = np.random.default_rng(1)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    cam = Camera(position=[1.0, -2.0, 3.0], rotation=q, fov_x=0.8, fov_y=0.7)
    m = cam.local_to_world() @ cam.world_to_local()
    assert np.allclose(m, np.eye(4), atol=1e-12)


def test_camera_transform_semantics():
    # Camera at -8z with identity rotation sees the origin at view-space +8z.
    cam = Camera(position=[0, 0, -8.0], rotation=[1, 0, 0, 0], fov_x=0.8, fov_y=0.8)
    p_view = cam.world_to_local()[:3, :3] @ np.zeros(3) + cam.world_to_local()[:3, 3]
    assert np.allclose(p_view, [0, 0, 8.0])


def test_focal_and_center():
    cam = Camera(
        position=[0, 0, 0], rotation=[1, 0, 0, 0],
        fov_x=np.pi / 2, fov_y=np.pi / 2, center_uv=[0.5, 0.5],
    )
    focal = cam.focal((640, 480))
    # fov 90deg: focal = w/2.
    assert np.allclose(focal, [320.0, 240.0])
    assert np.allclose(cam.center((640, 480)), [320.0, 240.0])

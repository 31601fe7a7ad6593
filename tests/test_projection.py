import jax.numpy as jnp
import numpy as np

from brush_tpu.camera import Camera
from brush_tpu.constants import COV_BLUR, TILE_WIDTH
from brush_tpu.ops.projection import project_splats, quat_to_rotmat
from brush_tpu.ops.rasterize_reference import camera_params


def make_cam(img_size=(64, 64), dist=8.0, fov=np.pi / 2):
    cam = Camera(
        position=[0.0, 0.0, -dist], rotation=[1, 0, 0, 0], fov_x=fov, fov_y=fov
    )
    return cam, camera_params(cam, img_size)


def project_one(means, log_scales=None, quats=None, img_size=(64, 64)):
    n = means.shape[0]
    if log_scales is None:
        log_scales = np.log(0.5) * np.ones((n, 3))
    if quats is None:
        quats = np.tile([1.0, 0, 0, 0], (n, 1))
    _, cp = make_cam(img_size)
    return project_splats(
        jnp.asarray(means, jnp.float32),
        jnp.asarray(log_scales, jnp.float32),
        jnp.asarray(quats, jnp.float32),
        cp.viewmat, cp.focal, cp.pixel_center, img_size,
    )


def test_center_splat_projects_to_center():
    proj = project_one(np.zeros((1, 3)))
    assert bool(proj.visible[0])
    np.testing.assert_allclose(np.asarray(proj.xy[0]), [32.0, 32.0], atol=1e-4)
    np.testing.assert_allclose(float(proj.depth[0]), 8.0, rtol=1e-6)


def test_isotropic_cov2d_matches_closed_form():
    # Isotropic scale s at distance d on the optical axis: J = diag(f/d),
    # W = I, so cov2d = (f*s/d)^2 I + COV_BLUR I, conic = 1/diag.
    s, d, img = 0.5, 8.0, (64, 64)
    proj = project_one(np.zeros((1, 3)), np.log(s) * np.ones((1, 3)), img_size=img)
    f = 0.5 * img[0] / np.tan(np.pi / 4)  # fov 90deg -> focal = w/2 = 32
    expected_var = (f * s / d) ** 2 + COV_BLUR
    conic = np.asarray(proj.conic[0])
    np.testing.assert_allclose(conic[0], 1.0 / expected_var, rtol=1e-5)
    np.testing.assert_allclose(conic[2], 1.0 / expected_var, rtol=1e-5)
    np.testing.assert_allclose(conic[1], 0.0, atol=1e-7)
    # 3-sigma pixel radius.
    assert int(proj.radius[0]) == int(np.ceil(3.0 * np.sqrt(expected_var)))


def test_near_plane_culling():
    # Camera at -8z: a splat behind the camera (z < -8) has view z < 0.
    means = np.array([[0, 0, -20.0], [0, 0, 0.0], [0, 0, -8.005]])
    proj = project_one(means)
    vis = np.asarray(proj.visible)
    assert not vis[0]          # behind camera
    assert vis[1]              # in front
    assert not vis[2]          # inside near plane (view z = 0.005 <= 0.01)


def test_offscreen_culling_via_empty_bbox():
    # Far off to the side: projected far outside the image, bbox clamps empty.
    means = np.array([[1000.0, 0, 0]])
    proj = project_one(means)
    assert not bool(proj.visible[0])


def test_tile_bbox_contains_splat():
    proj = project_one(np.zeros((1, 3)))
    xy = np.asarray(proj.xy[0])
    tmin = np.asarray(proj.tile_min[0])
    tmax = np.asarray(proj.tile_max[0])
    tile_of_center = np.floor(xy / TILE_WIDTH)
    assert np.all(tmin <= tile_of_center) and np.all(tile_of_center < tmax)


def test_quat_rotation_affects_cov():
    # An anisotropic splat rotated 90deg about view axis swaps conic x/z.
    scales = np.log(np.array([[1.0, 0.1, 0.1]]))
    q_id = np.array([[1.0, 0, 0, 0]])
    c = np.cos(np.pi / 4)
    q_z90 = np.array([[c, 0, 0, np.sin(np.pi / 4)]])  # 90deg about z
    p1 = project_one(np.zeros((1, 3)), scales, q_id)
    p2 = project_one(np.zeros((1, 3)), scales, q_z90)
    c1 = np.asarray(p1.conic[0])
    c2 = np.asarray(p2.conic[0])
    np.testing.assert_allclose(c1[0], c2[2], rtol=1e-4)
    np.testing.assert_allclose(c1[2], c2[0], rtol=1e-4)


def test_quat_to_rotmat_batch_matches_host():
    from brush_tpu.camera import quat_to_rotmat as host_rotmat

    rng = np.random.default_rng(7)
    quats = rng.normal(size=(8, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    got = np.asarray(quat_to_rotmat(jnp.asarray(quats, jnp.float32)))
    for i in range(8):
        np.testing.assert_allclose(got[i], host_rotmat(quats[i]), atol=1e-6)

"""Tiled pipeline vs the dense oracle, forward and backward.

Forward parity caveat: the tiled path culls (splat, tile) pairs via the
3-sigma bbox + exact ellipse test; the oracle composites every visible splat
at every pixel. For opacities <= ~0.35 the 3-sigma bound is exact (alpha at
3 sigma < 1/255), so comparisons there are tight; high-opacity scenes get a
looser tolerance (same relationship the reference has to its fixtures).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brush_tpu.camera import Camera
from brush_tpu.constants import SH_C0
from brush_tpu.ops.rasterize_reference import camera_params, render_oracle
from brush_tpu.render import render_splats


def inverse_sigmoid(x):
    return float(np.log(x / (1.0 - x)))


def random_scene(n, rng, opac_range=(0.1, 0.3), scale_range=(0.1, 0.8), sh_degree=0):
    k = (sh_degree + 1) ** 2
    colors = rng.uniform(0, 1, size=(n, 3))
    sh = np.zeros((n, k, 3), np.float32)
    sh[:, 0, :] = (colors - 0.5) / SH_C0
    if k > 1:
        sh[:, 1:, :] = rng.normal(0, 0.2, size=(n, k - 1, 3))
    quats = rng.normal(size=(n, 4))
    return dict(
        means=jnp.asarray(rng.uniform(-2.5, 2.5, size=(n, 3)), jnp.float32),
        log_scales=jnp.asarray(
            np.log(rng.uniform(*scale_range, size=(n, 3))), jnp.float32
        ),
        quats=jnp.asarray(quats, jnp.float32),
        sh_coeffs=jnp.asarray(sh, jnp.float32),
        raw_opacity=jnp.asarray(
            [inverse_sigmoid(o) for o in rng.uniform(*opac_range, n)], jnp.float32
        ),
    )


def default_cam(img_size, dist=8.0):
    cam = Camera(
        position=[0, 0, -dist], rotation=[1, 0, 0, 0],
        fov_x=np.pi / 2, fov_y=np.pi / 2,
    )
    return camera_params(cam, img_size)


@pytest.mark.parametrize("img_size", [(32, 32), (48, 32), (40, 56)])
def test_tiled_matches_oracle_low_opacity(img_size):
    rng = np.random.default_rng(0)
    params = random_scene(80, rng)
    cp = default_cam(img_size)
    img_t, aux = render_splats(**params, cam=cp, img_size=img_size)
    img_o = render_oracle(**params, cam=cp, img_size=img_size)
    assert img_t.shape == (img_size[1], img_size[0], 4)
    assert int(aux.num_visible) > 0
    assert int(aux.num_isects) > 0
    np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_o), atol=2e-5)


def test_tiled_matches_oracle_high_opacity():
    rng = np.random.default_rng(1)
    params = random_scene(60, rng, opac_range=(0.5, 0.98))
    cp = default_cam((32, 32))
    img_t, _ = render_splats(**params, cam=cp, img_size=(32, 32))
    img_o = render_oracle(**params, cam=cp, img_size=(32, 32))
    # Differences only from 3-sigma bbox culling of barely-contributing
    # (alpha ~ 1/255) splat/pixel pairs.
    np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_o), atol=8e-3)
    assert (
        np.abs(np.asarray(img_t) - np.asarray(img_o)) > 1e-5
    ).mean() < 0.05


def test_tiled_matches_oracle_sh_degree_2():
    rng = np.random.default_rng(2)
    params = random_scene(50, rng, sh_degree=2)
    cp = default_cam((32, 32))
    img_t, _ = render_splats(**params, cam=cp, img_size=(32, 32))
    img_o = render_oracle(**params, cam=cp, img_size=(32, 32))
    np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_o), atol=2e-5)


def test_tiled_with_padding_and_active_mask():
    rng = np.random.default_rng(3)
    params = random_scene(40, rng)
    # Pad with garbage rows masked out by `active`.
    pad = 24
    padded = {
        k: jnp.concatenate([v, jnp.ones((pad,) + v.shape[1:], v.dtype) * 37.0])
        for k, v in params.items()
    }
    active = jnp.arange(64) < 40
    cp = default_cam((32, 32))
    img_p, aux = render_splats(**padded, cam=cp, img_size=(32, 32), active=active)
    img_t, _ = render_splats(**params, cam=cp, img_size=(32, 32))
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_t), atol=1e-6)
    assert int(aux.num_visible) <= 40


def test_tiled_gradients_match_oracle():
    rng = np.random.default_rng(4)
    params = random_scene(30, rng)
    cp = default_cam((32, 32))
    target = jnp.asarray(rng.uniform(0, 1, size=(32, 32, 4)), jnp.float32)

    def loss_tiled(p):
        img, _ = render_splats(**p, cam=cp, img_size=(32, 32))
        return jnp.mean((img - target) ** 2)

    def loss_oracle(p):
        img = render_oracle(**p, cam=cp, img_size=(32, 32))
        return jnp.mean((img - target) ** 2)

    g_t = jax.grad(loss_tiled)(params)
    g_o = jax.grad(loss_oracle)(params)
    for key in params:
        gt = np.asarray(g_t[key])
        go = np.asarray(g_o[key])
        scale = np.abs(go).max() + 1e-8
        np.testing.assert_allclose(
            gt / scale, go / scale, atol=2e-4, err_msg=f"grad mismatch: {key}"
        )


def test_xy_dummy_gradient():
    # The densification-statistics path: grads w.r.t. the zero xy_dummy input
    # are the screen-space gradients at global splat indices.
    rng = np.random.default_rng(5)
    n = 20
    params = random_scene(n, rng)
    cp = default_cam((32, 32))
    target = jnp.zeros((32, 32, 4))

    def loss(xy_dummy):
        img, _ = render_splats(
            **params, cam=cp, img_size=(32, 32), xy_dummy=xy_dummy
        )
        return jnp.mean((img - target) ** 2)

    g = jax.grad(loss)(jnp.zeros((n, 2)))
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0

    # Against finite differences of the oracle on projected-xy shifts is
    # awkward; instead check equivalence: shifting xy_dummy by eps changes
    # the image like shifting the projection.
    eps = 1e-2
    dvec = jnp.zeros((n, 2)).at[0, 0].set(eps)
    l0 = float(loss(jnp.zeros((n, 2))))
    l1 = float(loss(dvec))
    fd = (l1 - l0) / eps
    assert abs(fd - g[0, 0]) < 2e-3 + 0.1 * abs(fd)


def test_block_size_invariance():
    rng = np.random.default_rng(6)
    params = random_scene(64, rng)
    cp = default_cam((32, 32))
    img_a, _ = render_splats(**params, cam=cp, img_size=(32, 32), block_size=8)
    img_b, _ = render_splats(**params, cam=cp, img_size=(32, 32), block_size=64)
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b), atol=1e-5)

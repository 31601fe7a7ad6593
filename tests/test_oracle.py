import jax
import jax.numpy as jnp
import numpy as np

from brush_tpu.camera import Camera
from brush_tpu.constants import COV_BLUR, SH_C0
from brush_tpu.ops.rasterize_reference import camera_params, render_oracle


def inverse_sigmoid(x):
    return float(np.log(x / (1.0 - x)))


def make_scene(means, colors, opacities, scales, img_size=(32, 32), dist=8.0):
    """DC-only SH scene with an axis-aligned camera at -dist z."""
    n = len(means)
    cam = Camera(
        position=[0, 0, -dist], rotation=[1, 0, 0, 0],
        fov_x=np.pi / 2, fov_y=np.pi / 2,
    )
    params = dict(
        means=jnp.asarray(means, jnp.float32),
        log_scales=jnp.log(jnp.asarray(scales, jnp.float32)),
        quats=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (n, 1)),
        sh_coeffs=(jnp.asarray(colors, jnp.float32)[:, None, :] - 0.5) / SH_C0,
        raw_opacity=jnp.asarray(
            [inverse_sigmoid(o) for o in opacities], jnp.float32
        ),
    )
    return params, camera_params(cam, img_size), img_size


def test_renders_at_all_empty():
    # Mirror of the reference smoke test (render.rs:652-693): splats at the
    # camera origin are culled by the near plane -> empty image.
    cam = Camera(position=[0, 0, 0], rotation=[1, 0, 0, 0], fov_x=0.5, fov_y=0.5)
    n = 8
    img = render_oracle(
        jnp.zeros((n, 3)), jnp.ones((n, 3)) * 2.0,
        jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (n, 1)),
        jnp.ones((n, 1, 3)), jnp.zeros((n,)),
        camera_params(cam, (32, 32)), (32, 32),
    )
    img = np.asarray(img)
    assert img.shape == (32, 32, 4)
    np.testing.assert_allclose(img, 0.0, atol=1e-5)


def test_single_gaussian_analytic():
    # One isotropic splat on-axis: alpha(pixel) = opac * exp(-0.5 r^2 / var)
    # with var = (f s / d)^2 + COV_BLUR, centered at the image center.
    opac, s, d = 0.8, 0.5, 8.0
    img_size = (32, 32)
    params, cp, _ = make_scene(
        [[0, 0, 0]], [[1.0, 0.2, 0.1]], [opac], [[s, s, s]], img_size, d
    )
    img = np.asarray(render_oracle(**params, cam=cp, img_size=img_size))

    f = 0.5 * img_size[0] / np.tan(np.pi / 4)
    var = (f * s / d) ** 2 + COV_BLUR
    ys, xs = np.mgrid[0:32, 0:32]
    r2 = (xs + 0.5 - 16.0) ** 2 + (ys + 0.5 - 16.0) ** 2
    alpha = opac * np.exp(-0.5 * r2 / var)
    alpha = np.where(alpha >= 1.0 / 255.0, np.minimum(alpha, 0.999), 0.0)

    np.testing.assert_allclose(img[..., 3], alpha, atol=1e-4)
    np.testing.assert_allclose(img[..., 0], alpha * 1.0, atol=1e-4)
    np.testing.assert_allclose(img[..., 1], alpha * 0.2, atol=1e-4)


def test_front_to_back_order():
    # A nearer opaque red splat must occlude a farther green one, regardless
    # of input order.
    big = 50.0  # huge scale -> flat alpha over the image
    for order in [(0, 1), (1, 0)]:
        means = [[0, 0, -2.0], [0, 0, 2.0]]  # nearer, farther (cam at -8z)
        colors = [[1, 0, 0], [0, 1, 0]]
        means = [means[i] for i in order]
        colors = [colors[i] for i in order]
        params, cp, img_size = make_scene(
            means, colors, [0.9, 0.9], [[big] * 3] * 2, (16, 16)
        )
        img = np.asarray(render_oracle(**params, cam=cp, img_size=(16, 16)))
        center = img[8, 8]
        # Front splat alpha ~0.9 red; back contributes 0.1 * 0.9 green.
        assert center[0] > 0.85
        assert 0.05 < center[1] < 0.15


def test_transmittance_early_out():
    # Stack many near-opaque splats: output alpha saturates at 1 - T_eps-ish
    # and stays finite / sane.
    n = 40
    means = [[0, 0, 0.01 * i] for i in range(n)]
    params, cp, img_size = make_scene(
        means, [[1, 1, 1]] * n, [0.95] * n, [[50.0] * 3] * n, (8, 8)
    )
    img = np.asarray(render_oracle(**params, cam=cp, img_size=(8, 8)))
    assert np.all(img[..., 3] <= 1.0)
    assert np.all(img[..., 3] > 0.999)
    assert np.all(np.isfinite(img))


def test_batch_boundary_invariance():
    # Compositing must not depend on the scan block size.
    rng = np.random.default_rng(5)
    n = 70
    means = rng.uniform(-2, 2, size=(n, 3))
    colors = rng.uniform(0, 1, size=(n, 3))
    params, cp, img_size = make_scene(
        means, colors, rng.uniform(0.3, 0.9, n), np.full((n, 3), 0.4), (24, 24)
    )
    img_a = np.asarray(
        render_oracle(**params, cam=cp, img_size=(24, 24), block_size=16)
    )
    img_b = np.asarray(
        render_oracle(**params, cam=cp, img_size=(24, 24), block_size=64)
    )
    np.testing.assert_allclose(img_a, img_b, atol=1e-5)


def test_gradients_finite_difference():
    # The load-bearing numerics test: autodiff grads of the oracle against
    # central finite differences (what render.rs:835-932 never finished).
    rng = np.random.default_rng(11)
    n = 6
    means = rng.uniform(-1.5, 1.5, size=(n, 3))
    colors = rng.uniform(0.2, 0.8, size=(n, 3))
    params, cp, _ = make_scene(
        means, colors, rng.uniform(0.4, 0.8, n), np.full((n, 3), 0.7), (16, 16)
    )
    target = jnp.asarray(rng.uniform(0, 1, size=(16, 16, 4)), jnp.float32)

    @jax.jit
    def loss_fn(p):
        img = render_oracle(**p, cam=cp, img_size=(16, 16))
        return jnp.mean(jnp.abs(img - target))

    grads = jax.jit(jax.grad(loss_fn))(params)
    eps = 3e-3
    rng2 = np.random.default_rng(17)
    for key in ["means", "log_scales", "raw_opacity", "sh_coeffs", "quats"]:
        g = np.asarray(grads[key])
        # Probe a few random coordinates with central differences.
        flat = np.asarray(params[key], np.float64).ravel()
        for _ in range(6):
            idx = rng2.integers(flat.size)
            p_plus = {k: np.array(v, np.float64) for k, v in params.items()}
            p_minus = {k: np.array(v, np.float64) for k, v in params.items()}
            p_plus[key].ravel()[idx] += eps
            p_minus[key].ravel()[idx] -= eps
            f_plus = float(loss_fn({k: jnp.asarray(v, jnp.float32) for k, v in p_plus.items()}))
            f_minus = float(loss_fn({k: jnp.asarray(v, jnp.float32) for k, v in p_minus.items()}))
            fd = (f_plus - f_minus) / (2 * eps)
            ad = g.ravel()[idx]
            assert abs(fd - ad) < 2e-3 + 0.05 * abs(fd), (
                f"{key}[{idx}]: fd={fd:.6f} ad={ad:.6f}"
            )


def test_compositing_early_out_sticky_across_blocks():
    """Once T crosses 1e-4 the pixel is DONE (the reference's `done` flag,
    rasterize.wgsl:87-90). The crossing splat's log1p(-alpha) is excluded
    from the carried log T, so without a sticky alive carry the next
    BLOCK's small-alpha splats would revive the pixel."""
    import jax.numpy as jnp

    from brush_tpu.ops.compositing import composite_pixels

    # 6 splats dead-center on one pixel: three 0.9s and a 0.99 drive T to
    # ~1e-4 * ... below threshold inside block 0 (block_size=4); block 1
    # holds a bright red 0.5 splat that must NOT composite.
    n = 6
    xy = jnp.zeros((n, 2))
    conic = jnp.tile(jnp.asarray([[1.0, 0.0, 1.0]]), (n, 1))
    color = jnp.zeros((n, 3)).at[4:].set(jnp.asarray([1.0, 0.0, 0.0]))
    opac = jnp.asarray([0.9, 0.9, 0.9, 0.99, 0.5, 0.5])
    valid = jnp.ones((n,), bool)
    pix = jnp.zeros((1, 2))

    out = composite_pixels(pix, xy, conic, color, opac, valid, block_size=4)

    # Serial reference loop (rasterize.wgsl:80-101 semantics).
    t = 1.0
    rgb = 0.0
    for a in [0.9, 0.9, 0.9, 0.99, 0.5, 0.5]:
        test_t = t * (1.0 - a)
        if test_t <= 1e-4:
            break
        red = a * t if a == 0.5 else 0.0
        rgb += red
        t = test_t
    np.testing.assert_allclose(float(out[0, 0]), rgb, atol=1e-6)
    assert float(out[0, 0]) == 0.0, "revived pixel composited red"

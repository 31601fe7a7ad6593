"""Pallas backward kernel vs the XLA custom-VJP gradients (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from brush_tpu.ops.pallas.raster_vjp import make_pallas_rasterizer
from brush_tpu.ops.rasterize_tiled import make_rasterizer
from tests.test_pallas_fwd import build_pipeline_inputs


def _grads(raster_fn, xy, conic, color, opac, isect, tile_ids, v_img):
    def loss(xy, conic, color, opac):
        img = raster_fn(
            xy, conic, color, opac, isect.isect_gid, isect.starts, isect.ends,
            tile_ids,
        )
        return jnp.sum(img * v_img)

    return jax.grad(loss, argnums=(0, 1, 2, 3))(xy, conic, color, opac)


def test_pallas_vjp_matches_xla_vjp():
    max_isects = 1024
    xy, conic, color, opac, isect, tiles_x, tiles_y = build_pipeline_inputs(
        n=60, img_size=(48, 32), seed=3, max_isects=max_isects
    )
    num_tiles = tiles_x * tiles_y
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)

    rng = np.random.default_rng(0)
    v_img = jnp.asarray(rng.normal(size=(num_tiles, 256, 4)), jnp.float32)

    xla_raster = make_rasterizer(tiles_x, num_tiles, max_isects, 64)
    pl_raster = make_pallas_rasterizer(
        tiles_x, num_tiles, max_isects, 128, interpret=True
    )

    g_xla = _grads(xla_raster, xy, conic, color, opac, isect, tile_ids, v_img)
    g_pl = _grads(pl_raster, xy, conic, color, opac, isect, tile_ids, v_img)

    names = ["v_xy", "v_conic", "v_color", "v_opac"]
    for name, a, b in zip(names, g_xla, g_pl):
        a = np.asarray(a)
        b = np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(
            # atol absorbs the u16 color/opacity quantization of the
            # packed record layout (rasterize_fwd.quantize_color).
            b / scale, a / scale, atol=3e-4, err_msg=f"grad mismatch: {name}"
        )


def test_pallas_vjp_zero_cotangent():
    max_isects = 1024
    xy, conic, color, opac, isect, tiles_x, tiles_y = build_pipeline_inputs(
        n=30, img_size=(32, 32), seed=4, max_isects=max_isects
    )
    num_tiles = tiles_x * tiles_y
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    pl_raster = make_pallas_rasterizer(
        tiles_x, num_tiles, max_isects, 128, interpret=True
    )
    v_img = jnp.zeros((num_tiles, 256, 4), jnp.float32)
    g = _grads(pl_raster, xy, conic, color, opac, isect, tile_ids, v_img)
    for arr in g:
        np.testing.assert_allclose(np.asarray(arr), 0.0)


def test_hyperbolic_conic_grads_finite():
    """Regression: a conic with det < 0 (f32 cancellation in the projection
    can emit one for near-singular covariances) sends sigma to large
    NEGATIVE values at masked pixels. Raw exp(-sigma) overflows to inf
    there, and the backward's v_sigma = -opac * vis * (v_alpha = 0)
    became inf * 0 = NaN — the poisoning that killed the 2026-08-20
    castle training run at step ~3026 (one hyperbolic splat NaN'd three
    tiles' gradient records; Adam spread it to every live row in ~20
    steps; runs/r5_castle_default collapsed to PSNR 11.3). Both kernels
    and the XLA path now clamp sigma >= 0 before the exp — bit-identical
    for contributing lanes (the `ok` mask already requires sigma >= 0).
    """
    max_isects = 1024
    xy, conic, color, opac, isect, tiles_x, tiles_y = build_pipeline_inputs(
        n=40, img_size=(48, 32), seed=7, max_isects=max_isects
    )
    # Overwrite a handful of compacted splats with an indefinite conic
    # (eigenvalues ~ +2.5 / -0.5) and park their centers in a corner: at
    # tiles ~40 px away sigma ~ -0.25 * d^2 < -88, exactly the overflow
    # regime. Binning already placed their records, so the bad records
    # stay spread across the frame.
    conic = np.array(conic, copy=True)
    xy = np.array(xy, copy=True)
    conic[:6] = np.float32([1.0, -1.5, 1.0])
    xy[:6] = np.float32([4.0, 4.0])
    conic = jnp.asarray(conic)
    xy = jnp.asarray(xy)

    num_tiles = tiles_x * tiles_y
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    rng = np.random.default_rng(1)
    v_img = jnp.asarray(rng.normal(size=(num_tiles, 256, 4)), jnp.float32)

    xla_raster = make_rasterizer(tiles_x, num_tiles, max_isects, 64)
    pl_raster = make_pallas_rasterizer(
        tiles_x, num_tiles, max_isects, 128, interpret=True
    )
    g_xla = _grads(xla_raster, xy, conic, color, opac, isect, tile_ids, v_img)
    g_pl = _grads(pl_raster, xy, conic, color, opac, isect, tile_ids, v_img)

    names = ["v_xy", "v_conic", "v_color", "v_opac"]
    for name, a, b in zip(names, g_xla, g_pl):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all(), f"XLA {name} not finite"
        assert np.isfinite(b).all(), f"pallas {name} not finite"
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(
            b / scale, a / scale, atol=3e-4,
            err_msg=f"grad mismatch under hyperbolic conic: {name}",
        )

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

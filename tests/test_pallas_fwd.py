"""Pallas forward rasterizer vs the XLA tiled implementation (interpret
mode on CPU; the same comparison runs on real TPU hardware via
scripts/tpu_checks.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from brush_tpu.camera import Camera
from brush_tpu.constants import TILE_SIZE, TILE_WIDTH
from brush_tpu.ops.binning import build_intersections
from brush_tpu.ops.pallas.rasterize_fwd import pack_isect_splats, rasterize_fwd_pallas
from brush_tpu.ops.projection import project_splats
from brush_tpu.ops.rasterize_reference import camera_params
from brush_tpu.ops.rasterize_tiled import make_rasterizer
from brush_tpu.ops.sh import sh_to_color
from brush_tpu.constants import SH_C0


def build_pipeline_inputs(n=80, img_size=(48, 32), seed=0, max_isects=1024):
    rng = np.random.default_rng(seed)
    means = jnp.asarray(rng.uniform(-2.5, 2.5, size=(n, 3)), jnp.float32)
    log_scales = jnp.asarray(np.log(rng.uniform(0.1, 0.8, size=(n, 3))), jnp.float32)
    quats = rng.normal(size=(n, 4))
    quats = jnp.asarray(quats / np.linalg.norm(quats, axis=-1, keepdims=True), jnp.float32)
    colors = rng.uniform(0, 1, size=(n, 3))
    sh = jnp.asarray((colors[:, None, :] - 0.5) / SH_C0, jnp.float32)
    opac_raw = jnp.asarray(
        np.log(rng.uniform(0.2, 0.9, n) / (1 - rng.uniform(0.2, 0.9, n))), jnp.float32
    )

    cam = Camera(position=[0, 0, -8], rotation=[1, 0, 0, 0], fov_x=np.pi / 2, fov_y=np.pi / 2)
    cp = camera_params(cam, img_size)
    proj = project_splats(
        means, log_scales, quats, cp.viewmat, cp.focal, cp.pixel_center, img_size
    )
    cam_pos = cp.viewmat[:3, 3]
    viewdir = means - cam_pos
    viewdir = viewdir / jnp.linalg.norm(viewdir, axis=-1, keepdims=True).clip(1e-12)
    color = sh_to_color(0, viewdir, sh)
    opac = jax.nn.sigmoid(opac_raw)

    tiles_x = -(-img_size[0] // TILE_WIDTH)
    tiles_y = -(-img_size[1] // TILE_WIDTH)
    isect = build_intersections(proj, opac, (tiles_x, tiles_y), max_isects,
                                align=128)
    order = isect.order
    return (
        proj.xy[order], proj.conic[order], color[order], opac[order],
        isect, tiles_x, tiles_y,
    )


def test_pallas_fwd_matches_xla():
    max_isects = 1024
    xy, conic, color, opac, isect, tiles_x, tiles_y = build_pipeline_inputs(
        max_isects=max_isects
    )
    num_tiles = tiles_x * tiles_y
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = isect.starts
    ends = isect.ends

    raster = make_rasterizer(tiles_x, num_tiles, max_isects, 64)
    img_xla = raster(xy, conic, color, opac, isect.isect_gid, starts, ends, tile_ids)

    packed = pack_isect_splats(xy, conic, color, opac, isect.isect_gid, max_isects, k_lanes=128)
    img_pl, log_t, fidx = rasterize_fwd_pallas(
        packed, starts, ends, tile_ids,
        tiles_x=tiles_x, num_tiles=num_tiles, max_isects=max_isects,
        k_lanes=128, interpret=True,
    )

    np.testing.assert_allclose(
        # atol absorbs the u16 color/opacity quantization of the packed
        # record layout (step ~1.2e-4; see rasterize_fwd.quantize_color).
        np.asarray(img_pl), np.asarray(img_xla), atol=2e-4
    )
    # log_t consistent with the output alpha channel.
    np.testing.assert_allclose(
        1.0 - np.exp(np.asarray(log_t)), np.asarray(img_pl)[..., 3], atol=1e-6
    )
    assert np.asarray(fidx).max() >= 0


def test_pallas_fwd_empty_tiles():
    # All-empty bins: should produce a black image without hanging.
    max_isects = 256
    num_tiles = 6
    tiles_x = 3
    packed = jnp.zeros((8, max_isects + 128), jnp.uint32)
    zeros = jnp.zeros((num_tiles,), jnp.int32)
    img, log_t, fidx = rasterize_fwd_pallas(
        packed, zeros, zeros, jnp.arange(num_tiles, dtype=jnp.int32),
        tiles_x=tiles_x, num_tiles=num_tiles, max_isects=max_isects,
        k_lanes=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(img), 0.0)
    np.testing.assert_allclose(np.asarray(fidx), -1)


def test_record_quantization_roundtrip():
    """The packed u16 color/opacity quantizers must round-trip within half a
    step over their documented ranges, clamp outside them, and decode
    exactly through the XLA-side unpack helpers."""
    from brush_tpu.ops.pallas.rasterize_fwd import (
        COLOR_HI,
        COLOR_LO,
        decode_color,
        decode_opac,
        pack_record_rows,
        quantize_color,
        quantize_opac,
        unpack_record_rows,
    )

    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.uniform(COLOR_LO, COLOR_HI, 4096), jnp.float32)
    o = jnp.asarray(rng.uniform(0, 1, 4096), jnp.float32)
    # 0.51 steps, not 0.50: f32 rounding in the quantize product can nudge
    # a borderline value across the round boundary by ~1e-3 steps.
    step_c = (COLOR_HI - COLOR_LO) / 65535.0
    np.testing.assert_allclose(np.asarray(decode_color(quantize_color(c))),
                               np.asarray(c), atol=step_c * 0.51 + 1e-6)
    np.testing.assert_allclose(np.asarray(decode_opac(quantize_opac(o))),
                               np.asarray(o), atol=0.5 / 65535.0 + 1e-7)
    # Clamping: out-of-range values saturate instead of wrapping.
    assert float(decode_color(quantize_color(jnp.float32(99.0)))) == COLOR_HI
    assert float(decode_color(quantize_color(jnp.float32(-99.0)))) == COLOR_LO
    assert float(decode_opac(quantize_opac(jnp.float32(2.0)))) == 1.0

    # pack -> unpack reproduces xy/conic bit-exactly and color to one step.
    n = 512
    xy0 = jnp.asarray(rng.normal(size=n) * 100, jnp.float32)
    xy1 = jnp.asarray(rng.normal(size=n) * 100, jnp.float32)
    cxx = jnp.asarray(rng.uniform(0.01, 3, n), jnp.float32)
    cxy = jnp.asarray(rng.normal(size=n), jnp.float32)
    cyy = jnp.asarray(rng.uniform(0.01, 3, n), jnp.float32)
    cols = [jnp.asarray(rng.uniform(-2, 2, n), jnp.float32) for _ in range(3)]
    opac = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
    rows = pack_record_rows(
        xy0, xy1, cxx, cxy, cyy,
        quantize_color(cols[0]), quantize_color(cols[1]),
        quantize_color(cols[2]), quantize_opac(opac),
        jnp.arange(n, dtype=jnp.uint32),
    )
    blk = jnp.stack(rows, axis=0).reshape(8, n)
    dec = unpack_record_rows(blk)
    np.testing.assert_array_equal(np.asarray(dec[0][0]), np.asarray(xy0))
    np.testing.assert_array_equal(np.asarray(dec[2][0]), np.asarray(cxx))
    for i in range(3):
        np.testing.assert_allclose(np.asarray(dec[5 + i][0]),
                                   np.asarray(cols[i]), atol=step_c * 0.51 + 1e-6)
    np.testing.assert_allclose(np.asarray(dec[8][0]), np.asarray(opac),
                               atol=0.51 / 65535.0 + 1e-6)
    assert int(blk[7][-1]) == n - 1  # splat id rides row 7 untouched

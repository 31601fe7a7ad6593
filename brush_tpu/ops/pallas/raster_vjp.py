"""Custom-VJP wrapper pairing the Pallas forward and backward kernels.

Per-intersection gradient records from the backward kernel are reduced to
per-splat gradients with one XLA scatter-add over the compact splat ids
(replacing the reference's global atomics, rasterize_backwards.wgsl:47-135).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from brush_tpu.ops.pallas.rasterize_bwd import rasterize_bwd_pallas
from brush_tpu.ops.pallas.rasterize_fwd import (
    pack_isect_splats,
    rasterize_fwd_pallas,
)


@functools.lru_cache(maxsize=32)
def make_pallas_rasterizer(
    tiles_x: int, num_tiles: int, max_isects: int, k_lanes: int,
    interpret: bool = False,
):
    """Same call signature as ops.rasterize_tiled.make_rasterizer."""

    def _fwd_impl(xy, conic, color, opac, isect_gid, starts, ends, tile_ids):
        packed = pack_isect_splats(xy, conic, color, opac, isect_gid,
                                   max_isects, k_lanes)
        img, log_t, fidx = rasterize_fwd_pallas(
            packed, starts, ends, tile_ids,
            tiles_x=tiles_x, num_tiles=num_tiles, max_isects=max_isects,
            k_lanes=k_lanes, interpret=interpret,
        )
        return packed, img, log_t, fidx

    @jax.custom_vjp
    def raster(xy, conic, color, opac, isect_gid, starts, ends, tile_ids):
        _, img, _, _ = _fwd_impl(
            xy, conic, color, opac, isect_gid, starts, ends, tile_ids
        )
        return img

    def raster_fwd(xy, conic, color, opac, isect_gid, starts, ends, tile_ids):
        packed, img, log_t, fidx = _fwd_impl(
            xy, conic, color, opac, isect_gid, starts, ends, tile_ids
        )
        n = xy.shape[0]
        res = (packed, isect_gid, starts, ends, tile_ids, log_t, fidx, n)
        return img, res

    def raster_bwd(res, g):
        packed, isect_gid, starts, ends, tile_ids, log_t, fidx, n = res
        grads = rasterize_bwd_pallas(
            packed, g, log_t, fidx, starts, ends, tile_ids,
            tiles_x=tiles_x, num_tiles=num_tiles, max_isects=max_isects,
            k_lanes=k_lanes, interpret=interpret,
        )  # (16, max_isects + k_lanes)

        # Alignment-padding and overflow slots carry splat id n (see
        # ops/binning.py) and the extra K-lane window is padded with n too:
        # unwritten-garbage records land in the scratch row n and are
        # sliced off. ONE fused row scatter-add — scatters cost per index,
        # so four separate ones would cost 4x.
        recs = grads[:9].T  # (max_isects + k, 9)
        gid = jnp.pad(isect_gid, (0, k_lanes), constant_values=n)
        acc = jnp.zeros((n + 1, 9), jnp.float32).at[gid].add(recs)[:n]
        return (
            acc[:, 0:2], acc[:, 2:5], acc[:, 5:8], acc[:, 8],
            None, None, None, None,
        )

    raster.defvjp(raster_fwd, raster_bwd)
    return raster

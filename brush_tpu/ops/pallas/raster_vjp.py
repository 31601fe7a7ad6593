"""Custom-VJP TPU record pipeline: expand -> sort -> rasterize (fwd + bwd).

The forward runs the three pool-scale stages the reference implements as
MapGaussiansToIntersect + TileSort + Rasterize (render.rs:199-307), built
TPU-shaped:

  1. expand_pallas: one-hot MXU expansion of depth-ordered splat rows into
     per-intersection records + packed sort keys (see ops/pallas/expand.py);
  2. one XLA variadic sort_key_val carrying the 9 raster attributes and the
     compact splat id as payloads — measured ~3x a key-only sort, vs ~30x
     for a post-sort row gather or scatter;
  3. rasterize_fwd_pallas over *unaligned* tile ranges (tile_bins used
     directly; DMA windows snap down to lane boundaries and masks cut the
     leading lanes).

Backward: rasterize_bwd_pallas writes per-intersection gradient records to
the same unaligned layout (leading-boundary read-merge keeps neighbouring
tiles' records intact), then ONE fused XLA scatter-add by compact splat id
reduces them to per-splat gradients (replacing the reference's global
atomics, rasterize_backwards.wgsl:47-135).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from brush_tpu.ops.pallas.expand import (
    EXP_IN_ROWS,
    WINDOW_ALIGN,
    expand_pallas,
)
from brush_tpu.ops.pallas.rasterize_bwd import rasterize_bwd_pallas
from brush_tpu.ops.pallas.rasterize_fwd import (
    PACK_ROWS,
    pack_isect_splats,
    rasterize_fwd_pallas,
)


@functools.lru_cache(maxsize=32)
def make_pallas_pipeline(
    tiles_x: int, num_tiles: int, max_isects: int, n: int,
    k_lanes: int = 256, k_exp: int = 512, interpret: bool = False,
):
    """Full record pipeline as one custom-VJP function.

    Returns raster(attrs9, decode, splat_c, s_lo, total, tile_ids) ->
    img_tiles where
      attrs9: (9, n) f32, depth-compact order — x, y, cxx, cxy, cyy,
        r, g, b, opac (differentiable);
      decode: (12, n) f32 ints — tmin_x, tmin_y, bbox_w, mask halves x4,
        pc halves x2, small, offset, gid (stop-gradient bookkeeping);
      splat_c: (1, max_isects) i32 compact splat id per slot (monotone);
      s_lo: (num_blocks,) i32 aligned splat-window starts;
      total: (1,) i32 live record count;
      tile_ids: (num_tiles,) i32 tile id per grid step.
    """
    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    # Pack the slot id into the key's low bits when it fits: depth order
    # within a tile comes free and the sort needs no stability machinery.
    # Otherwise sort tile-only keys stably (the expansion emits slots in
    # depth order, which a stable sort preserves).
    slot_bits = 32 - tile_bits if max_isects <= (1 << (32 - tile_bits)) else 0
    assert max_isects % k_exp == 0 and max_isects % k_lanes == 0

    # numpy, not jnp: this closure is lru-cached across traces, and a jnp
    # constant created under one jit trace would leak into the next.
    boundaries = (np.arange(num_tiles + 1, dtype=np.uint64)
                  << slot_bits).astype(np.uint32)

    window = k_exp + 2 * WINDOW_ALIGN
    n_pad = -(-n // WINDOW_ALIGN) * WINDOW_ALIGN + window

    def _fwd_impl(attrs9, decode, splat_c, s_lo, total, tile_ids):
        attrs_t = jnp.concatenate(
            [attrs9, decode,
             jnp.zeros((EXP_IN_ROWS - 21, n), jnp.float32)], axis=0
        )
        attrs_t = jnp.pad(attrs_t, ((0, 0), (0, n_pad - n)))

        keys, recs = expand_pallas(
            attrs_t, splat_c, s_lo, total,
            tiles_x=tiles_x, num_tiles=num_tiles, slot_bits=slot_bits,
            n=n, max_isects=max_isects, k_exp=k_exp, interpret=interpret,
        )

        # One variadic sort groups records by tile (keys pack tile | slot,
        # so depth order within a tile is free) and carries the payloads.
        ops = jax.lax.sort(
            (keys,) + tuple(recs[i] for i in range(10)), num_keys=1,
            is_stable=slot_bits == 0,
        )
        skeys = ops[0]
        packed = jnp.concatenate(
            [
                jnp.stack(ops[1:10], axis=0),
                jnp.zeros((PACK_ROWS - 9, max_isects), jnp.float32),
            ],
            axis=0,
        )
        packed = jnp.pad(packed, ((0, 0), (0, k_lanes)))
        gid_sorted = ops[10].astype(jnp.int32)

        tile_bins = jnp.searchsorted(skeys, boundaries).astype(jnp.int32)
        starts = tile_bins[:-1]
        ends = tile_bins[1:]

        img, log_t, fidx = rasterize_fwd_pallas(
            packed, starts, ends, tile_ids,
            tiles_x=tiles_x, num_tiles=num_tiles, max_isects=max_isects,
            k_lanes=k_lanes, interpret=interpret,
        )
        return img, (packed, gid_sorted, starts, ends, log_t, fidx)

    @jax.custom_vjp
    def raster(attrs9, decode, splat_c, s_lo, total, tile_ids):
        img, _ = _fwd_impl(attrs9, decode, splat_c, s_lo, total, tile_ids)
        return img

    def raster_fwd(attrs9, decode, splat_c, s_lo, total, tile_ids):
        img, (packed, gid_sorted, starts, ends, log_t, fidx) = _fwd_impl(
            attrs9, decode, splat_c, s_lo, total, tile_ids
        )
        return img, (packed, gid_sorted, starts, ends, tile_ids, log_t, fidx)

    def raster_bwd(res, g):
        packed, gid_sorted, starts, ends, tile_ids, log_t, fidx = res
        grads = rasterize_bwd_pallas(
            packed, g, log_t, fidx, starts, ends, tile_ids,
            tiles_x=tiles_x, num_tiles=num_tiles, max_isects=max_isects,
            k_lanes=k_lanes, interpret=interpret,
        )  # (16, max_isects + k_lanes)

        # Records outside every tile range are unwritten garbage, but their
        # splat id is n (set by the expand kernel / the key sort sentinel),
        # so they land in the scratch row and are sliced off. ONE fused row
        # scatter-add — scatters cost per index, so nine separate ones
        # would cost 9x.
        recs = grads[:9].T  # (max_isects + k, 9)
        gid = jnp.pad(gid_sorted, (0, k_lanes), constant_values=n)
        acc = jnp.zeros((n + 1, 9), jnp.float32).at[gid].add(recs)[:n]
        return (acc.T, None, None, None, None, None)

    raster.defvjp(raster_fwd, raster_bwd)
    return raster


@functools.lru_cache(maxsize=32)
def make_pallas_rasterizer(
    tiles_x: int, num_tiles: int, max_isects: int, k_lanes: int,
    interpret: bool = False,
):
    """Aligned-records rasterizer (same call signature as
    ops.rasterize_tiled.make_rasterizer). Used by the sharded train step;
    single-device rendering uses make_pallas_pipeline."""

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

"""Find the hotspot inside the mask-pretest build_intersections."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from brush_tpu.camera import Camera
from brush_tpu.constants import TILE_WIDTH
from brush_tpu.ops.binning import (
    _floor_div,
    _select_bit,
    precompute_tile_masks,
)
from brush_tpu.ops.projection import project_splats
from brush_tpu.ops.rasterize_reference import camera_params
from brush_tpu.splats import from_random


def timeit(name, fn, *args, iters=5):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn_j(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(jnp.ravel(leaf)[:1])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:9.2f} ms")


def main():
    n = 1 << 20
    img_size = (1024, 1024)
    align = 256
    rng = np.random.default_rng(0)
    splats = from_random(rng, [-3, -3, -3], [3, 3, 3], count=n, sh_degree=1,
                         capacity=n)
    cam = Camera(position=[0, 0, -8.0], rotation=[1, 0, 0, 0],
                 fov_x=np.pi / 2, fov_y=np.pi / 2)
    cp = camera_params(cam, img_size)
    w, h = img_size
    tiles_x, tiles_y = -(-w // TILE_WIDTH), -(-h // TILE_WIDTH)
    num_tiles = tiles_x * tiles_y
    max_isects = 1 << 22

    means = jax.device_put(splats.means)
    log_scales = jax.device_put(splats.log_scales)
    quats = jax.device_put(splats.quats)
    raw_op = jax.device_put(splats.raw_opacity)

    proj = jax.jit(lambda m, ls, q: project_splats(
        m, ls, q, cp.viewmat, cp.focal, cp.pixel_center, img_size))(
        means, log_scales, quats)
    jax.block_until_ready(proj)
    opac = jax.jit(jax.nn.sigmoid)(raw_op)
    jax.block_until_ready(opac)

    timeit("1 pretest masks (N,64)", precompute_tile_masks, proj, opac)
    masks = jax.jit(precompute_tile_masks)(proj, opac)
    jax.block_until_ready(masks)
    producing = proj.visible & (masks.counts > 0)

    def stage_sort(proj, producing):
        depth_bits = jax.lax.bitcast_convert_type(
            jnp.maximum(proj.depth, 1e-20), jnp.uint32)
        depth_key = jnp.where(producing, depth_bits, jnp.uint32(0xFFFFFFFF))
        _, order = jax.lax.sort_key_val(
            depth_key, jnp.arange(n, dtype=jnp.int32), is_stable=True)
        return order
    timeit("2 depth sort_key_val u32", stage_sort, proj, producing)
    order = jax.jit(stage_sort)(proj, producing)
    jax.block_until_ready(order)

    def stage_decode_rows(masks, proj, producing, order):
        counts_c = masks.counts[order] * producing[order].astype(jnp.int32)
        cum = jnp.cumsum(counts_c)
        offsets = cum - counts_c
        decode = jnp.stack(
            [offsets,
             masks.mask_lo[order].astype(jnp.int32),
             masks.mask_hi[order].astype(jnp.int32),
             masks.pc_pack[order].astype(jnp.int32),
             proj.tile_min[order, 0], proj.tile_min[order, 1],
             jnp.maximum(proj.tile_max[order, 0] - proj.tile_min[order, 0],
                         1).astype(jnp.int32),
             masks.small[order].astype(jnp.int32)], axis=1)
        return decode, counts_c, offsets, cum[-1]
    timeit("3 decode rows build (N gathers)", stage_decode_rows, masks, proj,
           producing, order)
    decode, counts_c, offsets, total = jax.jit(stage_decode_rows)(
        masks, proj, producing, order)
    jax.block_until_ready((decode, counts_c, offsets, total))

    def stage_slotmap(counts_c, offsets):
        scatter_idx = jnp.where(counts_c > 0, offsets, max_isects)
        marks = jnp.zeros((max_isects,), jnp.int32).at[scatter_idx].max(
            jnp.arange(n, dtype=jnp.int32) + 1, mode="drop")
        slot_splat = jax.lax.cummax(marks) - 1
        return slot_splat
    timeit("4 scatter + cummax slot->splat", stage_slotmap, counts_c, offsets)
    slot_splat = jax.jit(stage_slotmap)(counts_c, offsets)
    jax.block_until_ready(slot_splat)

    def stage_decode(decode, slot_splat, total):
        slot = jnp.arange(max_isects, dtype=jnp.int32)
        splat = jnp.clip(slot_splat, 0, n - 1)
        d = decode[splat]
        return d, splat, slot
    timeit("5 pool row gather (pool,8)", stage_decode, decode, slot_splat,
           total)
    d, splat, slot = jax.jit(stage_decode)(decode, slot_splat, total)
    jax.block_until_ready((d, splat, slot))

    def stage_key(d, slot_splat, slot, total):
        rank = slot - d[:, 0]
        pos = jnp.where(
            d[:, 7] > 0,
            _select_bit(d[:, 1].astype(jnp.uint32), d[:, 2].astype(jnp.uint32),
                        d[:, 3].astype(jnp.uint32), rank),
            rank)
        w_i = d[:, 6]
        dy = _floor_div(pos, w_i.astype(jnp.float32), w_i)
        dx = pos - dy * w_i
        tile_id = (d[:, 5] + dy) * tiles_x + (d[:, 4] + dx)
        valid = (slot_splat >= 0) & (slot < total)
        key = jnp.where(valid, tile_id, num_tiles)
        return key
    timeit("6 select-bit + tile key", stage_key, d, slot_splat, slot, total)
    key = jax.jit(stage_key)(d, slot_splat, slot, total)
    jax.block_until_ready(key)

    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    slot_bits = 32 - tile_bits

    def stage_sort2(key, slot, splat):
        packed = (key.astype(jnp.uint32) << slot_bits) | slot.astype(jnp.uint32)
        sorted_packed = jax.lax.sort(packed)
        sorted_key = (sorted_packed >> slot_bits).astype(jnp.int32)
        slot_of = (sorted_packed & ((1 << slot_bits) - 1)).astype(jnp.int32)
        isect_gid = splat[slot_of]
        return sorted_key, isect_gid
    timeit("7 packed sort + gid gather", stage_sort2, key, slot, splat)
    sorted_key, isect_gid = jax.jit(stage_sort2)(key, slot, splat)
    jax.block_until_ready((sorted_key, isect_gid))

    def stage_align(sorted_key, isect_gid, slot):
        boundaries = jnp.arange(num_tiles + 1, dtype=jnp.int32)
        tile_bins = jnp.searchsorted(sorted_key, boundaries,
                                     side="left").astype(jnp.int32)
        counts = tile_bins[1:] - tile_bins[:-1]
        aligned_counts = -(-counts // align) * align
        aligned_starts = jnp.cumsum(aligned_counts) - aligned_counts
        starts = jnp.minimum(aligned_starts, max_isects).astype(jnp.int32)
        ends = jnp.minimum(aligned_starts + counts, max_isects).astype(jnp.int32)
        sorted_tile = jnp.clip(sorted_key, 0, num_tiles - 1)
        rank = slot - tile_bins[:-1][sorted_tile]
        new_pos = aligned_starts[sorted_tile] + rank
        new_pos = jnp.where(sorted_key < num_tiles, new_pos, max_isects)
        gid_aligned = jnp.full((max_isects,), n, jnp.int32).at[new_pos].set(
            isect_gid, mode="drop")
        return starts, ends, gid_aligned
    timeit("8 bins + aligned scatter", stage_align, sorted_key, isect_gid, slot)


if __name__ == "__main__":
    main()

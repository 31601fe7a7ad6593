"""Stage ablation of the new pallas record pipeline on the real chip.

STALE (round-3): the packed-record pipeline changed expand_pallas's
signature (comps/bf16 component rows, no slot_bits) and the record layout
(8 u32 rows). Use scripts/profile_r3.py for current measurements.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from brush_tpu.camera import Camera
from brush_tpu.constants import TILE_WIDTH
from brush_tpu.ops.binning import precompute_tile_masks
from brush_tpu.ops.pallas.expand import WINDOW_ALIGN, expand_pallas
from brush_tpu.ops.pallas.rasterize_fwd import rasterize_fwd_pallas
from brush_tpu.ops.projection import project_splats
from brush_tpu.ops.rasterize_reference import camera_params
from brush_tpu.ops.sh import sh_to_color
from brush_tpu.splats import from_random


def timeit(name, fn, *args, iters=4):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn_j(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(jnp.ravel(leaf)[:1])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    n = 1 << 20
    img_size = (1024, 1024)
    k_exp = 512
    k_lanes = 256
    max_isects = 3 * (1 << 20)
    rng = np.random.default_rng(0)
    splats = from_random(rng, [-3, -3, -3], [3, 3, 3], count=n, sh_degree=1,
                         capacity=n)
    cam = Camera(position=[0, 0, -8.0], rotation=[1, 0, 0, 0],
                 fov_x=np.pi / 2, fov_y=np.pi / 2)
    cp = camera_params(cam, img_size)
    w, h = img_size
    tiles_x, tiles_y = -(-w // TILE_WIDTH), -(-h // TILE_WIDTH)
    num_tiles = tiles_x * tiles_y
    window = k_exp + 2 * WINDOW_ALIGN
    n_pad = -(-n // WINDOW_ALIGN) * WINDOW_ALIGN + window
    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    slot_bits = 0  # pool too big to pack at 4096 tiles

    means = jax.device_put(splats.means)
    log_scales = jax.device_put(splats.log_scales)
    quats = jax.device_put(splats.quats)
    raw_op = jax.device_put(splats.raw_opacity)

    def prep(means, log_scales, quats, raw_op):
        proj = project_splats(means, log_scales, quats, cp.viewmat, cp.focal,
                              cp.pixel_center, img_size)
        opac = jax.nn.sigmoid(raw_op)
        cam_pos = cp.viewmat[:3, 3]
        vd = means - cam_pos
        vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True).clip(1e-12)
        color = sh_to_color(1, vd, splats.sh_coeffs)
        masks = precompute_tile_masks(proj, opac)
        producing = proj.visible & (masks.counts > 0)
        counts_g = jnp.where(producing, masks.counts, 0)
        depth_bits = jax.lax.bitcast_convert_type(
            jnp.maximum(proj.depth, 1e-20), jnp.uint32)
        depth_key = jnp.where(producing, depth_bits, jnp.uint32(0xFFFFFFFF))
        f32 = lambda v: v.astype(jnp.float32)
        m_lo, m_hi = masks.mask_lo, masks.mask_hi
        ops = jax.lax.sort(
            (depth_key, proj.xy[:, 0], proj.xy[:, 1], proj.conic[:, 0],
             proj.conic[:, 1], proj.conic[:, 2], color[:, 0], color[:, 1],
             color[:, 2], opac,
             f32(proj.tile_min[:, 0]), f32(proj.tile_min[:, 1]),
             f32(jnp.maximum(proj.tile_max[:, 0] - proj.tile_min[:, 0], 1)),
             f32(m_lo & 0xFFFF), f32(m_lo >> 16),
             f32(m_hi & 0xFFFF), f32(m_hi >> 16),
             f32(masks.pc_pack & 0xFFFF), f32(masks.pc_pack >> 16),
             f32(masks.small), counts_g,
             jnp.arange(n, dtype=jnp.int32)),
            num_keys=1, is_stable=True)
        counts_c = ops[20]
        cum = jnp.cumsum(counts_c)
        offsets = cum - counts_c
        total = cum[-1:]
        attrs_t = jnp.concatenate(
            [jnp.stack(ops[1:10], 0),
             jnp.stack([ops[10], ops[11], ops[12], ops[13], ops[14], ops[15],
                        ops[16], ops[17], ops[18], ops[19], f32(offsets),
                        jnp.arange(n, dtype=jnp.float32)], 0),
             jnp.zeros((3, n), jnp.float32)], axis=0)
        attrs_t = jnp.pad(attrs_t, ((0, 0), (0, n_pad - n)))
        scatter_idx = jnp.where(counts_c > 0, offsets, max_isects)
        marks = jnp.zeros((max_isects,), jnp.int32).at[scatter_idx].add(
            1, mode="drop")
        splat_c = jnp.clip(jnp.cumsum(marks) - 1, 0, n - 1)
        s_lo = jnp.clip((splat_c[::k_exp] // WINDOW_ALIGN) * WINDOW_ALIGN,
                        0, n_pad - window)
        return attrs_t, splat_c[None, :], s_lo, total.astype(jnp.int32)

    out = timeit("1 XLA prep (pretest+sort+cumsum+marks)", prep,
                 means, log_scales, quats, raw_op)
    attrs_t, splat_c, s_lo, total = jax.device_put(jax.tree_util.tree_map(np.asarray, out))

    def expand(attrs_t, splat_c, s_lo, total):
        return expand_pallas(attrs_t, splat_c, s_lo, total,
                             tiles_x=tiles_x, num_tiles=num_tiles,
                             slot_bits=slot_bits, n=n, max_isects=max_isects,
                             k_exp=k_exp)
    out = timeit("2 expand kernel", expand, attrs_t, splat_c, s_lo, total)
    keys, recs = out
    jax.block_until_ready((keys, recs))

    def key_sort(keys, recs):
        return jax.lax.sort((keys,) + tuple(recs[i] for i in range(10)),
                            num_keys=1, is_stable=True)
    out = timeit("3 variadic stable sort (10 payloads)", key_sort, keys, recs)
    sorted_ops = jax.device_put(tuple(np.asarray(o) for o in out))

    def post(ops):
        skeys = ops[0]
        packed = jnp.concatenate(
            [jnp.stack(ops[1:10], axis=0),
             jnp.zeros((7, max_isects), jnp.float32)], axis=0)
        packed = jnp.pad(packed, ((0, 0), (0, k_lanes)))
        boundaries = jnp.arange(num_tiles + 1, dtype=jnp.uint32)
        bins = jnp.searchsorted(skeys, boundaries).astype(jnp.int32)
        return packed, bins, ops[10].astype(jnp.int32)
    out = timeit("4 stack + searchsorted", post, sorted_ops)
    packed, bins, gid = out
    jax.block_until_ready((packed, bins))
    starts, ends = bins[:-1], bins[1:]
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)

    def rast(packed, starts, ends):
        return rasterize_fwd_pallas(packed, starts, ends, tile_ids,
                                    tiles_x=tiles_x, num_tiles=num_tiles,
                                    max_isects=max_isects, k_lanes=k_lanes)
    timeit("5 raster fwd kernel", rast, packed, starts, ends)


if __name__ == "__main__":
    main()

"""Round-2 stage profile of the TPU record pipeline at the bench config.

STALE (round-3): the packed-record pipeline changed expand_pallas's
signature (comps/bf16 component rows, no slot_bits) and the record layout
(8 u32 rows). Use scripts/profile_r3.py for current measurements.


Times each stage of ops/pallas/raster_vjp._fwd_impl as a separately-jitted
piece, plus sort microbenchmarks that derisk the planned payload-packing
changes. Run on the real chip (no --platform override); prints incrementally
because each jit is a multi-minute remote compile.

Usage: python scripts/profile_r2.py [quick]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from brush_tpu.camera import Camera
from brush_tpu.constants import TILE_WIDTH, sh_degree_from_coeffs
from brush_tpu.ops.binning import precompute_tile_masks
from brush_tpu.ops.pallas.expand import EXP_IN_ROWS, WINDOW_ALIGN, expand_pallas
from brush_tpu.ops.pallas.rasterize_fwd import PACK_ROWS, rasterize_fwd_pallas
from brush_tpu.ops.projection import project_splats
from brush_tpu.ops.rasterize_reference import camera_params
from brush_tpu.ops.sh import sh_to_color
from brush_tpu.splats import from_random


def timeit(name, fn, *args, iters=12):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    print(f"{name:34s} {dt*1e3:9.2f} ms   (compile {compile_s:.0f}s)",
          flush=True)
    return out, dt


def main():
    quick = "quick" in sys.argv[1:]
    n = 1 << 20
    img_size = (1024, 1024)
    k_lanes = 512
    k_exp = 512
    max_isects = 3 << 20
    rng = np.random.default_rng(0)
    splats = from_random(rng, [-3, -3, -3], [3, 3, 3], count=n, sh_degree=1,
                         capacity=n)
    cam = Camera(position=[0, 0, -8.0], rotation=[1, 0, 0, 0],
                 fov_x=np.pi / 2, fov_y=np.pi / 2)
    cp = camera_params(cam, img_size)
    w, h = img_size
    tiles_x, tiles_y = -(-w // TILE_WIDTH), -(-h // TILE_WIDTH)
    num_tiles = tiles_x * tiles_y
    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    slot_bits = 32 - tile_bits if max_isects <= (1 << (32 - tile_bits)) else 0
    print(f"n={n} tiles={num_tiles} pool={max_isects} slot_bits={slot_bits}",
          flush=True)

    # ---- stage A: project + SH + pretest + row building ----
    def stage_a(means, log_scales, quats, sh, raw_op):
        quats_n = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True).clip(1e-12)
        proj = project_splats(means, log_scales, quats_n, cp.viewmat,
                              cp.focal, cp.pixel_center, img_size)
        cam_pos = cp.viewmat[:3, 3]
        vd = means - cam_pos
        vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True).clip(1e-12)
        color = sh_to_color(sh_degree_from_coeffs(sh.shape[1]), vd, sh)
        opac = jax.nn.sigmoid(raw_op)
        masks = precompute_tile_masks(proj, opac)
        producing = proj.visible & (masks.counts > 0)
        counts_g = jnp.where(producing, masks.counts, 0)
        depth_bits = jax.lax.bitcast_convert_type(
            jnp.maximum(proj.depth, 1e-20), jnp.uint32)
        depth_key = jnp.where(producing, depth_bits, jnp.uint32(0xFFFFFFFF))
        f32 = lambda v: v.astype(jnp.float32)
        m_lo, m_hi = masks.mask_lo, masks.mask_hi
        attrs9 = jnp.stack(
            [proj.xy[:, 0], proj.xy[:, 1], proj.conic[:, 0], proj.conic[:, 1],
             proj.conic[:, 2], color[:, 0], color[:, 1], color[:, 2], opac],
            axis=0)
        decode = jnp.stack(
            [f32(proj.tile_min[:, 0]), f32(proj.tile_min[:, 1]),
             f32(jnp.maximum(proj.tile_max[:, 0] - proj.tile_min[:, 0], 1)),
             f32(m_lo & 0xFFFF), f32(m_lo >> 16),
             f32(m_hi & 0xFFFF), f32(m_hi >> 16),
             f32(masks.pc_pack & 0xFFFF), f32(masks.pc_pack >> 16),
             f32(masks.small), f32(counts_g)], axis=0)
        return attrs9, decode, depth_key

    args = jax.device_put((splats.means, splats.log_scales, splats.quats,
                           splats.sh_coeffs, splats.raw_opacity))
    (attrs9, decode, depth_key), _ = timeit(
        "A project+SH+pretest+rows", jax.jit(stage_a), *args)

    # ---- stage B: depth sort, 22 arrays ----
    def stage_b(attrs9, decode, depth_key):
        ops = jax.lax.sort(
            (depth_key,) + tuple(attrs9[i] for i in range(9))
            + tuple(decode[i] for i in range(11))
            + (jnp.arange(n, dtype=jnp.int32),),
            num_keys=1, is_stable=True)
        return ops

    ops, _ = timeit("B depth sort (22 arrays)", jax.jit(stage_b),
                    attrs9, decode, depth_key)
    ops = jax.device_put(ops)

    # ---- stage C: slot map + expand kernel ----
    window = k_exp + 2 * WINDOW_ALIGN
    n_pad = -(-n // WINDOW_ALIGN) * WINDOW_ALIGN + window

    def stage_c(ops):
        counts_c = ops[20].astype(jnp.int32)
        cum = jnp.cumsum(counts_c)
        offsets = cum - counts_c
        total = jnp.minimum(cum[-1:], max_isects).astype(jnp.int32)
        attrs_t = jnp.concatenate(
            [jnp.stack(ops[1:20], axis=0),
             offsets.astype(jnp.float32)[None],
             jnp.arange(n, dtype=jnp.float32)[None],
             jnp.zeros((EXP_IN_ROWS - 21, n), jnp.float32)], axis=0)
        attrs_t = jnp.pad(attrs_t, ((0, 0), (0, n_pad - n)))
        scatter_idx = jnp.where(counts_c > 0, offsets, max_isects)
        marks = jnp.zeros((max_isects,), jnp.int32).at[scatter_idx].add(
            1, mode="drop")
        splat_c = jnp.clip(jnp.cumsum(marks) - 1, 0, n - 1)[None, :]
        s_lo = (splat_c[0, ::k_exp] // WINDOW_ALIGN) * WINDOW_ALIGN
        s_lo = jnp.clip(s_lo, 0, n_pad - window)
        keys, recs = expand_pallas(
            attrs_t, splat_c, s_lo, total,
            tiles_x=tiles_x, num_tiles=num_tiles, slot_bits=slot_bits,
            n=n, max_isects=max_isects, k_exp=k_exp)
        return keys, recs, total

    (keys, recs, total), _ = timeit("C slotmap+expand", jax.jit(stage_c), ops)
    keys, recs, total = jax.device_put((keys, recs, total))

    # ---- stage D: tile sort ----
    def stage_d(keys, recs):
        payload = tuple(recs[i] for i in range(9))
        if slot_bits == 0:
            payload = payload + (jnp.arange(max_isects, dtype=jnp.uint32),)
        sops = jax.lax.sort((keys,) + payload, num_keys=1,
                            is_stable=slot_bits == 0)
        return sops

    sops, _ = timeit(f"D tile sort ({10 + (slot_bits == 0)} arrays)",
                     jax.jit(stage_d), keys, recs)
    sops = jax.device_put(sops)

    # ---- stage E: bins + rasterize ----
    boundaries = (np.arange(num_tiles + 1, dtype=np.uint64)
                  << slot_bits).astype(np.uint32)
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)

    def stage_e(sops):
        skeys = sops[0]
        packed = jnp.concatenate(
            [jnp.stack(sops[1:10], axis=0),
             jnp.zeros((PACK_ROWS - 9, max_isects), jnp.float32)], axis=0)
        packed = jnp.pad(packed, ((0, 0), (0, k_lanes)))
        tile_bins = jnp.searchsorted(skeys, jnp.asarray(boundaries))
        tile_bins = tile_bins.astype(jnp.int32)
        starts = tile_bins[:-1]
        ends = tile_bins[1:]
        img, log_t, fidx = rasterize_fwd_pallas(
            packed, starts, ends, tile_ids,
            tiles_x=tiles_x, num_tiles=num_tiles, max_isects=max_isects,
            k_lanes=k_lanes)
        return img, log_t, fidx

    (img, log_t, fidx), dt_e = timeit("E bins+rasterize", jax.jit(stage_e), sops)
    print(f"  true records: {int(total[0])}", flush=True)

    if quick:
        return

    # ---- sort microbenchmarks (derisk payload packing) ----
    def sort_n_arrays(m, n_arrays, name):
        data = [jax.device_put(jnp.asarray(
            np.random.default_rng(i).integers(0, 2**31, m, dtype=np.int64)
            .astype(np.uint32))) for i in range(n_arrays)]

        def f(*a):
            return jax.lax.sort(a, num_keys=1, is_stable=True)
        timeit(name, jax.jit(f), *data)

    sort_n_arrays(n, 1, "sort 1M key-only")
    sort_n_arrays(n, 15, "sort 1M key+14")
    sort_n_arrays(n, 22, "sort 1M key+21")
    sort_n_arrays(max_isects, 1, "sort 3.1M key-only")
    sort_n_arrays(max_isects, 2, "sort 3.1M key+1")
    sort_n_arrays(max_isects, 11, "sort 3.1M key+10 (stable)")

    # unstable variant (tile sort can drop stability if slot rides the key)
    def sort_unstable(*a):
        return jax.lax.sort(a, num_keys=1, is_stable=False)
    data = [jax.device_put(jnp.asarray(
        np.random.default_rng(i).integers(0, 2**31, max_isects, dtype=np.int64)
        .astype(np.uint32))) for i in range(11)]
    timeit("sort 3.1M key+10 (unstable)", jax.jit(sort_unstable), *data)

    # chunked segment sort: 8 independent chunks as a batched axis
    data2 = [d.reshape(8, max_isects // 8) for d in data]

    def sort_chunked(*a):
        return jax.lax.sort(a, dimension=1, num_keys=1, is_stable=True)
    timeit("sort 8x392k key+10 chunked", jax.jit(sort_chunked), *data2)


if __name__ == "__main__":
    main()

"""Subtractive ablation of the full pallas render jit on the real chip.

STALE (round-3): the packed-record pipeline changed expand_pallas's
signature (comps/bf16 component rows, no slot_bits) and the record layout
(8 u32 rows). Use scripts/profile_r3.py for current measurements.


NOTE: written against the round-1 pipeline (22-array depth sort, unpacked
decode rows); the round-2 pipeline packs decode into 5 u32 rows and sorts
16 arrays (ops/pallas/raster_vjp.py). Update the stage bodies before
trusting new measurements.

Each variant truncates the pipeline after stage X and returns reductions of
everything computed so far (keeps all prior compute live under DCE).
Marginal stage costs = successive differences.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from brush_tpu.camera import Camera
from brush_tpu.constants import TILE_WIDTH
from brush_tpu.ops.binning import precompute_tile_masks
from brush_tpu.ops.pallas.expand import EXP_IN_ROWS, WINDOW_ALIGN, expand_pallas
from brush_tpu.ops.pallas.rasterize_fwd import rasterize_fwd_pallas
from brush_tpu.ops.projection import project_splats
from brush_tpu.ops.rasterize_reference import camera_params
from brush_tpu.ops.sh import sh_to_color
from brush_tpu.splats import from_random

N = 1 << 20
IMG = (1024, 1024)
K_EXP = 512
K_LANES = 256
POOL = 3 * (1 << 20)


def build(stage):
    rng = np.random.default_rng(0)
    splats = from_random(rng, [-3, -3, -3], [3, 3, 3], count=N, sh_degree=1,
                         capacity=N)
    cam = Camera(position=[0, 0, -8.0], rotation=[1, 0, 0, 0],
                 fov_x=np.pi / 2, fov_y=np.pi / 2)
    cp = camera_params(cam, IMG)
    w, h = IMG
    tiles_x, tiles_y = -(-w // TILE_WIDTH), -(-h // TILE_WIDTH)
    num_tiles = tiles_x * tiles_y
    window = K_EXP + 2 * WINDOW_ALIGN
    n_pad = -(-N // WINDOW_ALIGN) * WINDOW_ALIGN + window
    sh_coeffs = jax.device_put(splats.sh_coeffs)

    def fn(means, log_scales, quats, raw_op):
        proj = project_splats(means, log_scales, quats, cp.viewmat, cp.focal,
                              cp.pixel_center, IMG)
        opac = jax.nn.sigmoid(raw_op)
        cam_pos = cp.viewmat[:3, 3]
        vd = means - cam_pos
        vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True).clip(1e-12)
        color = sh_to_color(1, vd, sh_coeffs)
        if stage == "project":
            return proj.xy.sum() + color.sum() + opac.sum()
        masks = precompute_tile_masks(proj, opac)
        if stage == "pretest":
            return (proj.xy.sum() + color.sum() + masks.counts.sum()
                    + (masks.mask_lo ^ masks.mask_hi).sum())
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
             jnp.arange(N, dtype=jnp.int32)),
            num_keys=1, is_stable=True)
        counts_c = ops[20]
        cum = jnp.cumsum(counts_c)
        offsets = cum - counts_c
        total = cum[-1:]
        attrs_t = jnp.concatenate(
            [jnp.stack(ops[1:10], 0),
             jnp.stack([ops[10], ops[11], ops[12], ops[13], ops[14], ops[15],
                        ops[16], ops[17], ops[18], ops[19], f32(offsets),
                        jnp.arange(N, dtype=jnp.float32)], 0),
             jnp.zeros((EXP_IN_ROWS - 21, N), jnp.float32)], axis=0)
        attrs_t = jnp.pad(attrs_t, ((0, 0), (0, n_pad - N)))
        scatter_idx = jnp.where(counts_c > 0, offsets, POOL)
        marks = jnp.zeros((POOL,), jnp.int32).at[scatter_idx].add(
            1, mode="drop")
        splat_c = jnp.clip(jnp.cumsum(marks) - 1, 0, N - 1)
        s_lo = jnp.clip((splat_c[::K_EXP] // WINDOW_ALIGN) * WINDOW_ALIGN,
                        0, n_pad - window)
        if stage == "depthsort":
            return (attrs_t[:, ::1024].sum() + splat_c[::1024].sum()
                    + s_lo.sum())
        keys, recs = expand_pallas(
            attrs_t, splat_c[None], s_lo, total.astype(jnp.int32),
            tiles_x=tiles_x, num_tiles=num_tiles, slot_bits=0, n=N,
            max_isects=POOL, k_exp=K_EXP)
        if stage == "expand":
            return keys[::1024].astype(jnp.int32).sum() + recs[:, ::1024].sum()
        sops = jax.lax.sort((keys,) + tuple(recs[i] for i in range(10)),
                            num_keys=1, is_stable=True)
        if stage == "keysort":
            return (sops[0][::1024].astype(jnp.int32).sum()
                    + sum(o[::1024].sum() for o in sops[1:10]))
        skeys = sops[0]
        packed = jnp.concatenate(
            [jnp.stack(sops[1:10], axis=0),
             jnp.zeros((7, POOL), jnp.float32)], axis=0)
        packed = jnp.pad(packed, ((0, 0), (0, K_LANES)))
        bins = jnp.searchsorted(
            skeys, jnp.arange(num_tiles + 1, dtype=jnp.uint32)
        ).astype(jnp.int32)
        if stage == "stack":
            return packed[:, ::1024].sum() + bins.sum()
        tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
        img, log_t, fidx = rasterize_fwd_pallas(
            packed, bins[:-1], bins[1:], tile_ids,
            tiles_x=tiles_x, num_tiles=num_tiles, max_isects=POOL,
            k_lanes=K_LANES)
        return img.sum()

    args = jax.device_put((splats.means, splats.log_scales, splats.quats,
                           splats.raw_opacity))
    return jax.jit(fn), args


def main():
    stages = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "project", "pretest", "depthsort", "expand", "keysort", "stack",
        "full"]
    for stage in stages:
        fn, args = build(stage)
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(4):
            out = fn(*args)
        _ = np.asarray(jnp.ravel(out)[:1])
        print(f"up to {stage:10s} {(time.perf_counter()-t0)/4*1e3:9.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()

"""Mosaic-lowering check for every campaign kernel variant, no TPU needed.

Interpret-mode tests and XLA both accept ops that Mosaic cannot lower
(e.g. f32<->u32 casts — no fptoui/uitofp), so a kernel edit can pass the
whole CPU suite and still fail its first hardware compile. Cross-lowering
catches the client-side class of those failures on any host:

    jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))

runs the full pallas -> Mosaic MLIR pipeline (serialized into stablehlo
custom calls) without executing anything. Server-side Mosaic->LLO errors
(layout/register pressure) still need the chip; this catches everything
the client rejects.

Usage: python scripts/crosslower_check.py   (exit 0 iff all variants OK)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_cases():
    import jax
    import jax.numpy as jnp

    from brush_tpu.camera import Camera
    from brush_tpu.constants import TILE_WIDTH
    from brush_tpu.ops.binning import precompute_tile_masks
    from brush_tpu.ops.pallas import raster_vjp
    from brush_tpu.ops.projection import project_splats
    from brush_tpu.ops.rasterize_reference import camera_params
    from brush_tpu.ops.sh import sh_to_color
    from brush_tpu.render import pack_decode_rows
    from brush_tpu.splats import from_random

    N = 65536
    IMG = (512, 512)
    MI = 262144
    rng = np.random.default_rng(0)
    s = from_random(rng, [-3, -3, -3], [3, 3, 3], count=N, sh_degree=1,
                    capacity=N)
    cam = Camera(position=[0, 0, -8.0], rotation=[1, 0, 0, 0],
                 fov_x=np.pi / 2, fov_y=np.pi / 2)
    cp = camera_params(cam, IMG)
    args = (s.means, s.log_scales, s.quats, s.sh_coeffs, s.raw_opacity)

    def build(grad, raster_frac=1, k_lanes=512, **pkw):
        def prep(means, log_scales, quats, sh_coeffs, raw_op):
            w, h = IMG
            tiles_x, tiles_y = -(-w // TILE_WIDTH), -(-h // TILE_WIDTH)
            cell = pkw.get("cell", (1, 1))
            quats_n = quats / jnp.linalg.norm(
                quats, axis=-1, keepdims=True).clip(1e-12)
            proj = project_splats(means, log_scales, quats_n, cp.viewmat,
                                  cp.focal, cp.pixel_center, IMG)
            vd = means - cp.viewmat[:3, 3]
            vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True).clip(1e-12)
            color = sh_to_color(1, vd, sh_coeffs)
            opac = jax.nn.sigmoid(raw_op)
            masks = precompute_tile_masks(proj, opac, cell=cell)
            producing = proj.visible & (masks.counts > 0)
            counts_g = jnp.where(producing, masks.counts, 0)
            depth_bits = jax.lax.bitcast_convert_type(
                jnp.maximum(proj.depth, 1e-20), jnp.uint32)
            depth_key = jnp.where(producing, depth_bits,
                                  jnp.uint32(0xFFFFFFFF))
            attrs9 = jnp.stack(
                [proj.xy[:, 0], proj.xy[:, 1], proj.conic[:, 0],
                 proj.conic[:, 1], proj.conic[:, 2], color[:, 0],
                 color[:, 1], color[:, 2], opac], axis=0)
            decode = pack_decode_rows(proj, masks, counts_g, cell=cell)
            cells_x = -(-tiles_x // cell[0])
            cells_y = -(-tiles_y // cell[1])
            num_cells = cells_x * cells_y
            rt = (num_cells if raster_frac == 1
                  else -(-num_cells // raster_frac))
            raster = raster_vjp.make_pallas_pipeline(
                cells_x, num_cells, MI, N, raster_tiles=rt,
                k_lanes=k_lanes, **pkw)
            tile_ids = jnp.arange(rt, dtype=jnp.int32)
            return raster, attrs9, decode, depth_key, tile_ids

        def fwd(*a):
            raster, attrs9, decode, depth_key, tile_ids = prep(*a)
            return raster(attrs9, decode, depth_key, tile_ids)[0]

        if not grad:
            return fwd

        def loss(*a):
            return fwd(*a)[..., :3].mean()

        return lambda *a: jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*a)

    cases = [
        ("fwd base", build(False)),
        ("bwd base", build(True)),
        ("fwd cell2x2", build(False, cell=(2, 2))),
        ("bwd cell2x2", build(True, cell=(2, 2))),
        ("bwd cell4x2", build(True, cell=(4, 2))),
        ("bwd scan2", build(True, scan_passes=2)),
        ("bwd packgrad", build(True, pack_grad_sort=True)),
        ("bwd all-knobs", build(True, cell=(2, 2), scan_passes=2,
                                pack_grad_sort=True)),
        ("fwd strip(1/8)", build(False, raster_frac=8)),
        ("bwd strip(1/8)", build(True, raster_frac=8)),
        ("fwd k_lanes1024", build(False, k_lanes=1024)),
        ("fwd k_exp1024", build(False, k_exp=1024)),
        ("fwd tps16", build(False, tiles_per_step=16)),
        ("fwd nbuf8", build(False, n_buf=8)),
        ("fwd nbuf2", build(False, n_buf=2)),
        ("fwd infer", build(False, needs_grad=False)),
        ("fwd infer cell2x2", build(False, needs_grad=False, cell=(2, 2))),
    ]
    return cases, args


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    cases, args = build_cases()
    failed = 0
    for name, fn in cases:
        try:
            lw = jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))
            print(f"{name:24s} OK  ({len(lw.as_text()) // 1024} KiB)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - report and count every failure
            failed += 1
            print(f"{name:24s} FAIL {type(e).__name__}: {str(e)[:400]}",
                  flush=True)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()

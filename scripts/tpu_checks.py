"""On-hardware checks: Pallas kernels vs XLA implementations on the real TPU.

Run (on a machine with a TPU visible to JAX):
    python scripts/tpu_checks.py [--n 20000] [--img 512]

Complements the CPU interpret-mode tests in tests/test_pallas_*.py.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--k-lanes", type=int, default=512)
    ap.add_argument("--skip-xla", action="store_true")
    args = ap.parse_args()

    import jax
    from brush_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from brush_tpu.camera import Camera
    from brush_tpu.constants import SH_C0, TILE_WIDTH
    from brush_tpu.ops.binning import build_intersections
    from brush_tpu.ops.pallas.rasterize_fwd import (
        pack_isect_splats,
        rasterize_fwd_pallas,
    )
    from brush_tpu.ops.projection import project_splats
    from brush_tpu.ops.rasterize_reference import camera_params
    from brush_tpu.ops.rasterize_tiled import make_rasterizer
    from brush_tpu.ops.sh import sh_to_color

    print("devices:", jax.devices())
    n = args.n
    img_size = (args.img, args.img)
    rng = np.random.default_rng(0)

    means = jnp.asarray(rng.uniform(-3, 3, size=(n, 3)), jnp.float32)
    log_scales = jnp.asarray(np.log(rng.uniform(0.02, 0.3, size=(n, 3))), jnp.float32)
    quats = rng.normal(size=(n, 4))
    quats = jnp.asarray(quats / np.linalg.norm(quats, axis=-1, keepdims=True), jnp.float32)
    colors = rng.uniform(0, 1, size=(n, 3))
    sh = jnp.asarray((colors[:, None, :] - 0.5) / SH_C0, jnp.float32)
    opacs = rng.uniform(0.2, 0.9, n)
    opac_raw = jnp.asarray(np.log(opacs / (1 - opacs)), jnp.float32)

    cam = Camera(position=[0, 0, -8], rotation=[1, 0, 0, 0], fov_x=np.pi / 2, fov_y=np.pi / 2)
    cp = camera_params(cam, img_size)
    tiles_x = -(-img_size[0] // TILE_WIDTH)
    tiles_y = -(-img_size[1] // TILE_WIDTH)
    num_tiles = tiles_x * tiles_y

    k_lanes = args.k_lanes
    max_isects = ((min(n * num_tiles, 1 << 22) + k_lanes - 1) // k_lanes) * k_lanes

    @jax.jit
    def prep():
        proj = project_splats(
            means, log_scales, quats, cp.viewmat, cp.focal, cp.pixel_center, img_size
        )
        cam_pos = cp.viewmat[:3, 3]
        vd = means - cam_pos
        vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True).clip(1e-12)
        color = sh_to_color(0, vd, sh)
        opac = jax.nn.sigmoid(opac_raw)
        isect = build_intersections(proj, opac, (tiles_x, tiles_y), max_isects,
                                    align=k_lanes)
        o = isect.order
        packed = pack_isect_splats(
            proj.xy[o], proj.conic[o], color[o], opac[o], isect.isect_gid,
            max_isects, k_lanes,
        )
        return (
            proj.xy[o], proj.conic[o], color[o], opac[o], packed,
            isect.isect_gid, isect.starts, isect.ends, isect.num_isects,
        )

    t0 = time.perf_counter()
    (xy, conic, color, opac, packed, isect_gid, starts, ends, num_isects) = (
        jax.block_until_ready(prep())
    )
    print(f"prep (proj+bin+sort) compile+run: {time.perf_counter()-t0:.1f}s, "
          f"num_isects={int(num_isects)}")

    # Timed prep (binning pipeline alone).
    t0 = time.perf_counter()
    for _ in range(3):
        out = prep()
    jax.block_until_ready(out)
    print(f"prep steady-state: {(time.perf_counter()-t0)/3*1000:.1f} ms")

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)

    # interp: on a CPU host the whole script runs in interpret mode as a
    # smoke test of every check (the on-chip run is the real gate).
    interp = jax.default_backend() == "cpu"
    fwd = lambda: rasterize_fwd_pallas(
        packed, starts, ends, tile_ids,
        tiles_x=tiles_x, num_tiles=num_tiles, max_isects=max_isects,
        k_lanes=k_lanes, interpret=interp,
    )
    t0 = time.perf_counter()
    img_pl, log_t, fidx = jax.block_until_ready(fwd())
    print(f"pallas fwd compile+run: {time.perf_counter()-t0:.1f}s")

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    mpix = img_size[0] * img_size[1] / 1e6
    print(f"pallas fwd: {dt*1000:.2f} ms -> {mpix/dt:.0f} Mpix/s "
          f"({int(num_isects)/dt/1e6:.0f}M isects/s)")

    if not args.skip_xla:
        raster = make_rasterizer(tiles_x, num_tiles, max_isects, 256)

        @jax.jit
        def xla_fwd():
            return raster(xy, conic, color, opac, isect_gid, starts, ends, tile_ids)

        t0 = time.perf_counter()
        img_xla = jax.block_until_ready(xla_fwd())
        print(f"xla fwd compile+run: {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter()
        for _ in range(3):
            out = xla_fwd()
        jax.block_until_ready(out)
        dt_x = (time.perf_counter() - t0) / 3
        print(f"xla fwd: {dt_x*1000:.2f} ms -> {mpix/dt_x:.0f} Mpix/s")

        diff = np.abs(np.asarray(img_pl) - np.asarray(img_xla))
        print(f"pallas vs xla: max diff {diff.max():.2e} mean {diff.mean():.2e}")
        # Sub-1/255 max tolerance: fp-ordering can flip a splat exactly at
        # the alpha >= 1/255 contribution threshold (sigma computed by MXU
        # rank-6 form vs VPU direct form); such a flip changes a pixel by at
        # most 1/255. With the sticky early-out, a death-lane flip also cuts
        # a pixel's tail at T ~ 1e-4, so saturated scenes carry an expected
        # ~1e-4 mean difference. Anything above these bounds is a real bug.
        assert diff.max() < 1.5 / 255.0, "MISMATCH"
        assert diff.mean() < 3e-4, "MISMATCH (mean)"
        print("MATCH (aligned kernel path)")

    # --- full record pipeline (expand + payload sorts + raster + bwd) ---
    from brush_tpu.render import render_splats

    def pipe_loss(backend, block):
        def f(means_, scales_, quats_, sh_, opac_):
            img, _ = render_splats(
                means_, scales_, quats_, sh_, opac_, cp, img_size,
                block_size=block, max_isects=max_isects, backend=backend,
            )
            return jnp.sum(img ** 2), img
        return jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2, 3, 4),
                                          has_aux=True))

    t0 = time.perf_counter()
    (l_p, img_p), g_p = jax.block_until_ready(
        pipe_loss("pallas", k_lanes)(means, log_scales, quats, sh, opac_raw))
    print(f"pipeline fwd+bwd compile+run: {time.perf_counter()-t0:.1f}s")
    assert all(bool(jnp.isfinite(g).all()) for g in g_p), "pipeline NaN grads"
    if not args.skip_xla:
        (l_x, img_x), g_x = jax.block_until_ready(
            pipe_loss("xla", 256)(means, log_scales, quats, sh, opac_raw))
        di = np.abs(np.asarray(img_p) - np.asarray(img_x))
        print(f"pipeline img vs xla: max {di.max():.2e} mean {di.mean():.2e}")
        # CROSS-PROGRAM bound (measured 2026-08-20, r5 bisection): the two
        # backends are separately-jitted programs, and XLA's per-program
        # fma contraction perturbs projection f32 at ulp scale — enough to
        # flip the depth-sort order of ulp-equal-depth splats. A swapped
        # pair of overlapping mid-alpha splats moves pixels by up to the
        # alpha-weighted color difference (~0.2 observed, clustered over
        # the tiles the pair covers), with NO kernel at fault: the same
        # records fed to the compiled kernel and the XLA path match to
        # 2.3e-4 (scripts/check_real_records.py), and eager (per-op)
        # execution — which keeps CPU-identical arithmetic — reproduces
        # the CPU image to 2.3e-4 with an IDENTICAL depth order
        # (scripts/check_capture.py). Both orders are valid compositions;
        # the tight kernel gate is the aligned/identical-records check
        # above. Here only systematic (mean-level) disagreement is a bug.
        assert di.mean() < 1e-3, "PIPELINE IMG MISMATCH (systematic)"
        assert di.max() < 0.5, "PIPELINE IMG MISMATCH (gross)"
        for a, b in zip(g_p, g_x):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(b).max(), 1e-3)
            bad = np.abs(a - b).max()
            # Element max allows contribution-threshold / death-lane /
            # depth-tie-order flips (the cross-program fp mechanism above);
            # the Frobenius ratio catches any systematic disagreement.
            fro = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-6)
            print(f"  grad maxdiff {bad:.2e} (scale {scale:.2e}) "
                  f"fro-ratio {fro:.2e}")
            assert fro < 1e-2, "PIPELINE GRAD MISMATCH (systematic)"
        np.savez("/tmp/tpu_check_grads.npz",
                 **{f"p{i}": np.asarray(g) for i, g in enumerate(g_p)},
                 **{f"x{i}": np.asarray(g) for i, g in enumerate(g_x)})
        print("MATCH (record pipeline fwd+bwd)")

    # --- raster-cell grouping on hardware: same bounds vs the 1x1 pallas
    # image (per-pixel compositing order is identical; only batch
    # boundaries and the cell-local quadratic frame differ) ---
    def pipe_cell(cell):
        def f(means_, scales_, quats_, sh_, opac_):
            img, _ = render_splats(
                means_, scales_, quats_, sh_, opac_, cp, img_size,
                block_size=k_lanes, max_isects=max_isects, backend="pallas",
                cell=cell,
            )
            return jnp.sum(img ** 2), img
        return jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2, 3, 4),
                                          has_aux=True))

    for cell in ((2, 2), (4, 2)):
        t0 = time.perf_counter()
        (l_c, img_c), g_c = jax.block_until_ready(
            pipe_cell(cell)(means, log_scales, quats, sh, opac_raw))
        print(f"cell {cell} fwd+bwd compile+run: {time.perf_counter()-t0:.1f}s")
        assert all(bool(jnp.isfinite(g).all()) for g in g_c), f"cell {cell} NaN grads"
        di = np.abs(np.asarray(img_c) - np.asarray(img_p))
        fro = max(
            np.linalg.norm(np.asarray(a) - np.asarray(b))
            / max(np.linalg.norm(np.asarray(b)), 1e-6)
            for a, b in zip(g_c, g_p)
        )
        print(f"cell {cell} img vs 1x1: max {di.max():.2e} grad-fro {fro:.2e}")
        assert di.max() < 1.5 / 255.0, f"CELL {cell} IMG MISMATCH"
        assert fro < 5e-3, f"CELL {cell} GRAD MISMATCH"
        print(f"MATCH (cell {cell})")

    # --- strip-local pipeline on hardware: each strip rendered with a
    # strip-restricted mask set + strip pool must reassemble to the full
    # frame (the sharded step's per-device path, minus the mesh) ---
    from brush_tpu.constants import sh_degree_from_coeffs
    from brush_tpu.ops.binning import (
        precompute_tile_masks, restrict_masks_to_strip,
    )
    from brush_tpu.ops.pallas import raster_vjp
    from brush_tpu.ops.projection import project_splats
    from brush_tpu.ops.rasterize_tiled import assemble_image
    from brush_tpu.render import pack_decode_parts

    tiles_x = -(-img_size[0] // TILE_WIDTH)
    tiles_y = -(-img_size[1] // TILE_WIDTH)
    n_strips = 4
    strip_rows = -(-tiles_y // n_strips)
    tiles_per = strip_rows * tiles_x
    pool_strip = max(-(-max_isects // 512) * 512 // 2, 512 * 4)

    @jax.jit
    def strip_render(means_, scales_, quats_, sh_, opac_):
        quats_n = quats_ / jnp.linalg.norm(
            quats_, axis=-1, keepdims=True).clip(1e-12)
        proj = project_splats(means_, scales_, quats_n, cp.viewmat, cp.focal,
                              cp.pixel_center, img_size)
        vd = means_ - cp.viewmat[:3, 3]
        vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True).clip(1e-12)
        color = sh_to_color(sh_degree_from_coeffs(sh_.shape[1]), vd, sh_)
        opac = jax.nn.sigmoid(opac_)
        masks = precompute_tile_masks(proj, opac)
        producing = proj.visible & (masks.counts > 0)
        counts_g = jnp.where(producing, masks.counts, 0)
        attrs9 = jnp.stack(
            [proj.xy[:, 0], proj.xy[:, 1], proj.conic[:, 0],
             proj.conic[:, 1], proj.conic[:, 2], color[:, 0], color[:, 1],
             color[:, 2], opac], axis=0)
        depth_bits = jax.lax.bitcast_convert_type(
            jnp.maximum(proj.depth, 1e-20), jnp.uint32)
        outs = []
        dropped = jnp.int32(0)
        raster = raster_vjp.make_pallas_pipeline(
            tiles_x, tiles_x * tiles_y, pool_strip, means_.shape[0],
            raster_tiles=tiles_per,
            interpret=jax.default_backend() == "cpu")
        for d in range(n_strips):
            r0 = d * strip_rows
            counts_d, m_lo_d, m_hi_d, tmin_y_d, bbox_h_d = (
                restrict_masks_to_strip(proj, masks, counts_g,
                                        jnp.int32(r0),
                                        jnp.int32(r0 + strip_rows)))
            bbox_w = jnp.clip(
                proj.tile_max[:, 0] - proj.tile_min[:, 0], 1, 1023)
            decode_d = pack_decode_parts(
                proj.tile_min[:, 0], tmin_y_d, bbox_w, bbox_h_d, counts_d,
                masks.small.astype(jnp.uint32), m_lo_d, m_hi_d)
            dkey = jnp.where(counts_d > 0, depth_bits, jnp.uint32(0xFFFFFFFF))
            my_tiles = r0 * tiles_x + jnp.arange(tiles_per, dtype=jnp.int32)
            img_tiles, _, _, raw = raster(attrs9, decode_d, dkey, my_tiles)
            outs.append(img_tiles)
            dropped += jnp.maximum(raw - pool_strip, 0)
        full = jnp.concatenate(outs, axis=0)[:tiles_x * tiles_y]
        return assemble_image(full, img_size, tiles_x, tiles_y), dropped

    t0 = time.perf_counter()
    img_s, dropped = jax.block_until_ready(
        strip_render(means, log_scales, quats, sh, opac_raw))
    print(f"strip pipeline compile+run: {time.perf_counter()-t0:.1f}s "
          f"dropped={int(dropped)}")
    ds = np.abs(np.asarray(img_s) - np.asarray(img_p))
    print(f"strip img vs full: max {ds.max():.2e}")
    assert int(dropped) == 0, "STRIP POOL OVERFLOW (raise pool_strip)"
    assert ds.max() < 1.5 / 255.0, "STRIP IMG MISMATCH"
    print("MATCH (strip-local pipeline)")


if __name__ == "__main__":
    main()

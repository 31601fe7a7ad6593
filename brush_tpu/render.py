"""The differentiable render pipeline (reference: brush-render/src/render.rs).

Stages (mirroring render.rs:55-323 with TPU-native mechanics):
  1. project all splats densely with a validity mask       (ProjectSplats)
  2. exact per-tile pretest -> 64-bit coverage bitmasks    (ProjectVisible's
     tile-count loop; ops/binning.py pretest)
  3. SH color + opacity for all splats                     (ProjectVisible)
  4. depth ordering: ONE variadic sort on bitcast-u32 depth keys carrying
     every per-splat attribute as payload                  (DepthSort)
  5. record pipeline: Pallas one-hot expansion + variadic tile sort +
     Pallas tile rasterizer with custom VJP                (MapGaussians...,
     TileSort, GetTileBinEdges, Rasterize/RasterizeBackwards —
     see ops/pallas/)

On CPU (and as the correctness oracle for the kernels) the same records are
built by the XLA path: ops/binning.py + ops/rasterize_tiled.py.

Differentiation: stages 1-4 are plain traced JAX (autodiff replaces the
hand-written project_backwards.wgsl / gather_grads.wgsl VJPs); stage 5
carries the custom VJP.

The reference threads a zero "xys_dummy" parameter through its autodiff op
so screen-space gradients surface for densification (gaussian_splats.rs:32,
render.rs:606-608). Same trick here: `xy_dummy` is added to the projected
centers, so d(loss)/d(xy_dummy) lands at *global* splat indices.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from brush_tpu.constants import TILE_WIDTH, sh_degree_from_coeffs
from brush_tpu.ops.binning import build_intersections, precompute_tile_masks
from brush_tpu.ops.projection import project_splats
from brush_tpu.ops.rasterize_reference import CameraParams
from brush_tpu.ops.rasterize_tiled import assemble_image, make_rasterizer
from brush_tpu.ops.sh import sh_to_color


class RenderAux(NamedTuple):
    """Side outputs of a render (reference: RenderAux, lib.rs:21-33)."""

    num_visible: jnp.ndarray   # () int32
    num_isects: jnp.ndarray    # () int32
    num_dropped: jnp.ndarray   # () int32 records lost to pool overflow
    visible: jnp.ndarray       # (N,) bool, global order
    order: jnp.ndarray         # (N,) depth order: compact -> global id
    producing: jnp.ndarray     # (N,) bool, global order: emits >=1 record


def default_max_isects(n: int, img_size, cap: int = 1 << 23) -> int:
    """Static intersection-pool size.

    The reference caps its intersection buffer at min(N*tiles, 128*65535)
    because wasm cannot read back the true count (render.rs:199-208); we cap
    for the same static-shape reason. Because binning applies the exact tile
    test *before* expansion (ops/binning.py pretest), the pool only needs to
    hold exact hits — 8 slots/splat covers typical trained scenes with slack,
    and every pool-sized op's cost scales with this static size.
    """
    tiles = (-(-int(img_size[0]) // TILE_WIDTH)) * (-(-int(img_size[1]) // TILE_WIDTH))
    # Floor of 64k slots: at small N (early training, train2d's 32 splats)
    # a single large gaussian can legitimately cover hundreds of tiles, so
    # n*8 alone would truncate. Overflow is observable via
    # RenderAux.num_dropped either way.
    return min(max(n * 8, 64 * 1024), n * tiles, cap)


def pack_decode_rows(proj, masks, counts_g, cell=(1, 1)) -> jnp.ndarray:
    """Pack the per-splat decode state into 3 uint32 rows.

    The depth sort carries every per-splat quantity as a sort payload (a
    gather after the sort would cost ~20ns per index); packing the
    small-integer decode quantities into 3 u32 rows cuts the sorted bytes.
    Byte popcounts (round 2's pc_pack row) are derived in-kernel by the
    expand kernel's SWAR select, and the per-splat record count (round 3's
    d1 row) is recomputed AFTER the sort from the other fields — small
    splats by a SWAR popcount of the mask halves, bbox splats as
    bbox_w * bbox_h — so neither rides the sort. Layout (unpacked in
    raster_vjp._fwd_impl):

      row 0: tmin_x (10b) | small << 10 | tmin_y << 11 (11b) | bbox_w << 22
      row 1: mask_lo for small splats; clipped bbox_h for bbox splats
             (their 64-bit mask is meaningless and never read)
      row 2: mask_hi

    Rows 1-2 are zeroed for non-producing splats so the recomputed counts
    vanish exactly where the depth key is the sentinel.

    cell=(gw, gh): coordinates and bbox are in raster-cell units (must
    match the `cell` passed to precompute_tile_masks — the mask bit ranks
    decode against this bbox).
    """
    from brush_tpu.ops.binning import cell_bbox

    cmin_x, cmin_y, cmax_x, cmax_y = cell_bbox(proj, cell)
    bbox_w = jnp.clip(cmax_x - cmin_x, 1, 1023)
    bbox_h = jnp.maximum(cmax_y - cmin_y, 1)
    return pack_decode_parts(
        cmin_x, cmin_y, bbox_w, bbox_h, counts_g,
        masks.small, masks.mask_lo, masks.mask_hi,
    )


def pack_decode_parts(tmin_x, tmin_y, bbox_w, bbox_h, counts, small, m_lo,
                      m_hi):
    """pack_decode_rows from explicit components (the sharded strip path
    substitutes strip-restricted counts/masks/tmin_y/bbox_h — see
    ops/binning.restrict_masks_to_strip)."""
    u32 = lambda v: v.astype(jnp.uint32)
    small_b = small.astype(bool)
    prod = counts > 0
    d0 = (u32(tmin_x) | (u32(small_b) << 10) | (u32(tmin_y) << 11)
          | (u32(bbox_w) << 22))
    stash = jnp.where(small_b, m_lo, u32(bbox_h))
    d1 = jnp.where(prod, stash, jnp.uint32(0))
    d2 = jnp.where(prod, m_hi, jnp.uint32(0))
    return jnp.stack([d0, d1, d2], axis=0)


def pack_rgba_u32(img: jnp.ndarray) -> jnp.ndarray:
    """(h, w, 4) float RGBA -> (h, w) uint32 packed RGBA8.

    The reference's display path packs inside the kernel when
    render_u32_buffer is set (rasterize.wgsl:106-109); packing the float
    image afterwards yields identical bytes and keeps one kernel variant.
    """
    q = jnp.clip(img * 255.0, 0.0, 255.0).astype(jnp.uint32)
    return q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16) | (q[..., 3] << 24)


def _render_pallas(xy, conic, color, opac, proj, masks, tiles_x, tiles_y,
                   max_isects, k_lanes, interpret, scan_passes=2,
                   pack_grad_sort=True, cell=(1, 1), needs_grad=True,
                   bwd_tiles_per_step=None):
    """TPU record pipeline (see ops/pallas/raster_vjp.py).

    xy/conic/color/opac are differentiable; proj/masks are stop-gradient
    integer bookkeeping (depth keys, tile bboxes, coverage bitmasks). All
    sorts/expansions live inside the pipeline's custom VJP.

    cell=(gw, gh): tiles_x/tiles_y must then be the CELL grid dims and
    masks must come from precompute_tile_masks(..., cell=cell); the whole
    pipeline runs in the cell domain (one record per splat x cell).
    """
    from brush_tpu.ops.pallas.raster_vjp import make_pallas_pipeline

    n = xy.shape[0]
    num_tiles = tiles_x * tiles_y

    producing = proj.visible & (masks.counts > 0)
    counts_g = jnp.where(producing, masks.counts, 0)

    depth_bits = jax.lax.bitcast_convert_type(
        jnp.maximum(proj.depth, 1e-20), jnp.uint32
    )
    depth_key = jnp.where(producing, depth_bits, jnp.uint32(0xFFFFFFFF))

    attrs9 = jnp.stack(
        [xy[:, 0], xy[:, 1], conic[:, 0], conic[:, 1], conic[:, 2],
         color[:, 0], color[:, 1], color[:, 2], opac], axis=0,
    )  # (9, n), global order, differentiable
    decode = pack_decode_rows(proj, masks, counts_g, cell=cell)
    decode = jax.lax.stop_gradient(decode)

    raster = make_pallas_pipeline(
        tiles_x, num_tiles, max_isects, n, k_lanes=k_lanes,
        interpret=interpret, scan_passes=scan_passes,
        pack_grad_sort=pack_grad_sort, cell=cell, needs_grad=needs_grad,
        bwd_tiles_per_step=bwd_tiles_per_step,
    )
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    img_tiles, order, total, raw_total = raster(
        attrs9, decode, depth_key, tile_ids
    )
    num_isects = jnp.minimum(total, max_isects).astype(jnp.int32)
    num_dropped = jnp.maximum(raw_total - max_isects, 0).astype(jnp.int32)
    return img_tiles, order, num_isects, num_dropped, producing


def render_splats(
    means: jnp.ndarray,
    log_scales: jnp.ndarray,
    quats: jnp.ndarray,
    sh_coeffs: jnp.ndarray,
    raw_opacity: jnp.ndarray,
    cam: CameraParams,
    img_size,
    xy_dummy: jnp.ndarray | None = None,
    active: jnp.ndarray | None = None,
    max_isects: int | None = None,
    block_size: int = 32,
    backend: str = "auto",
    scan_passes: int = 2,
    pack_grad_sort: bool = True,
    cell: tuple = (1, 1),
    needs_grad: bool = True,
    bwd_tiles_per_step: int | None = None,
) -> tuple[jnp.ndarray, RenderAux]:
    """Render (h, w, 4) RGBA. img_size is (w, h) static.

    quats are normalized internally (gaussian_splats.rs:174-175).
    backend: "xla" (lockstep while_loop implementation), "pallas" (TPU
    kernels; interpret mode on CPU), or "auto" (pallas on TPU-like
    platforms, xla on CPU).
    scan_passes / pack_grad_sort / cell are pallas-path perf knobs (see
    ops/pallas/rasterize_fwd._cumsum_lanes_mxu and
    raster_vjp.make_pallas_pipeline). The default scan_passes=2 truncates
    the in-kernel log-T scan input to 16 mantissa bits — lossy but bounded
    (<= 2^-16 relative on log T; measured 2e-7 image delta at the bench
    config); scan_passes=3 recovers exactness. pack_grad_sort defaults ON since
    round 5 — the backward's conic/color per-record cotangents ride the
    grad re-sort as bf16 pairs (10 -> 7 pool-scale payload rows,
    measured -6 ms/step at the 1M bench point) — gated by a 9k-iter
    training run matching the exact pipeline within 0.05 dB at every
    eval (docs/RESULTS.md round-5 appendix); pack_grad_sort=False
    recovers exact f32 cotangents. cell=(1, 1) is exact. bwd_tiles_per_step overrides the
    backward raster kernel's tiles-per-grid-step clamp (default: the
    fwd's tiles_per_step clamped to 4 — see raster_vjp).
    cell=(gw, gh) rasterizes in cells of gw x gh tiles: one record per
    splat x cell shrinks every pool-scale stage by the multi-tile-coverage
    factor at the cost of sweeping 256*gw*gh pixels per record.
    needs_grad=False (pallas path) builds the inference-only pipeline —
    two fewer pool-scale sort payloads, bit-identical image, grads raise;
    eval/viewer/render callers use it (the reference's fwd-only u32 raster
    mode, rasterize.wgsl:106-109). aux.order is zeros there.
    """
    n = means.shape[0]
    w, h = int(img_size[0]), int(img_size[1])
    tiles_x = -(-w // TILE_WIDTH)
    tiles_y = -(-h // TILE_WIDTH)
    if backend == "auto":
        backend = "xla" if jax.default_backend() == "cpu" else "pallas"
    if max_isects is None:
        max_isects = default_max_isects(n, img_size)
    if backend == "pallas":
        k_lanes = max(128, block_size)
        # Pool must tile both k_lanes and k_exp (512): lcm, not max — for
        # non-power-of-two blocks (192, 384, ...) max(k_lanes, 512) is not
        # a multiple of k_lanes and the pipeline would assert at trace time.
        k_align = math.lcm(k_lanes, 512)
        max_isects = -(-max_isects // k_align) * k_align
    else:
        k_lanes = block_size

    quats_n = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True).clip(1e-12)

    proj = project_splats(
        means, log_scales, quats_n,
        cam.viewmat, cam.focal, cam.pixel_center, img_size, active=active,
    )

    # SH color (project_visible.wgsl:232-235; see camera.py for the viewdir
    # convention quirk replicated here).
    cam_pos = cam.viewmat[:3, 3]
    viewdir = means - cam_pos
    viewdir = viewdir / jnp.linalg.norm(viewdir, axis=-1, keepdims=True).clip(1e-12)
    viewdir = jax.lax.stop_gradient(viewdir)
    sh_degree = sh_degree_from_coeffs(sh_coeffs.shape[1])
    color = sh_to_color(sh_degree, viewdir, sh_coeffs)
    opac = jax.nn.sigmoid(raw_opacity)

    xy = proj.xy
    if xy_dummy is not None:
        xy = xy + xy_dummy

    num_tiles = tiles_x * tiles_y
    if backend == "pallas":
        cells_x = -(-tiles_x // cell[0])
        cells_y = -(-tiles_y // cell[1])
        proj_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, proj)
        masks = precompute_tile_masks(proj_sg, jax.lax.stop_gradient(opac),
                                      cell=cell)
        img_tiles, order, num_isects, num_dropped, producing = _render_pallas(
            xy, proj.conic, color, opac, proj_sg, masks, cells_x, cells_y,
            max_isects, k_lanes,
            interpret=jax.default_backend() == "cpu",
            scan_passes=scan_passes, pack_grad_sort=pack_grad_sort,
            cell=cell, needs_grad=needs_grad,
            bwd_tiles_per_step=bwd_tiles_per_step,
        )
        num_visible = jnp.sum(proj.visible).astype(jnp.int32)
        aux = RenderAux(
            num_visible=num_visible,
            num_isects=num_isects,
            num_dropped=num_dropped,
            visible=proj.visible,
            order=order,
            producing=producing,
        )
        img = assemble_image(img_tiles, img_size, cells_x, cells_y,
                             cell=cell)
        return img, aux

    # ---- XLA path (CPU correctness/fallback) ----
    isect = build_intersections(
        jax.tree_util.tree_map(jax.lax.stop_gradient, proj),
        jax.lax.stop_gradient(opac),
        (tiles_x, tiles_y),
        max_isects,
        align=1,
    )
    order = isect.order

    # Differentiable gather into depth-compact order: cotangents scatter
    # back to global splat indices automatically. One fused (N, 9) row
    # gather — TPU gathers cost per *index*, not per byte, so four separate
    # gathers would cost 4x.
    attrs = jnp.concatenate(
        [xy, proj.conic, color, opac[:, None]], axis=1
    )[order]
    raster = make_rasterizer(tiles_x, num_tiles, max_isects, block_size)
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    img_tiles = raster(
        attrs[:, 0:2], attrs[:, 2:5], attrs[:, 5:8], attrs[:, 8],
        isect.isect_gid, isect.starts, isect.ends, tile_ids,
    )
    img = assemble_image(img_tiles, img_size, tiles_x, tiles_y)

    aux = RenderAux(
        num_visible=isect.num_visible,
        num_isects=isect.num_isects,
        num_dropped=isect.num_dropped,
        visible=proj.visible,
        order=order,
        producing=isect.producing,
    )
    return img, aux

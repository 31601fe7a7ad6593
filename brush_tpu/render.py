"""The differentiable render pipeline (reference: brush-render/src/render.rs).

Stages (mirroring render.rs:55-323 with TPU-native mechanics):
  1. project all splats densely with a validity mask       (ProjectSplats)
  2. depth ordering via one sort over the padded array     (DepthSort)
  3. SH color + opacity for all splats                     (ProjectVisible)
  4. static-pool intersection expansion + tile sort + bins (MapGaussians...,
     TileSort, GetTileBinEdges — see ops/binning.py)
  5. tiled rasterization with custom VJP                   (Rasterize /
     RasterizeBackwards — see ops/rasterize_tiled.py)

Differentiation: stages 1 and 3 are plain traced JAX (autodiff replaces the
hand-written project_backwards.wgsl / gather_grads.wgsl VJPs); stage 4 is
integer bookkeeping under stop_gradient; stage 5 carries the custom VJP.

The reference threads a zero "xys_dummy" parameter through its autodiff op
so screen-space gradients surface for densification (gaussian_splats.rs:32,
render.rs:606-608). Same trick here: `xy_dummy` is added to the projected
centers, so d(loss)/d(xy_dummy) lands at *global* splat indices.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from brush_tpu.constants import TILE_WIDTH, sh_degree_from_coeffs
from brush_tpu.ops.binning import build_intersections
from brush_tpu.ops.projection import project_splats
from brush_tpu.ops.rasterize_reference import CameraParams
from brush_tpu.ops.rasterize_tiled import assemble_image, make_rasterizer
from brush_tpu.ops.sh import sh_to_color


class RenderAux(NamedTuple):
    """Side outputs of a render (reference: RenderAux, lib.rs:21-33)."""

    num_visible: jnp.ndarray   # () int32
    num_isects: jnp.ndarray    # () int32
    visible: jnp.ndarray       # (N,) bool, global order
    order: jnp.ndarray         # (N,) depth order: compact -> global id


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
    return min(n * 8, n * tiles, cap)


def pack_rgba_u32(img: jnp.ndarray) -> jnp.ndarray:
    """(h, w, 4) float RGBA -> (h, w) uint32 packed RGBA8.

    The reference's display path packs inside the kernel when
    render_u32_buffer is set (rasterize.wgsl:106-109); packing the float
    image afterwards yields identical bytes and keeps one kernel variant.
    """
    q = jnp.clip(img * 255.0, 0.0, 255.0).astype(jnp.uint32)
    return q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16) | (q[..., 3] << 24)


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
) -> tuple[jnp.ndarray, RenderAux]:
    """Render (h, w, 4) RGBA. img_size is (w, h) static.

    quats are normalized internally (gaussian_splats.rs:174-175).
    backend: "xla" (lockstep while_loop implementation), "pallas" (TPU
    kernels), or "auto" (pallas on TPU-like platforms, xla on CPU).
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
        max_isects = -(-max_isects // k_lanes) * k_lanes
        align = k_lanes
    else:
        align = 1

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

    # Integer index bookkeeping — no gradients flow through it.
    isect = build_intersections(
        jax.tree_util.tree_map(jax.lax.stop_gradient, proj),
        jax.lax.stop_gradient(opac),
        (tiles_x, tiles_y),
        max_isects,
        align=align,
    )
    order = isect.order

    xy = proj.xy
    if xy_dummy is not None:
        xy = xy + xy_dummy

    # Differentiable gather into depth-compact order: cotangents scatter
    # back to global splat indices automatically. One fused (N, 9) row
    # gather — TPU gathers cost per *index*, not per byte, so four separate
    # gathers would cost 4x.
    attrs = jnp.concatenate(
        [xy, proj.conic, color, opac[:, None]], axis=1
    )[order]
    num_tiles = tiles_x * tiles_y
    if backend == "pallas":
        from brush_tpu.ops.pallas.raster_vjp import make_pallas_rasterizer

        raster = make_pallas_rasterizer(tiles_x, num_tiles, max_isects, k_lanes)
    else:
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
        visible=proj.visible,
        order=order,
    )
    return img, aux

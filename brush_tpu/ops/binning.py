"""Tile binning: map splats to (tile, splat) intersection records.

The reference builds this with GPU-side atomic compaction, two radix sorts
and an indirect-dispatched expansion kernel (reference: render.rs:123-265,
map_gaussian_to_intersects.wgsl, get_tile_bin_edges.wgsl). TPU/XLA has no
atomics or dynamic dispatch, so the same structure is built with static
shapes:

- depth ordering: one `sort` over the padded splat array with +inf keys for
  culled splats (replaces brush-sort's 32-bit radix argsort + compaction);
- expansion: a fixed pool of MAX_ISECTS intersection slots. Slot -> splat
  mapping is recovered with a scatter + cummax over bbox-area prefix sums
  (no searchsorted, O(MAX_ISECTS)); each slot decodes its tile from its rank
  inside the splat's tile bbox.
- the exact ellipse/AABB tile test (helpers.wgsl:220-279) is applied per
  *slot* rather than twice per splat; rejected slots get a sentinel key and
  sort to the end, which reproduces the reference's intersection list
  exactly (same records, same order).
- tile ranges come from searchsorted over the sorted keys (replaces
  get_tile_bin_edges.wgsl boundary detection).

The whole pipeline is index bookkeeping — gradients never flow through it
(mirrors the reference, where these buffers are plain integer workspaces).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from brush_tpu.constants import TILE_WIDTH
from brush_tpu.ops.projection import Projection


def _check_edge(p1x, p1y, p2x, p2y, ex, ey, ca, cb, cc):
    """Segment vs unit-level-set-of-conic intersection (helpers.wgsl:220-236)."""
    dx = p2x - p1x
    dy = p2y - p1y
    fx = p1x - ex
    fy = p1y - ey
    # dot(v * conic, w) with conic = [[ca, cb], [cb, cc]]
    a = dx * (ca * dx + cb * dy) + dy * (cb * dx + cc * dy)
    b = 2.0 * (fx * (ca * dx + cb * dy) + fy * (cb * dx + cc * dy))
    c = fx * (ca * fx + cb * fy) + fy * (cb * fx + cc * fy) - 1.0
    disc = b * b - 4.0 * a * c
    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
    denom = 2.0 * a
    t1 = (-b - sqrt_disc) / denom
    t2 = (-b + sqrt_disc) / denom
    hit = ((t1 >= 0.0) & (t1 <= 1.0)) | ((t2 >= 0.0) & (t2 <= 1.0))
    return (disc >= 0.0) & hit


def ellipse_intersects_aabb(box_x, box_y, ext, ex, ey, ca, cb, cc):
    """Ellipse (conic level set 1) vs AABB test (helpers.wgsl:238-262)."""
    dx_c = ex - box_x
    dy_c = ey - box_y
    center_inside = (jnp.abs(dx_c) <= ext) & (jnp.abs(dy_c) <= ext)

    sx = jnp.sign(dx_c)
    sy = jnp.sign(dy_c)
    nx = box_x + sx * ext
    ny = box_y + sy * ext
    cpx = nx - ex
    cpy = ny - ey
    corner_inside = cpx * (ca * cpx + cb * cpy) + cpy * (cb * cpx + cc * cpy) <= 1.0

    e1x = nx - sx * 2.0 * ext
    e2y = ny - sy * 2.0 * ext
    edge1 = _check_edge(nx, ny, e1x, ny, ex, ey, ca, cb, cc)
    edge2 = _check_edge(nx, ny, nx, e2y, ex, ey, ca, cb, cc)
    return center_inside | corner_inside | edge1 | edge2


def can_be_visible(tile_x, tile_y, xy, conic, opac):
    """Does the splat's 1/255-alpha iso-ellipse touch this tile?

    (helpers.wgsl:264-279). tile_x/tile_y are integer tile coords.
    """
    sigma = jnp.log(opac * 255.0)
    scale = 1.0 / (2.0 * sigma)
    ca = conic[..., 0] * scale
    cb = conic[..., 1] * scale
    cc = conic[..., 2] * scale
    ext = float(TILE_WIDTH) / 2.0
    cx = tile_x.astype(jnp.float32) * TILE_WIDTH + ext
    cy = tile_y.astype(jnp.float32) * TILE_WIDTH + ext
    hit = ellipse_intersects_aabb(cx, cy, ext, xy[..., 0], xy[..., 1], ca, cb, cc)
    return (sigma > 0.0) & hit


class Intersections(NamedTuple):
    """Static-shape intersection workspace (all integer index bookkeeping)."""

    order: jnp.ndarray        # (N,) depth order: compact -> global splat id
    isect_gid: jnp.ndarray    # (MAX_ISECTS,) intersection -> compact splat id
    starts: jnp.ndarray       # (num_tiles,) range start per tile
    ends: jnp.ndarray         # (num_tiles,) range end per tile (exclusive)
    num_visible: jnp.ndarray  # () int32
    num_isects: jnp.ndarray   # () int32 (records surviving the exact test)


def build_intersections(
    proj: Projection,
    opac: jnp.ndarray,
    tile_bounds: tuple[int, int],
    max_isects: int,
    align: int = 1,
) -> Intersections:
    """Build depth-then-tile ordered intersection records.

    All inputs are in *global* (unsorted) splat order; outputs index the
    depth-compact order via `order`.

    align > 1 pads each tile's range so starts are multiples of `align`
    (padding slots carry an out-of-range splat id). The Pallas kernels need
    this: HBM DMA windows must sit on lane-tiling boundaries, and aligned
    disjoint per-tile regions also keep backward gradient writes race-free.
    """
    n = proj.xy.shape[0]
    tiles_x, tiles_y = tile_bounds
    num_tiles = tiles_x * tiles_y

    # --- depth sort (replaces radix_argsort, render.rs:151-156) ---
    depth_key = jnp.where(proj.visible, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key)  # stable
    num_visible = jnp.sum(proj.visible).astype(jnp.int32)

    xy = proj.xy[order]
    conic = proj.conic[order]
    opac_c = opac[order]
    tmin = proj.tile_min[order]
    tmax = proj.tile_max[order]
    visible = proj.visible[order]

    # --- expansion offsets from bbox areas ---
    bbox_w = (tmax[:, 0] - tmin[:, 0]).astype(jnp.int32)
    bbox_h = (tmax[:, 1] - tmin[:, 1]).astype(jnp.int32)
    areas = jnp.where(visible, bbox_w * bbox_h, 0)
    cum = jnp.cumsum(areas)
    offsets = cum - areas
    total = cum[-1]

    # --- slot -> compact splat id via scatter + cummax ---
    scatter_idx = jnp.where(areas > 0, offsets, max_isects)  # dropped if ==max
    marks = jnp.zeros((max_isects,), jnp.int32).at[scatter_idx].max(
        jnp.arange(n, dtype=jnp.int32) + 1, mode="drop"
    )
    slot_splat = jax.lax.cummax(marks) - 1  # -1 before first offset
    slot = jnp.arange(max_isects, dtype=jnp.int32)
    splat = jnp.clip(slot_splat, 0, n - 1)

    rank = slot - offsets[splat]
    w = jnp.maximum(bbox_w[splat], 1)
    tile_x = tmin[splat, 0] + rank % w
    tile_y = tmin[splat, 1] + rank // w
    tile_id = tile_y * tiles_x + tile_x

    in_pool = (slot_splat >= 0) & (slot < total)
    exact = can_be_visible(tile_x, tile_y, xy[splat], conic[splat], opac_c[splat])
    valid = in_pool & exact

    # --- tile sort (replaces the second radix sort + bin edges kernel) ---
    # When tile and slot ids fit one u32 together, pack them and sort a
    # single array: the low slot bits carry the depth order, so stability is
    # free and the sort moves half the bytes. (The reference's radix sort
    # instead restricts the *bit count* per sort, README.md:87.)
    key = jnp.where(valid, tile_id, num_tiles)
    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    slot_bits = 32 - tile_bits
    if max_isects <= (1 << slot_bits):
        packed = (key.astype(jnp.uint32) << slot_bits) | slot.astype(jnp.uint32)
        sorted_packed = jax.lax.sort(packed)
        sorted_key = (sorted_packed >> slot_bits).astype(jnp.int32)
        slot_of = (sorted_packed & ((1 << slot_bits) - 1)).astype(jnp.int32)
        isect_gid = splat[slot_of]
    else:
        sorted_key, isect_gid = jax.lax.sort_key_val(key, splat, is_stable=True)

    boundaries = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    tile_bins = jnp.searchsorted(sorted_key, boundaries, side="left").astype(jnp.int32)
    num_isects = tile_bins[-1]

    if align <= 1:
        return Intersections(
            order=order,
            isect_gid=isect_gid,
            starts=tile_bins[:-1],
            ends=tile_bins[1:],
            num_visible=num_visible,
            num_isects=num_isects,
        )

    # --- aligned re-layout for the Pallas kernels ---
    counts = tile_bins[1:] - tile_bins[:-1]
    aligned_counts = -(-counts // align) * align
    aligned_starts = jnp.cumsum(aligned_counts) - aligned_counts
    starts = jnp.minimum(aligned_starts, max_isects).astype(jnp.int32)
    ends = jnp.minimum(aligned_starts + counts, max_isects).astype(jnp.int32)

    sorted_tile = jnp.clip(sorted_key, 0, num_tiles - 1)
    rank = slot - tile_bins[:-1][sorted_tile]
    new_pos = aligned_starts[sorted_tile] + rank
    new_pos = jnp.where(sorted_key < num_tiles, new_pos, max_isects)
    # Padding / overflow slots carry splat id n: scatter-adds in the
    # backward drop them (out-of-range index).
    gid_aligned = jnp.full((max_isects,), n, jnp.int32).at[new_pos].set(
        isect_gid, mode="drop"
    )

    return Intersections(
        order=order,
        isect_gid=gid_aligned,
        starts=starts,
        ends=ends,
        num_visible=num_visible,
        num_isects=num_isects,
    )

"""Tile binning: map splats to (tile, splat) intersection records.

The reference builds this with GPU-side atomic compaction, two radix sorts
and an indirect-dispatched expansion kernel (reference: render.rs:123-265,
map_gaussian_to_intersects.wgsl, get_tile_bin_edges.wgsl). TPU/XLA has no
atomics or dynamic dispatch, so the same structure is built with static
shapes — and, because TPU gathers/scatters cost ~20ns *per index* regardless
of row width, the design minimises the number of indexed memory ops:

- **exact-test pretest** (mirrors project_visible.wgsl counting its exact
  per-tile hits before expansion): each splat evaluates the ellipse/AABB
  test (helpers.wgsl:220-279) densely over its tile bbox (up to 64 tiles)
  and packs the passing tiles into a 64-bit mask + per-byte popcounts. The
  intersection pool then holds only *exact* hits — typically 3-4x fewer
  slots than bbox-area expansion, and every pool-sized op shrinks with it.
  Splats with bbox_w > 8 or bbox_h > 8 fall back to conservative bbox
  expansion (the mask rides a fixed 8x8 layout);
  their extra records have alpha < 1/255 in the tile and are culled by the
  rasterizer's alpha cut, so images are identical (only num_isects differs
  from the reference when such splats exist).
- depth ordering: positive-float keys bitcast to u32 (monotone for
  depth > 0, same trick as the reference's 32-bit radix argsort on float
  bits, render.rs:153-156) sorted with an index payload;
- expansion: a fixed pool of MAX_ISECTS slots; slot -> splat recovered with
  one scatter-add at segment starts + a cumsum; the slot's tile decodes
  from its rank via the bitmask (select rank-th set bit using the
  precomputed byte popcounts). Integer div/mod by dynamic divisors is
  avoided (slow on TPU) in favour of exact float division with fixup. All
  per-splat decode state rides in one (N, 8) row array so the per-slot
  lookup is a single row gather;
- tile grouping: one u32 sort of (tile_id << slot_bits | slot) — the low
  slot bits carry the depth order, so stability is free and the sort moves
  half the bytes. Tile ranges come from searchsorted over the sorted keys
  (replaces get_tile_bin_edges.wgsl boundary detection);
- the align>1 re-layout is gather-free: with per-run padding assigned at
  run *ends*, every record's aligned position is simply
  `iota + exclusive_cumsum(end_pads)`.

The whole pipeline is index bookkeeping — gradients never flow through it
(mirrors the reference, where these buffers are plain integer workspaces).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from brush_tpu.constants import TILE_WIDTH
from brush_tpu.ops.projection import Projection

MASK_BITS = 64  # bbox tiles covered by the exact-pretest bitmask


def _edge_hits(a, half_b, c):
    """Axis-aligned segment vs conic-INTERIOR hit, sqrt- and division-free.

    The segment is t in [0, 1] along one box edge; f(t) = a t^2 + 2 half_b t
    + c is the conic quadratic with a > 0 (positive-definite conic) and
    f <= 0 inside the ellipse. The segment touches the interior iff f <= 0
    somewhere on [0, 1]:
      - f(0) <= 0 (start corner inside), or
      - f(1) <= 0 (end corner inside), or
      - the vertex lies in [0, 1] and f there <= 0:
        t* = -half_b / a in [0, 1]  <=>  0 <= -half_b <= a, and
        min f = c - half_b^2/a <= 0  <=>  half_b^2 >= a c.
    This replaces the reference's root formula (helpers.wgsl:220-236) —
    two sqrts + four divisions per edge per (bbox slot, splat) in the
    dense (64, N) pretest — with sign tests on the same polynomial; the
    accepted set is identical in real arithmetic (boundary-grazing f32
    flips are the usual measure-zero class the golden tolerances cover).
    The a > 0 guard keeps the vertex clause off degenerate conics (a
    diagonal entry underflowing to exactly 0), where f is linear and the
    endpoint clauses alone are the right test; there the root formula
    produced NaN roots and rejected even endpoint-inside edges — this
    form accepts them, which is the safe direction (a spurious record is
    culled by the rasterizer's alpha cut; a missed one would hole the
    image).
    """
    return (
        (c <= 0.0)
        | (a + 2.0 * half_b + c <= 0.0)
        | ((half_b * half_b >= a * c) & (half_b <= 0.0) & (-half_b <= a)
           & (a > 0.0))
    )


def ellipse_intersects_aabb(box_x, box_y, ext_x, ext_y, ex, ey, ca, cb, cc):
    """Ellipse (conic level set 1) vs AABB test (helpers.wgsl:238-262).

    Generalized to rectangular boxes (ext_x, ext_y half-extents) so the
    same test covers single tiles and gw x gh tile cells. Decisions match
    the reference's center/corner/edge formulation exactly (see
    _edge_hits); the reference's explicit nearest-corner-inside clause is
    _edge_hits' f(0) <= 0 term, and each edge's far corner is covered by
    the f(1) <= 0 term of that edge.
    """
    dx_c = ex - box_x
    dy_c = ey - box_y
    center_inside = (jnp.abs(dx_c) <= ext_x) & (jnp.abs(dy_c) <= ext_y)

    # Nearest corner to the ellipse center, and the conic's value/gradient
    # there (shared by both edge quadratics: f_edge(t) = Q(cp + t d) - 1
    # with d axis-aligned, so half_b = d . (gx, gy) and a = d^T C d).
    sx = jnp.sign(dx_c)
    sy = jnp.sign(dy_c)
    cpx = box_x + sx * ext_x - ex
    cpy = box_y + sy * ext_y - ey
    gx = ca * cpx + cb * cpy
    gy = cb * cpx + cc * cpy
    c = cpx * gx + cpy * gy - 1.0

    dx1 = -sx * (2.0 * ext_x)       # horizontal edge: nearest -> far corner
    dy2 = -sy * (2.0 * ext_y)       # vertical edge
    edge1 = _edge_hits(ca * (4.0 * ext_x * ext_x), dx1 * gx, c)
    edge2 = _edge_hits(cc * (4.0 * ext_y * ext_y), dy2 * gy, c)
    return center_inside | edge1 | edge2


def can_be_visible(tile_x, tile_y, xy, conic, opac, cell=(1, 1)):
    """Does the splat's 1/255-alpha iso-ellipse touch this raster cell?

    (helpers.wgsl:264-279). tile_x/tile_y are integer CELL coords; a cell
    is cell=(gw, gh) image tiles (the default is one tile, the reference's
    granularity). A cell is hit iff some constituent tile's box intersects
    the ellipse — the union-box test is exact for that.
    """
    gw, gh = cell
    sigma = jnp.log(opac * 255.0)
    scale = 1.0 / (2.0 * sigma)
    ca = conic[..., 0] * scale
    cb = conic[..., 1] * scale
    cc = conic[..., 2] * scale
    ext_x = float(TILE_WIDTH * gw) / 2.0
    ext_y = float(TILE_WIDTH * gh) / 2.0
    cx = tile_x.astype(jnp.float32) * (TILE_WIDTH * gw) + ext_x
    cy = tile_y.astype(jnp.float32) * (TILE_WIDTH * gh) + ext_y
    hit = ellipse_intersects_aabb(cx, cy, ext_x, ext_y,
                                  xy[..., 0], xy[..., 1], ca, cb, cc)
    return (sigma > 0.0) & hit


def _floor_div(a_int, b_float, b_int):
    """Exact floor(a / b) for non-negative int32 a and small positive b.

    Float division is correctly rounded but can land on the wrong side of an
    integer boundary; two fixups make the result exact. Dynamic-divisor
    integer div/mod lowers very slowly on TPU — this stays on the float VPU.
    """
    y = jnp.floor(a_int.astype(jnp.float32) / b_float).astype(jnp.int32)
    r = a_int - y * b_int
    y = jnp.where(r < 0, y - 1, y)
    r = a_int - y * b_int
    y = jnp.where(r >= b_int, y + 1, y)
    return y


class TileMasks(NamedTuple):
    """Per-splat exact-pretest results (global splat order)."""

    counts: jnp.ndarray    # (N,) int32 exact (or conservative) record count
    mask_lo: jnp.ndarray   # (N,) uint32 bits 0-31 of the bbox hit mask
    mask_hi: jnp.ndarray   # (N,) uint32 bits 32-63
    pc_pack: jnp.ndarray   # (N,) uint32 popcount of each mask byte, 4b each
    small: jnp.ndarray     # (N,) bool — mask is authoritative (fits 8x8:
                           # bbox_w <= 8 AND bbox_h <= 8)


def cell_bbox(proj: Projection, cell):
    """Tile bbox -> raster-cell bbox (inclusive min, exclusive max, width).

    A raster cell is cell=(gw, gh) image tiles; at (1, 1) this is the
    identity on the tile bbox. Static divisors keep the div on fast paths.
    """
    gw, gh = cell
    cmin_x = proj.tile_min[:, 0] // gw
    cmin_y = proj.tile_min[:, 1] // gh
    cmax_x = (proj.tile_max[:, 0] + (gw - 1)) // gw
    cmax_y = (proj.tile_max[:, 1] + (gh - 1)) // gh
    return cmin_x, cmin_y, cmax_x, cmax_y


def precompute_tile_masks(proj: Projection, opac: jnp.ndarray,
                          cell=(1, 1)) -> TileMasks:
    """Evaluate the exact tile test densely over each splat's bbox.

    The reference counts exact hits per splat with a scalar loop over its
    bbox (project_visible.wgsl tile loop writing num_tiles_hit); here the
    loop is a dense (64, N) vector pass the VPU chews through in one fused
    kernel — k lives in the sublane dim so per-splat reductions never cross
    lanes, and all bit packing is done with exact power-of-two f32 sums
    (native reductions; u32 tree-sums lower poorly).

    FIXED 8x8 LAYOUT (round 4): mask bit k covers tile
    (cmin_x + k % 8, cmin_y + k // 8) — kx/ky are STATIC, so the ellipse
    quadratic separates into precomputed (8, N) row/column pieces and the
    dense (64, N) pass drops to ~a dozen fused ops per element (vs ~70 for
    the bbox-row-major layout with its dynamic floor-div); rank decode
    becomes shift/mask. The cost: `small` now requires bbox_w <= 8 AND
    bbox_h <= 8 — thin splats with one side > 8 but area <= 64 fall back
    to conservative bbox records whose off-ellipse tiles the rasterizer's
    alpha cut discards (identical image; measured pool growth +0.00% on
    the bench scene, +0.02-0.17% on the castle eval views).

    cell=(gw, gh) evaluates the test at raster-cell granularity (a cell is
    gw x gh tiles): a splat covering several tiles of one cell emits ONE
    record, shrinking every pool-scale stage; the rasterizer then sweeps
    the whole cell's pixels per record. Bigger cells also put more splats
    under the exact 64-bit-mask path (the cell bbox has ~gw*gh fewer
    entries).
    """
    cmin_x, cmin_y, cmax_x, cmax_y = cell_bbox(proj, cell)
    bbox_w = (cmax_x - cmin_x).astype(jnp.int32)
    bbox_h = (cmax_y - cmin_y).astype(jnp.int32)
    area = jnp.where(proj.visible, bbox_w * bbox_h, 0)
    small = (bbox_w <= 8) & (bbox_h <= 8) & (area > 0)

    gw, gh = cell
    wpx = float(TILE_WIDTH * gw)
    hpx = float(TILE_WIDTH * gh)
    ext_x = wpx / 2.0
    ext_y = hpx / 2.0
    sig = jnp.log(opac * 255.0)
    scale = 1.0 / (2.0 * sig)
    ca = proj.conic[:, 0] * scale
    cb = proj.conic[:, 1] * scale
    cc = proj.conic[:, 2] * scale

    # Separable pieces: every per-(kx, ky) quantity of the sign-test form
    # (see _edge_hits / ellipse_intersects_aabb — same polynomial, factored
    # along the static 8x8 grid) is a sum/product of one kx piece and one
    # ky piece. X pieces and Y pieces are (8, N); the combine below runs at
    # (8, 8, N).
    k8 = jnp.arange(8, dtype=jnp.float32)[:, None]                  # (8, 1)
    k8i = jnp.arange(8, dtype=jnp.int32)[:, None]
    cxf = cmin_x.astype(jnp.float32)
    cyf = cmin_y.astype(jnp.float32)
    dx_c = (proj.xy[:, 0] - cxf * wpx - ext_x)[None, :] - k8 * wpx  # (8, N)
    dy_c = (proj.xy[:, 1] - cyf * hpx - ext_y)[None, :] - k8 * hpx
    rx = jnp.abs(dx_c) <= ext_x
    ry = jnp.abs(dy_c) <= ext_y
    sx = jnp.sign(dx_c)
    sy = jnp.sign(dy_c)
    px = sx * ext_x - dx_c          # cpx: nearest corner -> center, x
    py = sy * ext_y - dy_c
    gx1 = ca[None, :] * px
    gy1 = cc[None, :] * py
    axm1 = gx1 * px - 1.0           # ca*cpx^2 - 1 (folds the -1 of c)
    ay = gy1 * py                   # cc*cpy^2
    pxb = (2.0 * cb)[None, :] * px  # cross-term coefficient of c
    e1k = -sx * wpx                 # edge-1 direction dx1 = -sx*2ext_x
    e1a = e1k * gx1                 # kx piece of half_b1
    e1b = e1k * cb[None, :]         # (* py) piece of half_b1
    e2k = -sy * hpx
    e2a = e2k * gy1
    e2b = e2k * cb[None, :]
    kx_ok = k8i < bbox_w[None, :]
    ky_ok = k8i < bbox_h[None, :]

    a1 = (ca * (wpx * wpx))[None, None, :]                     # (1, 1, N)
    a2 = (cc * (hpx * hpx))[None, None, :]
    alive = ((sig > 0.0) & (area > 0))[None, None, :]

    X = lambda v: v[None, :, :]     # kx pieces -> (1, 8, N)
    Y = lambda v: v[:, None, :]     # ky pieces -> (8, 1, N)
    c = X(axm1) + Y(ay) + X(pxb) * Y(py)
    hb1 = X(e1a) + X(e1b) * Y(py)
    hb2 = Y(e2a) + Y(e2b) * X(px)
    in0 = c <= 0.0                  # f(0) <= 0, shared by both edges

    def vertex(a, hb):
        return ((hb * hb >= a * c) & (hb <= 0.0) & (hb + a >= 0.0)
                & (a > 0.0))

    hit = (
        (X(rx) & Y(ry)) | in0
        | (a1 + 2.0 * hb1 + c <= 0.0) | vertex(a1, hb1)
        | (a2 + 2.0 * hb2 + c <= 0.0) | vertex(a2, hb2)
    )
    hit = hit & X(kx_ok) & Y(ky_ok) & alive                     # (8, 8, N)
    hit_f = hit.astype(jnp.float32).reshape(MASK_BITS, -1)      # (64, N)

    # Exact f32 packing: every weight is a power of two and each partial sum
    # stays <= 65535, so the 16-bit half-sums are exact.
    w16 = (1 << np.arange(16, dtype=np.int64)).astype(np.float32)[:, None]

    def pack16(rows):  # (16, N) bits -> (N,) exact integer-valued f32
        return jnp.sum(rows * w16, axis=0)

    q0 = pack16(hit_f[0:16])
    q1 = pack16(hit_f[16:32])
    q2 = pack16(hit_f[32:48])
    q3 = pack16(hit_f[48:64])
    mask_lo = q0.astype(jnp.uint32) | (q1.astype(jnp.uint32) << 16)
    mask_hi = q2.astype(jnp.uint32) | (q3.astype(jnp.uint32) << 16)

    # Per-byte popcounts (<= 8 each) packed 4 bits apiece. Summed in two
    # exact 16-bit halves (like the mask bits): each half-sum is
    # sum_k hit_k * 16^(k//8) <= 0x8888 < 2^16, so every partial sum fits
    # the f32 mantissa exactly. A single 32-bit weighted sum would NOT be
    # exact — its max value 0x88888888 needs 32 significant bits.
    wpc16 = (16.0 ** (np.arange(32) // 8)).astype(np.float32)[:, None]
    pc_lo = jnp.sum(hit_f[0:32] * wpc16, axis=0).astype(jnp.uint32)
    pc_hi = jnp.sum(hit_f[32:64] * wpc16, axis=0).astype(jnp.uint32)
    pc_pack = pc_lo | (pc_hi << 16)

    cnt_exact = jnp.sum(hit_f, axis=0).astype(jnp.int32)
    counts = jnp.where(small, cnt_exact, area)
    return TileMasks(
        counts=counts, mask_lo=mask_lo, mask_hi=mask_hi, pc_pack=pc_pack,
        small=small,
    )


def popcount_u32(v):
    """SWAR popcount on uint32 lanes (the classic bit-parallel reduction).

    `lax.population_count` measured ~10 ms/M-element on the chip; this is a
    dozen fused VPU ops. The u32 multiply wraps, which is exactly what the
    byte-accumulate trick wants (the count lands in the top byte).
    """
    c55 = jnp.uint32(0x55555555)
    c33 = jnp.uint32(0x33333333)
    c0f = jnp.uint32(0x0F0F0F0F)
    v = v - ((v >> 1) & c55)
    v = (v & c33) + ((v >> 2) & c33)
    v = (v + (v >> 4)) & c0f
    return (v * jnp.uint32(0x01010101)) >> 24


def _ones_below64(x):
    """(lo, hi) u32 halves of a 64-bit mask with bits [0, x) set.

    x is an int32 array clamped to [0, 64]. Shift amounts are kept < 32
    (shift-by-width is undefined); the >=32 cases go through jnp.where.
    """
    x = jnp.clip(x, 0, 64)
    xl = jnp.clip(x, 0, 32).astype(jnp.uint32)
    xh = jnp.clip(x - 32, 0, 32).astype(jnp.uint32)
    full = jnp.uint32(0xFFFFFFFF)
    one = jnp.uint32(1)
    lo = jnp.where(xl >= 32, full, (one << jnp.minimum(xl, 31)) - 1)
    hi = jnp.where(xh >= 32, full, (one << jnp.minimum(xh, 31)) - 1)
    return lo, hi


def restrict_masks_to_strip(proj: Projection, masks: TileMasks,
                            counts_g: jnp.ndarray, row_lo, row_hi):
    """Restrict per-splat tile coverage to the tile-row range [row_lo, row_hi).

    The sharded record pipeline gives each device a row-aligned strip of
    tiles; every device then builds records ONLY for its strip instead of
    replicating the full expansion (the SURVEY §5.7 re-shard design). All
    arithmetic is elementwise over N — no per-bit pass:

    - small splats (authoritative 64-bit mask on the fixed 8x8 layout):
      keep mask bits whose bbox row falls inside the strip — bit k covers
      row tmin_y + k // 8, so the kept bits are the contiguous range
      [lo_r*8, hi_r*8) and the new count is a popcount;
    - bbox splats: clip the bbox row range to the strip; tmin_y advances to
      the first included row so the expand kernel's rank -> (dy, dx) decode
      needs no extra state.

    row_lo/row_hi are traced scalars (they differ per device under
    shard_map). Returns (counts_d, mask_lo_d, mask_hi_d, tmin_y_d,
    bbox_h_d) — bbox_h_d is the clipped bbox row count, which
    render.pack_decode_parts stashes in the mask-lo row for bbox splats.
    """
    ty0 = proj.tile_min[:, 1].astype(jnp.int32)
    bbox_w = jnp.clip(proj.tile_max[:, 0] - proj.tile_min[:, 0], 1, 1023)
    bbox_h = jnp.maximum(proj.tile_max[:, 1] - proj.tile_min[:, 1], 1)
    return restrict_masks_parts(
        ty0, bbox_w, bbox_h, masks.small, masks.mask_lo, masks.mask_hi,
        counts_g, row_lo, row_hi,
    )


def restrict_masks_parts(ty0, bbox_w, bbox_h, small, mask_lo, mask_hi,
                         counts_g, row_lo, row_hi):
    """restrict_masks_to_strip from explicit components (the sharded step
    carries these as packed all-gathered rows rather than a Projection)."""
    lo_r = jnp.clip(row_lo - ty0, 0, bbox_h)
    hi_r = jnp.clip(row_hi - ty0, 0, bbox_h)

    # Mask rows are 8 bits wide on the fixed 8x8 layout (bit k covers row
    # k // 8 relative to tmin_y) regardless of bbox_w; kx >= bbox_w bits
    # are never set, so the 8-wide row windows keep exactly the strip rows.
    a_lo, a_hi = _ones_below64(lo_r * 8)
    b_lo, b_hi = _ones_below64(hi_r * 8)
    keep_lo = b_lo & ~a_lo
    keep_hi = b_hi & ~a_hi
    m_lo = mask_lo & keep_lo
    m_hi = mask_hi & keep_hi
    cnt_small = (popcount_u32(m_lo) + popcount_u32(m_hi)).astype(jnp.int32)
    cnt_bbox = (hi_r - lo_r) * bbox_w

    producing = counts_g > 0
    counts_d = jnp.where(small, cnt_small, cnt_bbox)
    counts_d = jnp.where(producing, counts_d, 0)
    m_lo = jnp.where(producing, m_lo, 0)
    m_hi = jnp.where(producing, m_hi, 0)
    tmin_y_d = jnp.where(small, ty0, ty0 + lo_r)
    return counts_d, m_lo, m_hi, tmin_y_d, hi_r - lo_r


def _select_bit(mask_lo, mask_hi, pc_pack, rank):
    """Position of the rank-th set bit of a 64-bit mask (0-indexed).

    Uses the precomputed per-byte popcounts (4 bits each in pc_pack): a
    linear scan picks the byte, then a second scan the bit. ~60 fused int
    ops per element — no gathers, no popcount primitive (slow on TPU).
    """
    acc = jnp.zeros_like(rank)
    sel_byte = jnp.zeros_like(rank)
    r_in = rank
    for j in range(8):
        cj = ((pc_pack >> jnp.uint32(4 * j)) & jnp.uint32(15)).astype(jnp.int32)
        take = (rank >= acc) & (rank < acc + cj)
        sel_byte = jnp.where(take, j, sel_byte)
        r_in = jnp.where(take, rank - acc, r_in)
        acc = acc + cj
    shift = (jnp.minimum(sel_byte, 3) * 8).astype(jnp.uint32)
    shift_hi = ((sel_byte - 4).clip(0) * 8).astype(jnp.uint32)
    byte = jnp.where(
        sel_byte < 4, (mask_lo >> shift), (mask_hi >> shift_hi)
    ).astype(jnp.int32) & 255

    cum = jnp.zeros_like(rank)
    pos_in = jnp.zeros_like(rank)
    for b in range(8):
        bit = (byte >> b) & 1
        take = (bit == 1) & (cum == r_in)
        pos_in = jnp.where(take, b, pos_in)
        cum = cum + bit
    return sel_byte * 8 + pos_in


class Intersections(NamedTuple):
    """Static-shape intersection workspace (all integer index bookkeeping)."""

    order: jnp.ndarray        # (N,) depth order: compact -> global splat id
    isect_gid: jnp.ndarray    # (MAX_ISECTS,) intersection -> compact splat id
    starts: jnp.ndarray       # (num_tiles,) range start per tile
    ends: jnp.ndarray         # (num_tiles,) range end per tile (exclusive)
    num_visible: jnp.ndarray  # () int32
    num_isects: jnp.ndarray   # () int32 (records surviving the exact test)
    num_dropped: jnp.ndarray  # () int32 records lost to pool overflow
    producing: jnp.ndarray    # (N,) bool, global order: emits >=1 record


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

    masks = precompute_tile_masks(proj, opac)
    producing = proj.visible & (masks.counts > 0)

    # Per-splat decode rows, packed BEFORE the depth gather so reordering
    # them costs one indexed op. Column 0 (offsets) is filled post-sort.
    decode_g = jnp.stack(
        [
            jnp.where(producing, masks.counts, 0),
            masks.mask_lo.astype(jnp.int32),
            masks.mask_hi.astype(jnp.int32),
            masks.pc_pack.astype(jnp.int32),
            proj.tile_min[:, 0],
            proj.tile_min[:, 1],
            jnp.maximum(proj.tile_max[:, 0] - proj.tile_min[:, 0], 1),
            masks.small.astype(jnp.int32),
        ],
        axis=1,
    )  # (N, 8) int32

    # --- depth sort (replaces radix_argsort, render.rs:151-156) ---
    # Positive-float bits are order-isomorphic to their u32 pattern (the
    # same fact the reference's radix sort relies on). Splats with no
    # records sort to the end so slot->splat windows stay dense.
    depth_bits = jax.lax.bitcast_convert_type(
        jnp.maximum(proj.depth, 1e-20), jnp.uint32
    )
    depth_key = jnp.where(producing, depth_bits, jnp.uint32(0xFFFFFFFF))
    _, order = jax.lax.sort_key_val(
        depth_key, jnp.arange(n, dtype=jnp.int32), is_stable=True
    )
    num_visible = jnp.sum(proj.visible).astype(jnp.int32)

    decode = decode_g[order]                       # ONE N-sized row gather
    counts_c = decode[:, 0]
    # Overflow-safe offsets (same guard as raster_vjp._fwd_impl): a
    # pathological frame can push the raw record sum past 2^31; an f32
    # shadow cumsum zeroes counts that are safely past the pool so the
    # exact i32 cumsum stays bounded, and the raw total reports clamped.
    cum_f = jnp.cumsum(counts_c.astype(jnp.float32))
    beyond = cum_f - counts_c.astype(jnp.float32) > 4.0 * max_isects
    counts_c = jnp.where(beyond, 0, counts_c)
    cum = jnp.cumsum(counts_c)
    offsets = cum - counts_c
    total = jnp.minimum(cum_f[-1], 2.0**31 - 1024).astype(jnp.int32)
    # Repurpose column 0 to hold the slot offsets so the per-slot lookup
    # below stays a single row gather.
    decode = jnp.concatenate([offsets[:, None], decode[:, 1:]], axis=1)

    # --- slot -> compact splat id: one scatter-add at segment starts plus a
    # cumsum (producing splats are the depth-order prefix, so the running
    # count of starts IS the compact splat index) ---
    scatter_idx = jnp.where(counts_c > 0, offsets, max_isects)
    marks = jnp.zeros((max_isects,), jnp.int32).at[scatter_idx].add(
        1, mode="drop"
    )
    splat = jnp.cumsum(marks) - 1                  # (MAX_ISECTS,), monotone
    slot = jnp.arange(max_isects, dtype=jnp.int32)
    valid = (splat >= 0) & (slot < total)
    splat = jnp.clip(splat, 0, n - 1)

    d = decode[splat]                              # ONE pool-sized row gather
    rank = slot - d[:, 0]
    mask_lo = d[:, 1].astype(jnp.uint32)
    mask_hi = d[:, 2].astype(jnp.uint32)
    pc_pack = d[:, 3].astype(jnp.uint32)
    w_i = d[:, 6]
    # Small splats: bit positions live on the fixed 8x8 layout (static
    # shift/mask decode). Bbox splats: rank is row-major over bbox_w.
    pos = _select_bit(mask_lo, mask_hi, pc_pack, rank)
    dy_b = _floor_div(rank, w_i.astype(jnp.float32), w_i)
    is_small = d[:, 7] > 0
    dy = jnp.where(is_small, pos >> 3, dy_b)
    dx = jnp.where(is_small, pos & 7, rank - dy_b * w_i)
    tile_id = (d[:, 5] + dy) * tiles_x + (d[:, 4] + dx)

    # --- tile grouping (replaces the second radix sort + bin edges kernel) ---
    # Pack tile and slot ids into one u32 and sort a single array: the low
    # slot bits carry the depth order, so stability is free and the sort
    # moves half the bytes. (The reference's radix sort instead restricts
    # the *bit count* per sort, README.md:87.)
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
    num_dropped = jnp.maximum(total - max_isects, 0).astype(jnp.int32)

    if align <= 1:
        return Intersections(
            order=order,
            isect_gid=isect_gid,
            starts=tile_bins[:-1],
            ends=tile_bins[1:],
            num_visible=num_visible,
            num_isects=num_isects,
            num_dropped=num_dropped,
            producing=producing,
        )

    # --- aligned re-layout, gather-free ---
    # Treat each run of equal sorted keys as a segment; assign its
    # pad-to-align at the run's END. Then every record's aligned position is
    # iota + (sum of pads of runs that ended strictly before it):
    #   new_pos[i] = i + exclusive_cumsum(end_pad)[i]
    is_end = jnp.concatenate(
        [sorted_key[1:] != sorted_key[:-1], jnp.ones((1,), bool)]
    )
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_key[1:] != sorted_key[:-1]]
    )
    run_start = jax.lax.cummax(jnp.where(is_start, slot, 0))
    run_len_at_end = slot - run_start + 1
    end_pad = jnp.where(
        is_end & (sorted_key < num_tiles), (-run_len_at_end) % align, 0
    )
    pad_cum = jnp.cumsum(end_pad)
    new_pos = slot + (pad_cum - end_pad)  # exclusive cumsum
    new_pos = jnp.where(sorted_key < num_tiles, new_pos, max_isects)

    # Per-tile aligned ranges: tiny (num_tiles+1) gather of the pad cumsum
    # at each tile's first record.
    pads_before = (pad_cum - end_pad)[jnp.minimum(tile_bins, max_isects - 1)]
    pads_before = jnp.where(tile_bins >= max_isects, pad_cum[-1], pads_before)
    aligned_starts = tile_bins[:-1] + pads_before[:-1]
    counts = tile_bins[1:] - tile_bins[:-1]
    starts = jnp.minimum(aligned_starts, max_isects).astype(jnp.int32)
    ends = jnp.minimum(aligned_starts + counts, max_isects).astype(jnp.int32)

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
        num_dropped=num_dropped,
        producing=producing,
    )

"""Regression tests for the exact-pretest bitmask binning (ops/binning.py).

Targets the pc_pack packing hazard: the per-byte popcounts (4 bits each)
must be summed in two exact 16-bit halves — a single f32 weighted sum over
all 8 bytes can reach 0x88888888, which exceeds the 24-bit f32 mantissa and
silently rounds, mis-binning every record of a splat whose bbox occupies
mask bytes 4-7 (area 33-64 tiles).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from brush_tpu.ops.binning import (
    build_intersections,
    can_be_visible,
    precompute_tile_masks,
)
from brush_tpu.ops.projection import Projection


def _proj_single(xy, conic, tmin, tmax):
    return Projection(
        xy=jnp.asarray([xy], jnp.float32),
        depth=jnp.asarray([1.0], jnp.float32),
        conic=jnp.asarray([conic], jnp.float32),
        radius=jnp.asarray([64], jnp.int32),
        tile_min=jnp.asarray([tmin], jnp.int32),
        tile_max=jnp.asarray([tmax], jnp.int32),
        visible=jnp.asarray([True]),
    )


def _tile_truth(proj, opac, tiles=(8, 8)):
    """Per-bbox-tile hits straight from the exact test (no packing)."""
    w = tiles[0]
    k = np.arange(w * tiles[1])
    tx = jnp.asarray(proj.tile_min[0, 0] + k % w, jnp.int32)
    ty = jnp.asarray(proj.tile_min[0, 1] + k // w, jnp.int32)
    n = k.size
    return np.asarray(
        can_be_visible(
            tx, ty,
            jnp.broadcast_to(proj.xy[0], (n, 2)),
            jnp.broadcast_to(proj.conic[0], (n, 3)),
            jnp.broadcast_to(opac, (n,)),
        )
    )


# Centers chosen so hits land in the HIGH mask bytes (4-7): full coverage,
# bottom-heavy partial coverage, corner coverage.
@pytest.mark.parametrize(
    "center,conic",
    [
        ((64.0, 64.0), (1e-4, 0.0, 1e-4)),    # all 64 tiles hit
        ((100.0, 88.0), (4e-3, 0.0, 4e-3)),   # partial, straddles byte 4+
        ((20.0, 120.0), (4e-3, 1e-3, 6e-3)),  # bottom-left corner, bytes 6-7
    ],
)
def test_high_byte_popcount_pack_exact(center, conic):
    opac = jnp.asarray([0.9], jnp.float32)
    proj = _proj_single(center, conic, (0, 0), (8, 8))
    masks = precompute_tile_masks(proj, opac)
    hit = _tile_truth(proj, opac)
    assert hit[32:].any(), "case must exercise the high mask bytes"

    mask = int(masks.mask_lo[0]) | (int(masks.mask_hi[0]) << 32)
    assert mask == sum(1 << int(i) for i in np.nonzero(hit)[0])
    pc = int(masks.pc_pack[0])
    for j in range(8):
        assert (pc >> (4 * j)) & 15 == int(hit[8 * j: 8 * j + 8].sum()), (
            f"byte {j} popcount corrupted: pc_pack={pc:#010x}"
        )
    assert int(masks.counts[0]) == int(hit.sum())


def test_large_bbox_records_land_in_correct_tiles():
    # End-to-end through build_intersections: every record of an 8x8-bbox
    # splat must decode to exactly the tiles the exact test passes.
    opac = jnp.asarray([0.9], jnp.float32)
    proj = _proj_single((64.0, 64.0), (1e-4, 0.0, 1e-4), (0, 0), (8, 8))
    hit = _tile_truth(proj, opac)

    isect = build_intersections(proj, opac, (8, 8), max_isects=128)
    counts = np.asarray(isect.ends) - np.asarray(isect.starts)
    np.testing.assert_array_equal(counts, hit.astype(np.int64))
    assert int(isect.num_isects) == int(hit.sum())


def test_strip_restriction_matches_bruteforce():
    """restrict_masks_to_strip must keep exactly the records whose tile row
    falls in [row_lo, row_hi), for both the bitmask and bbox paths."""
    from brush_tpu.ops.binning import restrict_masks_to_strip
    from brush_tpu.camera import Camera
    from brush_tpu.ops.projection import project_splats
    from brush_tpu.ops.rasterize_reference import camera_params
    from brush_tpu import splats as sp
    import jax

    rng = np.random.default_rng(11)
    model = sp.from_random(rng, [-2, -2, -2], [2, 2, 2], count=120,
                           sh_degree=0)
    # A few huge splats force the conservative bbox path (area > 64).
    model = model.replace(
        log_scales=model.log_scales.at[:6].set(np.log(1.5)))
    cam = Camera(position=[0, 0, -5.0], rotation=[1, 0, 0, 0],
                 fov_x=np.pi / 3, fov_y=np.pi / 3)
    img_size = (128, 96)
    cp = camera_params(cam, img_size)
    proj = project_splats(model.means, model.log_scales,
                          model.quats / np.linalg.norm(model.quats, axis=-1,
                                                       keepdims=True),
                          cp.viewmat, cp.focal, cp.pixel_center, img_size,
                          active=model.active_mask())
    opac = jax.nn.sigmoid(model.raw_opacity)
    masks = precompute_tile_masks(proj, opac)
    producing = np.asarray(proj.visible & (masks.counts > 0))
    counts_g = jnp.where(proj.visible & (masks.counts > 0), masks.counts, 0)

    tiles_y = 96 // 16
    for row_lo, row_hi in [(0, 2), (2, 4), (4, 6), (0, 6), (3, 3), (5, 9)]:
        counts_d, m_lo_d, m_hi_d, tmin_y_d, _bbox_h_d = jax.jit(
            restrict_masks_to_strip)(proj, masks, counts_g,
                                     jnp.int32(row_lo), jnp.int32(row_hi))
        counts_d = np.asarray(counts_d)
        tmin_y_d = np.asarray(tmin_y_d)
        m_lo_d, m_hi_d = np.asarray(m_lo_d), np.asarray(m_hi_d)

        tm = np.asarray(proj.tile_min)
        tM = np.asarray(proj.tile_max)
        small = np.asarray(masks.small)
        mlo, mhi = np.asarray(masks.mask_lo), np.asarray(masks.mask_hi)
        for i in range(120):
            if not producing[i]:
                assert counts_d[i] == 0
                continue
            w = max(min(tM[i, 0] - tm[i, 0], 1023), 1)
            h = max(tM[i, 1] - tm[i, 1], 1)
            if small[i]:
                # Fixed 8x8 layout: bit k covers row tmin_y + k // 8.
                mask = (int(mhi[i]) << 32) | int(mlo[i])
                want_bits = [k for k in range(64)
                             if (mask >> k) & 1
                             and row_lo <= tm[i, 1] + k // 8 < row_hi]
                got_mask = (int(m_hi_d[i]) << 32) | int(m_lo_d[i])
                got_bits = [k for k in range(64) if (got_mask >> k) & 1]
                assert got_bits == want_bits, f"splat {i} mask bits"
                assert counts_d[i] == len(want_bits), f"splat {i} count"
                assert tmin_y_d[i] == tm[i, 1]
            else:
                lo = min(max(row_lo - tm[i, 1], 0), h)
                hi = min(max(row_hi - tm[i, 1], 0), h)
                assert counts_d[i] == max(hi - lo, 0) * w, f"splat {i} bbox"
                assert tmin_y_d[i] == tm[i, 1] + lo

    # Strips tile the image: per-strip counts must sum to the full counts.
    cap = int(model.capacity)
    total = np.zeros(cap, np.int64)
    for r in range(0, tiles_y, 2):
        c, _, _, _, _ = jax.jit(restrict_masks_to_strip)(
            proj, masks, counts_g, jnp.int32(r), jnp.int32(r + 2))
        total += np.asarray(c)
    np.testing.assert_array_equal(total, np.asarray(counts_g))


def _ellipse_aabb_root_formula(box_x, box_y, ext_x, ext_y, ex, ey,
                               ca, cb, cc):
    """The reference's original formulation (helpers.wgsl:220-262): explicit
    nearest-corner test plus per-edge root-interval tests via sqrt and
    division. Kept here (in the caller's dtype) as the oracle for the
    sqrt/div-free sign-test rewrite in ops/binning.ellipse_intersects_aabb."""

    def check_edge(p1x, p1y, p2x, p2y):
        dx = p2x - p1x
        dy = p2y - p1y
        fx = p1x - ex
        fy = p1y - ey
        a = dx * (ca * dx + cb * dy) + dy * (cb * dx + cc * dy)
        b = 2.0 * (fx * (ca * dx + cb * dy) + fy * (cb * dx + cc * dy))
        c = fx * (ca * fx + cb * fy) + fy * (cb * fx + cc * fy) - 1.0
        disc = b * b - 4.0 * a * c
        sqrt_disc = np.sqrt(np.maximum(disc, 0.0))
        denom = 2.0 * a
        t1 = (-b - sqrt_disc) / denom
        t2 = (-b + sqrt_disc) / denom
        hit = ((t1 >= 0.0) & (t1 <= 1.0)) | ((t2 >= 0.0) & (t2 <= 1.0))
        return (disc >= 0.0) & hit

    dx_c = ex - box_x
    dy_c = ey - box_y
    center_inside = (np.abs(dx_c) <= ext_x) & (np.abs(dy_c) <= ext_y)
    sx = np.sign(dx_c)
    sy = np.sign(dy_c)
    nx = box_x + sx * ext_x
    ny = box_y + sy * ext_y
    cpx = nx - ex
    cpy = ny - ey
    corner_inside = (cpx * (ca * cpx + cb * cpy)
                     + cpy * (cb * cpx + cc * cpy)) <= 1.0
    edge1 = check_edge(nx, ny, nx - sx * 2.0 * ext_x, ny)
    edge2 = check_edge(nx, ny, nx, ny - sy * 2.0 * ext_y)
    return center_inside | corner_inside | edge1 | edge2


def test_ellipse_aabb_sign_test_matches_root_formula():
    """The sqrt/div-free edge test accepts exactly the root formula's set.

    Proven in real arithmetic (see _edge_hits docstring); here checked in
    float64 over random positive-definite conics and boxes, where a
    disagreement would require a sample landing within f64 rounding of a
    decision boundary — with continuous random inputs that is a genuine
    bug, not bad luck. A second f32-vs-f64 check bounds the rewrite's own
    rounding flips to the usual borderline class.
    """
    import jax

    from brush_tpu.ops.binning import ellipse_intersects_aabb

    rng = np.random.default_rng(7)
    m = 200_000
    # Random SPD conics spanning tiny-round to huge-elongated, centers from
    # deep inside the box to far outside, tile boxes and 2x1-cell boxes.
    l11 = np.exp(rng.uniform(-6, 2, m))
    l21 = rng.normal(0, 1, m) * np.exp(rng.uniform(-4, 2, m))
    l22 = np.exp(rng.uniform(-6, 2, m))
    ca = l11 * l11
    cb = l11 * l21
    cc = l21 * l21 + l22 * l22
    ext_x = np.where(rng.random(m) < 0.5, 8.0, 16.0)
    ext_y = np.full(m, 8.0)
    box_x = np.zeros(m)
    box_y = np.zeros(m)
    ex = rng.normal(0, 1, m) * np.exp(rng.uniform(0, 5, m))
    ey = rng.normal(0, 1, m) * np.exp(rng.uniform(0, 5, m))

    want = _ellipse_aabb_root_formula(box_x, box_y, ext_x, ext_y, ex, ey,
                                      ca, cb, cc)

    # f64 equivalence: numpy replica of the sign-test formulation (JAX runs
    # f32 under the suite's config, so the f64 check lives here; keep in
    # sync with ops/binning._edge_hits / ellipse_intersects_aabb).
    def edge_hits(a, half_b, c):
        return ((c <= 0.0) | (a + 2.0 * half_b + c <= 0.0)
                | ((half_b * half_b >= a * c) & (half_b <= 0.0)
                   & (-half_b <= a)))

    dx_c = ex - box_x
    dy_c = ey - box_y
    sx = np.sign(dx_c)
    sy = np.sign(dy_c)
    cpx = box_x + sx * ext_x - ex
    cpy = box_y + sy * ext_y - ey
    gx = ca * cpx + cb * cpy
    gy = cb * cpx + cc * cpy
    c = cpx * gx + cpy * gy - 1.0
    got64 = ((np.abs(dx_c) <= ext_x) & (np.abs(dy_c) <= ext_y)
             | edge_hits(ca * 4.0 * ext_x * ext_x, -sx * 2.0 * ext_x * gx, c)
             | edge_hits(cc * 4.0 * ext_y * ext_y, -sy * 2.0 * ext_y * gy, c))
    np.testing.assert_array_equal(got64, want)
    assert want.any() and not want.all()  # both classes exercised

    got32 = np.asarray(jax.jit(ellipse_intersects_aabb)(
        *[jnp.asarray(v, jnp.float32) for v in
          (box_x, box_y, ext_x, ext_y, ex, ey, ca, cb, cc)]))
    flips = int(np.sum(got32 != want))
    assert flips <= m // 1000, f"{flips} f32 borderline flips of {m}"


def test_fixed8_separable_mask_matches_dense_pretest():
    """precompute_tile_masks' separable fixed-8x8 evaluation must accept
    the same tile set as a dense can_be_visible sweep over the 8x8 grid —
    the same polynomial, factored into static row/column pieces, so any
    disagreement beyond f32 reassociation flips on decision boundaries is
    a bug."""
    import jax

    from brush_tpu import splats as sp
    from brush_tpu.camera import Camera
    from brush_tpu.ops.projection import project_splats
    from brush_tpu.ops.rasterize_reference import camera_params

    rng = np.random.default_rng(5)
    model = sp.from_random(rng, [-2, -2, -2], [2, 2, 2], count=400,
                           sh_degree=0)
    cam = Camera(position=[0, 0, -5.0], rotation=[1, 0, 0, 0],
                 fov_x=np.pi / 3, fov_y=np.pi / 3)
    img_size = (256, 192)
    cp = camera_params(cam, img_size)
    proj = project_splats(
        model.means, model.log_scales,
        model.quats / np.linalg.norm(model.quats, axis=-1, keepdims=True),
        cp.viewmat, cp.focal, cp.pixel_center, img_size,
        active=model.active_mask())
    opac = jax.nn.sigmoid(model.raw_opacity)
    masks = precompute_tile_masks(proj, opac)

    k = np.arange(64)
    tx = proj.tile_min[:, 0][None, :] + jnp.asarray(k % 8, jnp.int32)[:, None]
    ty = proj.tile_min[:, 1][None, :] + jnp.asarray(k // 8, jnp.int32)[:, None]
    hit = np.asarray(can_be_visible(
        tx, ty, proj.xy[None, :, :], proj.conic[None, :, :], opac[None, :]))
    bbox_w = np.asarray(proj.tile_max[:, 0] - proj.tile_min[:, 0])
    bbox_h = np.asarray(proj.tile_max[:, 1] - proj.tile_min[:, 1])
    valid = ((k % 8)[:, None] < bbox_w[None, :]) \
        & ((k // 8)[:, None] < bbox_h[None, :]) \
        & np.asarray(proj.visible)[None, :]
    want = hit & valid  # (64, N)

    got = np.zeros_like(want)
    mlo = np.asarray(masks.mask_lo).astype(np.uint64)
    mhi = np.asarray(masks.mask_hi).astype(np.uint64)
    mask64 = mlo | (mhi << np.uint64(32))
    for b in range(64):
        got[b] = (mask64 >> np.uint64(b)) & np.uint64(1)

    small = np.asarray(masks.small)
    flips = int(np.sum(got[:, small] != want[:, small]))
    assert flips <= max(2, small.sum() // 500), (
        f"{flips} mask-bit disagreements on {small.sum()} small splats")
    # Counts: popcount for small, bbox area for the rest.
    cnt = np.asarray(masks.counts)
    np.testing.assert_array_equal(
        cnt[small], got[:, small].sum(axis=0))
    big = ~small & np.asarray(proj.visible) & (bbox_w * bbox_h > 0)
    np.testing.assert_array_equal(cnt[big], (bbox_w * bbox_h)[big])

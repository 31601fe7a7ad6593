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

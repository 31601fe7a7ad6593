"""Gaussian projection: world-space 3D gaussians -> screen-space 2D splats.

Dense vectorized re-expression of the reference projection kernels
(reference: helpers.wgsl:119-218 math; project_forward.wgsl culling;
project_visible.wgsl per-visible recompute). The reference runs this twice —
once to cull+compact via atomics, once per visible splat — because its
sparse design needs a compacted buffer. On TPU we compute everything densely
over the padded splat array with a validity mask; XLA fuses the whole thing
into a few vector loops, and the gradient comes from JAX autodiff instead of
project_backwards.wgsl.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from brush_tpu.constants import COV_BLUR, NEAR_PLANE_Z, TILE_WIDTH


class Projection(NamedTuple):
    """Per-splat screen-space quantities (all padded to N with `visible` mask)."""

    xy: jnp.ndarray        # (N, 2) projected means, pixels
    depth: jnp.ndarray     # (N,) view-space z
    conic: jnp.ndarray     # (N, 3) inverse 2D covariance upper triangle (a, b, c)
    radius: jnp.ndarray    # (N,) int32 pixel radius of the 3-sigma ellipse bound
    tile_min: jnp.ndarray  # (N, 2) int32 inclusive tile bbox min (x, y)
    tile_max: jnp.ndarray  # (N, 2) int32 exclusive tile bbox max (x, y)
    visible: jnp.ndarray   # (N,) bool — survives culling


def quat_to_rotmat(quats: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) wxyz quaternions -> (N, 3, 3) rotation matrices (helpers.wgsl:74)."""
    w, x, y, z = quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3]
    x2, y2, z2 = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (y2 + z2), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (x2 + z2), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (x2 + y2),
        ],
        axis=-1,
    )
    return m.reshape(-1, 3, 3)


def calc_cov2d(
    focal: jnp.ndarray,
    img_size,
    pixel_center: jnp.ndarray,
    viewmat: jnp.ndarray,
    p_view: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
) -> jnp.ndarray:
    """Projected 2D covariance upper triangle (c00, c01, c11), incl. COV_BLUR.

    Matches helpers.wgsl:124-158: EWA-style first-order projection with the
    frustum-clamped tangent point and the 0.3 screen-space dilation.

    Args:
      focal: (2,) fx, fy.  img_size: (w, h) static ints.
      pixel_center: (2,) cx, cy.  viewmat: (4, 4) world-to-view.
      p_view: (N, 3) view-space positions.  scales: (N, 3).  quats: (N, 4).
    """
    img = jnp.asarray(img_size, dtype=jnp.float32)
    tan_fov = 0.5 * img / focal
    lims_pos = (img - pixel_center) / focal + 0.3 * tan_fov
    lims_neg = pixel_center / focal + 0.3 * tan_fov

    rz = 1.0 / p_view[:, 2]
    rz2 = rz * rz
    t_xy = p_view[:, 2:3] * jnp.clip(p_view[:, :2] * rz[:, None], -lims_neg, lims_pos)

    rot = quat_to_rotmat(quats)
    m = rot * scales[:, None, :]  # scale columns: M = R @ diag(s)
    v = jnp.einsum("nij,nkj->nik", m, m)  # M @ M^T

    # J is the 2x3 Jacobian of the projection at the clamped tangent point.
    zeros = jnp.zeros_like(rz)
    j = jnp.stack(
        [
            jnp.stack([focal[0] * rz, zeros, -focal[0] * t_xy[:, 0] * rz2], axis=-1),
            jnp.stack([zeros, focal[1] * rz, -focal[1] * t_xy[:, 1] * rz2], axis=-1),
        ],
        axis=1,
    )  # (N, 2, 3)

    w = viewmat[:3, :3]
    t = jnp.einsum("nij,jk->nik", j, w)  # (N, 2, 3)
    cov = jnp.einsum("nij,njk,nlk->nil", t, v, t)  # T V T^T, (N, 2, 2)

    return jnp.stack(
        [cov[:, 0, 0] + COV_BLUR, cov[:, 0, 1], cov[:, 1, 1] + COV_BLUR], axis=-1
    )


def cov_to_conic(cov2d: jnp.ndarray) -> jnp.ndarray:
    """Invert the symmetric 2x2 covariance (helpers.wgsl:160-164)."""
    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] * cov2d[:, 1]
    inv_det = 1.0 / det
    return jnp.stack(
        [cov2d[:, 2] * inv_det, -cov2d[:, 1] * inv_det, cov2d[:, 0] * inv_det], axis=-1
    )


def radius_from_conic(conic: jnp.ndarray) -> jnp.ndarray:
    """Conservative integer pixel radius of the splat (helpers.wgsl:192-202).

    The reference computes this with opacity fixed at 1.0 (see the TODO at
    project_forward.wgsl:53); we keep that for identical culling.
    """
    det = 1.0 / (conic[:, 0] * conic[:, 2] - conic[:, 1] * conic[:, 1])
    cov_x = conic[:, 2] * det
    cov_z = conic[:, 0] * det
    b = 0.5 * (cov_x + cov_z)
    disc = jnp.sqrt(jnp.maximum(0.1, b * b - det))
    v1 = b + disc
    v2 = b - disc
    radius = 3.0 * jnp.sqrt(jnp.maximum(0.0, jnp.maximum(v1, v2)))
    return jnp.ceil(radius).astype(jnp.int32)


def tile_bbox(xy: jnp.ndarray, radius: jnp.ndarray, tile_bounds) -> tuple:
    """Inclusive-min / exclusive-max tile bbox of a splat (helpers.wgsl:55-71).

    tile_bounds is (tiles_x, tiles_y) static ints.
    """
    bounds = jnp.asarray(tile_bounds, dtype=jnp.float32)
    center = xy / float(TILE_WIDTH)
    rad = radius.astype(jnp.float32)[:, None] / float(TILE_WIDTH)
    # WGSL casts f32->i32 (truncation); after clamping to [0, bounds] this is
    # equivalent to floor+clamp for every case that survives the clamp.
    tmin = jnp.clip(jnp.floor(center - rad), 0.0, bounds).astype(jnp.int32)
    tmax = jnp.clip(jnp.floor(center + rad + 1.0), 0.0, bounds).astype(jnp.int32)
    return tmin, tmax


def project_splats(
    means: jnp.ndarray,
    log_scales: jnp.ndarray,
    quats: jnp.ndarray,
    viewmat: jnp.ndarray,
    focal: jnp.ndarray,
    pixel_center: jnp.ndarray,
    img_size,
    active: jnp.ndarray | None = None,
) -> Projection:
    """Project all splats and compute visibility.

    Culling matches project_forward.wgsl:32-62: near plane, zero covariance
    determinant, and empty tile bbox.

    Args:
      means: (N, 3). log_scales: (N, 3). quats: (N, 4) wxyz, assumed normalized.
      viewmat: (4, 4) world-to-view. focal/pixel_center: (2,).
      img_size: (w, h) static ints.
      active: optional (N,) bool mask of live (non-padding) splats.
    """
    w = viewmat[:3, :3]
    t = viewmat[:3, 3]
    p_view = means @ w.T + t
    depth = p_view[:, 2]

    visible = depth > NEAR_PLANE_Z
    if active is not None:
        visible = visible & active

    # Culled splats must still produce finite values: a NaN/Inf in the
    # masked-out branch of a downstream `where` would poison gradients
    # (standard JAX pitfall), so substitute a safe depth before dividing.
    z_safe = jnp.where(visible, depth, 1.0)
    p_view = p_view.at[:, 2].set(z_safe)

    scales = jnp.exp(log_scales)
    cov2d = calc_cov2d(focal, img_size, pixel_center, viewmat, p_view, scales, quats)
    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] * cov2d[:, 1]
    visible = visible & (det != 0.0)
    cov2d_safe = jnp.where(
        visible[:, None], cov2d, jnp.array([1.0, 0.0, 1.0], dtype=cov2d.dtype)
    )

    conic = cov_to_conic(cov2d_safe)
    xy = p_view[:, :2] / p_view[:, 2:3] * focal + pixel_center
    radius = jnp.where(visible, radius_from_conic(conic), 0)

    tiles_x = -(-int(img_size[0]) // TILE_WIDTH)
    tiles_y = -(-int(img_size[1]) // TILE_WIDTH)
    tmin, tmax = tile_bbox(xy, radius, (tiles_x, tiles_y))
    visible = visible & (tmax[:, 0] > tmin[:, 0]) & (tmax[:, 1] > tmin[:, 1])

    return Projection(
        xy=xy, depth=depth, conic=conic, radius=radius,
        tile_min=tmin, tile_max=tmax, visible=visible,
    )

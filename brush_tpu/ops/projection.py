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
    tx = p_view[:, 2] * jnp.clip(p_view[:, 0] * rz, -lims_neg[0], lims_pos[0])
    ty = p_view[:, 2] * jnp.clip(p_view[:, 1] * rz, -lims_neg[1], lims_pos[1])

    # Everything below is the fully expanded scalar form of
    # T V T^T with V = (R diag(s)) (R diag(s))^T and T = J W. Batched (N,3,3)
    # einsums lower to per-splat micro-matmuls that waste the MXU (its tiles
    # are 128x128); the expansion keeps the whole projection on the VPU as a
    # handful of fused (N,) vector ops.
    qw, qx, qy, qz = quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3]
    x2, y2, z2 = qx * qx, qy * qy, qz * qz
    xy_, xz_, yz_ = qx * qy, qx * qz, qy * qz
    wx_, wy_, wz_ = qw * qx, qw * qy, qw * qz
    s0, s1, s2 = scales[:, 0], scales[:, 1], scales[:, 2]
    # m_ij = R_ij * s_j  (M = R @ diag(s))
    m00 = (1.0 - 2.0 * (y2 + z2)) * s0
    m01 = (2.0 * (xy_ - wz_)) * s1
    m02 = (2.0 * (xz_ + wy_)) * s2
    m10 = (2.0 * (xy_ + wz_)) * s0
    m11 = (1.0 - 2.0 * (x2 + z2)) * s1
    m12 = (2.0 * (yz_ - wx_)) * s2
    m20 = (2.0 * (xz_ - wy_)) * s0
    m21 = (2.0 * (yz_ + wx_)) * s1
    m22 = (1.0 - 2.0 * (x2 + y2)) * s2
    # V = M M^T, symmetric (6 unique entries)
    v00 = m00 * m00 + m01 * m01 + m02 * m02
    v01 = m00 * m10 + m01 * m11 + m02 * m12
    v02 = m00 * m20 + m01 * m21 + m02 * m22
    v11 = m10 * m10 + m11 * m11 + m12 * m12
    v12 = m10 * m20 + m11 * m21 + m12 * m22
    v22 = m20 * m20 + m21 * m21 + m22 * m22
    # J rows: [fx*rz, 0, -fx*tx*rz2], [0, fy*rz, -fy*ty*rz2]
    ja = focal[0] * rz
    jc0 = -focal[0] * tx * rz2
    jb = focal[1] * rz
    jc1 = -focal[1] * ty * rz2
    # T = J @ W (W constant 3x3), rows t0, t1
    w = viewmat[:3, :3]
    t00 = ja * w[0, 0] + jc0 * w[2, 0]
    t01 = ja * w[0, 1] + jc0 * w[2, 1]
    t02 = ja * w[0, 2] + jc0 * w[2, 2]
    t10 = jb * w[1, 0] + jc1 * w[2, 0]
    t11 = jb * w[1, 1] + jc1 * w[2, 1]
    t12 = jb * w[1, 2] + jc1 * w[2, 2]
    # cov = T V T^T
    u0 = v00 * t00 + v01 * t01 + v02 * t02
    u1 = v01 * t00 + v11 * t01 + v12 * t02
    u2 = v02 * t00 + v12 * t01 + v22 * t02
    c00 = t00 * u0 + t01 * u1 + t02 * u2
    c01 = t10 * u0 + t11 * u1 + t12 * u2
    q0 = v00 * t10 + v01 * t11 + v02 * t12
    q1 = v01 * t10 + v11 * t11 + v12 * t12
    q2 = v02 * t10 + v12 * t11 + v22 * t12
    c11 = t10 * q0 + t11 * q1 + t12 * q2

    return jnp.stack([c00 + COV_BLUR, c01, c11 + COV_BLUR], axis=-1)


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
    # Expanded (N,3) @ (3,3): a K=3 matmul pads to a 128-wide MXU tile; three
    # fused multiply-adds on the VPU are faster and fuse with the rest.
    mx, my, mz = means[:, 0], means[:, 1], means[:, 2]
    p_view = jnp.stack(
        [
            mx * w[0, 0] + my * w[0, 1] + mz * w[0, 2] + t[0],
            mx * w[1, 0] + my * w[1, 1] + mz * w[1, 2] + t[1],
            mx * w[2, 0] + my * w[2, 1] + mz * w[2, 2] + t[2],
        ],
        axis=-1,
    )
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

"""Dense reference renderer — the numerics oracle.

Composites every splat against every pixel (no tiles, no binning) in global
depth order, using exactly the projection / SH / compositing math of the
tiled pipeline. O(N x pixels): for tests and small scenes only. The tiled
and Pallas rasterizers are validated bit-for-bit (to fp tolerance) against
this (mirrors the reference's gold-file strategy, render.rs:696-833, with the
oracle replacing gsplat-generated fixtures).

Fully differentiable through JAX autodiff — gradients of this renderer are
the ground truth that the custom-VJP tiled path is checked against.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from brush_tpu.constants import sh_degree_from_coeffs
from brush_tpu.ops.compositing import composite_pixels
from brush_tpu.ops.projection import project_splats
from brush_tpu.ops.sh import sh_to_color


class CameraParams(NamedTuple):
    """Static camera data as device arrays (host Camera -> device)."""

    viewmat: jnp.ndarray       # (4, 4) world-to-view
    focal: jnp.ndarray         # (2,) fx, fy
    pixel_center: jnp.ndarray  # (2,) cx, cy


def camera_params(camera, img_size) -> CameraParams:
    return CameraParams(
        viewmat=jnp.asarray(camera.world_to_local(), dtype=jnp.float32),
        focal=jnp.asarray(camera.focal(img_size), dtype=jnp.float32),
        pixel_center=jnp.asarray(camera.center(img_size), dtype=jnp.float32),
    )


def pixel_grid(img_size) -> jnp.ndarray:
    """(H*W, 2) pixel-center coordinates (x, y); img_size is (w, h)."""
    w, h = int(img_size[0]), int(img_size[1])
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5
    gx, gy = jnp.meshgrid(xs, ys)
    return jnp.stack([gx.ravel(), gy.ravel()], axis=-1)


def render_oracle(
    means: jnp.ndarray,
    log_scales: jnp.ndarray,
    quats: jnp.ndarray,
    sh_coeffs: jnp.ndarray,
    raw_opacity: jnp.ndarray,
    cam: CameraParams,
    img_size,
    active: jnp.ndarray | None = None,
    block_size: int = 256,
) -> jnp.ndarray:
    """Render (h, w, 4) RGBA float32. quats are normalized internally.

    Matches the reference forward semantics end to end: projection culling
    (project_forward.wgsl), SH color + 0.5 (project_visible.wgsl:235), and
    front-to-back compositing with early-out (rasterize.wgsl).
    """
    n = means.shape[0]
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True).clip(1e-12)

    proj = project_splats(
        means, log_scales, quats,
        cam.viewmat, cam.focal, cam.pixel_center, img_size, active=active,
    )

    # Reference quirk: the "camera position" used for SH view directions is
    # the translation column of the world-to-view matrix, not the camera's
    # world position (project_visible.wgsl:232). Replicated for parity.
    cam_pos = cam.viewmat[:3, 3]
    viewdir = means - cam_pos
    viewdir = viewdir / jnp.linalg.norm(viewdir, axis=-1, keepdims=True).clip(1e-12)
    # The reference does not backprop color -> view direction -> means
    # (gather_grads.wgsl treats viewdir as a constant).
    viewdir = jax.lax.stop_gradient(viewdir)

    sh_degree = sh_degree_from_coeffs(sh_coeffs.shape[1])
    color = sh_to_color(sh_degree, viewdir, sh_coeffs)
    opac = jax.nn.sigmoid(raw_opacity)

    # Global front-to-back depth order; culled splats sort to the end.
    order = jnp.argsort(jnp.where(proj.visible, proj.depth, jnp.inf))
    pix = pixel_grid(img_size)
    out = composite_pixels(
        pix,
        proj.xy[order],
        proj.conic[order],
        color[order],
        opac[order],
        proj.visible[order],
        block_size=block_size,
    )
    w, h = int(img_size[0]), int(img_size[1])
    return out.reshape(h, w, 4)

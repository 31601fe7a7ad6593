"""Uninitialized-memory defense (reference: brush-kernel/src/lib.rs:134-147).

The backward rasterizer deliberately leaves gradient-pool slots outside any
tile range unwritten, relying on downstream masking (slot >= total sorts to
the back and is zeroed; strip masking in the sharded path). The reference
guards the same class of bug by noise-filling every raw allocation in test
builds. Here: pre-fill the gradient pool with a large sentinel and assert
the pipeline's gradients are bit-identical to the zero-filled run — if any
masking regresses, the sentinel leaks into the per-splat sums and this
fails loudly.
"""

import numpy as np
import jax
import jax.numpy as jnp

from brush_tpu import splats as sp
from brush_tpu.camera import Camera
from brush_tpu.ops.pallas import raster_vjp
from brush_tpu.ops.rasterize_reference import camera_params
from brush_tpu.render import render_splats


def _grads(fill):
    rng = np.random.default_rng(0)
    model = sp.from_random(rng, [-2, -2, -2], [2, 2, 2], count=200,
                           sh_degree=1)
    cam = Camera(position=[0, 0, -6.0], rotation=[1, 0, 0, 0],
                 fov_x=np.pi / 3, fov_y=np.pi / 3)
    img_size = (64, 48)
    cp = camera_params(cam, img_size)
    tgt = np.zeros((48, 64, 4), np.float32)

    def loss(means, log_scales, quats, sh, opac):
        img, _ = render_splats(
            means, log_scales, quats, sh, opac, cp, img_size,
            active=model.active_mask(), backend="pallas",
            block_size=128, max_isects=2048,
        )
        return jnp.sum((img - tgt) ** 2)

    raster_vjp.DEBUG_GRAD_POOL_FILL = fill
    raster_vjp.make_pallas_pipeline.cache_clear()
    try:
        g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            model.means, model.log_scales, model.quats, model.sh_coeffs,
            model.raw_opacity,
        )
    finally:
        raster_vjp.DEBUG_GRAD_POOL_FILL = None
        raster_vjp.make_pallas_pipeline.cache_clear()
    return [np.asarray(x) for x in g]


def test_sentinel_filled_grad_pool_changes_nothing():
    clean = _grads(None)
    noisy = _grads(-12345.0)
    for a, b in zip(clean, noisy):
        assert np.isfinite(b).all()
        np.testing.assert_array_equal(a, b)

"""Gold-file rasterizer tests against gsplat(CUDA)-generated fixtures.

The reference validates its renderer against safetensors fixtures produced
by a PyTorch/gsplat notebook (reference: test_cases/NerfStudioRefGen.ipynb,
consumed by render.rs:696-833 `test_reference`). The same fixtures drive
this test: load splats, render with the fixed camera (position z=-8,
fov_x=pi/2, principal point 0.5/0.5, image 123x82), compare the projected
xys/conics, the composited image, and every input gradient of
loss = mean((rgb - crab)^2) — the identical tolerances where possible
(v_quats is loose at 1e-1 in the reference too, "TODO: Fix this test").

Fixtures are read from the reference checkout; skipped when unavailable.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from brush_tpu.camera import Camera, focal_to_fov, fov_to_focal
from brush_tpu.ops.projection import project_splats
from brush_tpu.ops.rasterize_reference import camera_params
from brush_tpu.render import render_splats

FIXTURE_DIR = "/root/reference/crates/brush-render/test_cases"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURE_DIR), reason="reference fixtures not available"
)


def _load_case(name):
    from safetensors import safe_open

    out = {}
    with safe_open(os.path.join(FIXTURE_DIR, f"{name}.safetensors"),
                   framework="np") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def _crab():
    from PIL import Image

    img = Image.open(os.path.join(FIXTURE_DIR, "crab.png")).convert("RGB")
    return np.asarray(img, np.float32) / 255.0


def _camera(w, h):
    # render.rs:734-746: fov pi/2 on width, matched focal for height.
    fov = np.pi * 0.5
    focal = fov_to_focal(fov, w)
    return Camera(
        position=[0.0, 0.0, -8.0], rotation=[1, 0, 0, 0],
        fov_x=focal_to_fov(focal, w), fov_y=focal_to_fov(focal, h),
    )


def _allclose(got, want, rtol, atol, name):
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=rtol, atol=atol,
        err_msg=f"{name} mismatch",
    )


@pytest.mark.parametrize("case", ["tiny_case", "basic_case"])
@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_golden_forward_and_grads(case, backend):
    t = _load_case(case)
    crab = _crab()
    h, w, _ = t["out_img"].shape
    assert crab.shape == (h, w, 3)
    cam = _camera(w, h)
    cp = camera_params(cam, (w, h))
    n = t["means"].shape[0]

    means = jnp.asarray(t["means"])
    log_scales = jnp.asarray(t["scales"])
    quats = jnp.asarray(t["quats"])
    coeffs = jnp.asarray(t["coeffs"])
    raw_op = jnp.asarray(t["opacities"])

    # Projected quantities (ProjectVisible outputs) for visible splats.
    qn = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    proj = project_splats(means, log_scales, qn, cp.viewmat, cp.focal,
                          cp.pixel_center, (w, h))
    vis = np.asarray(proj.visible)
    _allclose(np.asarray(proj.xy)[vis], t["xys"][vis], 1e-4, 1e-4, "xys")
    _allclose(np.asarray(proj.conic)[vis], t["conics"][vis], 1e-4, 5e-4,
              "conics")
    _allclose(np.asarray(proj.depth)[vis], t["depths"][vis], 1e-4, 1e-6,
              "depths")

    # pack_grad_sort=False: golden fixtures gate the EXACT math; the
    # lossy-but-bounded default (bf16-pair conic/color cotangents since
    # round 5) is bounded separately by
    # test_pipeline_perf_variants_match_baseline.
    kw = dict(block_size=64 if backend == "pallas" else 16,
              backend=backend, max_isects=4096, pack_grad_sort=False)

    def loss_fn(means, log_scales, quats, coeffs, raw_op, xy_dummy):
        img, _ = render_splats(means, log_scales, quats, coeffs, raw_op,
                               cp, (w, h), xy_dummy=xy_dummy, **kw)
        return jnp.mean((img[..., :3] - crab) ** 2), img

    xy_dummy = jnp.zeros((n, 2), jnp.float32)
    grads, img = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5),
                          has_aux=True)(means, log_scales, quats, coeffs,
                                        raw_op, xy_dummy)

    _allclose(img[..., :3], t["out_img"], 1e-4, 2e-4, "out_img")
    v_means, v_scales, v_quats, v_coeffs, v_op, v_xy = grads
    # A handful of elements sit on decision boundaries (the alpha >= 1/255
    # cut and the T < 1e-4 early-out): our log-space transmittance rounds
    # them differently than gsplat's multiplicative chain, toggling one
    # borderline contribution (~5e-4) per affected splat. Everything else
    # matches at the reference's own tolerances (render.rs:815-828).
    _allclose(v_means, t["v_means"], 1e-4, 1e-3, "v_means")
    _allclose(v_scales, t["v_scales"], 1e-4, 1e-3, "v_scales")
    _allclose(v_coeffs, t["v_coeffs"], 1e-4, 2e-6, "v_coeffs")
    _allclose(v_op, t["v_opacities"], 1e-4, 1e-4, "v_opacities")
    _allclose(v_xy, t["v_xy"], 1e-4, 1e-3, "v_xy")
    # Reference keeps this one loose (render.rs:829-830 "TODO: Fix").
    _allclose(v_quats, t["v_quats"], 1e-1, 1e-1, "v_quats")

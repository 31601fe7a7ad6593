"""The pallas record pipeline (expand kernel + payload sort + rasterizer)
must reproduce the XLA path bit-for-bit-ish on CPU (interpret mode).

The XLA path (ops/binning.py + ops/rasterize_tiled.py) is itself validated
against the dense oracle and the reference's semantics in test_render_tiled;
this locks the TPU pipeline to it, forward and backward.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from brush_tpu import splats as sp
from brush_tpu.camera import Camera
from brush_tpu.ops.rasterize_reference import camera_params
from brush_tpu.render import render_splats


def _scene(n=300, seed=0, capacity=None):
    rng = np.random.default_rng(seed)
    model = sp.from_random(rng, [-2, -2, -2], [2, 2, 2], count=n, sh_degree=1,
                           capacity=capacity)
    cam = Camera(position=[0, 0, -6.0], rotation=[1, 0, 0, 0],
                 fov_x=np.pi / 3, fov_y=np.pi / 3)
    return model, cam


def _render(model, cam, img_size, backend, **kw):
    cp = camera_params(cam, img_size)
    return render_splats(
        model.means, model.log_scales, model.quats, model.sh_coeffs,
        model.raw_opacity, cp, img_size, active=model.active_mask(),
        backend=backend, **kw,
    )


@pytest.mark.parametrize("img_size", [(64, 48), (48, 64)])
def test_pipeline_matches_xla_forward(img_size):
    model, cam = _scene()
    img_x, aux_x = _render(model, cam, img_size, "xla", block_size=32,
                           max_isects=2048)
    img_p, aux_p = _render(model, cam, img_size, "pallas", block_size=128,
                           max_isects=2048)
    assert int(aux_x.num_isects) == int(aux_p.num_isects)
    assert int(aux_x.num_visible) == int(aux_p.num_visible)
    # Quantization-aware comparison: see conftest.assert_close_quantized.
    from conftest import assert_close_quantized

    assert_close_quantized(img_p, img_x, err_msg="pipeline fwd")


def test_pipeline_matches_xla_grads():
    model, cam = _scene()
    img_size = (64, 48)
    cp = camera_params(cam, img_size)
    tgt = np.zeros((48, 64, 4), np.float32)

    def loss(backend, block):
        def f(means, log_scales, quats, sh, opac):
            # pack_grad_sort=False: this gates the EXACT pipeline math
            # against the XLA backend; the lossy-but-bounded round-5
            # default is bounded by the perf-variants test.
            img, _ = render_splats(
                means, log_scales, quats, sh, opac, cp, img_size,
                active=model.active_mask(), backend=backend,
                block_size=block, max_isects=2048, pack_grad_sort=False,
            )
            return jnp.sum((img - tgt) ** 2)
        return f

    args = (model.means, model.log_scales, model.quats, model.sh_coeffs,
            model.raw_opacity)
    g_p = jax.grad(loss("pallas", 128), argnums=(0, 1, 2, 3, 4))(*args)
    g_x = jax.grad(loss("xla", 32), argnums=(0, 1, 2, 3, 4))(*args)
    from conftest import assert_close_quantized

    for a, b in zip(g_p, g_x):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all()
        scale = max(np.abs(b).max(), 1e-3)
        # A flipped borderline splat's whole gradient contribution toggles;
        # bound the count of such flips, and the bulk by the quantization
        # step (conftest.assert_close_quantized).
        assert_close_quantized(a / scale, b / scale, atol=3e-4,
                               flip_tol=0.05, max_flip_frac=5e-3,
                               err_msg="pipeline grads")


def test_pipeline_pool_overflow_drops_tail():
    # A pool smaller than the true record count must not crash or produce
    # non-finite output (the reference clamps its intersection buffer too,
    # render.rs:199-208).
    model, cam = _scene(n=500, seed=3)
    img, aux = _render(model, cam, (64, 64), "pallas", block_size=128,
                       max_isects=512)
    assert int(aux.num_isects) == 512
    assert np.isfinite(np.asarray(img)).all()


def test_pipeline_empty_scene():
    model, cam = _scene(n=4)
    model = model.replace(means=model.means + 100.0)  # everything off-screen
    img, aux = _render(model, cam, (32, 32), "pallas", block_size=128,
                       max_isects=512)
    assert int(aux.num_isects) == 0
    np.testing.assert_allclose(np.asarray(img), 0.0, atol=1e-7)


def test_pipeline_padding_rows_get_zero_grads():
    model, cam = _scene(n=64, capacity=128)
    img_size = (32, 32)
    cp = camera_params(cam, img_size)

    def f(means):
        img, _ = render_splats(
            means, model.log_scales, model.quats, model.sh_coeffs,
            model.raw_opacity, cp, img_size, active=model.active_mask(),
            backend="pallas", block_size=128, max_isects=1024,
        )
        return jnp.sum(img ** 2)

    g = np.asarray(jax.grad(f)(model.means))
    assert np.isfinite(g).all()
    assert np.abs(g[64:]).max() == 0.0


def test_saturated_tile_no_revival_blowup():
    # Regression: a pixel whose transmittance crosses the 1e-4 early-out
    # mid-block used to "revive" in the next block (the crossing lane is
    # excluded from the carry), making the backward's final_index replay
    # absorb far more than the forward and explode exp-reconstruction into
    # inf/NaN. The early-out must be sticky (rasterize.wgsl:87-90 `done`).
    n = 400
    rng = np.random.default_rng(0)
    model = sp.from_random(rng, [-0.05, -0.05, 0], [0.05, 0.05, 2.0],
                           count=n, sh_degree=0)
    # Dense, fairly opaque splats stacked on one small screen region.
    model = model.replace(
        raw_opacity=model.raw_opacity.at[:n].set(1.5),
        log_scales=model.log_scales.at[:n].set(np.log(0.05)),
    )
    cam = Camera(position=[0, 0, -4.0], rotation=[1, 0, 0, 0],
                 fov_x=np.pi / 3, fov_y=np.pi / 3)
    img_size = (32, 32)
    cp = camera_params(cam, img_size)

    grads = {}
    for backend, block in (("xla", 16), ("pallas", 128)):
        def f(means):
            img, _ = render_splats(
                means, model.log_scales, model.quats, model.sh_coeffs,
                model.raw_opacity, cp, img_size,
                active=model.active_mask(), backend=backend,
                block_size=block, max_isects=4096,
            )
            return jnp.sum(img ** 2)

        g = np.asarray(jax.grad(f)(model.means))
        assert np.isfinite(g).all(), f"{backend} grads not finite"
        assert np.abs(g).max() < 1e4, f"{backend} grads exploded"
        grads[backend] = g
    from conftest import assert_close_quantized

    scale = max(np.abs(grads["xla"]).max(), 1.0)
    assert_close_quantized(grads["pallas"] / scale, grads["xla"] / scale,
                           atol=3e-4, flip_tol=0.05, max_flip_frac=5e-3,
                           err_msg="saturated-tile grads")


def test_pipeline_perf_variants_match_baseline():
    """scan_passes=2 and pack_grad_sort are lossy-but-bounded perf knobs:
    the forward must stay within the quantized tolerance and the gradients
    within the bf16 rounding envelope of the exact pipeline."""
    from conftest import assert_close_quantized

    model, cam = _scene(n=250, seed=7)
    img_size = (64, 48)
    cp = camera_params(cam, img_size)

    def loss(**kw):
        def f(means, log_scales, quats, sh, opac):
            img, _ = render_splats(
                means, log_scales, quats, sh, opac, cp, img_size,
                active=model.active_mask(), backend="pallas",
                block_size=128, max_isects=2048, **kw,
            )
            return jnp.sum(img ** 2)
        return f

    args = (model.means, model.log_scales, model.quats, model.sh_coeffs,
            model.raw_opacity)
    # The baselines must be the EXACT pipeline: scan_passes defaults to 2
    # since round 3 and pack_grad_sort to True since round 5, so without
    # the explicit exact knobs these would self-compare against the lossy
    # variant and bound nothing (r3 advisor finding).
    img_base, _ = _render(model, cam, img_size, "pallas", block_size=128,
                          max_isects=2048, scan_passes=3,
                          pack_grad_sort=False)
    g_base = jax.grad(loss(scan_passes=3, pack_grad_sort=False),
                      argnums=(0, 1, 2, 3, 4))(*args)

    # scan_passes=2: forward truncation <= 2^-16 relative on log T — far
    # inside the quantized-image tolerance.
    img_s2, _ = _render(model, cam, img_size, "pallas", block_size=128,
                        max_isects=2048, scan_passes=2)
    assert_close_quantized(img_s2, img_base, err_msg="scan_passes=2 fwd")

    # pack_grad_sort: v_xy / v_opac exact, conic+color grads rounded to
    # bf16 per record before the per-splat sum (scan_passes=3 isolates the
    # packing error from the scan truncation).
    g_pk = jax.grad(
        loss(pack_grad_sort=True, scan_passes=3), argnums=(0, 1, 2, 3, 4)
    )(*args)
    names = ["means", "log_scales", "quats", "sh", "opac"]
    for name, a, b in zip(names, g_pk, g_base):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all()
        scale = max(np.abs(b).max(), 1e-6)
        # bf16 relative rounding (2^-9) on per-record conic/color grads;
        # sums of ~k records keep relative error at the same scale.
        np.testing.assert_allclose(
            a / scale, b / scale, atol=6e-3,
            err_msg=f"pack_grad_sort grads: {name}",
        )

    # Both knobs together stay finite and close.
    g_both = jax.grad(
        loss(pack_grad_sort=True, scan_passes=2), argnums=(0,)
    )(*args)
    assert np.isfinite(np.asarray(g_both[0])).all()


def test_pack_bf16_pair_roundtrip():
    from brush_tpu.ops.pallas.raster_vjp import (
        _pack_bf16_pair, _unpack_bf16_pair)

    rng = np.random.default_rng(11)
    a = jnp.asarray(rng.normal(size=512).astype(np.float32) * 10.0 ** rng.integers(-6, 6, size=512))
    b = jnp.asarray(rng.normal(size=512).astype(np.float32))
    ra, rb = _unpack_bf16_pair(_pack_bf16_pair(a, b))
    np.testing.assert_allclose(np.asarray(ra), np.asarray(a.astype(jnp.bfloat16).astype(jnp.float32)))
    np.testing.assert_allclose(np.asarray(rb), np.asarray(b.astype(jnp.bfloat16).astype(jnp.float32)))
    # bf16-representable values round-trip exactly (incl. signs and zeros).
    exact = jnp.asarray([0.0, -0.0, 1.5, -3.25, 65280.0, 2.0 ** -20])
    ra, rb = _unpack_bf16_pair(_pack_bf16_pair(exact, -exact))
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(exact))
    np.testing.assert_array_equal(np.asarray(rb), np.asarray(-exact))


@pytest.mark.parametrize("cell", [(2, 1), (2, 2), (4, 2)])
def test_pipeline_cell_grouping_matches_single_tile(cell):
    """Raster-cell grouping (one record per splat x cell of gw x gh tiles)
    must reproduce the per-tile pipeline: the compositing order and the
    contributing record set per pixel are identical — only batch boundaries
    and the cell-local quadratic-form frame differ (borderline alpha flips,
    bounded like the known MXU/VPU sigma divergence)."""
    from conftest import assert_close_quantized

    model, cam = _scene(n=300, seed=5)
    # 80x48 px -> 5x3 tiles: exercises cell grids that don't divide evenly.
    img_size = (80, 48)
    img_1, aux_1 = _render(model, cam, img_size, "pallas", block_size=128,
                           max_isects=2048)
    img_c, aux_c = _render(model, cam, img_size, "pallas", block_size=128,
                           max_isects=2048, cell=cell)
    # Grouping merges same-cell records; the count can only shrink.
    assert int(aux_c.num_isects) <= int(aux_1.num_isects)
    assert int(aux_c.num_dropped) == 0 and int(aux_1.num_dropped) == 0
    assert_close_quantized(img_c, img_1, atol=2e-3, flip_tol=0.05,
                           max_flip_frac=2e-3,
                           err_msg=f"cell {cell} fwd")


def test_pipeline_cell_vmem_clamp_odd_cells():
    """The scoped-VMEM clamp in make_pallas_pipeline floors k_lanes to a
    POWER OF TWO: at cell (3, 1) the naive budget (256*1024)//768 = 341
    would break the pool's max_isects %% k_lanes == 0 invariant (pools pad
    to multiples of 512). Regression for the 2026-08-18 2x2 compile OOM
    fix: the pipeline must build and run at non-power-of-two cell areas
    with large k_lanes requests."""
    from conftest import assert_close_quantized

    model, cam = _scene(n=300, seed=5)
    img_size = (80, 48)
    img_1, _ = _render(model, cam, img_size, "pallas", block_size=128,
                       max_isects=2048)
    # block_size=512 requests k_lanes=512 >> the (3,1) budget of 341.
    img_c, aux_c = _render(model, cam, img_size, "pallas", block_size=512,
                           max_isects=2048, cell=(3, 1))
    assert int(aux_c.num_dropped) == 0
    assert_close_quantized(img_c, img_1, atol=2e-3, flip_tol=0.05,
                           max_flip_frac=2e-3, err_msg="cell (3,1) clamp")


def test_pipeline_cell_grouping_grads():
    from conftest import assert_close_quantized

    model, cam = _scene(n=200, seed=6)
    img_size = (64, 64)
    cp = camera_params(cam, img_size)

    def loss(**kw):
        def f(means, log_scales, quats, sh, opac):
            img, _ = render_splats(
                means, log_scales, quats, sh, opac, cp, img_size,
                active=model.active_mask(), backend="pallas",
                block_size=128, max_isects=2048, **kw,
            )
            return jnp.sum(img ** 2)
        return f

    args = (model.means, model.log_scales, model.quats, model.sh_coeffs,
            model.raw_opacity)
    # pack_grad_sort=False on both sides: the comparison bounds the CELL
    # regrouping, whose record sets differ between configs — the round-5
    # bf16-pair default would add differing rounding noise on top.
    g_1 = jax.grad(loss(pack_grad_sort=False),
                   argnums=(0, 1, 2, 3, 4))(*args)
    g_c = jax.grad(loss(cell=(2, 2), pack_grad_sort=False),
                   argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(g_c, g_1):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all()
        scale = max(np.abs(b).max(), 1e-6)
        assert_close_quantized(a / scale, b / scale, atol=1e-3,
                               flip_tol=0.1, max_flip_frac=5e-3,
                               err_msg="cell grads")


def test_inference_pipeline_bit_identical_and_nondifferentiable():
    """needs_grad=False must change NOTHING about the image — same stable
    sorts on the same keys, same kernels, just two fewer payload rows
    (the depth sort's `order` and the tile sort's splat-id row, which only
    the backward reads). Gradients through it must fail loudly instead of
    autodiffing through the sorts."""
    model, cam = _scene(n=600, seed=11)
    img_size = (80, 48)
    cp = camera_params(cam, img_size)
    args = (model.means, model.log_scales, model.quats, model.sh_coeffs,
            model.raw_opacity)

    img_t, aux_t = render_splats(*args, cp, img_size, backend="pallas",
                                 block_size=128, max_isects=2048)
    img_i, aux_i = render_splats(*args, cp, img_size, backend="pallas",
                                 block_size=128, max_isects=2048,
                                 needs_grad=False)
    np.testing.assert_array_equal(np.asarray(img_t), np.asarray(img_i))
    assert int(aux_t.num_isects) == int(aux_i.num_isects)
    assert int(aux_t.num_dropped) == int(aux_i.num_dropped)

    def loss(means):
        img, _ = render_splats(means, *args[1:], cp, img_size,
                               backend="pallas", block_size=128,
                               max_isects=2048, needs_grad=False)
        return img[..., :3].mean()

    with pytest.raises(Exception, match="inference-only"):
        jax.grad(loss)(model.means)

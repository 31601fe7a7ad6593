"""The train-2d toy gate (reference: crates/train-2d): fit gaussians to a
single fixed-camera image, refinement on, and verify convergence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brush_tpu.camera import Camera, focal_to_fov
from brush_tpu.config import TrainConfig
from brush_tpu.eval import eval_view
from brush_tpu.splats import from_random
from brush_tpu.train import SceneBatch, SplatTrainer, quat_rotate


def synthetic_target(size=64):
    """A colorful smooth target image (stand-in for crab.jpg)."""
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32) / size
    r = 0.5 + 0.5 * np.sin(6.0 * xs) * np.cos(3.0 * ys)
    g = np.exp(-((xs - 0.3) ** 2 + (ys - 0.6) ** 2) / 0.05)
    b = (xs + ys) / 2.0
    return np.stack([r, g, b], axis=-1).clip(0, 1)


def toy_camera(size):
    # train-2d/main.rs:185-205: camera 8 units back, focal ~ image size.
    fov = focal_to_fov(float(size), size)
    return Camera(position=[0, 0, -8.0], rotation=[1, 0, 0, 0], fov_x=fov, fov_y=fov)


def test_quat_rotate_matches_rotmat():
    from brush_tpu.ops.projection import quat_to_rotmat

    rng = np.random.default_rng(0)
    q = rng.normal(size=(16, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    v = rng.normal(size=(16, 3))
    got = np.asarray(quat_rotate(jnp.asarray(q, jnp.float32), jnp.asarray(v, jnp.float32)))
    rot = np.asarray(quat_to_rotmat(jnp.asarray(q, jnp.float32)))
    want = np.einsum("nij,nj->ni", rot, v)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_train2d_converges():
    size = 64
    target = synthetic_target(size)
    cam = toy_camera(size)

    # train-2d/main.rs:217-222: warmup 100, always refine, no alpha reset.
    config = TrainConfig(
        warmup_steps=100,
        max_refine_step=10**9,
        reset_alpha_every_refine=10**9,
        refine_every=100,
        lr_mean=1.5e-4,
        lr_mean_decay_target=1.0,   # decay = 1.0 in the toy
        scale_mean_lr_by_extent=False,
    )

    rng = np.random.default_rng(42)
    splats = from_random(rng, [-2.5, -2.5, -2.5], [2.5, 2.5, 2.5], count=32, sh_degree=0)
    trainer = SplatTrainer(config, raster_block_size=16)
    state = trainer.init_state(splats)

    batch = SceneBatch(gt_image=target, camera=cam, scene_extent=1.0)

    losses = []
    for _ in range(220):
        state, stats = trainer.step(state, batch)
        losses.append(float(stats.loss))

    ev = eval_view(state.splats, cam, target, block_size=16)

    early = np.mean(losses[:10])
    late = np.mean(losses[-10:])
    assert late < early * 0.6, f"loss did not converge: {early:.4f} -> {late:.4f}"
    assert ev.psnr > 14.0, f"PSNR too low: {ev.psnr:.2f}"
    # Refinement ran (iter 101, 201) and produced a live count.
    assert trainer.iter == 220
    assert int(state.splats.n_live) >= 16


def test_pool_overflow_signal_and_growth():
    # A mid-window intersection-pool overflow must be visible
    # (StepStats.num_dropped > 0) and must grow the pool on the very next
    # step — without waiting for a refine boundary.
    size = 64
    target = synthetic_target(size)
    cam = toy_camera(size)
    config = TrainConfig(warmup_steps=10**9, refine_every=10**9)
    rng = np.random.default_rng(0)
    splats = from_random(rng, [-2.5, -2.5, -2.5], [2.5, 2.5, 2.5], count=64,
                         sh_degree=0)
    # Large opaque splats cover every tile -> far more records than the pool.
    splats = splats.replace(
        log_scales=jnp.zeros_like(splats.log_scales),  # scale 1.0
    )
    trainer = SplatTrainer(config, raster_block_size=16)
    trainer._isect_pool = 256
    state = trainer.init_state(splats)
    batch = SceneBatch(gt_image=target, camera=cam, scene_extent=1.0)

    state, stats = trainer.step(state, batch)
    assert int(stats.num_dropped) > 0, "overflow must surface in StepStats"
    # The next step reads the (one-step delayed) signal and doubles the pool.
    state, _ = trainer.step(state, batch)
    assert trainer._isect_pool >= 512
    assert trainer.total_dropped_records > 0


def test_refine_clone_split_prune():
    # Deterministic refinement surgery check on a tiny hand-built state.
    config = TrainConfig(warmup_steps=0, refine_every=1, reset_alpha_every_refine=10**9)
    trainer = SplatTrainer(config, raster_block_size=16)

    rng = np.random.default_rng(1)
    splats = from_random(rng, [-1, -1, -1], [1, 1, 1], count=8, sh_degree=0)
    # Make splat 0 small (clone candidate), splat 1 large (split candidate),
    # splat 2 transparent (prune), splat 3 oversized (prune).
    ls = np.array(splats.log_scales)
    ls[0] = np.log(0.001)
    ls[1] = np.log(0.1)
    ls[3] = np.log(10.0)
    op = np.array(splats.raw_opacity)
    op[2] = -10.0  # sigmoid -> ~5e-5 < 0.005
    splats = splats.replace(
        log_scales=jnp.asarray(ls), raw_opacity=jnp.asarray(op)
    )
    state = trainer.init_state(splats)
    # Force high accumulated gradients on splats 0 and 1.
    accum = np.zeros(splats.capacity, np.float32)
    accum[0] = accum[1] = 1.0
    counts = np.zeros(splats.capacity, np.int32)
    counts[:8] = 1
    state = jax.tree_util.tree_map(lambda x: x, state)
    state.grad_2d_accum = jnp.asarray(accum)
    state.xy_grad_counts = jnp.asarray(counts)

    trainer.iter = 1  # refine fires when iter % refine_every == 1... 1 % 1 == 0
    new_state, stats = trainer._refine(state, splats)
    assert int(stats.num_cloned) == 1
    assert int(stats.num_split) == 1
    assert int(stats.num_pruned_alpha) == 1
    assert int(stats.num_pruned_scale) == 1
    # 8 alive + 2 appends - 2 pruned = 8.
    assert int(stats.n_live) == 8
    assert int(new_state.splats.n_live) == 8
    # Padding rows inert.
    live = int(new_state.splats.n_live)
    assert np.all(np.asarray(new_state.splats.raw_opacity)[live:] < -10)


def test_capacity_shrinks_after_mass_prune():
    # After an opacity-reset-style mass prune, a 4x-oversized capacity
    # buffer must shrink (measured on hardware: 1M capacity carrying 75k
    # live splats tripled the step time).
    size = 32
    target = synthetic_target(size)
    cam = toy_camera(size)
    # densify_grad_thresh=inf: this test is about PRUNING transparent
    # splats; clones/splits of the 40 opaque ones would rebuild the count.
    # (Before the refine_idx > 0 reset guard, the first refine reset ALL
    # opacities to 0.004 — despite reset_alpha_every_refine=1e9 asking for
    # none — and the second refine then pruned everything below 0.005,
    # which is what this test accidentally measured.)
    config = TrainConfig(warmup_steps=0, refine_every=2,
                         reset_alpha_every_refine=10**9,
                         densify_grad_thresh=float("inf"))
    rng = np.random.default_rng(0)
    splats = from_random(rng, [-2, -2, -2], [2, 2, 2], count=900,
                         sh_degree=0, capacity=1024)
    # Make all but 40 splats transparent -> pruned at the first refine.
    op = np.full(1024, -10.0, np.float32)
    op[:40] = 1.0
    splats = splats.replace(raw_opacity=jnp.asarray(op))
    trainer = SplatTrainer(config, raster_block_size=16)
    state = trainer.init_state(splats)
    batch = SceneBatch(gt_image=target, camera=cam, scene_extent=1.0)
    for _ in range(4):
        state, _ = trainer.step(state, batch)
    assert int(state.splats.n_live) < 100
    assert state.splats.capacity <= 256, (
        f"capacity {state.splats.capacity} did not shrink"
    )
    # Training still works after the shrink.
    state, stats = trainer.step(state, batch)
    assert np.isfinite(float(stats.loss))

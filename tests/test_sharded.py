"""Sharded train step on a virtual 8-device CPU mesh vs the single-device
trainer — the multi-chip parity gate (BASELINE.md: PSNR parity with 1-chip)."""

import jax
import jax.numpy as jnp
import numpy as np

from brush_tpu.camera import Camera
from brush_tpu.config import TrainConfig
from brush_tpu.ops.rasterize_reference import camera_params
from brush_tpu.parallel import make_mesh, make_sharded_train_step
from brush_tpu.parallel.sharding import shard_state
from brush_tpu.splats import from_random
from brush_tpu.train import SceneBatch, SplatTrainer


def test_sharded_step_matches_single_device():
    n_dev = len(jax.devices())
    assert n_dev == 8, f"expected 8 virtual devices, got {n_dev}"
    mesh = make_mesh()

    rng = np.random.default_rng(0)
    splats = from_random(rng, [-2, -2, -2], [2, 2, 2], count=50, sh_degree=1)
    config = TrainConfig(warmup_steps=0)
    img_size = (32, 32)
    gt = rng.uniform(0, 1, size=(32, 32, 3)).astype(np.float32)
    cam = Camera(position=[0, 0, -6], rotation=[1, 0, 0, 0], fov_x=1.0, fov_y=1.0)
    cp = camera_params(cam, img_size)

    # Single-device trainer step.
    trainer = SplatTrainer(config, raster_block_size=16)
    state_1 = trainer.init_state(splats)
    batch = SceneBatch(gt_image=gt, camera=cam, scene_extent=1.0)
    state_1, stats_1 = trainer.step(state_1, batch)

    # Sharded step.
    step_fn = make_sharded_train_step(
        mesh, config, splats.capacity, img_size, 3, splats.sh_coeffs.shape[1],
        block_size=16,
    )
    trainer2 = SplatTrainer(config)
    state_8 = shard_state(trainer2.init_state(splats), mesh)
    lr_mean = config.lr_mean_at(0)
    state_8, stats_8 = step_fn(
        state_8, jnp.asarray(gt), cp.viewmat, cp.focal, cp.pixel_center,
        jnp.float32(lr_mean), jnp.int32(0),
    )

    assert abs(float(stats_1.loss) - float(stats_8.loss)) < 1e-5
    assert int(stats_1.num_visible) == int(stats_8.num_visible)
    assert int(stats_1.num_isects) == int(stats_8.num_isects)

    for key in state_1.splats.params():
        a = np.asarray(getattr(state_1.splats, key))
        b = np.asarray(getattr(state_8.splats, key))
        np.testing.assert_allclose(a, b, atol=5e-5, err_msg=f"param {key}")

    np.testing.assert_allclose(
        np.asarray(state_1.grad_2d_accum), np.asarray(state_8.grad_2d_accum),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(state_1.xy_grad_counts), np.asarray(state_8.xy_grad_counts)
    )


def test_sharded_pallas_strip_matches_single_device():
    """The tile-sharded Pallas strip path — raster_tiles < num_tiles plus
    the backward's strip masking of gradient records — must reproduce the
    single-device trainer. Runs the real record pipeline in interpret mode
    (the only way to execute the strip branch without hardware)."""
    mesh = make_mesh()
    rng = np.random.default_rng(2)
    splats = from_random(rng, [-2, -2, -2], [2, 2, 2], count=64, sh_degree=1)
    config = TrainConfig(warmup_steps=0)
    # 4x3 = 12 tiles on 8 devices: tiles_per = 2, so the last strips run
    # past num_tiles (empty-tile handling) and strips are uneven.
    img_size = (64, 48)
    gt = rng.uniform(0, 1, size=(48, 64, 3)).astype(np.float32)
    cam = Camera(position=[0, 0, -6], rotation=[1, 0, 0, 0], fov_x=1.0, fov_y=1.0)
    cp = camera_params(cam, img_size)

    trainer = SplatTrainer(config, raster_block_size=16)
    state_1 = trainer.init_state(splats)
    batch = SceneBatch(gt_image=gt, camera=cam, scene_extent=1.0)
    state_1, stats_1 = trainer.step(state_1, batch)

    step_fn = make_sharded_train_step(
        mesh, config, splats.capacity, img_size, 3, splats.sh_coeffs.shape[1],
        block_size=128, backend="pallas_interpret",
    )
    trainer2 = SplatTrainer(config)
    state_8 = shard_state(trainer2.init_state(splats), mesh)
    state_8, stats_8 = step_fn(
        state_8, jnp.asarray(gt), cp.viewmat, cp.focal, cp.pixel_center,
        jnp.float32(config.lr_mean_at(0)), jnp.int32(0),
    )

    assert abs(float(stats_1.loss) - float(stats_8.loss)) < 1e-5
    assert int(stats_1.num_visible) == int(stats_8.num_visible)
    assert int(stats_1.num_isects) == int(stats_8.num_isects)
    np.testing.assert_allclose(
        np.asarray(state_1.grad_2d_accum), np.asarray(state_8.grad_2d_accum),
        atol=1e-4,
    )
    for key in state_1.splats.params():
        a = np.asarray(getattr(state_1.splats, key))
        b = np.asarray(getattr(state_8.splats, key))
        np.testing.assert_allclose(a, b, atol=5e-4, err_msg=f"param {key}")


def test_sharded_pallas_strip_imbalanced_tiles():
    """Load-imbalance case (SURVEY hard part #5): nearly every record lands
    in ONE device's tile strip while the others are empty. The strip path
    must still reproduce the single-device result."""
    mesh = make_mesh()
    rng = np.random.default_rng(5)
    # Cluster all splats so they project into the top-left corner tiles.
    splats = from_random(rng, [-2.0, -2.0, 0], [-1.2, -1.2, 0.5], count=64,
                         sh_degree=0)
    config = TrainConfig(warmup_steps=0)
    img_size = (64, 64)  # 4x4 = 16 tiles over 8 devices
    gt = rng.uniform(0, 1, size=(64, 64, 3)).astype(np.float32)
    cam = Camera(position=[0, 0, -6], rotation=[1, 0, 0, 0], fov_x=1.0, fov_y=1.0)
    cp = camera_params(cam, img_size)

    trainer = SplatTrainer(config, raster_block_size=16)
    state_1 = trainer.init_state(splats)
    state_1, stats_1 = trainer.step(
        state_1, SceneBatch(gt_image=gt, camera=cam, scene_extent=1.0))
    assert int(stats_1.num_isects) > 0

    step_fn = make_sharded_train_step(
        mesh, config, splats.capacity, img_size, 3, splats.sh_coeffs.shape[1],
        block_size=128, backend="pallas_interpret",
    )
    trainer2 = SplatTrainer(config)
    state_8 = shard_state(trainer2.init_state(splats), mesh)
    state_8, stats_8 = step_fn(
        state_8, jnp.asarray(gt), cp.viewmat, cp.focal, cp.pixel_center,
        jnp.float32(config.lr_mean_at(0)), jnp.int32(0),
    )
    assert abs(float(stats_1.loss) - float(stats_8.loss)) < 1e-5
    assert int(stats_1.num_isects) == int(stats_8.num_isects)
    np.testing.assert_allclose(
        np.asarray(state_1.grad_2d_accum), np.asarray(state_8.grad_2d_accum),
        atol=1e-4,
    )


def test_sharded_step_multiple_iterations():
    mesh = make_mesh()
    rng = np.random.default_rng(1)
    splats = from_random(rng, [-2, -2, -2], [2, 2, 2], count=30, sh_degree=0)
    config = TrainConfig(warmup_steps=0)
    img_size = (16, 16)
    gt = rng.uniform(0, 1, size=(16, 16, 3)).astype(np.float32)
    cam = Camera(position=[0, 0, -6], rotation=[1, 0, 0, 0], fov_x=1.0, fov_y=1.0)
    cp = camera_params(cam, img_size)

    step_fn = make_sharded_train_step(
        mesh, config, splats.capacity, img_size, 3, 1, block_size=16
    )
    trainer = SplatTrainer(config)
    state = shard_state(trainer.init_state(splats), mesh)
    losses = []
    for i in range(5):
        state, stats = step_fn(
            state, jnp.asarray(gt), cp.viewmat, cp.focal, cp.pixel_center,
            jnp.float32(config.lr_mean_at(i)), jnp.int32(i),
        )
        losses.append(float(stats.loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()

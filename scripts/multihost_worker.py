"""One process of the multi-host smoke test (see tests/test_multihost.py).

Runs jax.distributed over CPU processes: each process owns 4 virtual
devices; the global mesh spans all processes; a few sharded train steps run
SPMD and process 0 prints the loss sequence for the parent test to compare
against a single-process run.

Usage: python scripts/multihost_worker.py <coordinator> <nprocs> <pid> <steps>
"""
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def place(x, mesh, spec):
    """Multihost-safe placement: every process holds the full host value and
    materializes only its addressable shards."""
    from jax.sharding import NamedSharding

    x = np.asarray(x)
    s = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])


def main():
    coordinator, nprocs, pid, steps = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
    )
    from brush_tpu.parallel import multihost

    multihost.initialize(coordinator, nprocs, pid)
    assert jax.process_count() == nprocs
    n_dev = len(jax.devices())

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from brush_tpu.camera import Camera
    from brush_tpu.config import TrainConfig
    from brush_tpu.ops.rasterize_reference import camera_params
    from brush_tpu.parallel import make_mesh, make_sharded_train_step
    from brush_tpu.splats import from_random
    from brush_tpu.train import SplatTrainer

    mesh = make_mesh()
    rng = np.random.default_rng(0)
    capacity = 256
    splats = from_random(rng, [-2, -2, -2], [2, 2, 2], count=128,
                         sh_degree=1, capacity=capacity)
    config = TrainConfig(warmup_steps=0)
    img_size = (48, 32)
    # Per-process view decoding (multihost.process_view_slice): each process
    # renders only its own slice of the synthetic views, then feeds the
    # global batch order (views are tiny; the slice proves the plumbing).
    n_views = 4
    my_views = multihost.process_view_slice(n_views)
    gts = {
        i: np.random.default_rng(100 + i).uniform(
            0, 1, size=(32, 48, 3)
        ).astype(np.float32)
        for i in range(n_views)
    }
    assert set(my_views) <= set(gts)
    cam = Camera(position=[0, 0, -6], rotation=[1, 0, 0, 0],
                 fov_x=1.0, fov_y=1.0)
    cp = camera_params(cam, img_size)

    step_fn = make_sharded_train_step(
        mesh, config, capacity, img_size, 3, splats.sh_coeffs.shape[1],
        block_size=16,
    )
    trainer = SplatTrainer(config)
    state = trainer.init_state(splats)
    state = jax.tree_util.tree_map(
        lambda x: place(
            x, mesh,
            P("shard") if (hasattr(x, "ndim") and x.ndim >= 1
                           and x.shape[0] % n_dev == 0) else P(),
        ),
        state,
    )

    losses = []
    for i in range(steps):
        gt = place(gts[i % n_views], mesh, P())
        state, stats = step_fn(
            state, gt, place(cp.viewmat, mesh, P()),
            place(cp.focal, mesh, P()), place(cp.pixel_center, mesh, P()),
            jnp.float32(config.lr_mean_at(i)), jnp.int32(i),
        )
        losses.append(float(stats.loss))
    if multihost.is_coordinator():
        print("MULTIHOST_LOSSES " + " ".join(f"{v:.6f}" for v in losses),
              flush=True)
        print(f"MULTIHOST_OK devices={n_dev} procs={jax.process_count()}",
              flush=True)


if __name__ == "__main__":
    main()

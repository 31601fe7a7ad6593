"""Multi-host smoke test: 2 jax.distributed CPU processes, 4 devices each,
running the sharded train step SPMD over the 8-device global mesh — the
multi-process analog SURVEY.md §4 calls for. Loss sequence must match a
single-process 8-device run of the same configuration.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
STEPS = 3


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _reference_losses():
    """Single-process 8-device run of the worker's exact configuration."""
    import jax
    import jax.numpy as jnp

    from brush_tpu.camera import Camera
    from brush_tpu.config import TrainConfig
    from brush_tpu.ops.rasterize_reference import camera_params
    from brush_tpu.parallel import make_mesh, make_sharded_train_step
    from brush_tpu.parallel.sharding import shard_state
    from brush_tpu.splats import from_random
    from brush_tpu.train import SplatTrainer

    mesh = make_mesh()
    rng = np.random.default_rng(0)
    capacity = 256
    splats = from_random(rng, [-2, -2, -2], [2, 2, 2], count=128,
                         sh_degree=1, capacity=capacity)
    config = TrainConfig(warmup_steps=0)
    img_size = (48, 32)
    gts = {
        i: np.random.default_rng(100 + i).uniform(
            0, 1, size=(32, 48, 3)
        ).astype(np.float32)
        for i in range(4)
    }
    cam = Camera(position=[0, 0, -6], rotation=[1, 0, 0, 0],
                 fov_x=1.0, fov_y=1.0)
    cp = camera_params(cam, img_size)
    step_fn = make_sharded_train_step(
        mesh, config, capacity, img_size, 3, splats.sh_coeffs.shape[1],
        block_size=16,
    )
    trainer = SplatTrainer(config)
    state = shard_state(trainer.init_state(splats), mesh)
    losses = []
    for i in range(STEPS):
        state, stats = step_fn(
            state, jnp.asarray(gts[i % 4]), cp.viewmat, cp.focal,
            cp.pixel_center, jnp.float32(config.lr_mean_at(i)), jnp.int32(i),
        )
        losses.append(float(stats.loss))
    return losses


@pytest.mark.slow
def test_two_process_training_matches_single_process():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "PYTHONPATH")}
    procs = [
        subprocess.Popen(
            [sys.executable, "scripts/multihost_worker.py",
             coordinator, "2", str(pid), str(STEPS)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    lines = [ln for ln in outs[0].splitlines()
             if ln.startswith("MULTIHOST_LOSSES")]
    assert lines, f"no loss line from coordinator:\n{outs[0][-4000:]}"
    got = np.array([float(v) for v in lines[0].split()[1:]])
    assert "MULTIHOST_OK devices=8 procs=2" in outs[0]

    want = np.array(_reference_losses())
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert np.isfinite(got).all()

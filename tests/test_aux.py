"""Auxiliary subsystems: checkpoint roundtrip, u32 packing, metrics, profiler."""

import jax
import jax.numpy as jnp
import numpy as np

from brush_tpu.config import TrainConfig
from brush_tpu.render import pack_rgba_u32
from brush_tpu.splats import from_random
from brush_tpu.train import SplatTrainer
from brush_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from brush_tpu.utils.metrics import MetricsLogger
from brush_tpu.utils.profiler import reset_timings, set_sync_mode, span, timings


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    splats = from_random(rng, [-1, -1, -1], [1, 1, 1], count=17, sh_degree=1)
    trainer = SplatTrainer(TrainConfig())
    state = trainer.init_state(splats)
    state.grad_2d_accum = state.grad_2d_accum.at[0].set(3.5)
    key = jax.random.PRNGKey(7)

    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state, step=123, key=key, config=trainer.config)
    state2, step, key2, config = load_checkpoint(path)

    assert step == 123
    assert config["warmup_steps"] == 500
    assert int(state2.splats.n_live) == 17
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(key)), np.asarray(jax.random.key_data(key2))
    )
    for k in state.splats.params():
        np.testing.assert_array_equal(
            np.asarray(getattr(state.splats, k)), np.asarray(getattr(state2.splats, k))
        )
    np.testing.assert_array_equal(
        np.asarray(state.opt.m["means"]), np.asarray(state2.opt.m["means"])
    )
    assert float(state2.grad_2d_accum[0]) == 3.5


def test_pack_rgba_u32():
    img = jnp.asarray([[[1.0, 0.0, 0.5, 1.0]]])
    packed = np.asarray(pack_rgba_u32(img))
    assert packed.dtype == np.uint32
    assert packed[0, 0] == 255 | (0 << 8) | (127 << 16) | (255 << 24)
    # Out-of-range values clamp.
    img2 = jnp.asarray([[[2.0, -1.0, 0.0, 0.0]]])
    assert np.asarray(pack_rgba_u32(img2))[0, 0] == 255


def test_metrics_logger(tmp_path):
    path = str(tmp_path / "m.jsonl")
    m = MetricsLogger(jsonl_path=path, console_every=1000)
    for i in range(5):
        m.log(i, loss=0.5 - i * 0.01, splats=100 + i)
    rate = m.iters_per_sec()
    m.close()
    import json

    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 5
    assert lines[2]["splats"] == 102
    assert rate >= 0


def test_profiler_sync_spans():
    reset_timings()
    set_sync_mode(True)
    x = jnp.ones((128, 128))
    with span("matmul", x):
        y = x @ x
    with span("matmul", y):
        y = y @ y
    set_sync_mode(False)
    t = timings()
    assert "matmul" in t and t["matmul"] > 0

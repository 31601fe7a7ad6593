"""Reproduce the r5 castle NaN collapse from the pre-collapse checkpoint.

The 2026-08-20 castle run (runs/r5_castle_default) was healthy at step 3000
(eval PSNR 31.3), hit the scheduled opacity reset at the step-3001 refine,
mass-pruned at 3101, and by step ~3120 every live splat's params were NaN
(verified in ckpt_final.npz). This resumes from ckpt_0003000 and steps
through the window, checking params for NaN each step to find the first
poisoned step, then localizes the NaN leaf in the gradient tree.

Usage: python scripts/repro_nan.py [n_steps]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faulthandler
import signal

faulthandler.register(signal.SIGUSR1)

import numpy as np
import jax
import jax.numpy as jnp

from brush_tpu.config import TrainConfig
from brush_tpu.datasets.loading import load_dataset
from brush_tpu.datasets.loader import SceneLoader
from brush_tpu.train import SplatTrainer
from brush_tpu.utils.checkpoint import load_checkpoint

CKPT = "runs/r5_castle_default/ckpt_0003000.npz"
N_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 160


def tree_nan_report(tree, name):
    bad = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            n = int(jnp.isnan(leaf).sum())
            if n:
                bad.append((jax.tree_util.keystr(path), n, leaf.shape))
    if bad:
        print(f"  !! NaNs in {name}:")
        for p, n, s in bad:
            print(f"     {p}: {n} NaNs, shape {s}")
    return bool(bad)


def main():
    print("loading dataset...", flush=True)
    ds = load_dataset("data/castle_800.zip")
    print(f"dataset: {len(ds.train.views)} train views", flush=True)
    config = TrainConfig()
    trainer = SplatTrainer(config, raster_block_size=512)

    print("loading checkpoint...", flush=True)
    state, start_step, key, _ = load_checkpoint(CKPT)
    if key is not None:
        trainer._key = key
    trainer.iter = start_step
    print(f"resumed at step {start_step}, n_live={int(state.splats.n_live)}, "
          f"capacity={state.splats.capacity}", flush=True)

    loader = SceneLoader(ds.train, seed=config.seed)
    # Replicate the original run's stream position: steps 0..3000 consumed
    # 3001 batches before the checkpoint; skip them so step 3001 sees the
    # same view the original saw (the collapse is data-dependent — with a
    # restarted stream the window trains through cleanly).
    if "--ff" in sys.argv:
        for _ in range(start_step):
            loader.next_batch()
        print(f"fast-forwarded loader by {start_step} batches", flush=True)
    prev_state = state
    try:
        for step in range(start_step, start_step + N_STEPS):
            batch = loader.next_batch()
            prev_state = state
            state, stats = trainer.step(state, batch)
            nan_op = int(jnp.isnan(state.splats.raw_opacity).sum())
            nan_mean = int(jnp.isnan(state.splats.means).sum())
            if step % 10 == 0 or nan_op or nan_mean:
                print(f"step {step}: loss={float(stats.loss):.5f} "
                      f"vis={int(stats.num_visible)} isects={int(stats.num_isects)} "
                      f"live={int(state.splats.n_live)} "
                      f"nan_op={nan_op} nan_means={nan_mean}", flush=True)
            if trainer.last_refine_stats is not None:
                rs = trainer.last_refine_stats
                print(f"  refine@{step}: cloned={int(rs.num_cloned)} "
                      f"split={int(rs.num_split)} "
                      f"pruned_a={int(rs.num_pruned_alpha)}", flush=True)
            if nan_op or nan_mean:
                print(f"FIRST NaN at step {step}; dumping pre-step state + batch",
                      flush=True)
                np.savez(
                    "/tmp/nan_prestate.npz",
                    **{f"param/{k}": np.asarray(v)
                       for k, v in prev_state.splats.params().items()},
                    **{f"adam_m/{k}": np.asarray(v)
                       for k, v in prev_state.opt.m.items()},
                    **{f"adam_v/{k}": np.asarray(v)
                       for k, v in prev_state.opt.v.items()},
                    adam_count=np.asarray(prev_state.opt.count),
                    n_live=np.asarray(prev_state.splats.n_live),
                    grad_2d_accum=np.asarray(prev_state.grad_2d_accum),
                    xy_grad_counts=np.asarray(prev_state.xy_grad_counts),
                    step=step,
                )
                tree_nan_report(prev_state.splats.params(), "pre-step params")
                tree_nan_report(state.splats.params(), "post-step params")
                tree_nan_report(state.opt.m, "post-step adam m")
                break
        else:
            print("no NaN in window", flush=True)
    finally:
        loader.close()


if __name__ == "__main__":
    main()

"""End-to-end training on the real chip: synthetic scene, densify on,
PSNR-gated. Capacity and the intersection pool are pre-sized so the whole
run uses one compiled step function (axon recompiles are minutes each)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(source="/tmp/synth_scene.zip", iters=1500, capacity=16384,
         init_count=2000, eval_every=500, sh_degree=1, block=512):
    iters, capacity, init_count, eval_every, sh_degree, block = (
        int(iters), int(capacity), int(init_count), int(eval_every),
        int(sh_degree), int(block))
    import jax

    from brush_tpu.config import TrainConfig
    from brush_tpu.datasets import load_dataset
    from brush_tpu.datasets.loader import SceneLoader
    from brush_tpu.datasets.loading import LoadDatasetArgs
    from brush_tpu.eval import eval_stats
    from brush_tpu.splats import from_random
    from brush_tpu.train import SplatTrainer

    ds = load_dataset(source, LoadDatasetArgs(eval_split_every=8))
    print(f"{len(ds.train.views)} train / {len(ds.eval.views)} eval views, "
          f"{ds.train.views[0].image.shape}", flush=True)

    config = TrainConfig()
    center, extent = ds.train.bounds(0.0, 0.0)
    bext = float(np.linalg.norm(extent))
    c2, e2 = ds.train.bounds(bext * 0.25, bext)
    rng = np.random.default_rng(config.seed)
    splats = from_random(rng, c2 - e2, c2 + e2, count=init_count,
                         sh_degree=sh_degree, capacity=capacity)

    trainer = SplatTrainer(config, raster_block_size=block)
    trainer._isect_pool = 1 << 20
    state = trainer.init_state(splats)
    loader = SceneLoader(ds.train, seed=config.seed)

    t_start = time.time()
    t0 = None
    for step in range(iters):
        batch = loader.next_batch()
        state, stats = trainer.step(state, batch)
        if step == 0:
            print(f"first step (compile): {time.time()-t_start:.0f}s",
                  flush=True)
            t0 = time.time()
        if step % 100 == 0 and step > 0:
            print(f"step {step:5d} loss {float(stats.loss):.5f} "
                  f"splats {int(state.splats.n_live)} "
                  f"({step / (time.time() - t0):.2f} it/s)", flush=True)
        if eval_every and step > 0 and step % eval_every == 0:
            views = [(v.camera, v.image) for v in ds.eval.views]
            evals = eval_stats(state.splats, views, block_size=block)
            print(f"  eval PSNR {np.mean([e.psnr for e in evals]):.2f} "
                  f"SSIM {np.mean([e.ssim for e in evals]):.4f}", flush=True)
    loader.close()

    views = [(v.camera, v.image) for v in ds.eval.views]
    evals = eval_stats(state.splats, views, block_size=block)
    dt = time.time() - t0
    print(f"FINAL: PSNR {np.mean([e.psnr for e in evals]):.2f} "
          f"SSIM {np.mean([e.ssim for e in evals]):.4f} "
          f"splats {int(state.splats.n_live)} "
          f"{(iters - 1) / dt:.2f} it/s ({dt:.0f}s train)", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])

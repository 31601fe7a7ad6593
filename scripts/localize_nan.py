"""Localize the step-3026 NaN gradient from the dumped pre-state.

Loads /tmp/nan_prestate.npz (written by repro_nan.py at the first NaN),
regenerates the exact batch (loader draw #3026 from seed 42), and computes
grads of the trainer's loss under both rasterizer backends. Reports which
gradient leaves/rows are NaN and whether the XLA lockstep backend agrees —
separating a Pallas kernel bug from shared projection/SH/loss math.

Usage: python scripts/localize_nan.py [pallas|xla|both]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from brush_tpu.config import TrainConfig
from brush_tpu.datasets.loading import load_dataset
from brush_tpu.render import render_splats
from brush_tpu.ops.rasterize_reference import camera_params
from brush_tpu.ssim import Ssim

MODE = sys.argv[1] if len(sys.argv) > 1 else "both"
POOL = 1 << 22
BLOCK = 512


def get_batch(step):
    ds = load_dataset("data/castle_800.zip")
    rng = np.random.default_rng(TrainConfig().seed)
    idx = [int(rng.integers(len(ds.train.views))) for _ in range(step + 1)][-1]
    view = ds.train.views[idx]
    print(f"batch: view {idx}", flush=True)
    return view


def main():
    d = np.load("/tmp/nan_prestate.npz")
    step = int(d["step"])
    view = get_batch(step)
    gt = jnp.asarray(view.image)[..., :3]
    h, w = gt.shape[:2]
    cam = camera_params(view.camera, (w, h))

    params = {
        "means": jnp.asarray(d["param/means"]),
        "log_scales": jnp.asarray(d["param/log_scales"]),
        "quats": jnp.asarray(d["param/quats"]),
        "sh_coeffs": jnp.asarray(d["param/sh_coeffs"]),
        "raw_opacity": jnp.asarray(d["param/raw_opacity"]),
    }
    capacity = params["means"].shape[0]
    n_live = int(d["n_live"])
    active = jnp.arange(capacity) < n_live
    cfg = TrainConfig()
    ssim = Ssim(cfg.ssim_window_size, 3)

    def loss_fn(params, xy_dummy, backend):
        img, aux = render_splats(
            params["means"], params["log_scales"], params["quats"],
            params["sh_coeffs"], params["raw_opacity"],
            cam, (w, h), xy_dummy=xy_dummy, active=active,
            block_size=BLOCK, max_isects=POOL, backend=backend,
        )
        pred = img[..., :3]
        l1 = jnp.mean(jnp.abs(pred - gt))
        ssim_val = ssim.ssim(img[None, ..., :3], gt[None, ..., :3])
        loss = l1 * (1.0 - cfg.ssim_weight) - ssim_val * cfg.ssim_weight
        return loss, aux

    xy_dummy = jnp.zeros((capacity, 2), jnp.float32)
    for backend in (["pallas", "xla"] if MODE == "both" else [MODE]):
        print(f"=== backend {backend}", flush=True)
        (loss, aux), (pg, xg) = jax.jit(
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True),
            static_argnames=("backend",),
        )(params, xy_dummy, backend)
        print(f"loss={float(loss):.6f} isects={int(aux.num_isects)} "
              f"vis={int(aux.num_visible)} dropped={int(aux.num_dropped)}",
              flush=True)
        any_nan = False
        for k, g in {**pg, "xy_dummy": xg}.items():
            g = np.asarray(g)
            n = np.isnan(g).sum()
            if n:
                any_nan = True
                rows = np.unique(np.argwhere(np.isnan(g))[:, 0])
                print(f"  grad[{k}]: {n} NaNs in {len(rows)} rows; "
                      f"first rows {rows[:8]}", flush=True)
                np.save(f"/tmp/nan_rows_{backend}_{k}.npy", rows)
        if not any_nan:
            print("  grads clean", flush=True)


if __name__ == "__main__":
    main()

"""Which outputs does a timed sync actually force? (round-5 probe)

measure_r5b's fixed-params train step reads ~52.7 ms syncing only the
returned loss, while the same fwd+bwd as a standalone value_and_grad
reads ~114.6 ms — mutually impossible if one dispatched program always
runs to completion. Hypothesis: the axon tunnel materializes outputs
per-fetch, so syncing the loss (whose cone is the forward only) never
pays for the backward+Adam. This times the SAME jitted train step,
varying only which output the batch sync reads:

  A. sync loss                 (the measurement measure_r5b/bench used)
  B. sync updated params leaf  (cone = fwd + bwd + Adam)
  C. block_until_ready on everything

and the standalone value_and_grad syncing loss vs a grad leaf.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from brush_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
import jax.numpy as jnp
import numpy as np

from scripts.profile_r3 import IMG, MAX_ISECTS, build_inputs, report

from brush_tpu.render import render_splats
from brush_tpu.optim import init_adam, adam_step


def timed(fn, sync, iters=6, batch=8):
    out = fn()
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(batch):
            out = fn()
        sync(out)
        times.append((time.perf_counter() - t0) / batch)
    return sorted(times)[len(times) // 2]


def main():
    cp, args = build_inputs()
    gt = jnp.zeros((IMG[1], IMG[0], 3), jnp.float32)
    params = {
        "means": args[0], "log_scales": args[1], "quats": args[2],
        "sh_coeffs": args[3], "raw_opacity": args[4],
    }
    opt = init_adam(params)

    def loss_fn(p):
        img, _ = render_splats(
            p["means"], p["log_scales"], p["quats"], p["sh_coeffs"],
            p["raw_opacity"], cp, IMG, block_size=512,
            max_isects=MAX_ISECTS)
        return jnp.mean(jnp.abs(img[..., :3] - gt))

    @jax.jit
    def train_step(params, opt):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        lrs = {"means": 1.6e-4, "raw_opacity": 5e-2, "sh_coeffs": 4e-3,
               "quats": 2e-3, "log_scales": 1e-2}
        params, opt = adam_step(params, grads, opt, lrs)
        return params, opt, loss

    step = lambda: train_step(params, opt)
    report("train: sync loss only", timed(
        step, lambda out: np.asarray(jnp.ravel(out[2])[:1])))
    report("train: sync updated means[0]", timed(
        step, lambda out: np.asarray(jnp.ravel(out[0]["means"])[:1])))
    report("train: block_until_ready(all)", timed(
        step, lambda out: jax.block_until_ready(out)))

    vg = jax.jit(jax.value_and_grad(loss_fn))
    g = lambda: vg(params)
    report("value_and_grad: sync loss", timed(
        g, lambda out: np.asarray(jnp.ravel(out[0])[:1])))
    report("value_and_grad: sync g_means", timed(
        g, lambda out: np.asarray(jnp.ravel(out[1]["means"])[:1])))


if __name__ == "__main__":
    main()

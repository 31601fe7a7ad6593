"""Decompose the headline-fwd vs train-step anomaly (round 5).

measure_r5b measured train (fwd+bwd+Adam) at 52.3 ms amortized but the
image-returning headline fwd at 54.4 ms — while the isolated bwd raster
alone costs 37 ms. Those three numbers are mutually inconsistent unless
either (a) returning the assembled image costs ~as much as the whole
backward, or (b) an isolated-kernel measurement artifact inflates the
bwd number. This script separates output-materialization cost from
backward marginal cost with amortized variants of the SAME pipeline:

  1. fwd -> (img, num_dropped)     (the bench headline)
  2. fwd -> mean(img) scalar       (loss only: image never leaves XLA)
  3. value_and_grad(loss)          (adds the whole backward)
  4. fwd infer -> (img, dropped)   (needs_grad=False payload savings)

Usage: python scripts/decompose_fwd.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from brush_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
import jax.numpy as jnp

from scripts.profile_r3 import IMG, MAX_ISECTS, build_inputs, median_time, report

from brush_tpu.render import render_splats


def main():
    cp, args = build_inputs()

    def fwd_full(means, log_scales, quats, sh_coeffs, raw_op):
        img, aux = render_splats(
            means, log_scales, quats, sh_coeffs, raw_op, cp, IMG,
            block_size=512, max_isects=MAX_ISECTS)
        return img, aux.num_dropped

    def fwd_loss(means, log_scales, quats, sh_coeffs, raw_op):
        img, _ = render_splats(
            means, log_scales, quats, sh_coeffs, raw_op, cp, IMG,
            block_size=512, max_isects=MAX_ISECTS)
        return jnp.mean(jnp.abs(img[..., :3]))

    def fwd_infer(means, log_scales, quats, sh_coeffs, raw_op):
        img, aux = render_splats(
            means, log_scales, quats, sh_coeffs, raw_op, cp, IMG,
            block_size=512, max_isects=MAX_ISECTS, needs_grad=False)
        return img, aux.num_dropped

    grad_loss = jax.value_and_grad(fwd_loss, argnums=(0, 1, 2, 3, 4))

    report("fwd -> (img, dropped)  [headline]", median_time(fwd_full, args))
    report("fwd -> mean(img)       [loss only]", median_time(fwd_loss, args))
    report("value_and_grad(loss)   [fwd+bwd]", median_time(grad_loss, args))
    report("fwd infer -> (img, dropped)", median_time(fwd_infer, args))


if __name__ == "__main__":
    main()

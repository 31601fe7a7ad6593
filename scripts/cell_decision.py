"""Cell-grouping decision data (VERDICT r4 item 6).

Measures the multi-tile coverage factor (records per producing splat) of
a TRAINED model across its eval views, then times the bench-path forward
at cell (1,1) vs (2,2) on the trained distribution. The r3 measurement
rejected 2x2 at the synthetic bench scene (coverage 1.56x); this checks
whether a densified real model's distribution changes the answer, and
documents the resulting default policy.

Usage: python scripts/cell_decision.py <ckpt.npz> [--time]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from brush_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from brush_tpu.datasets.loading import load_dataset
from brush_tpu.utils.checkpoint import load_checkpoint
from brush_tpu.ops.projection import project_splats
from brush_tpu.ops.binning import precompute_tile_masks
from brush_tpu.ops.rasterize_reference import camera_params
from brush_tpu.render import render_splats


def main():
    ckpt = sys.argv[1]
    state, step, _, _ = load_checkpoint(ckpt)
    sp = state.splats
    ds = load_dataset("data/castle_800.zip")
    opac = jax.nn.sigmoid(sp.raw_opacity)
    quats_n = sp.quats / jnp.linalg.norm(
        sp.quats, axis=-1, keepdims=True).clip(1e-12)

    print(f"{ckpt} @ step {step}: n_live={int(sp.n_live)}")
    for cell in ((1, 1), (2, 2)):
        covs = []
        for v in ds.eval.views[:4]:
            h, w = v.image.shape[:2]
            cp = camera_params(v.camera, (w, h))
            proj = project_splats(sp.means, sp.log_scales, quats_n,
                                  cp.viewmat, cp.focal, cp.pixel_center,
                                  (w, h), active=sp.active_mask())
            masks = precompute_tile_masks(proj, opac, cell=cell)
            producing = np.asarray(proj.visible & (masks.counts > 0))
            counts = np.asarray(jnp.where(producing, masks.counts, 0))
            covs.append(counts.sum() / max(producing.sum(), 1))
        print(f"cell {cell}: coverage factor (records/producer) over 4 "
              f"views: {np.mean(covs):.3f} (min {min(covs):.3f} "
              f"max {max(covs):.3f})")

    if "--time" in sys.argv:
        # --right-size: give each cell a pool sized to its own measured
        # record count (x1.25, rounded to k_lanes) instead of a shared
        # 2M pool — the fixed pool runs every pool-scale stage (sorts,
        # expand) at the SAME size for both cells, erasing exactly the
        # advantage cell grouping exists to buy.
        right_size = "--right-size" in sys.argv
        v = ds.eval.views[0]
        h, w = v.image.shape[:2]
        cp = camera_params(v.camera, (w, h))
        for cell in ((1, 1), (2, 2)):
            mi = 1 << 21
            if right_size:
                probe = jax.jit(lambda cell=cell: render_splats(
                    sp.means, sp.log_scales, sp.quats, sp.sh_coeffs,
                    sp.raw_opacity, cp, (w, h), active=sp.active_mask(),
                    block_size=512, max_isects=1 << 21,
                    cell=cell)[1].num_isects)
                n_rec = int(jax.block_until_ready(probe()))
                mi = ((int(n_rec * 1.25) + 511) // 512) * 512
                print(f"cell {cell}: right-sized pool {mi} "
                      f"(records {n_rec})", flush=True)

            @jax.jit
            def fwd(cell=cell, mi=mi):
                img, aux = render_splats(
                    sp.means, sp.log_scales, sp.quats, sp.sh_coeffs,
                    sp.raw_opacity, cp, (w, h), active=sp.active_mask(),
                    block_size=512, max_isects=mi, cell=cell)
                return img, aux.num_isects
            img, iso = jax.block_until_ready(fwd())
            ts = []
            for _ in range(6):  # amortized batches: cancel the ~27 ms
                t0 = time.perf_counter()  # per-sync tunnel constant
                for _ in range(8):
                    img, iso = fwd()
                np.asarray(iso)
                ts.append((time.perf_counter() - t0) / 8)
            print(f"cell {cell}: fwd median {np.median(ts)*1e3:.2f} ms "
                  f"amortized (isects {int(iso)})", flush=True)


if __name__ == "__main__":
    main()

"""Run the REAL pipeline's captured records through the raster on HW.

/tmp/capture_cpu.npz holds the actual (packed, starts, ends, tile_ids)
the real render_splats pipeline produced on CPU for the divergent scene,
plus its raster outputs. Feeding the SAME records to the compiled TPU
kernel separates:
  HW(records_cpu) != CPU(records_cpu)  -> raster kernel diverges on real
                                          record content;
  HW(records_cpu) == CPU(records_cpu)  -> the TPU-side records themselves
                                          must differ (upstream glue).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from brush_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()
import jax.numpy as jnp

from brush_tpu.ops.pallas.rasterize_fwd import rasterize_fwd_pallas

d = np.load("/tmp/capture_cpu.npz")
packed = jnp.asarray(d["packed"])
starts = jnp.asarray(d["starts"])
ends = jnp.asarray(d["ends"])
tile_ids = jnp.asarray(d["tile_ids"])
num_tiles = tile_ids.shape[0]
tiles_x = 32
max_isects = packed.shape[1] - 512

img_hw, lt_hw, fx_hw = rasterize_fwd_pallas(
    packed, starts, ends, tile_ids, tiles_x=tiles_x, num_tiles=num_tiles,
    max_isects=max_isects, k_lanes=512, interpret=False,
    tiles_per_step=8, n_buf=6, scan_passes=2)
img_hw = np.asarray(img_hw)
print("hw done", flush=True)

di = np.abs(img_hw - d["img"])
print(f"HW(records_cpu) vs CPU-captured raster img: max {di.max():.3e} "
      f"mean {di.mean():.3e}")
print("per-channel:", [f"{np.abs(img_hw[..., c] - d['img'][..., c]).max():.2e}"
                       for c in range(4)])
dl = np.abs(np.asarray(lt_hw) - d["log_t"])
print(f"log_t: max {dl.max():.3e}; fidx ndiff "
      f"{(np.asarray(fx_hw) != d['fidx']).sum()}")
if di.max() > 1e-3:
    tmax = di.reshape(num_tiles, -1).max(axis=1)
    bad = np.flatnonzero(tmax > 1e-3)
    st, en = d["starts"], d["ends"]
    print(f"bad tiles: {len(bad)}; first:")
    for t in bad[:8]:
        print(f"  tile {t}: [{st[t]},{en[t]}) n={en[t]-st[t]} "
              f"diff={tmax[t]:.3e} "
              f"lt_diff={np.abs(np.asarray(lt_hw)[t]-d['log_t'][t]).max():.2e}")

"""Capture the REAL pipeline's raster-stage inputs/outputs on each platform.

Monkeypatches rasterize_fwd_pallas inside raster_vjp to stash its actual
arguments (packed records, starts, ends) and outputs during an EAGER
render_splats call, on TPU (default) or CPU (FORCE_CPU=1). Comparing the
saved arrays across platforms pins whether the 0.196 pallas TPU-vs-CPU
image divergence enters BEFORE the raster kernel (records differ) or IN
it (same records, different image).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from brush_tpu.camera import Camera
from brush_tpu.constants import SH_C0
from brush_tpu.ops.rasterize_reference import camera_params
from brush_tpu.render import render_splats
from brush_tpu.ops.pallas import raster_vjp

N = 20000
IMG = (512, 512)
MAX_ISECTS = 1 << 19


def main():
    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.uniform(-2.5, 2.5, size=(N, 3)), jnp.float32)
    log_scales = jnp.asarray(
        np.log(rng.uniform(0.01, 0.15, size=(N, 3))), jnp.float32)
    quats = rng.normal(size=(N, 4))
    quats = jnp.asarray(
        quats / np.linalg.norm(quats, axis=-1, keepdims=True), jnp.float32)
    colors = rng.uniform(0, 1, size=(N, 3))
    sh = jnp.asarray((colors[:, None, :] - 0.5) / SH_C0, jnp.float32)
    opac_raw = jnp.asarray(
        np.log(rng.uniform(0.2, 0.9, N) / (1 - rng.uniform(0.2, 0.9, N))),
        jnp.float32)
    cam = Camera(position=[0, 0, -8], rotation=[1, 0, 0, 0],
                 fov_x=np.pi / 2, fov_y=np.pi / 2)
    cp = camera_params(cam, IMG)

    cap = {}
    real = raster_vjp.rasterize_fwd_pallas

    def capture(packed, starts, ends, tile_ids, **kw):
        out = real(packed, starts, ends, tile_ids, **kw)
        cap["packed"] = np.asarray(packed)
        cap["starts"] = np.asarray(starts)
        cap["ends"] = np.asarray(ends)
        cap["tile_ids"] = np.asarray(tile_ids)
        cap["kw"] = {k: v for k, v in kw.items()}
        cap["img"] = np.asarray(out[0])
        cap["log_t"] = np.asarray(out[1])
        cap["fidx"] = np.asarray(out[2])
        return out

    raster_vjp.rasterize_fwd_pallas = capture
    img, aux = render_splats(  # EAGER: the monkeypatch must see arrays
        means, log_scales, quats, sh, opac_raw, cp, IMG,
        block_size=512, max_isects=MAX_ISECTS, backend="pallas")
    raster_vjp.rasterize_fwd_pallas = real
    plat = "cpu" if os.environ.get("FORCE_CPU") else "tpu"
    print(f"{plat}: isects={int(aux.num_isects)} kw={cap['kw']}", flush=True)
    np.savez(f"/tmp/capture_{plat}.npz",
             packed=cap["packed"], starts=cap["starts"], ends=cap["ends"],
             tile_ids=cap["tile_ids"], img=cap["img"], log_t=cap["log_t"],
             fidx=cap["fidx"], full_img=np.asarray(img))

    # If both captures exist, compare.
    try:
        a = np.load("/tmp/capture_tpu.npz")
        b = np.load("/tmp/capture_cpu.npz")
    except FileNotFoundError:
        return
    for k in ("starts", "ends", "tile_ids"):
        eq = np.array_equal(a[k], b[k])
        print(f"{k}: equal={eq}" + (
            "" if eq else f" ndiff={(a[k] != b[k]).sum()}"))
    pk_a, pk_b = a["packed"], b["packed"]
    nd = (pk_a != pk_b).sum(axis=1)
    print(f"packed rows ndiff: {list(nd)}")
    if nd.sum():
        bad = np.flatnonzero((pk_a != pk_b).any(axis=0))
        print(f"  {len(bad)} differing slots, first {bad[:10]}")
    di = np.abs(a["img"] - b["img"])
    print(f"raster img tiles diff: max {di.max():.3e} mean {di.mean():.3e}")
    dl = np.abs(a["log_t"] - b["log_t"])
    print(f"log_t diff: max {dl.max():.3e}")
    df = (a["fidx"] != b["fidx"]).sum()
    print(f"fidx ndiff: {df}")
    dfull = np.abs(a["full_img"] - b["full_img"])
    print(f"full assembled img diff: max {dfull.max():.3e}")


if __name__ == "__main__":
    main()

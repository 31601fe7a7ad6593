"""Characterize the pipeline-vs-XLA image diff on hardware.

tpu_checks failed `pipeline img vs xla: max 7.83e-02` (threshold 1.5/255).
This reruns the same comparison (same scene constructor as tpu_checks) and
reports WHERE the difference lives: per-pixel histogram, bad-pixel count,
spatial clustering — separating a handful of sigma~0 high-alpha boundary
flips (FP-path divergence, bounded by per-splat alpha) from structural
corruption (whole tiles / many pixels).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
from brush_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

if os.environ.get("FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")  # env var alone can't override axon
import jax.numpy as jnp

from brush_tpu.camera import Camera
from brush_tpu.constants import SH_C0
from brush_tpu.ops.rasterize_reference import camera_params
from brush_tpu.render import render_splats

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

    def render(backend, block):
        img, aux = render_splats(
            means, log_scales, quats, sh, opac_raw, cp, IMG,
            block_size=block, max_isects=MAX_ISECTS, backend=backend)
        return img, aux

    img_p, aux_p = jax.jit(lambda: render("pallas", 512))()
    img_p = np.asarray(img_p)
    print(f"pallas done isects={int(aux_p.num_isects)}", flush=True)
    img_x, aux_x = jax.jit(lambda: render("xla", 256))()
    img_x = np.asarray(img_x)
    print(f"xla done isects={int(aux_x.num_isects)}", flush=True)

    d = np.abs(img_p - img_x).max(axis=-1)  # (H, W)
    print(f"max {d.max():.3e} mean {d.mean():.3e}")
    for th in (1e-4, 1e-3, 1.5 / 255, 2e-2):
        print(f"  pixels > {th:.1e}: {(d > th).sum()}")
    bad = np.argwhere(d > 1.5 / 255)
    if len(bad):
        print(f"bad pixels ({len(bad)}): first 10 at\n{bad[:10]}")
        ty, tx = bad[:, 0] // 16, bad[:, 1] // 16
        tiles = np.unique(ty * 32 + tx)
        print(f"  spread over {len(tiles)} tiles of 1024")
        # worst pixel detail
        iy, ix = np.unravel_index(d.argmax(), d.shape)
        print(f"  worst at ({iy},{ix}): pallas {img_p[iy, ix]} "
              f"xla {img_x[iy, ix]}")
    np.save("/tmp/pipe_diff.npy", d)


if __name__ == "__main__":
    main()

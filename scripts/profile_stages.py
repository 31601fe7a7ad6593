"""Stage-by-stage timing of the render pipeline on the real chip."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from brush_tpu.camera import Camera
from brush_tpu.constants import TILE_WIDTH
from brush_tpu.ops.binning import build_intersections
from brush_tpu.ops.projection import project_splats
from brush_tpu.ops.rasterize_reference import camera_params
from brush_tpu.ops.sh import sh_to_color
from brush_tpu.ops.pallas.rasterize_fwd import pack_isect_splats, rasterize_fwd_pallas
from brush_tpu.render import default_max_isects
from brush_tpu.splats import from_random


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:30s} {dt*1e3:9.2f} ms")
    return out, dt


def main():
    n = 1 << 20
    img_size = (1024, 1024)
    k_lanes = 256
    rng = np.random.default_rng(0)
    splats = from_random(rng, [-3, -3, -3], [3, 3, 3], count=n, sh_degree=1,
                         capacity=n)
    cam = Camera(position=[0, 0, -8.0], rotation=[1, 0, 0, 0],
                 fov_x=np.pi / 2, fov_y=np.pi / 2)
    cp = camera_params(cam, img_size)
    w, h = img_size
    tiles_x, tiles_y = -(-w // TILE_WIDTH), -(-h // TILE_WIDTH)
    num_tiles = tiles_x * tiles_y
    max_isects = 1 << 22
    max_isects = -(-max_isects // k_lanes) * k_lanes
    print(f"n={n} tiles={num_tiles} max_isects={max_isects}")

    proj_fn = jax.jit(lambda m, ls, q: project_splats(
        m, ls, q, cp.viewmat, cp.focal, cp.pixel_center, img_size))
    proj, _ = timeit("project", proj_fn, splats.means, splats.log_scales,
                     splats.quats)

    opac = jax.nn.sigmoid(splats.raw_opacity)
    binn_fn = jax.jit(lambda p, o: build_intersections(
        p, o, (tiles_x, tiles_y), max_isects, align=k_lanes))
    isect, _ = timeit("build_intersections", binn_fn, proj, opac)
    print(f"  num_visible={int(isect.num_visible)} "
          f"num_isects={int(isect.num_isects)} pool={max_isects}")

    cam_pos = cp.viewmat[:3, 3]
    sh_fn = jax.jit(lambda m, c: sh_to_color(
        1, (m - cam_pos) / jnp.linalg.norm(m - cam_pos, axis=-1,
                                           keepdims=True).clip(1e-12), c))
    color, _ = timeit("sh_color", sh_fn, splats.means, splats.sh_coeffs)

    pack_fn = jax.jit(lambda xy, con, col, op, gid: pack_isect_splats(
        xy[isect.order], con[isect.order], col[isect.order], op[isect.order],
        gid, max_isects, k_lanes))
    packed, _ = timeit("pack_gather", pack_fn, proj.xy, proj.conic, color,
                       opac, isect.isect_gid)

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    rast_fn = jax.jit(lambda p, s, e: rasterize_fwd_pallas(
        p, s, e, tile_ids, tiles_x=tiles_x, num_tiles=num_tiles,
        max_isects=max_isects, k_lanes=k_lanes))
    _, dt = timeit("rasterize_fwd_pallas", rast_fn, packed, isect.starts,
                   isect.ends)
    print(f"raster-only Mpix/s: {w*h/1e6/dt:.1f}")


if __name__ == "__main__":
    main()

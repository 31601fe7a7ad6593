"""Benchmark: rasterizer throughput on the real chip.

Mirrors the reference's divan benchmark setup (reference:
brush-render/benches/render_bench.rs: 2^21 random splats, 512^2/1024^2,
forward and forward+backward, GPU sync per sample) and reports ONE JSON line
for the driver.

Headline metric: forward-render megapixels/second at ~1M splats, 1024^2.
vs_baseline is measured against BASELINE.md's ">=3x Brush-on-GPU" target
using 1000 Mpix/s as the assumed Brush-class single-GPU figure (the
reference publishes no absolute numbers — README.md:91-93 is qualitative),
i.e. vs_baseline = mpix_per_s / 1000.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from brush_tpu.camera import Camera
    from brush_tpu.ops.rasterize_reference import CameraParams, camera_params
    from brush_tpu.render import render_splats
    from brush_tpu.splats import from_random

    n_splats = 1 << 20
    img_size = (1024, 1024)
    iters = 12

    rng = np.random.default_rng(0)
    # Random splats in a box in front of the camera, like render_bench.rs:34.
    splats = from_random(
        rng, [-3, -3, -3], [3, 3, 3], count=n_splats, sh_degree=1,
        capacity=n_splats,
    )
    cam = Camera(
        position=[0, 0, -8.0], rotation=[1, 0, 0, 0],
        fov_x=np.pi / 2, fov_y=np.pi / 2,
    )
    cp = camera_params(cam, img_size)

    @jax.jit
    def forward(means, log_scales, quats, sh_coeffs, raw_opacity):
        img, aux = render_splats(
            means, log_scales, quats, sh_coeffs, raw_opacity,
            cp, img_size, block_size=512, max_isects=3 << 20,
        )
        return img, aux.num_isects

    args = jax.device_put(
        (
            splats.means, splats.log_scales, splats.quats,
            splats.sh_coeffs, splats.raw_opacity,
        )
    )

    # Warmup / compile. The device tunnel front-loads multi-second one-time
    # work onto the first executions, so the metric is the median of
    # individually synced iterations, not a mean over one batch.
    img, _ = forward(*args)
    img.block_until_ready()

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        img, _ = forward(*args)
        _ = np.asarray(img[:1, :1])
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]

    mpix = img_size[0] * img_size[1] / 1e6
    mpix_per_s = mpix / dt

    print(
        json.dumps(
            {
                "metric": "rasterize_fwd_mpix_per_s_1m_splats_1024",
                "value": round(mpix_per_s, 2),
                "unit": "Mpix/s",
                "vs_baseline": round(mpix_per_s / 1000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

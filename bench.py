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


def _median_time(fn, args, sync, iters=12):
    out = fn(*args)
    sync(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def main():
    import jax
    import jax.numpy as jnp

    from brush_tpu.camera import Camera
    from brush_tpu.ops.rasterize_reference import CameraParams, camera_params
    from brush_tpu.render import render_splats
    from brush_tpu.splats import from_random

    n_splats = 1 << 20
    img_size = (1024, 1024)

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

    # Pool sized like the adaptive trainer would size it for this scene
    # (true records ~2.16M; the r1 bench used a slack 3<<20 pool and paid
    # for the padding in every pool-sized op).
    max_isects = 2162688

    @jax.jit
    def forward(means, log_scales, quats, sh_coeffs, raw_opacity):
        img, aux = render_splats(
            means, log_scales, quats, sh_coeffs, raw_opacity,
            cp, img_size, block_size=512, max_isects=max_isects,
        )
        return img, aux.num_isects

    # Full training step: fwd + bwd + per-group Adam on L1 loss
    # (the reference's fwd+bwd divan group, render_bench.rs:199-237).
    from brush_tpu.optim import init_adam, adam_step

    gt = jnp.zeros((img_size[1], img_size[0], 3), jnp.float32)

    @jax.jit
    def train_step(params, opt):
        def loss_fn(p):
            img, _ = render_splats(
                p["means"], p["log_scales"], p["quats"], p["sh_coeffs"],
                p["raw_opacity"], cp, img_size, block_size=512,
                max_isects=max_isects,
            )
            return jnp.mean(jnp.abs(img[..., :3] - gt))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        lrs = {"means": 1.6e-4, "raw_opacity": 5e-2, "sh_coeffs": 4e-3,
               "quats": 2e-3, "log_scales": 1e-2}
        params, opt = adam_step(params, grads, opt, lrs)
        return params, opt, loss

    args = jax.device_put(
        (
            splats.means, splats.log_scales, splats.quats,
            splats.sh_coeffs, splats.raw_opacity,
        )
    )

    # Median of individually synced iterations: the device tunnel
    # front-loads multi-second one-time work onto the first executions.
    dt_fwd = _median_time(
        forward, args, lambda out: np.asarray(out[0][:1, :1])
    )
    mpix = img_size[0] * img_size[1] / 1e6
    mpix_per_s = mpix / dt_fwd

    params = jax.device_put(splats.params())
    opt = init_adam(params)
    state = [params, opt]

    def step_once():
        state[0], state[1], loss = train_step(state[0], state[1])
        return loss

    dt_train = _median_time(
        lambda: (step_once(),), (), lambda out: np.asarray(out[0])
    )

    print(
        json.dumps(
            {
                "metric": "rasterize_fwd_mpix_per_s_1m_splats_1024",
                "value": round(mpix_per_s, 2),
                "unit": "Mpix/s",
                "vs_baseline": round(mpix_per_s / 1000.0, 3),
                "fwd_ms": round(dt_fwd * 1e3, 2),
                "train_step_ms": round(dt_train * 1e3, 2),
                "train_iters_per_s": round(1.0 / dt_train, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

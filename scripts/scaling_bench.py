"""Multi-chip scaling-efficiency harness (BASELINE.md: >=80% at N>=2 hosts).

Measures sharded-train-step throughput on 1, 2, 4, ... devices of whatever
mesh is available and reports efficiency vs the single-device rate. On real
TPU slices run it as-is (one process per host via jax.distributed; see
brush_tpu/parallel/multihost.py); on this single-chip environment it can
only demonstrate the harness on a virtual CPU mesh (pass --cpu N), where
timing is not meaningful but the measurement plumbing is the deliverable.

Usage:
  python scripts/scaling_bench.py [--cpu N] [--splats M] [--size S] [--steps K]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def project_efficiency(stages_ms: dict, n_dev: int, slack: float,
                       n_splats: int = 1 << 20, ici_gbps: float = 90.0):
    """Analytic N-device projection from measured single-chip stage buckets.

    The sharded step's stages scale three different ways (see
    parallel/train_step.py dataflow):
      - gaussian-sharded (projection/SH/pretest): / n_dev
      - replicated N-scale (depth sort + sort prep; backward's
        compact->global inversion sort): unchanged
      - pool-scale (expand, tile sort, raster, bwd raster, segsum, grad
        sort): x slack / n_dev — each device's pool holds its strip's
        records with `slack` over-provision
    plus ICI collectives: the attrs/meta all_gather (15 rows x N x 4 B in),
    the image tile all_gather, and the cotangent reduce-scatter (9 rows).

    stages_ms keys: proj (gaussian-sharded), sort_rep (replicated),
    pool (pool-scale), per direction: {"fwd": {...}, "bwd": {...}} or a
    flat dict treated as fwd-only.

    Returns {n_dev, t_ms, speedup, efficiency} vs the 1-device sum.
    """
    def split(d):
        return d.get("proj", 0.0), d.get("sort_rep", 0.0), d.get("pool", 0.0)

    dirs = stages_ms if "fwd" in stages_ms else {"fwd": stages_ms}
    t1 = sum(sum(split(d)) for d in dirs.values())
    ici_ms = 0.0
    if n_dev > 1:
        # Bytes that cross ICI per step per device (inbound, tiled
        # all_gather): 15 attr/meta rows + 9 cotangent rows, f32/u32.
        rows = 15 + (9 if "bwd" in dirs else 0)
        ici_ms = rows * n_splats * 4 * (n_dev - 1) / n_dev / (
            ici_gbps * 1e9) * 1e3
    t_n = ici_ms
    for d in dirs.values():
        proj, rep, pool = split(d)
        # A strip pool never exceeds the frame pool: pool_strip =
        # min(max_isects, max_isects * slack / n_dev) in train_step.py.
        t_n += proj / n_dev + rep + pool * min(1.0, slack / n_dev)
    return {
        "n_dev": n_dev,
        "t_ms": round(t_n, 2),
        "ici_ms": round(ici_ms, 2),
        "speedup": round(t1 / t_n, 2) if t_n else None,
        "efficiency": round(t1 / t_n / n_dev, 3) if t_n else None,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=0,
                    help="use a virtual CPU mesh with N devices")
    ap.add_argument("--splats", type=int, default=1 << 17)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu}"
        ).strip()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from brush_tpu.camera import Camera
    from brush_tpu.config import TrainConfig
    from brush_tpu.ops.rasterize_reference import camera_params
    from brush_tpu.parallel import make_mesh, make_sharded_train_step
    from brush_tpu.parallel.sharding import shard_state
    from brush_tpu.splats import from_random
    from brush_tpu.train import SplatTrainer

    devices = jax.devices()
    img_size = (args.size, args.size)
    rng = np.random.default_rng(0)
    config = TrainConfig(warmup_steps=0)
    cam = Camera(position=[0, 0, -8.0], rotation=[1, 0, 0, 0],
                 fov_x=np.pi / 2, fov_y=np.pi / 2)
    cp = camera_params(cam, img_size)
    gt = np.random.default_rng(1).uniform(
        0, 1, size=(args.size, args.size, 3)).astype(np.float32)

    rates = {}
    n = 1
    while n <= len(devices):
        mesh = make_mesh(devices[:n])
        splats = from_random(rng, [-3, -3, -3], [3, 3, 3],
                             count=args.splats, sh_degree=1,
                             capacity=args.splats)
        step_fn = make_sharded_train_step(
            mesh, config, args.splats, img_size, 3,
            splats.sh_coeffs.shape[1], block_size=512,
        )
        trainer = SplatTrainer(config)
        state = shard_state(trainer.init_state(splats), mesh)
        run = lambda s, i: step_fn(
            s, jnp.asarray(gt), cp.viewmat, cp.focal, cp.pixel_center,
            jnp.float32(config.lr_mean_at(i)), jnp.int32(i))
        state, stats = run(state, 0)
        stats.loss.block_until_ready()
        times = []
        for i in range(args.steps):
            t0 = time.perf_counter()
            state, stats = run(state, i + 1)
            _ = float(stats.loss)
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        rates[n] = 1.0 / dt
        eff = rates[n] / (n * rates[1]) * 100.0
        print(f"devices={n:2d}  {dt*1e3:8.1f} ms/step  {rates[n]:6.2f} it/s"
              f"  scaling efficiency {eff:5.1f}%", flush=True)
        n *= 2

    # Analytic projection from the latest measured single-chip stage
    # buckets (docs/PERFORMANCE.md round-5 table) — the number the
    # CPU-mesh plumbing above cannot produce (its timing is not
    # meaningful off hardware). Buckets: proj = gaussian-sharded,
    # sort_rep = replicated N-scale sorts, pool = pool-scale stages.
    print("\nanalytic projection from measured single-chip stage buckets"
          " (1M splats, 1024^2, docs/PERFORMANCE.md r5):")
    # Measured r5 buckets (docs/PERFORMANCE.md "Round-5 changes"):
    # fwd 54.6 = prep 7.1 + depth sort 6.6 + pool-scale 40.9;
    # bwd 52.4 = autodiff tail 1.0 + inversion sort 5.5 + pool 45.9.
    stages = {
        "fwd": {"proj": 7.1, "sort_rep": 6.6, "pool": 40.9},
        "bwd": {"proj": 1.0, "sort_rep": 5.5, "pool": 45.9},
    }
    for nd in (1, 2, 4, 8, 16):
        for slack in (2.0, 1.3, 1.0):
            p = project_efficiency(stages, nd, slack)
            print(f"  n_dev={nd:2d} slack={slack}: {p['t_ms']:7.2f} ms "
                  f"(ici {p['ici_ms']:5.2f}) speedup {p['speedup']:5.2f} "
                  f"efficiency {p['efficiency']:.0%}")


if __name__ == "__main__":
    main()

"""Benchmark: rasterizer throughput on the real chip.

Mirrors the reference's divan benchmark setup (reference:
brush-render/benches/render_bench.rs: random splats, density = prefix
fraction of the splat set, 512^2/1024^2, forward and forward+backward, GPU
sync per sample) and reports ONE JSON line for the driver.

Headline metric: forward-render megapixels/second at ~1M splats, 1024^2
(same config across rounds). Since round 3 the headline is AMORTIZED
steady-state throughput (8 back-to-back async dispatches, one sync) —
per-call sync through the axon tunnel costs a measured ~26-31 ms that is
tunnel latency, not device time (reported as dispatch_const_ms; the old
per-call-synced latency is reported as fwd_ms_synced). See
_amortized_time's docstring for the full rationale.

Since round 5 the harness is UN-LOSABLE under the driver's wall-clock
budget (round 4 lost its record to rc=124: the single end-of-run print
never happened): the headline JSON line is emitted the moment the
headline fwd+train measurements exist, every later block (infer mode,
matrix points, stage ablations) runs under an internal wall-clock budget
(BENCH_BUDGET_S, default 1380 s) with a per-block cost estimate, and the
JSON line is RE-emitted after every completed block. The driver reads
the LAST stdout line, so a timeout at any point leaves the freshest
complete record; `skipped` names what the budget cut. Secondary keys:
  matrix   {"<res>_d<density>[_train]": ms, ...}  — render_bench.rs's
           sweep at the {0.1, 1.0} x {512, 1024} corners by default
           (each point is a separate XLA compile; the full 10-density
           sweep is behind --full because axon compiles cost minutes —
           dropped points are a deliberate, logged truncation).
  stages   {"prep_sort": ms, "expand_tilesort": ms, "raster": ms} —
           marginal costs from jitted prefix ablations of the SAME
           pipeline (staged timing through axon is meaningless: every
           separate dispatch pays a ~15-30 ms tunnel constant).

vs_baseline is measured against BASELINE.md's ">=3x Brush-on-GPU" target
using 1000 Mpix/s as the assumed Brush-class single-GPU figure (the
reference publishes no absolute numbers — README.md:91-93 is qualitative),
i.e. vs_baseline = mpix_per_s / 1000.
"""

import json
import sys
import time

import numpy as np

DENSITIES = [0.1, 1.0]
FULL_DENSITIES = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]


def _log(msg):
    # Progress to stderr: compiles through the axon tunnel take minutes per
    # executable, and stdout must stay a single JSON line for the driver.
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def _median_time(fn, args, sync, iters=12, name=""):
    """Per-call latency: each call synced with a tiny readback (round-1/2
    methodology). Includes the axon tunnel's per-sync dispatch+readback
    constant (~26-31 ms — see _dispatch_const), so it measures end-to-end
    single-frame latency through the tunnel, not device throughput."""
    t0 = time.perf_counter()
    out = fn(*args)
    sync(out)
    if name:
        _log(f"{name}: compile+first {time.perf_counter() - t0:.1f}s")
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    if name:
        _log(f"{name}: median {dt * 1e3:.2f} ms")
    return dt


def _amortized_time(fn, args, sync, batch=8, iters=5, name=""):
    """Steady-state time per call: `batch` back-to-back async dispatches,
    ONE sync, median over `iters` batches.

    Why this is the throughput number: this environment reaches the chip
    through a tunnel whose per-SYNC constant is ~26-31 ms (measured: a
    trivial kernel returning 4 bytes takes ~31 ms synced — see
    dispatch_const_ms in the output). Per-call sync therefore measures the
    tunnel, not the device. JAX dispatch is asynchronous: back-to-back
    calls queue on the device and serialize on actual device time, which
    is exactly how production render/train loops run (they sync for
    logging every N steps, not per step). The reference's divan loop syncs
    per sample on a *local* GPU where sync costs microseconds; amortized
    dispatch is the faithful TPU equivalent, and the synced latency is
    still reported alongside (fwd_ms_synced)."""
    out = fn(*args)
    sync(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(batch):
            out = fn(*args)
        sync(out)
        times.append((time.perf_counter() - t0) / batch)
    dt = sorted(times)[len(times) // 2]
    if name:
        _log(f"{name}: amortized {dt * 1e3:.2f} ms/call (batch={batch})")
    return dt


def _dispatch_const(jax, jnp, np):
    """Measured per-sync tunnel constant: trivial jitted kernel, synced."""

    @jax.jit
    def triv(x):
        return x[:1] + 1.0

    x = jax.device_put(jnp.zeros((8,), jnp.float32))
    out = triv(x)
    np.asarray(out)
    times = []
    for _ in range(9):
        t0 = time.perf_counter()
        out = triv(x)
        _ = np.asarray(out)
        times.append(time.perf_counter() - t0)
    return sorted(times)[4]


def main():
    import os

    # Wall-clock budget starts before the jax/backend imports: the axon
    # backend init + per-executable first-execution loads are the dominant
    # costs and all count against the driver's timeout. Round 3's full run
    # took ~24 min and passed, round 4 was killed (rc=124) — 1380 s leaves
    # margin under a >=25 min driver budget.
    t0_wall = time.time()
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1380"))

    import jax

    from brush_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    # Smoke-test override (CI/CPU): the axon plugin ignores JAX_PLATFORMS,
    # only an in-process config update reroutes to CPU. Unset = the real
    # chip (driver default).
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    import jax.numpy as jnp

    from brush_tpu.camera import Camera
    from brush_tpu.ops.rasterize_reference import camera_params
    from brush_tpu.render import render_splats
    from brush_tpu.splats import from_random
    from brush_tpu.optim import init_adam, adam_step

    full = "--full" in sys.argv
    with_stages = "--no-stages" not in sys.argv

    # Smoke-test override (CI/CPU): BENCH_N shrinks the scene; the metric
    # name still reflects the real config only when unset.
    n_splats = int(os.environ.get("BENCH_N", 1 << 20))
    hi_res = int(os.environ.get("BENCH_RES", 1024))
    # Raster-cell grouping knob, e.g. BENCH_CELL=2x2 (see
    # render_splats(cell=...)); default single-tile cells.
    cell = tuple(
        int(v) for v in os.environ.get("BENCH_CELL", "1x1").split("x")
    )
    lo_res = hi_res // 2
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

    def args_at(density, mean_mult=1.0):
        n = int(n_splats * density)
        return jax.device_put((
            splats.means[:n] * mean_mult, splats.log_scales[:n],
            splats.quats[:n], splats.sh_coeffs[:n], splats.raw_opacity[:n],
        ))

    # Pool sized like the adaptive trainer would size it for this scene at
    # full density (true records ~2.16M); scaled by density for the matrix.
    def pool_at(density):
        return max(-(-int(2162688 * density) // 512) * 512, 1 << 16)

    def make_fwd(img_size, density, pool_mult=1):
        cp = camera_params(cam, img_size)
        mi = pool_mult * pool_at(density)

        @jax.jit
        def forward(means, log_scales, quats, sh_coeffs, raw_opacity):
            img, aux = render_splats(
                means, log_scales, quats, sh_coeffs, raw_opacity,
                cp, img_size, block_size=512, max_isects=mi, cell=cell,
            )
            return img, aux.num_dropped

        return forward

    def make_train(img_size, density):
        cp = camera_params(cam, img_size)
        mi = pool_at(density)
        gt = jnp.zeros((img_size[1], img_size[0], 3), jnp.float32)

        @jax.jit
        def train_step(params, opt):
            def loss_fn(p):
                img, _ = render_splats(
                    p["means"], p["log_scales"], p["quats"], p["sh_coeffs"],
                    p["raw_opacity"], cp, img_size, block_size=512,
                    max_isects=mi, cell=cell,
                )
                return jnp.mean(jnp.abs(img[..., :3] - gt))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            lrs = {"means": 1.6e-4, "raw_opacity": 5e-2, "sh_coeffs": 4e-3,
                   "quats": 2e-3, "log_scales": 1e-2}
            params, opt = adam_step(params, grads, opt, lrs)
            return params, opt, loss

        return train_step

    sync_img = lambda out: np.asarray(out[0][:1, :1])

    def remaining():
        return budget_s - (time.time() - t0_wall)

    dconst = _dispatch_const(jax, jnp, np)
    _log(f"tunnel dispatch+sync constant: {dconst * 1e3:.2f} ms; "
         f"budget {budget_s:.0f}s")

    # --- headline: fwd + train step at 1M splats, 1024^2 ---
    args_full = args_at(1.0)
    fwd_headline = make_fwd((hi_res, hi_res), 1.0)
    dt_fwd_sync = _median_time(fwd_headline, args_full, sync_img,
                               name="fwd_headline_synced")
    dt_fwd = _amortized_time(fwd_headline, args_full, sync_img,
                             name="fwd_headline")
    mpix_per_s = hi_res * hi_res / 1e6 / dt_fwd

    params = jax.device_put(splats.params())
    opt = init_adam(params)
    train_step = make_train((hi_res, hi_res), 1.0)

    # FIXED params every call (methodology v3, round 5): feeding updates
    # back while the loss pulls toward a black gt collapses the model
    # within the measurement batches — opacities crash, tile ranges
    # empty, and the batch medians report empty-range kernel costs
    # instead of real work (measured: 52 ms "train" vs 115 ms honest at
    # the r5 bench point; rounds 3-4 under-reported the same way). The
    # full fwd+bwd+Adam program still runs every call; only the state
    # feedback loop is cut.
    def step_once():
        _p, _o, loss = train_step(params, opt)
        return loss

    dt_train = _amortized_time(
        lambda: (step_once(),), (), lambda out: np.asarray(out[0]),
        name="train_step",
    )

    matrix = {f"{hi_res}_d1.0": round(dt_fwd * 1e3, 2),
              f"{hi_res}_d1.0_train": round(dt_train * 1e3, 2)}
    matrix_dropped = {}
    result = {
        "metric": "rasterize_fwd_mpix_per_s_1m_splats_1024",
        "value": round(mpix_per_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_per_s / 1000.0, 3),
        # Headline timing methodology, versioned so round-over-round
        # comparisons can tell a methodology change from a speedup:
        # v1 (rounds 1-2) = per-call-synced latency (now fwd_ms_synced);
        # v2 (rounds 3-4) = amortized batch-8 async dispatch, one sync
        # (see _amortized_time) — the tunnel's ~27 ms per-sync constant
        # (dispatch_const_ms) is tunnel latency, not device time;
        # v3 (round 5+) = v2 + train points run at FIXED params (rounds
        # 3-4 fed updates back, the model collapsed toward the black gt
        # inside the batches, and train_step_ms under-reported real work;
        # the round-5 pipeline measures ~116 ms under v3 — what the r3/r4
        # pipelines would have read under v3 is unknown, only bounded
        # below by their recorded 135/106).
        "methodology": "v3_amortized_batch8_fixed_params",
        "fwd_ms": round(dt_fwd * 1e3, 2),
        "fwd_ms_synced": round(dt_fwd_sync * 1e3, 2),
        "dispatch_const_ms": round(dconst * 1e3, 2),
        "fwd_infer_ms": None,
        "train_step_ms": round(dt_train * 1e3, 2),
        "train_iters_per_s": round(1.0 / dt_train, 2),
        "matrix_ms": matrix,
        "matrix_dropped": matrix_dropped,
        "stages": {},
        "skipped": [],
    }

    def emit():
        # The driver parses the LAST stdout line: every completed block
        # re-emits the whole record so a timeout anywhere loses nothing.
        print(json.dumps(result), flush=True)

    emit()  # the headline is now on the scoreboard, whatever happens next

    # --- budget-gated blocks, priority order -------------------------------
    # Each block has a cost estimate (compile through the axon tunnel is
    # ~120-160 s per new executable + ~15 s of measurement); blocks that
    # don't fit the remaining budget are skipped and named in `skipped`.

    def run_infer():
        cp_h = camera_params(cam, (hi_res, hi_res))
        mi_h = pool_at(1.0)

        @jax.jit
        def fwd_infer(means, log_scales, quats, sh_coeffs, raw_opacity):
            img, aux = render_splats(
                means, log_scales, quats, sh_coeffs, raw_opacity,
                cp_h, (hi_res, hi_res), block_size=512, max_isects=mi_h,
                cell=cell, needs_grad=False,
            )
            return img, aux.num_dropped

        dt = _amortized_time(fwd_infer, args_full, sync_img,
                             name="fwd_infer")
        result["fwd_infer_ms"] = round(dt * 1e3, 2)

    def measure_point(key, img_size, d, pool_mult=1, mean_mult=1.0):
        a = args_at(d, mean_mult=mean_mult)
        fwd = make_fwd(img_size, d, pool_mult=pool_mult)
        dt = _amortized_time(fwd, a, sync_img, name=key)
        matrix[key] = round(dt * 1e3, 2)
        dropped = int(np.asarray(fwd(*a)[1]))
        if dropped:
            matrix_dropped[key] = dropped

    def measure_train_point(key, img_size, d):
        # Fixed params (methodology v3) — see the headline train comment.
        p = {k: v for k, v in params.items()}
        o = init_adam(p)
        ts = make_train(img_size, d)

        def stepper():
            _p, _o, loss = ts(p, o)
            return loss

        matrix[key] = round(_amortized_time(
            lambda: (stepper(),), (), lambda out: np.asarray(out[0]),
            name=key,
        ) * 1e3, 2)

    def run_stages():
        # Stage buckets from jitted prefix ablations of the SAME pipeline.
        from scripts.profile_r3 import make_staged, MAX_ISECTS  # noqa: F401

        cp = camera_params(cam, (1024, 1024))  # ablation is fixed-config
        sync_first = lambda out: np.asarray(
            jax.tree_util.tree_leaves(out)[0][:1])
        t_sort = _amortized_time(
            jax.jit(make_staged(cp, "sort")), args_full, sync_first,
            name="stage_sort")
        t_tile = _amortized_time(
            jax.jit(make_staged(cp, "tilesort")), args_full, sync_first,
            name="stage_tilesort")
        # All three buckets are amortized, so the tunnel constant cancels
        # out of the pipeline entirely (it never enters amortized numbers).
        result["stages"] = {
            "prep_sort_ms": round(t_sort * 1e3, 2),
            "expand_tilesort_ms": round((t_tile - t_sort) * 1e3, 2),
            "raster_bins_ms": round((dt_fwd - t_tile) * 1e3, 2),
        }

    # Stage ablations only make sense at the canonical config (pinned
    # 1M/1024^2/1x1 pipeline; subtracting against an overridden dt_fwd
    # would mix incompatible configs) and off CPU smoke mode (the
    # ablations instantiate the real Pallas kernels, no interpret
    # fallback).
    canonical = (n_splats == 1 << 20 and hi_res == 1024 and cell == (1, 1))
    stages_ok = (with_stages and canonical and os.environ.get(
        "BENCH_PLATFORM", "") in ("", "tpu", "axon"))

    blocks = [("fwd_infer", 170, run_infer)]
    densities = FULL_DENSITIES if full else DENSITIES
    for d in densities:
        if d != 1.0 or (lo_res, lo_res) != (hi_res, hi_res):
            blocks.append((f"{lo_res}_d{d}", 170, lambda d=d: measure_point(
                f"{lo_res}_d{d}", (lo_res, lo_res), d)))
    blocks.append((f"{lo_res}_d1.0_train", 190,
                   lambda: measure_train_point(
                       f"{lo_res}_d1.0_train", (lo_res, lo_res), 1.0)))
    for d in densities:
        if d != 1.0:
            blocks.append((f"{hi_res}_d{d}", 170, lambda d=d: measure_point(
                f"{hi_res}_d{d}", (hi_res, hi_res), d)))
    if stages_ok:
        blocks.append(("stages", 330, run_stages))
    blocks.append((f"{lo_res}_d0.1_train", 190,
                   lambda: measure_train_point(
                       f"{lo_res}_d0.1_train", (lo_res, lo_res), 0.1)))
    if full:
        # The reference's "dense" group: means * 0.25 packs the same splats
        # into a smaller volume (render_bench.rs DENSE_MULT) — more overlap
        # per tile, bigger pools (4x the density-scaled base; overflow, if
        # any, shows up in matrix_dropped rather than passing silently).
        for d in (0.1, 0.5, 1.0):
            blocks.append((f"{lo_res}_dense_d{d}", 170,
                           lambda d=d: measure_point(
                               f"{lo_res}_dense_d{d}", (lo_res, lo_res), d,
                               pool_mult=4, mean_mult=0.25)))

    for name, est_s, thunk in blocks:
        if remaining() < est_s:
            result["skipped"].append(name)
            _log(f"skip {name}: {remaining():.0f}s left < {est_s}s estimate")
            continue
        thunk()
        emit()
    emit()  # final line = the complete record


if __name__ == "__main__":
    main()

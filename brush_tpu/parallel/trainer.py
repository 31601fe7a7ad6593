"""Multi-device trainer: the SplatTrainer orchestration over a device mesh.

Extends the single-device trainer (train.SplatTrainer) at its three jitted
seams — step, refine, capacity growth — so the host-side logic (LR
schedule, refine cadence, gt cache, adaptive pool growth on drops) is
shared verbatim:

- step: parallel.train_step.make_sharded_train_step — gaussian-sharded
  projection, strip-local record pipeline, tile-sharded raster (shard_map).
- refine: the SAME train.make_refine_fn computation, jitted over the
  row-sharded global arrays. Everything in it is elementwise over rows
  except the stable-compaction argsort and the row gathers; GSPMD executes
  those with a transient all-gather of the candidate rows — acceptable at
  the refine-every-100-steps cadence (~2.8 GB transient at 6M splats,
  amortized to ~28 MB/step). The result is bit-identical to the
  single-device refine, so the PSNR trajectory matches by construction.
- capacity growth/shrink: the base implementation followed by re-placement
  onto the mesh (pad/slice preserve row order, so re-placement only moves
  the new padding).

The reference has no counterpart (single-GPU, train.rs); this implements
the BASELINE.md multi-chip north star including densification — round 2
could only run fixed-capacity sharded steps.
"""

from __future__ import annotations

import functools

import jax

from brush_tpu.config import TrainConfig
from brush_tpu.train import SplatTrainer, TrainState
from brush_tpu.parallel.sharding import shard_state
from brush_tpu.parallel.train_step import make_sharded_train_step
from brush_tpu.splats import Splats


class ShardedTrainer(SplatTrainer):
    """SplatTrainer over a jax.sharding.Mesh (single axis, see sharding.py).

    backend: "xla" | "pallas" | "pallas_interpret" | "auto" (pallas on TPU
    platforms, xla on CPU).
    """

    def __init__(self, mesh, config: TrainConfig | None = None,
                 raster_block_size: int = 128, backend: str = "auto",
                 strip_pool_slack: float = 2.0, raster_cell=(1, 1),
                 adaptive_slack: bool = True):
        super().__init__(config, raster_block_size=raster_block_size,
                         raster_cell=raster_cell)
        self.mesh = mesh
        self.backend = backend
        # strip_pool_slack is the STARTING (and, adaptively, the maximum)
        # per-strip pool over-provision factor. With adaptive_slack the
        # trainer re-quantizes it from the measured peak strip share
        # (StepStats.max_strip_isects x n_dev / num_isects) at its existing
        # recompile boundaries, so a balanced scene stops paying 2x on
        # every pool-scale stage: slack drives per-device pool size, which
        # drives the expand/tile-sort/raster/backward work per device (the
        # round-4 verdict's 8-device efficiency projection charged the
        # fixed 2.0 with dropping it from ~54% to ~38%).
        self.strip_pool_slack = strip_pool_slack
        self.adaptive_slack = adaptive_slack
        self._slack_q = strip_pool_slack  # current quantized value
        self._peak_strip_frac = 0.0

    # ------------------------------------------------------------------ #

    def init_state(self, splats: Splats) -> TrainState:
        return shard_state(super().init_state(splats), self.mesh)

    SLACK_STEP = 0.25   # quantization of adaptive slack (recompile unit)
    SLACK_MIN = 1.25    # never size a strip pool below 1.25x its ideal share
    SLACK_MARGIN = 1.3  # headroom over the measured peak strip share

    def _observe_stats(self, stats):
        """Track the peak strip-load imbalance from the last step's stats."""
        total = max(int(stats.num_isects), 1)
        frac = int(stats.max_strip_isects) * self.mesh.size / total
        self._peak_strip_frac = max(self._peak_strip_frac, frac)

    def _retune_slack(self):
        """Re-quantize the strip pool slack from the observed peak share.

        Called only where a recompile can already happen (refine
        boundaries / pool growth), so adaptation never adds compile churn
        mid-window. Slack can shrink toward the measured imbalance or grow
        back up to the configured starting value; overflow beyond it still
        grows the WHOLE pool via the base trainer's drop response.
        """
        if not self.adaptive_slack or self._peak_strip_frac <= 0.0:
            return
        q = self.SLACK_STEP
        target = -(-self._peak_strip_frac * self.SLACK_MARGIN // q) * q
        target = min(max(target, self.SLACK_MIN), self.strip_pool_slack)
        if target != self._slack_q:
            self._slack_q = target

    def step(self, state, batch):
        state, stats = super().step(state, batch)
        self._observe_stats(stats)
        # The base class syncs on refine boundaries; retune there so the
        # next _get_step_fn call (next step) picks the new slack key.
        if self.last_refine_stats is not None or (
                self._prev_stats is not None
                and int(self._prev_stats.num_dropped) > 0):
            self._retune_slack()
        return state, stats

    def _get_step_fn(self, *key):
        # Include the quantized slack in the jit cache key: a retuned
        # slack is a different pool size, hence a different executable.
        return super()._get_step_fn(*key, self._slack_q)

    def _build_step_fn(self, capacity: int, img_size: tuple, channels: int,
                       sh_count: int, max_isects: int,
                       slack: float | None = None):
        step = make_sharded_train_step(
            self.mesh, self.config, capacity, img_size, channels, sh_count,
            max_isects=max_isects, block_size=self.raster_block_size,
            backend=self.backend,
            strip_pool_slack=slack if slack is not None else self._slack_q,
            cell=self.raster_cell,
        )

        def fn(state, gt, cam, lr_mean, it):
            # Adapter to the base trainer's (state, gt, CameraParams, lr,
            # iter) calling convention.
            return step(state, gt[..., :channels], cam.viewmat, cam.focal,
                        cam.pixel_center, lr_mean, it)

        return fn

    def _build_refine_fn(self, capacity: int, sh_count: int, do_reset: bool):
        from brush_tpu.train import make_refine_fn

        base = jax.jit(make_refine_fn(self.config, capacity, do_reset))
        mesh = self.mesh

        def fn(state, pre, key):
            new_state, stats = base(state, pre, key)
            # Re-pin the result to the canonical row-sharded placement (a
            # no-op for leaves GSPMD already laid out that way).
            return shard_state(new_state, mesh), stats

        return fn

    def _grow(self, state: TrainState, new_cap: int) -> TrainState:
        return shard_state(super()._grow(state, new_cap), self.mesh)

    def _shrink(self, state: TrainState, new_cap: int) -> TrainState:
        return shard_state(super()._shrink(state, new_cap), self.mesh)

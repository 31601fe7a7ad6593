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
                 strip_pool_slack: float = 2.0, raster_cell=(1, 1)):
        super().__init__(config, raster_block_size=raster_block_size,
                         raster_cell=raster_cell)
        self.mesh = mesh
        self.backend = backend
        self.strip_pool_slack = strip_pool_slack

    # ------------------------------------------------------------------ #

    def init_state(self, splats: Splats) -> TrainState:
        return shard_state(super().init_state(splats), self.mesh)

    def _build_step_fn(self, capacity: int, img_size: tuple, channels: int,
                       sh_count: int, max_isects: int):
        step = make_sharded_train_step(
            self.mesh, self.config, capacity, img_size, channels, sh_count,
            max_isects=max_isects, block_size=self.raster_block_size,
            backend=self.backend, strip_pool_slack=self.strip_pool_slack,
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

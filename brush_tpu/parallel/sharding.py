"""Mesh construction and sharding placement helpers.

The parallel decomposition (BASELINE.md north star; no reference equivalent
— Brush is single-GPU):

- *Gaussians* are sharded over the mesh for projection / SH / parameter
  updates (the per-splat phases).
- Projected splats are all-gathered (forward) / reduce-scattered (backward)
  over ICI — the transpose pair falls out of shard_map autodiff.
- *Image tiles* are sharded over the mesh for rasterization (the per-pixel
  phase) — the Ulysses-style axis swap between phases.
- Parameter gradients arrive pre-sharded; Adam runs on local shards.

A single mesh axis ("shard") serves both phases: every device does
gaussian-parallel work, re-shards, then tile-parallel work.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "shard"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def splat_sharding(mesh: Mesh) -> NamedSharding:
    """Per-splat arrays: rows sharded over the mesh."""
    return NamedSharding(mesh, P(AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_state(state, mesh: Mesh):
    """Place a TrainState: (C, ...) arrays row-sharded, scalars replicated."""

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % mesh.size == 0:
            return jax.device_put(x, splat_sharding(mesh))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(place, state)

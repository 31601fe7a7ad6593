"""Gaussian splat parameter model.

Mirrors the parameter set of the reference (reference:
brush-render/src/gaussian_splats.rs:25-34): means, SH coefficients, wxyz
rotation quaternions, raw (pre-sigmoid) opacity, and log scales.

TPU-first difference: arrays are allocated at a padded *capacity* C with an
explicit live count, because XLA requires static shapes while
densify/split/prune change the live splat count every refine step
(reference mutates buffer sizes freely: train.rs:585-644). Padding entries
are kept inert (opacity -> 0, scale tiny) and masked out of every pipeline
stage via `active_mask`. Capacity grows in power-of-two-ish buckets so
recompilation is rare.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from brush_tpu.constants import SH_C0, sh_coeffs_for_degree


def inverse_sigmoid(x: float) -> float:
    """(gaussian_splats.rs:36-38)."""
    return float(np.log(x / (1.0 - x)))


# Raw opacity assigned to padding slots: sigmoid(-12) ~ 6e-6, far below the
# 1/255 contribution threshold even before masking.
PADDING_RAW_OPACITY = -12.0


def round_up_capacity(n: int, minimum: int = 256) -> int:
    """Bucket a live count into a capacity: next power of two (>= minimum)."""
    cap = max(int(minimum), 1)
    while cap < n:
        cap *= 2
    return cap


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["means", "sh_coeffs", "quats", "raw_opacity", "log_scales", "n_live"],
    meta_fields=[],
)
@dataclasses.dataclass
class Splats:
    """Padded splat parameters (capacity C, first n_live entries are real).

    means: (C, 3); sh_coeffs: (C, K, 3); quats: (C, 4) wxyz;
    raw_opacity: (C,); log_scales: (C, 3); n_live: () int32.
    """

    means: jnp.ndarray
    sh_coeffs: jnp.ndarray
    quats: jnp.ndarray
    raw_opacity: jnp.ndarray
    log_scales: jnp.ndarray
    n_live: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def sh_count(self) -> int:
        return self.sh_coeffs.shape[1]

    def active_mask(self) -> jnp.ndarray:
        return jnp.arange(self.capacity) < self.n_live

    def num_splats(self) -> int:
        """Live splat count as a host int (forces a device sync)."""
        return int(self.n_live)

    def params(self) -> dict:
        """The trainable leaves (everything except n_live)."""
        return {
            "means": self.means,
            "sh_coeffs": self.sh_coeffs,
            "quats": self.quats,
            "raw_opacity": self.raw_opacity,
            "log_scales": self.log_scales,
        }

    def replace(self, **kw) -> "Splats":
        return dataclasses.replace(self, **kw)

    def with_params(self, params: dict) -> "Splats":
        return dataclasses.replace(self, **params)

    def opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.raw_opacity)

    def scales(self) -> jnp.ndarray:
        return jnp.exp(self.log_scales)


def _pad_to_capacity(arrs: dict, n: int, capacity: int) -> dict:
    def pad(x, fill):
        pads = [(0, capacity - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pads, constant_values=fill)

    return {
        "means": pad(arrs["means"], 0.0),
        "sh_coeffs": pad(arrs["sh_coeffs"], 0.0),
        "quats": pad(arrs["quats"], 0.0).at[n:, 0].set(1.0),
        "raw_opacity": pad(arrs["raw_opacity"], PADDING_RAW_OPACITY),
        "log_scales": pad(arrs["log_scales"], -10.0),
    }


def from_dense(
    means, sh_coeffs, quats, raw_opacity, log_scales, capacity: int | None = None
) -> Splats:
    """Build padded Splats from dense (n, ...) arrays."""
    n = means.shape[0]
    cap = capacity if capacity is not None else round_up_capacity(n)
    if cap < n:
        raise ValueError(f"capacity {cap} < live count {n}")
    arrs = {
        "means": jnp.asarray(means, jnp.float32),
        "sh_coeffs": jnp.asarray(sh_coeffs, jnp.float32),
        "quats": jnp.asarray(quats, jnp.float32),
        "raw_opacity": jnp.asarray(raw_opacity, jnp.float32),
        "log_scales": jnp.asarray(log_scales, jnp.float32),
    }
    return Splats(n_live=jnp.asarray(n, jnp.int32), **_pad_to_capacity(arrs, n, cap))


def from_safetensors(path_or_file, capacity: int | None = None) -> Splats:
    """Load a splat model from a safetensors file.

    Mirrors the reference's test-data loader (gaussian_splats.rs:208-223):
    tensors `means` (n,3), `scales` = log scales (n,3), `coeffs` (n,c,3),
    `quats` (n,4) wxyz, `opacities` = raw pre-sigmoid (n,).
    """
    from safetensors import safe_open

    with safe_open(path_or_file, framework="np") as f:
        t = {k: f.get_tensor(k) for k in f.keys()}
    return from_dense(
        t["means"], t["coeffs"], t["quats"], t["opacities"], t["scales"],
        capacity=capacity,
    )


def knn_mean_distance(positions: np.ndarray, k: int = 3) -> np.ndarray:
    """Initial scale heuristic: sqrt(mean of k nearest squared dists) / k...

    Reference (gaussian_splats.rs:108-120): sqrt(sum of 3 nearest squared
    distances) / 3. Exact but O(n^2) in the numpy fallback; the native
    extension provides a KD-tree version for large point clouds.
    """
    # Tiny point clouds: fewer points than neighbors would crash
    # np.partition (kth out of bounds); self counts among the k, so
    # clamping to n keeps the semantics.
    k = max(1, min(k, positions.shape[0]))
    try:
        from brush_tpu.native import knn_distances  # C++ fast path

        return knn_distances(positions.astype(np.float32), k)
    except Exception:
        pass
    n = positions.shape[0]
    out = np.empty(n, dtype=np.float32)
    # Chunked brute force to bound memory.
    chunk = max(1, min(n, 8_000_000 // max(n, 1)))
    p = positions.astype(np.float32)
    sq = np.sum(p * p, axis=1)
    for start in range(0, n, chunk):
        end = min(n, start + chunk)
        d2 = sq[start:end, None] + sq[None, :] - 2.0 * (p[start:end] @ p.T)
        np.maximum(d2, 0.0, out=d2)
        # k nearest *including* self (distance 0): the reference queries the
        # KD-tree that contains the point itself, so self is among the k.
        part = np.partition(d2, k - 1, axis=1)[:, :k]
        out[start:end] = np.sqrt(np.sum(part, axis=1)) / k
    return out


def from_point_cloud(
    positions: np.ndarray,
    colors: np.ndarray,
    sh_degree: int,
    capacity: int | None = None,
) -> Splats:
    """Init from a point cloud (reference: gaussian_splats.rs:71-136).

    DC SH = (rgb - 0.5) / SH_C0, higher orders zero; rotation identity;
    opacity sigmoid^-1(0.1); isotropic log-scale from 3-NN mean distance.
    """
    n = positions.shape[0]
    sh_num = sh_coeffs_for_degree(sh_degree)
    sh_dc = (np.asarray(colors, np.float32) - 0.5) / SH_C0
    sh = np.zeros((n, sh_num, 3), np.float32)
    sh[:, 0, :] = sh_dc

    quats = np.zeros((n, 4), np.float32)
    quats[:, 0] = 1.0

    raw_opac = np.full((n,), inverse_sigmoid(0.1), np.float32)

    extents = knn_mean_distance(np.asarray(positions, np.float32), 3)
    log_scales = np.log(np.clip(extents, 1e-7, None))[:, None].repeat(3, axis=1)

    return from_dense(positions, sh, quats, raw_opac, log_scales, capacity)


def from_random(
    rng: np.random.Generator,
    bounds_min,
    bounds_max,
    count: int = 10000,
    sh_degree: int = 0,
    capacity: int | None = None,
) -> Splats:
    """Random-in-bbox init (reference: gaussian_splats.rs:41-69)."""
    lo = np.asarray(bounds_min, np.float32)
    hi = np.asarray(bounds_max, np.float32)
    positions = rng.uniform(lo, hi, size=(count, 3)).astype(np.float32)
    colors = rng.uniform(0.0, 1.0, size=(count, 3)).astype(np.float32)
    return from_point_cloud(positions, colors, sh_degree, capacity)

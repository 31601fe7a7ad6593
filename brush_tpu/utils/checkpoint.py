"""Checkpoint / resume.

The reference persists the model only as a PLY export and never saves
optimizer state — it even resets it every refine (SURVEY.md §5.4,
train.rs:567-568). Here a checkpoint carries the full training state:
splat parameters, Adam moments, densification accumulators, iteration and
RNG key, so multi-host runs can resume exactly. PLY export stays available
for interop (datasets/ply.py).

Format: one .npz of host arrays + a small JSON sidecar. Sharded arrays are
gathered to host on save and re-placed by the caller on restore.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from brush_tpu.optim import AdamState
from brush_tpu.splats import Splats
from brush_tpu.train import TrainState

_PARAM_KEYS = ["means", "sh_coeffs", "quats", "raw_opacity", "log_scales"]


def save_checkpoint(path: str, state: TrainState, step: int, key=None,
                    config=None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    arrays = {}
    for k in _PARAM_KEYS:
        arrays[f"param/{k}"] = np.asarray(getattr(state.splats, k))
        arrays[f"adam_m/{k}"] = np.asarray(state.opt.m[k])
        arrays[f"adam_v/{k}"] = np.asarray(state.opt.v[k])
    arrays["adam_count"] = np.asarray(state.opt.count)
    arrays["n_live"] = np.asarray(state.splats.n_live)
    arrays["grad_2d_accum"] = np.asarray(state.grad_2d_accum)
    arrays["xy_grad_counts"] = np.asarray(state.xy_grad_counts)
    if key is not None:
        arrays["rng_key"] = np.asarray(jax.random.key_data(key))
    # np.savez appends ".npz" when missing while the JSON sidecar used the
    # raw path — saving to "ckpt_1" then loading it silently lost step and
    # config (resume restarted the LR/refine schedule from 0). Normalize.
    if not str(path).endswith(".npz"):
        path = str(path) + ".npz"
    np.savez(path, **arrays)

    meta = {"step": int(step), "format_version": 1}
    if config is not None:
        meta["config"] = dataclasses.asdict(config)
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2)


def load_checkpoint(path: str):
    """Returns (TrainState, step, rng_key_or_None, config_dict_or_None)."""
    if not str(path).endswith(".npz"):
        path = str(path) + ".npz"  # mirror save_checkpoint's normalization
    z = np.load(path)
    splats = Splats(
        n_live=jnp.asarray(z["n_live"]),
        **{k: jnp.asarray(z[f"param/{k}"]) for k in _PARAM_KEYS},
    )
    opt = AdamState(
        m={k: jnp.asarray(z[f"adam_m/{k}"]) for k in _PARAM_KEYS},
        v={k: jnp.asarray(z[f"adam_v/{k}"]) for k in _PARAM_KEYS},
        count=jnp.asarray(z["adam_count"]),
    )
    state = TrainState(
        splats=splats,
        opt=opt,
        grad_2d_accum=jnp.asarray(z["grad_2d_accum"]),
        xy_grad_counts=jnp.asarray(z["xy_grad_counts"]),
    )
    key = None
    if "rng_key" in z:
        key = jax.random.wrap_key_data(jnp.asarray(z["rng_key"]))
    meta_path = path + ".json"
    step, config = 0, None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        step = meta.get("step", 0)
        config = meta.get("config")
    return state, step, key, config

"""Adam with per-group learning rates and refinement state surgery.

The reference drives five separate Burn Adam steps with distinct LRs per
parameter group (reference: train.rs:318-359) and *resets* the optimizer at
every refine, losing all momenta (train.rs:567-568 — marked TODO there).

Here Adam is a plain pytree transformation so refinement can permute /
append / zero moment entries alongside the splats ("state surgery"),
keeping momenta across refines. Bias correction matches Burn/torch Adam.

The SH learning-rate trick (train.rs:334-348: post-hoc lerp emulating lr/20
on higher SH orders, exact because the Adam update is linear in lr) becomes
a direct per-coefficient LR scale.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["m", "v", "count"],
    meta_fields=[],
)
@dataclasses.dataclass
class AdamState:
    m: dict      # first moments, same structure as params
    v: dict      # second moments
    count: jnp.ndarray  # () int32 step count


def init_adam(params: dict) -> AdamState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(
        m=zeros,
        v=jax.tree_util.tree_map(jnp.zeros_like, params),
        count=jnp.zeros((), jnp.int32),
    )


def adam_step(
    params: dict,
    grads: dict,
    state: AdamState,
    lrs: dict,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-15,
) -> tuple[dict, AdamState]:
    """One Adam step. `lrs` maps leaf name -> scalar or broadcastable array."""
    count = state.count + 1
    b1c = 1.0 - beta1 ** count.astype(jnp.float32)
    b2c = 1.0 - beta2 ** count.astype(jnp.float32)

    new_params, new_m, new_v = {}, {}, {}
    for key, p in params.items():
        g = grads[key]
        m = beta1 * state.m[key] + (1.0 - beta1) * g
        v = beta2 * state.v[key] + (1.0 - beta2) * g * g
        m_hat = m / b1c
        v_hat = v / b2c
        new_params[key] = p - lrs[key] * m_hat / (jnp.sqrt(v_hat) + eps)
        new_m[key] = m
        new_v[key] = v
    return new_params, AdamState(m=new_m, v=new_v, count=count)


"""Front-to-back alpha compositing as dense (pixels x splats) block math.

The reference rasterizes with a per-pixel sequential loop over depth-sorted
splats, breaking when transmittance T drops below 1e-4
(reference: rasterize.wgsl:57-101), and a back-to-front gradient loop with
atomic accumulation (rasterize_backwards.wgsl:194-303). TPUs have no per-lane
control flow or global atomics, so both passes are re-derived here as dense
vector math over (P pixels x K splats) blocks:

- T is a running product of (1 - alpha): computed as exp(cumsum(log1p(-a)))
  along the splat axis — a parallel prefix scan instead of a serial loop.
- The early-out becomes a mask: T is monotone non-increasing, so the set of
  splats composited before T <= 1e-4 is a prefix, recoverable from the scan.
- Gradients come from JAX autodiff of this forward (the backward "buffer"
  of rasterize_backwards.wgsl:253-257 emerges as the transpose of the
  prefix scan; the tiled/Pallas paths hand-derive it where autodiff
  cannot reach).

These blocks are exact re-derivations of the reference formulas; the
accumulation *strategy* is the only thing that changed. One deliberate
divergence: the reference clamps alpha at 0.999 in forward (rasterize.wgsl:83)
but 0.99 in backward (rasterize_backwards.wgsl:239) — we use 0.999 in both.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from brush_tpu.constants import ALPHA_EPS, ALPHA_MAX, TRANSMITTANCE_EPS

LOG_T_EPS = math.log(TRANSMITTANCE_EPS)


class SplatBlock(NamedTuple):
    """A block of K depth-ordered splats (padded entries have valid=False)."""

    xy: jnp.ndarray     # (K, 2) projected centers, pixels
    conic: jnp.ndarray  # (K, 3) inverse covariance upper triangle
    color: jnp.ndarray  # (K, 3) RGB
    opac: jnp.ndarray   # (K,) opacity after sigmoid
    valid: jnp.ndarray  # (K,) bool


def _alpha_terms(pix: jnp.ndarray, blk: SplatBlock):
    """Per (pixel, splat) alpha and visibility (rasterize.wgsl:80-85).

    Returns (alpha, vis): alpha is 0 where the splat does not contribute
    (sigma < 0, alpha < 1/255, or padding).
    """
    delta = blk.xy[None, :, :] - pix[:, None, :]  # (P, K, 2)
    dx, dy = delta[..., 0], delta[..., 1]
    cx, cy, cz = blk.conic[:, 0], blk.conic[:, 1], blk.conic[:, 2]
    sigma = 0.5 * (cx * dx * dx + cz * dy * dy) + cy * dx * dy
    # Clamped exp (see ops/pallas/rasterize_fwd.py): keeps autodiff through
    # the masked lanes finite when a det<0 conic sends sigma below -88.
    vis = jnp.exp(-jnp.maximum(sigma, 0.0))
    alpha = jnp.minimum(ALPHA_MAX, blk.opac * vis)
    ok = (sigma >= 0.0) & (alpha >= ALPHA_EPS) & blk.valid
    return jnp.where(ok, alpha, 0.0), vis, delta


class CompositeCarry(NamedTuple):
    log_t: jnp.ndarray  # (P,) log transmittance so far
    rgb: jnp.ndarray    # (P, 3) accumulated color
    alive: jnp.ndarray  # (P,) f32 1.0 until the early-out crossed (sticky)


def composite_fwd_block(pix: jnp.ndarray, carry: CompositeCarry, blk: SplatBlock):
    """Composite one block of splats front-to-back over P pixels.

    The early-out must be STICKY across blocks (the reference's `done`
    flag, rasterize.wgsl:87-90): the crossing splat's log1p(-alpha) is
    excluded from the carried log_t, so the carry alone sits just above
    the threshold and a later block's small-alpha splats would revive the
    pixel — the same divergence class the Pallas kernels fixed with an
    explicit alive carry. Within one block the cumsum is monotone, so the
    active set is a prefix and a block-level flag suffices.
    """
    alpha, _, _ = _alpha_terms(pix, blk)
    log_one_minus = jnp.log1p(-alpha)                    # 0 for non-contributors
    csum = jnp.cumsum(log_one_minus, axis=1)
    log_t_after = carry.log_t[:, None] + csum
    # Prefix of splats composited before the early-out (monotone in depth).
    act = (log_t_after > LOG_T_EPS) & (carry.alive[:, None] > 0.0)
    t_before = jnp.exp(log_t_after - log_one_minus)
    fac = alpha * t_before * act
    # HIGHEST: TPU's default f32 matmul precision is bf16 (see
    # rasterize_tiled); the oracle must stay f32-exact.
    rgb = carry.rgb + jnp.matmul(fac, blk.color,
                                 precision=jax.lax.Precision.HIGHEST)
    log_t = carry.log_t + jnp.sum(log_one_minus * act, axis=1)
    alive = carry.alive * (log_t_after[:, -1] > LOG_T_EPS)
    return CompositeCarry(log_t=log_t, rgb=rgb, alive=alive)


def composite_pixels(
    pix: jnp.ndarray,
    xy: jnp.ndarray,
    conic: jnp.ndarray,
    color: jnp.ndarray,
    opac: jnp.ndarray,
    valid: jnp.ndarray,
    block_size: int = 256,
) -> jnp.ndarray:
    """Composite all splats (already depth-ordered) over P pixels.

    Returns (P, 4) RGBA where alpha = 1 - T_final (rasterize.wgsl:103-105).
    """
    n = xy.shape[0]
    n_pad = -(-n // block_size) * block_size
    pad = n_pad - n

    def pad0(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    blocks = SplatBlock(
        xy=pad0(xy).reshape(-1, block_size, 2),
        conic=pad0(conic).reshape(-1, block_size, 3),
        color=pad0(color).reshape(-1, block_size, 3),
        opac=pad0(opac).reshape(-1, block_size),
        valid=pad0(valid).reshape(-1, block_size),
    )
    p = pix.shape[0]
    init = CompositeCarry(log_t=jnp.zeros((p,)), rgb=jnp.zeros((p, 3)),
                          alive=jnp.ones((p,)))

    def step(carry, blk):
        return composite_fwd_block(pix, carry, blk), None

    carry, _ = jax.lax.scan(step, init, blocks)
    alpha_out = 1.0 - jnp.exp(carry.log_t)
    return jnp.concatenate([carry.rgb, alpha_out[:, None]], axis=-1)

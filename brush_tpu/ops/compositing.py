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
- The backward "buffer" of color accumulated behind each splat
  (rasterize_backwards.wgsl:253-257) becomes a suffix sum: S_total - prefix.
- Per-splat gradient accumulation over pixels is a (K x P) @ (P x c)
  contraction instead of subgroup reductions + CAS loops.

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
    vis = jnp.exp(-sigma)
    alpha = jnp.minimum(ALPHA_MAX, blk.opac * vis)
    ok = (sigma >= 0.0) & (alpha >= ALPHA_EPS) & blk.valid
    return jnp.where(ok, alpha, 0.0), vis, delta


class CompositeCarry(NamedTuple):
    log_t: jnp.ndarray  # (P,) log transmittance so far
    rgb: jnp.ndarray    # (P, 3) accumulated color


def composite_fwd_block(pix: jnp.ndarray, carry: CompositeCarry, blk: SplatBlock):
    """Composite one block of splats front-to-back over P pixels."""
    alpha, _, _ = _alpha_terms(pix, blk)
    log_one_minus = jnp.log1p(-alpha)                    # 0 for non-contributors
    csum = jnp.cumsum(log_one_minus, axis=1)
    log_t_after = carry.log_t[:, None] + csum
    # Prefix of splats composited before the early-out (monotone in depth).
    act = log_t_after > LOG_T_EPS
    t_before = jnp.exp(log_t_after - log_one_minus)
    fac = alpha * t_before * act
    rgb = carry.rgb + fac @ blk.color
    log_t = carry.log_t + jnp.sum(log_one_minus * act, axis=1)
    return CompositeCarry(log_t=log_t, rgb=rgb)


class BackwardCarry(NamedTuple):
    log_t: jnp.ndarray   # (P,)
    s_pref: jnp.ndarray  # (P,) prefix of (color . v_rgb) * fac


class SplatGrads(NamedTuple):
    """Per-splat gradients, shapes matching SplatBlock fields."""

    v_xy: jnp.ndarray     # (K, 2)
    v_conic: jnp.ndarray  # (K, 3)
    v_color: jnp.ndarray  # (K, 3)
    v_opac: jnp.ndarray   # (K,) gradient w.r.t. post-sigmoid opacity


def composite_bwd_block(
    pix: jnp.ndarray,
    carry: BackwardCarry,
    blk: SplatBlock,
    v_rgb: jnp.ndarray,     # (P, 3) output-color cotangent
    v_alpha_out: jnp.ndarray,  # (P,) output-alpha cotangent
    s_total: jnp.ndarray,   # (P,) total (color . v_rgb) * fac over all splats
    t_final: jnp.ndarray,   # (P,) final transmittance
):
    """Gradient of one composited block (rasterize_backwards.wgsl:244-270).

    v_alpha = (c . v_rgb) T_before - (color behind) . v_rgb / (1-a)
              + T_final / (1-a) * v_out.a
    v_sigma = -opac * vis * v_alpha
    followed by the quadratic-form chain to xy / conic. The color behind a
    splat is S_total minus the inclusive prefix at that splat.
    """
    alpha, vis, delta = _alpha_terms(pix, blk)
    log_one_minus = jnp.log1p(-alpha)
    csum = jnp.cumsum(log_one_minus, axis=1)
    log_t_after = carry.log_t[:, None] + csum
    act = log_t_after > LOG_T_EPS
    t_before = jnp.exp(log_t_after - log_one_minus)
    fac = alpha * t_before * act

    cw = v_rgb @ blk.color.T                      # (P, K) color . v_rgb
    contrib = cw * fac
    s_upto = carry.s_pref[:, None] + jnp.cumsum(contrib, axis=1)
    ra = 1.0 / (1.0 - alpha)
    v_alpha = act * (
        cw * t_before
        - (s_total[:, None] - s_upto) * ra
        + t_final[:, None] * ra * v_alpha_out[:, None]
    )
    v_sigma = -blk.opac[None, :] * vis * v_alpha

    dx, dy = delta[..., 0], delta[..., 1]
    cx, cy, cz = blk.conic[:, 0], blk.conic[:, 1], blk.conic[:, 2]
    v_xy = jnp.stack(
        [
            jnp.sum(v_sigma * (cx * dx + cy * dy), axis=0),
            jnp.sum(v_sigma * (cy * dx + cz * dy), axis=0),
        ],
        axis=-1,
    )
    v_conic = jnp.stack(
        [
            jnp.sum(v_sigma * 0.5 * dx * dx, axis=0),
            jnp.sum(v_sigma * dx * dy, axis=0),
            jnp.sum(v_sigma * 0.5 * dy * dy, axis=0),
        ],
        axis=-1,
    )
    v_color = fac.T @ v_rgb                       # (K, 3)
    v_opac = jnp.sum(vis * v_alpha * act, axis=0)

    new_carry = BackwardCarry(
        log_t=carry.log_t + jnp.sum(log_one_minus * act, axis=1),
        s_pref=carry.s_pref + jnp.sum(contrib, axis=1),
    )
    grads = SplatGrads(v_xy=v_xy, v_conic=v_conic, v_color=v_color, v_opac=v_opac)
    return new_carry, grads


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
    init = CompositeCarry(log_t=jnp.zeros((p,)), rgb=jnp.zeros((p, 3)))

    def step(carry, blk):
        return composite_fwd_block(pix, carry, blk), None

    carry, _ = jax.lax.scan(step, init, blocks)
    alpha_out = 1.0 - jnp.exp(carry.log_t)
    return jnp.concatenate([carry.rgb, alpha_out[:, None]], axis=-1)

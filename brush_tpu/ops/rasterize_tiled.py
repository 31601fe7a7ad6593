"""Tiled rasterizer with a custom VJP — XLA implementation.

Forward mirrors rasterize.wgsl: every tile walks its depth-sorted
intersection range in blocks, compositing front-to-back with the 1e-4
transmittance early-out. Backward mirrors rasterize_backwards.wgsl: a single
back-to-front sweep reconstructing T by division and accumulating per-splat
gradients — but with the reference's subgroup reductions + CAS atomic loops
(rasterize_backwards.wgsl:32-135) replaced by dense (tile, pixel, splat)
block math and XLA scatter-adds.

All tiles advance in lockstep "rounds" of `block_size` intersections inside a
`lax.while_loop` bounded by the longest tile range; short tiles mask out.
This is the XLA correctness/fallback path — the Pallas kernel in
ops/pallas/ is the performance path and is validated against this.

The per-pixel `final_idx` (last contributing intersection) is carried out of
the forward pass exactly like the reference's final_index buffer
(rasterize.wgsl:112) so the backward visits the same splat set.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from brush_tpu.constants import (
    ALPHA_EPS,
    ALPHA_MAX,
    TILE_SIZE,
    TILE_WIDTH,
    TRANSMITTANCE_EPS,
)

LOG_T_EPS = math.log(TRANSMITTANCE_EPS)


def tile_pixel_coords(tile_ids: jnp.ndarray, tiles_x: int) -> jnp.ndarray:
    """(T, TILE_SIZE, 2) pixel-center coordinates for the given tile ids."""
    tx = (tile_ids % tiles_x).astype(jnp.float32)
    ty = (tile_ids // tiles_x).astype(jnp.float32)
    k = jnp.arange(TILE_SIZE)
    px = (k % TILE_WIDTH).astype(jnp.float32)
    py = (k // TILE_WIDTH).astype(jnp.float32)
    x = tx[:, None] * TILE_WIDTH + px[None, :] + 0.5
    y = ty[:, None] * TILE_WIDTH + py[None, :] + 0.5
    return jnp.stack([x, y], axis=-1)


def _block_alpha(pix, bxy, bconic, bopac, lane_mask):
    """(T, P, K) alpha/vis for a block; alpha=0 where not contributing."""
    delta = bxy[:, None, :, :] - pix[:, :, None, :]          # (T, P, K, 2)
    dx, dy = delta[..., 0], delta[..., 1]
    cx = bconic[:, None, :, 0]
    cy = bconic[:, None, :, 1]
    cz = bconic[:, None, :, 2]
    sigma = 0.5 * (cx * dx * dx + cz * dy * dy) + cy * dx * dy
    # Clamped exp (see ops/pallas/rasterize_fwd.py): sigma < 0 lanes are
    # masked by `ok`, but a det<0 conic can push sigma below -88 where raw
    # exp(-sigma) is inf and the backward's v_sigma = -opac*vis*(0) = NaN.
    vis = jnp.exp(-jnp.maximum(sigma, 0.0))
    alpha = jnp.minimum(ALPHA_MAX, bopac[:, None, :] * vis)
    ok = (sigma >= 0.0) & (alpha >= ALPHA_EPS) & lane_mask[:, None, :]
    return jnp.where(ok, alpha, 0.0), vis, dx, dy, cx, cy, cz


@functools.lru_cache(maxsize=32)
def make_rasterizer(tiles_x: int, num_tiles: int, max_isects: int, block_size: int):
    """Build the custom-VJP tiled rasterizer for a static tile-count/pool size.

    Returns raster(xy, conic, color, opac, isect_gid, starts, ends, tile_ids)
    -> (num_tiles, TILE_SIZE, 4) where inputs are per-compact-splat tensors
    and integer index workspaces from ops/binning.py. `tile_ids` selects
    which image tiles this call rasterizes (all of them single-device; a
    contiguous slice per device when tiles are sharded over a mesh).
    """
    k_lanes = block_size

    def _forward(xy, conic, color, opac, isect_gid, starts, ends, tile_ids):
        pix = tile_pixel_coords(tile_ids, tiles_x)
        max_len = jnp.max(ends - starts)

        lanes = jnp.arange(k_lanes, dtype=jnp.int32)

        def cond(carry):
            r = carry[0]
            return r * k_lanes < max_len

        def body(carry):
            r, log_t, alive, rgb, final_idx = carry
            idx = starts[:, None] + r * k_lanes + lanes[None, :]     # (T, K)
            lane_mask = idx < ends[:, None]
            gid = isect_gid[jnp.clip(idx, 0, max_isects - 1)]
            bxy = xy[gid]
            bconic = conic[gid]
            bcolor = color[gid]
            bopac = opac[gid]

            alpha, _, _, _, _, _, _ = _block_alpha(pix, bxy, bconic, bopac, lane_mask)
            lom = jnp.log1p(-alpha)
            csum = jnp.cumsum(lom, axis=-1)
            log_t_after = log_t[:, :, None] + csum
            # Sticky early-out (reference: rasterize.wgsl:87-90 `done`): the
            # crossing splat is not composited and the pixel never revives,
            # keeping the backward's final_index replay consistent.
            act = alive[:, :, None] & (log_t_after > LOG_T_EPS)
            t_before = jnp.exp(log_t_after - lom)
            fac = alpha * t_before * act

            # HIGHEST: on TPU the default einsum precision is bf16 on the
            # MXU — a 2^-8 relative error per term that accumulates over
            # hundreds of records per pixel (measured 0.196 max image
            # divergence vs the exact pipeline at 512^2/85k records). This
            # path is the correctness baseline; it must be f32-exact.
            rgb = rgb + jnp.einsum("tpk,tkc->tpc", fac, bcolor,
                                   precision=jax.lax.Precision.HIGHEST)
            log_t = log_t + jnp.sum(lom * act, axis=-1)
            alive = alive & (log_t_after[..., -1] > LOG_T_EPS)

            contributed = act & (alpha > 0.0)
            idx_b = jnp.broadcast_to(idx[:, None, :], contributed.shape)
            final_idx = jnp.maximum(
                final_idx, jnp.max(jnp.where(contributed, idx_b, -1), axis=-1)
            )
            return (r + 1, log_t, alive, rgb, final_idx)

        p = TILE_SIZE
        init = (
            jnp.zeros((), jnp.int32),
            jnp.zeros((num_tiles, p), jnp.float32),
            jnp.ones((num_tiles, p), jnp.bool_),
            jnp.zeros((num_tiles, p, 3), jnp.float32),
            jnp.full((num_tiles, p), -1, jnp.int32),
        )
        _, log_t, _alive, rgb, final_idx = jax.lax.while_loop(cond, body, init)
        img = jnp.concatenate([rgb, 1.0 - jnp.exp(log_t)[..., None]], axis=-1)
        return img, log_t, final_idx

    @jax.custom_vjp
    def raster(xy, conic, color, opac, isect_gid, starts, ends, tile_ids):
        img, _, _ = _forward(xy, conic, color, opac, isect_gid, starts, ends, tile_ids)
        return img

    def raster_fwd(xy, conic, color, opac, isect_gid, starts, ends, tile_ids):
        img, log_t, final_idx = _forward(
            xy, conic, color, opac, isect_gid, starts, ends, tile_ids
        )
        res = (xy, conic, color, opac, isect_gid, starts, ends, tile_ids,
               log_t, final_idx)
        return img, res

    def raster_bwd(res, g):
        (xy, conic, color, opac, isect_gid, starts, ends, tile_ids,
         log_t_final, final_idx) = res
        v_rgb = g[..., :3]
        v_a = g[..., 3]
        t_final = jnp.exp(log_t_final)

        pix = tile_pixel_coords(tile_ids, tiles_x)
        max_len = jnp.max(ends - starts)
        n_rounds = jnp.ceil(max_len / k_lanes).astype(jnp.int32)
        lanes = jnp.arange(k_lanes, dtype=jnp.int32)

        n = xy.shape[0]
        init = (
            n_rounds - 1,
            log_t_final,                          # log T after all splats
            jnp.zeros_like(t_final),              # (c . v_rgb) behind
            jnp.zeros((n, 2), jnp.float32),
            jnp.zeros((n, 3), jnp.float32),
            jnp.zeros((n, 3), jnp.float32),
            jnp.zeros((n,), jnp.float32),
        )

        def cond(carry):
            return carry[0] >= 0

        def body(carry):
            r, log_t_end, s_behind, v_xy, v_conic, v_color, v_opac = carry
            idx = starts[:, None] + r * k_lanes + lanes[None, :]
            lane_mask = idx < ends[:, None]
            gid = isect_gid[jnp.clip(idx, 0, max_isects - 1)]
            bxy = xy[gid]
            bconic = conic[gid]
            bcolor = color[gid]
            bopac = opac[gid]

            alpha, vis, dx, dy, cx, cy, cz = _block_alpha(
                pix, bxy, bconic, bopac, lane_mask
            )
            # Same contributing set as the forward pass, via final_idx
            # (rasterize_backwards.wgsl:229 `isect_id <= final_isect`).
            act = (idx[:, None, :] <= final_idx[:, :, None]) & (alpha > 0.0)
            m = jnp.log1p(-alpha) * act
            m_inc = jnp.cumsum(m, axis=-1)
            m_tot = m_inc[..., -1]
            # log T after splat s = log_t_end - sum_{j>s} m_j.
            log_t_after = log_t_end[:, :, None] - (m_tot[:, :, None] - m_inc)
            t_before = jnp.exp(log_t_after - m)
            fac = alpha * t_before * act

            cw = jnp.einsum("tpc,tkc->tpk", v_rgb, bcolor,
                            precision=jax.lax.Precision.HIGHEST)
            contrib = cw * fac
            c_inc = jnp.cumsum(contrib, axis=-1)
            c_tot = c_inc[..., -1]
            buffer_behind = s_behind[:, :, None] + (c_tot[:, :, None] - c_inc)

            ra = 1.0 / (1.0 - alpha)
            v_alpha = act * (
                cw * t_before
                - buffer_behind * ra
                + t_final[:, :, None] * ra * v_a[:, :, None]
            )
            v_sigma = -bopac[:, None, :] * vis * v_alpha

            g_xy = jnp.stack(
                [
                    jnp.sum(v_sigma * (cx * dx + cy * dy), axis=1),
                    jnp.sum(v_sigma * (cy * dx + cz * dy), axis=1),
                ],
                axis=-1,
            )
            g_conic = jnp.stack(
                [
                    jnp.sum(v_sigma * 0.5 * dx * dx, axis=1),
                    jnp.sum(v_sigma * dx * dy, axis=1),
                    jnp.sum(v_sigma * 0.5 * dy * dy, axis=1),
                ],
                axis=-1,
            )
            g_color = jnp.einsum("tpk,tpc->tkc", fac, v_rgb,
                                 precision=jax.lax.Precision.HIGHEST)
            g_opac = jnp.sum(vis * v_alpha * act, axis=1)

            flat_gid = gid.reshape(-1)
            v_xy = v_xy.at[flat_gid].add(g_xy.reshape(-1, 2))
            v_conic = v_conic.at[flat_gid].add(g_conic.reshape(-1, 3))
            v_color = v_color.at[flat_gid].add(g_color.reshape(-1, 3))
            v_opac = v_opac.at[flat_gid].add(g_opac.reshape(-1))

            return (
                r - 1,
                log_t_end - m_tot,
                s_behind + c_tot,
                v_xy,
                v_conic,
                v_color,
                v_opac,
            )

        _, _, _, v_xy, v_conic, v_color, v_opac = jax.lax.while_loop(
            cond, body, init
        )
        return (v_xy, v_conic, v_color, v_opac, None, None, None, None)

    raster.defvjp(raster_fwd, raster_bwd)
    return raster


def assemble_image(img_tiles: jnp.ndarray, img_size, tiles_x: int,
                   tiles_y: int, cell=(1, 1)):
    """(T, P, 4) -> (h, w, 4), cropping tile padding.

    cell=(gw, gh): blocks are raster cells of gw x gh tiles (P =
    256*gw*gh); tiles_x/tiles_y are then the CELL grid dims.
    """
    w, h = int(img_size[0]), int(img_size[1])
    cw = TILE_WIDTH * cell[0]
    ch = TILE_WIDTH * cell[1]
    img = img_tiles.reshape(tiles_y, tiles_x, ch, cw, 4)
    img = img.transpose(0, 2, 1, 3, 4).reshape(tiles_y * ch, tiles_x * cw, 4)
    return img[:h, :w]

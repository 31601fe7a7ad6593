"""Sharded training step via shard_map.

Dataflow per step (see sharding.py for the decomposition rationale):

  gaussian-sharded:  project + SH + opacity on the local splat shard
  all_gather (ICI):  projected splats -> replicated compact arrays
  replicated:        depth sort + intersection expansion + tile bins
                     (integer bookkeeping; cheap relative to raster)
  tile-sharded:      each device rasterizes its contiguous tile strip
  all_gather (ICI):  image tiles -> full image, loss replicated
  backward:          transposes of the gathers reduce-scatter the per-splat
                     cotangents back to the owning shard; Adam runs locally.

The reference has no counterpart (single-GPU); this is the BASELINE.md
"gaussians + image tiles sharded over the mesh" design.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from brush_tpu.config import TrainConfig
from brush_tpu.constants import TILE_WIDTH, sh_degree_from_coeffs
from brush_tpu.ops.binning import build_intersections
from brush_tpu.ops.projection import Projection, project_splats
from brush_tpu.ops.rasterize_tiled import assemble_image, make_rasterizer
from brush_tpu.ops.sh import sh_to_color
from brush_tpu.optim import adam_step
from brush_tpu.parallel.sharding import AXIS
from brush_tpu.ssim import Ssim
from brush_tpu.train import StepStats, TrainState


def make_sharded_train_step(
    mesh,
    config: TrainConfig,
    capacity: int,
    img_size,
    channels: int,
    sh_count: int,
    max_isects: int | None = None,
    block_size: int = 32,
    backend: str = "auto",
):
    """Build a jitted sharded train step.

    Returns step(state, gt, viewmat, focal, pixel_center, lr_mean, step_idx)
    -> (state, StepStats) with all (C, ...) state arrays sharded over AXIS.
    backend: "xla" | "pallas" | "auto" (pallas on TPU platforms).
    """
    n_dev = mesh.size
    if capacity % n_dev:
        raise ValueError(f"capacity {capacity} not divisible by mesh size {n_dev}")
    rows_per = capacity // n_dev

    w, h = int(img_size[0]), int(img_size[1])
    tiles_x = -(-w // TILE_WIDTH)
    tiles_y = -(-h // TILE_WIDTH)
    num_tiles = tiles_x * tiles_y
    tiles_per = -(-num_tiles // n_dev)
    tiles_pad = tiles_per * n_dev

    if backend == "auto":
        backend = "xla" if jax.default_backend() == "cpu" else "pallas"
    if max_isects is None:
        from brush_tpu.render import default_max_isects

        max_isects = default_max_isects(capacity, img_size)

    ssim = Ssim(config.ssim_window_size, 3)
    if backend == "pallas":
        from brush_tpu.ops.pallas.raster_vjp import make_pallas_rasterizer

        k_lanes = max(128, block_size)
        max_isects = -(-max_isects // k_lanes) * k_lanes
        align = k_lanes
        raster = make_pallas_rasterizer(tiles_x, tiles_per, max_isects, k_lanes)
    else:
        align = 1
        raster = make_rasterizer(tiles_x, tiles_per, max_isects, block_size)

    def device_fn(params, opt_m, opt_v, opt_count, accum, counts, n_live,
                  gt, viewmat, focal, pixel_center, lr_mean, step_idx):
        """Runs per device: params etc. are local (rows_per, ...) shards."""
        d = jax.lax.axis_index(AXIS)
        rows = d * rows_per + jnp.arange(rows_per)
        active_l = rows < n_live

        def loss_fn(params, xy_dummy_l):
            quats_n = params["quats"] / jnp.linalg.norm(
                params["quats"], axis=-1, keepdims=True
            ).clip(1e-12)
            proj_l = project_splats(
                params["means"], params["log_scales"], quats_n,
                viewmat, focal, pixel_center, img_size, active=active_l,
            )
            cam_pos = viewmat[:3, 3]
            viewdir = params["means"] - cam_pos
            viewdir = viewdir / jnp.linalg.norm(
                viewdir, axis=-1, keepdims=True
            ).clip(1e-12)
            viewdir = jax.lax.stop_gradient(viewdir)
            sh_degree = sh_degree_from_coeffs(sh_count)
            color_l = sh_to_color(sh_degree, viewdir, params["sh_coeffs"])
            opac_l = jax.nn.sigmoid(params["raw_opacity"])
            xy_l = proj_l.xy + xy_dummy_l

            # Re-shard: gaussian-parallel -> replicated projected splats.
            gather = functools.partial(jax.lax.all_gather, axis_name=AXIS, tiled=True)
            proj_f = Projection(
                xy=gather(xy_l),
                depth=gather(proj_l.depth),
                conic=gather(proj_l.conic),
                radius=gather(proj_l.radius),
                tile_min=gather(proj_l.tile_min),
                tile_max=gather(proj_l.tile_max),
                visible=gather(proj_l.visible),
            )
            color_f = gather(color_l)
            opac_f = gather(opac_l)

            isect = build_intersections(
                jax.tree_util.tree_map(jax.lax.stop_gradient, proj_f),
                jax.lax.stop_gradient(opac_f),
                (tiles_x, tiles_y),
                max_isects,
                align=align,
            )
            order = isect.order

            # Tile strip for this device (empty padding ranges past the end).
            starts_pad = jnp.pad(isect.starts, (0, tiles_pad - num_tiles))
            ends_pad = jnp.pad(isect.ends, (0, tiles_pad - num_tiles))
            t0 = d * tiles_per
            my_starts = jax.lax.dynamic_slice(starts_pad, (t0,), (tiles_per,))
            my_ends = jax.lax.dynamic_slice(ends_pad, (t0,), (tiles_per,))
            my_tiles = t0 + jnp.arange(tiles_per, dtype=jnp.int32)

            img_tiles_l = raster(
                proj_f.xy[order], proj_f.conic[order], color_f[order],
                opac_f[order], isect.isect_gid, my_starts, my_ends, my_tiles,
            )

            # Re-shard: tile-parallel -> full image for the loss.
            img_tiles_f = gather(img_tiles_l)
            img = assemble_image(img_tiles_f[:num_tiles], img_size, tiles_x, tiles_y)

            pred = img if channels == 4 else img[..., :3]
            l1 = jnp.mean(jnp.abs(pred - gt))
            if config.ssim_weight > 0.0:
                ssim_val = ssim.ssim(img[None, ..., :3], gt[None, ..., :3])
                loss = l1 * (1.0 - config.ssim_weight) - ssim_val * config.ssim_weight
            else:
                loss = l1
            return loss, (isect.num_visible, isect.num_isects, isect.producing)

        xy_dummy_l = jnp.zeros((rows_per, 2), jnp.float32)
        (loss, (num_visible, num_isects, producing)), (pgrads, xy_grads) = (
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                params, xy_dummy_l
            )
        )

        # Densification stats on the local shard (train.rs:284-316).
        gate = (step_idx > config.warmup_steps).astype(jnp.float32)
        xys_scaled = xy_grads * jnp.asarray([w / 2.0, h / 2.0], jnp.float32)
        norms = jnp.sqrt(jnp.sum(xys_scaled**2, axis=1))
        counts_inc_f = producing.astype(jnp.int32)
        counts_inc_l = jax.lax.dynamic_slice(
            counts_inc_f, (d * rows_per,), (rows_per,)
        )
        accum = accum + gate * norms
        counts = counts + gate.astype(jnp.int32) * counts_inc_l

        if sh_count > 1:
            sh_scale = jnp.concatenate(
                [jnp.ones((1,)), jnp.full((sh_count - 1,), 1.0 / config.lr_coeffs_sh_scale)]
            ).reshape(1, sh_count, 1)
        else:
            sh_scale = jnp.ones((1, 1, 1))
        lrs = {
            "means": lr_mean,
            "raw_opacity": config.lr_opac,
            "sh_coeffs": config.lr_coeffs_dc * sh_scale,
            "quats": config.lr_rotation,
            "log_scales": config.lr_scale,
        }
        from brush_tpu.optim import AdamState

        new_params, new_opt = adam_step(
            params, pgrads, AdamState(m=opt_m, v=opt_v, count=opt_count),
            lrs, eps=config.adam_eps,
        )
        return (
            new_params, new_opt.m, new_opt.v, new_opt.count,
            accum, counts, loss, num_visible, num_isects,
        )

    sh = P(AXIS)          # row-sharded
    rep = P()             # replicated
    params_spec = {k: sh for k in ["means", "sh_coeffs", "quats", "raw_opacity", "log_scales"]}

    sharded = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(
            params_spec, params_spec, params_spec, rep,  # params, m, v, count
            sh, sh, rep,                                  # accum, counts, n_live
            rep, rep, rep, rep, rep, rep,                 # gt, cam..., lr, step
        ),
        out_specs=(
            params_spec, params_spec, params_spec, rep,
            sh, sh, rep, rep, rep,
        ),
        check_rep=False,
    )

    def step(state: TrainState, gt, viewmat, focal, pixel_center, lr_mean, step_idx):
        (new_params, m, v, count, accum, counts, loss, num_visible, num_isects) = (
            sharded(
                state.splats.params(), state.opt.m, state.opt.v, state.opt.count,
                state.grad_2d_accum, state.xy_grad_counts, state.splats.n_live,
                gt, viewmat, focal, pixel_center, lr_mean, step_idx,
            )
        )
        from brush_tpu.optim import AdamState

        new_state = TrainState(
            splats=state.splats.with_params(new_params),
            opt=AdamState(m=m, v=v, count=count),
            grad_2d_accum=accum,
            xy_grad_counts=counts,
        )
        return new_state, StepStats(
            loss=loss, num_visible=num_visible, num_isects=num_isects
        )

    return jax.jit(step)

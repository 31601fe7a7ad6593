"""Sharded training step via shard_map.

Dataflow per step (see sharding.py for the decomposition rationale):

  gaussian-sharded:  project + SH + opacity + exact-tile pretest on the
                     local splat shard
  all_gather (ICI):  attribute/decode rows -> replicated compact arrays
  strip-local:       each device restricts the coverage masks to ITS
                     row-aligned tile strip (ops/binning.
                     restrict_masks_to_strip) and runs the record pipeline
                     — depth sort, expansion, tile sort, bins — over a
                     strip-sized pool holding only its strip's records.
                     Expansion/tile-sort/bins/raster work is proportional
                     to the strip's record share (SURVEY §5.7); only the
                     N-shaped depth sort remains common work (it doubles
                     as producer compaction and has no cheaper sharded
                     form — see docs/PERFORMANCE.md).
  tile-sharded:      each device rasterizes its contiguous tile strip
  all_gather (ICI):  image tiles -> full image, loss replicated
  backward:          each device's strip-local pool produces gradient
                     records; the segment-sum reduces them per splat, and
                     the transpose of the attribute all_gather
                     reduce-scatters the partial cotangents back to the
                     owning shard. Adam runs locally.

The reference has no counterpart (single-GPU); this is the BASELINE.md
"gaussians + image tiles sharded over the mesh" design.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from brush_tpu.config import TrainConfig
from brush_tpu.constants import TILE_WIDTH, sh_degree_from_coeffs
from brush_tpu.ops.binning import build_intersections, precompute_tile_masks
from brush_tpu.ops.projection import Projection, project_splats
from brush_tpu.ops.rasterize_tiled import assemble_image, make_rasterizer
from brush_tpu.ops.sh import sh_to_color
from brush_tpu.optim import AdamState, adam_step
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
    strip_pool_slack: float = 2.0,
    cell=(1, 1),
):
    """Build a jitted sharded train step.

    Returns step(state, gt, viewmat, focal, pixel_center, lr_mean, step_idx)
    -> (state, StepStats) with all (C, ...) state arrays sharded over AXIS.
    backend: "xla" | "pallas" | "auto" (pallas on TPU platforms).
    cell=(gw, gh): raster-cell grouping on the pallas path (see
    render_splats); strips then shard CELL rows. The XLA fallback ignores
    it (single-tile blocks).
    """
    n_dev = mesh.size
    if capacity % n_dev:
        raise ValueError(f"capacity {capacity} not divisible by mesh size {n_dev}")
    rows_per = capacity // n_dev

    w, h = int(img_size[0]), int(img_size[1])
    tiles_x = -(-w // TILE_WIDTH)
    tiles_y = -(-h // TILE_WIDTH)
    num_tiles = tiles_x * tiles_y
    # Row-aligned strips: the strip-local mask restriction
    # (restrict_masks_to_strip) needs each strip to be a whole range of
    # tile rows. Devices past the last row own empty strips.
    strip_rows = -(-tiles_y // n_dev)
    tiles_per = strip_rows * tiles_x

    if backend == "auto":
        backend = "xla" if jax.default_backend() == "cpu" else "pallas"
    if max_isects is None:
        from brush_tpu.render import default_max_isects

        max_isects = default_max_isects(capacity, img_size)

    ssim = Ssim(config.ssim_window_size, 3)
    use_pipeline = backend in ("pallas", "pallas_interpret")
    if use_pipeline:
        from brush_tpu.ops.pallas.raster_vjp import make_pallas_pipeline

        # Cell domain (identical to the tile domain at the default 1x1).
        cells_x = -(-tiles_x // cell[0])
        cells_y = -(-tiles_y // cell[1])
        num_cells = cells_x * cells_y
        strip_crows = -(-cells_y // n_dev)
        cells_per = strip_crows * cells_x

        k_lanes = max(128, block_size)
        k_align = math.lcm(k_lanes, 512)  # pool tiles both k_lanes and k_exp
        # Strip-local pool: each device holds only its strip's records.
        # The slack factor absorbs tile-load imbalance; overflow is
        # observable via num_dropped (psum of per-strip drops).
        pool_strip = min(max_isects,
                         int(max_isects * strip_pool_slack / n_dev))
        pool_strip = max(-(-pool_strip // k_align) * k_align, k_align)
        raster = make_pallas_pipeline(
            cells_x, num_cells, pool_strip, capacity, k_lanes=k_lanes,
            raster_tiles=cells_per,
            interpret=backend == "pallas_interpret"
            or jax.default_backend() == "cpu",
            cell=cell,
        )
    else:
        pool_strip = max_isects
        raster = make_rasterizer(tiles_x, tiles_per, max_isects, block_size)

    gather1 = functools.partial(
        jax.lax.all_gather, axis_name=AXIS, tiled=True, axis=1
    )
    gather0 = functools.partial(
        jax.lax.all_gather, axis_name=AXIS, tiled=True
    )

    def _loss_pipeline(params, xy_dummy_l, active_l, d, gt,
                       viewmat, focal, pixel_center):
        """Strip-local loss on the TPU record pipeline."""
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
        color_l = sh_to_color(
            sh_degree_from_coeffs(sh_count), viewdir, params["sh_coeffs"]
        )
        opac_l = jax.nn.sigmoid(params["raw_opacity"])
        xy_l = proj_l.xy + xy_dummy_l

        proj_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, proj_l)
        masks = precompute_tile_masks(proj_sg, jax.lax.stop_gradient(opac_l),
                                      cell=cell)
        producing_l = proj_l.visible & (masks.counts > 0)
        counts_g = jnp.where(producing_l, masks.counts, 0)
        depth_bits = jax.lax.bitcast_convert_type(
            jnp.maximum(proj_l.depth, 1e-20), jnp.uint32
        )
        dkey_raw_l = jnp.where(
            producing_l, depth_bits, jnp.uint32(0xFFFFFFFF)
        )

        attrs9_l = jnp.stack(
            [xy_l[:, 0], xy_l[:, 1], proj_l.conic[:, 0], proj_l.conic[:, 1],
             proj_l.conic[:, 2], color_l[:, 0], color_l[:, 1],
             color_l[:, 2], opac_l], axis=0,
        )
        # Non-differentiable per-splat metadata, packed into 6 u32 rows for
        # one gather: [tmin_x|tmin_y<<16, bbox_w|bbox_h<<16,
        # counts|small<<31, mask_lo, mask_hi, depth_key]. All coordinates
        # are in the CELL domain (== tiles at the default 1x1 cell).
        from brush_tpu.ops.binning import cell_bbox

        u32 = lambda v: v.astype(jnp.uint32)
        cmin_x_l, cmin_y_l, cmax_x_l, cmax_y_l = cell_bbox(proj_sg, cell)
        bbox_w_l = jnp.clip(cmax_x_l - cmin_x_l, 1, 1023)
        bbox_h_l = jnp.maximum(cmax_y_l - cmin_y_l, 1)
        meta_l = jnp.stack(
            [u32(cmin_x_l) | (u32(cmin_y_l) << 16),
             u32(bbox_w_l) | (u32(bbox_h_l) << 16),
             u32(counts_g) | (u32(masks.small) << 31),
             masks.mask_lo, masks.mask_hi, dkey_raw_l], axis=0,
        )

        # Re-shard: gaussian-parallel -> replicated rows. The backward of
        # the attrs gather reduce-scatters the per-splat cotangents back to
        # the owning shard over ICI.
        attrs9 = gather1(attrs9_l)
        meta = gather1(jax.lax.stop_gradient(meta_l))

        # Strip-local record pipeline: restrict coverage to MY tile rows,
        # so the pool, tile sort, bins and raster all scale with the
        # strip's record share instead of the frame's.
        from brush_tpu.ops.binning import restrict_masks_parts
        from brush_tpu.render import pack_decode_parts

        m16 = jnp.uint32(0xFFFF)
        tmin_x = (meta[0] & m16).astype(jnp.int32)
        tmin_y = (meta[0] >> 16).astype(jnp.int32)
        bbox_w = (meta[1] & m16).astype(jnp.int32)
        bbox_h = (meta[1] >> 16).astype(jnp.int32)
        counts_f = (meta[2] & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        small_f = meta[2] >> 31

        r0 = d * strip_crows
        counts_d, m_lo_d, m_hi_d, tmin_y_d, bbox_h_d = restrict_masks_parts(
            tmin_y, bbox_w, bbox_h, small_f.astype(bool),
            meta[3], meta[4], counts_f, r0, r0 + strip_crows,
        )
        decode_d = pack_decode_parts(
            tmin_x, tmin_y_d, bbox_w, bbox_h_d, counts_d, small_f,
            m_lo_d, m_hi_d,
        )
        depth_key = jnp.where(counts_d > 0, meta[5], jnp.uint32(0xFFFFFFFF))

        t0 = d * cells_per
        my_tiles = t0 + jnp.arange(cells_per, dtype=jnp.int32)
        img_tiles_l, _, total_l, raw_total_l = raster(
            attrs9, decode_d, depth_key, my_tiles
        )
        num_isects = jax.lax.psum(total_l.astype(jnp.int32), AXIS)
        num_dropped = jax.lax.psum(
            jnp.maximum(raw_total_l - pool_strip, 0).astype(jnp.int32), AXIS
        )
        # Peak UNCLAMPED per-strip demand: drives the adaptive strip pool
        # slack (trainer re-quantizes slack at its recompile boundaries).
        # all_gather + max of the n_dev scalars rather than lax.pmax: this
        # traces under value_and_grad and pmax has no differentiation rule
        # (even for integer data).
        strip_totals = jax.lax.all_gather(
            jax.lax.stop_gradient(raw_total_l.astype(jnp.int32)), AXIS
        )
        max_strip = jnp.max(strip_totals)

        # Re-shard: cell-parallel -> full image for the loss.
        img_tiles_f = gather0(img_tiles_l)
        img = assemble_image(
            img_tiles_f[:num_cells], img_size, cells_x, cells_y, cell=cell
        )
        num_visible = jax.lax.psum(
            jnp.sum(proj_l.visible).astype(jnp.int32), AXIS
        )
        return (img, num_visible, num_isects, num_dropped, max_strip,
                producing_l)

    def _loss_xla(params, xy_dummy_l, active_l, d, gt,
                  viewmat, focal, pixel_center):
        """Replicated-binning loss on the XLA rasterizer (CPU fallback)."""
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
        color_l = sh_to_color(
            sh_degree_from_coeffs(sh_count), viewdir, params["sh_coeffs"]
        )
        opac_l = jax.nn.sigmoid(params["raw_opacity"])
        xy_l = proj_l.xy + xy_dummy_l

        proj_f = Projection(*[gather0(x) for x in proj_l])
        color_f = gather0(color_l)
        opac_f = gather0(opac_l)
        xy_f = gather0(xy_l)

        isect = build_intersections(
            jax.tree_util.tree_map(jax.lax.stop_gradient, proj_f),
            jax.lax.stop_gradient(opac_f),
            (tiles_x, tiles_y),
            max_isects,
            align=1,
        )
        order = isect.order
        attrs = jnp.concatenate(
            [xy_f, proj_f.conic, color_f, opac_f[:, None]], axis=1
        )[order]

        tiles_pad = tiles_per * n_dev
        starts_pad = jnp.pad(isect.starts, (0, tiles_pad - num_tiles))
        ends_pad = jnp.pad(isect.ends, (0, tiles_pad - num_tiles))
        t0 = d * tiles_per
        my_starts = jax.lax.dynamic_slice(starts_pad, (t0,), (tiles_per,))
        my_ends = jax.lax.dynamic_slice(ends_pad, (t0,), (tiles_per,))
        my_tiles = t0 + jnp.arange(tiles_per, dtype=jnp.int32)

        img_tiles_l = raster(
            attrs[:, 0:2], attrs[:, 2:5], attrs[:, 5:8], attrs[:, 8],
            isect.isect_gid, my_starts, my_ends, my_tiles,
        )
        img_tiles_f = gather0(img_tiles_l)
        img = assemble_image(
            img_tiles_f[:num_tiles], img_size, tiles_x, tiles_y
        )
        producing_l = jax.lax.dynamic_slice(
            isect.producing, (d * rows_per,), (rows_per,)
        )
        # Replicated binning: the pool is not strip-local, so the peak
        # per-device demand equals the frame total.
        return (img, isect.num_visible, isect.num_isects, isect.num_dropped,
                isect.num_isects, producing_l)

    loss_core = _loss_pipeline if use_pipeline else _loss_xla

    def device_fn(params, opt_m, opt_v, opt_count, accum, counts, n_live,
                  gt, viewmat, focal, pixel_center, lr_mean, step_idx):
        """Runs per device: params etc. are local (rows_per, ...) shards."""
        d = jax.lax.axis_index(AXIS)
        rows = d * rows_per + jnp.arange(rows_per)
        active_l = rows < n_live

        def loss_fn(params, xy_dummy_l):
            (img, num_visible, num_isects, num_dropped, max_strip,
             producing_l) = loss_core(
                params, xy_dummy_l, active_l, d, gt,
                viewmat, focal, pixel_center,
            )
            pred = img if channels == 4 else img[..., :3]
            l1 = jnp.mean(jnp.abs(pred - gt))
            if config.ssim_weight > 0.0:
                ssim_val = ssim.ssim(img[None, ..., :3], gt[None, ..., :3])
                loss = l1 * (1.0 - config.ssim_weight) - ssim_val * config.ssim_weight
            else:
                loss = l1
            return loss, (num_visible, num_isects, num_dropped,
                          max_strip, producing_l)

        xy_dummy_l = jnp.zeros((rows_per, 2), jnp.float32)
        ((loss, (num_visible, num_isects, num_dropped, max_strip,
                 producing_l)),
         (pgrads, xy_grads)) = (
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                params, xy_dummy_l
            )
        )

        # Densification stats on the local shard (train.rs:284-316).
        gate = (step_idx > config.warmup_steps).astype(jnp.float32)
        xys_scaled = xy_grads * jnp.asarray([w / 2.0, h / 2.0], jnp.float32)
        norms = jnp.sqrt(jnp.sum(xys_scaled**2, axis=1))
        accum = accum + gate * norms
        counts = counts + gate.astype(jnp.int32) * producing_l.astype(jnp.int32)

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
        new_params, new_opt = adam_step(
            params, pgrads, AdamState(m=opt_m, v=opt_v, count=opt_count),
            lrs, eps=config.adam_eps,
        )
        return (
            new_params, new_opt.m, new_opt.v, new_opt.count,
            accum, counts, loss, num_visible, num_isects, num_dropped,
            max_strip,
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
            sh, sh, rep, rep, rep, rep, rep,
        ),
        check_vma=False,
    )

    def step(state: TrainState, gt, viewmat, focal, pixel_center, lr_mean, step_idx):
        (new_params, m, v, count, accum, counts, loss, num_visible,
         num_isects, num_dropped, max_strip) = (
            sharded(
                state.splats.params(), state.opt.m, state.opt.v, state.opt.count,
                state.grad_2d_accum, state.xy_grad_counts, state.splats.n_live,
                gt, viewmat, focal, pixel_center, lr_mean, step_idx,
            )
        )
        new_state = TrainState(
            splats=state.splats.with_params(new_params),
            opt=AdamState(m=m, v=v, count=count),
            grad_2d_accum=accum,
            xy_grad_counts=counts,
        )
        return new_state, StepStats(
            loss=loss, num_visible=num_visible, num_isects=num_isects,
            num_dropped=num_dropped, max_strip_isects=max_strip,
        )

    return jax.jit(step)

"""Training loop: loss, per-group Adam, densification statistics, refinement.

Mirrors the reference trainer (reference: brush-train/src/train.rs):
  step  = render -> L1 + SSIM loss -> backward -> per-group Adam with
          distinct LRs -> screen-space-gradient accumulation
          (train.rs:211-393)
  refine = clone small / split large high-gradient splats, prune transparent
          or oversized ones, periodic opacity reset (train.rs:395-578)

TPU-first differences:
  - All shapes are static: splats live in a padded capacity-C buffer and
    refinement compacts/concatenates via a stable sort over 2C candidate
    rows instead of argwhere + dynamic concat (train.rs:420-537). The live
    count comes back to the host once per refine (the reference also reads
    back via argwhere_async, train.rs:427,458).
  - Adam moments survive refinement via state surgery (permute + zero new
    rows) instead of the reference's full optimizer reset (train.rs:567-568).
    `TrainConfig.keep_opt_state_on_refine=False` restores reference behavior.
  - Capacity grows in buckets (x2) when refinement would overflow,
    recompiling rarely.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from brush_tpu.camera import Camera
from brush_tpu.config import TrainConfig
from brush_tpu.optim import AdamState, adam_step, init_adam
from brush_tpu.ops.rasterize_reference import CameraParams, camera_params
from brush_tpu.render import render_splats
from brush_tpu.splats import PADDING_RAW_OPACITY, Splats, inverse_sigmoid
from brush_tpu.ssim import Ssim

_log = logging.getLogger(__name__)


@dataclasses.dataclass
class SceneBatch:
    """One training view (the reference asserts batch size 1, train.rs:217)."""

    gt_image: np.ndarray       # (H, W, 3|4) float32 in [0, 1]
    camera: Camera
    scene_extent: float = 1.0


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["splats", "opt", "grad_2d_accum", "xy_grad_counts"],
    meta_fields=[],
)
@dataclasses.dataclass
class TrainState:
    splats: Splats
    opt: AdamState
    grad_2d_accum: jnp.ndarray   # (C,) f32
    xy_grad_counts: jnp.ndarray  # (C,) i32


class StepStats(NamedTuple):
    loss: jnp.ndarray
    num_visible: jnp.ndarray
    num_isects: jnp.ndarray
    num_dropped: jnp.ndarray  # records lost to intersection-pool overflow
    # Peak per-device record demand (sharded step: max over strips of the
    # UNCLAMPED strip record count; single device: num_isects). Drives the
    # ShardedTrainer's adaptive strip_pool_slack. Plain-int default so
    # importing this module never touches the device backend.
    max_strip_isects: jnp.ndarray | int = 0


class RefineStats(NamedTuple):
    num_cloned: jnp.ndarray
    num_split: jnp.ndarray
    num_pruned_alpha: jnp.ndarray
    num_pruned_scale: jnp.ndarray
    n_live: jnp.ndarray


def quat_rotate(quats: jnp.ndarray, vecs: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors into the splat frame: R(q) @ v.

    The reference's hand-expanded version (train.rs:140-177,
    quaternion_vec_multiply) does not actually compute a rotation — its
    term expansion is wrong (verifiable numerically against R(q) @ v). The
    result only randomizes split offsets, so training still works there; we
    use the correct rotation, which is the intended semantics.
    """
    from brush_tpu.ops.projection import quat_to_rotmat

    # Stored quats drift off unit norm under Adam (rendering normalizes
    # internally, render.py); an unnormalized q = s*u gives
    # I + s^2 (R(u) - I) — a blend of identity and rotation — so split
    # offsets would skew in direction and scale. Normalize first.
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True).clip(1e-12)
    # Elementwise batched matvec (einsum "nij,nj->ni" is a tiny-batched
    # dot, the slow-lowering shape per docs/PERFORMANCE.md).
    rot = quat_to_rotmat(quats)
    return jnp.sum(rot * vecs[:, None, :], axis=-1)


class SplatTrainer:
    """Host-side orchestration around jitted step/refine functions.

    Jitted computations are cached per (capacity, image size, channels);
    capacity growth and the refine cadence live on the host, mirroring the
    reference's train_loop (brush-viewer/src/train_loop.rs:102-172).
    """

    def __init__(self, config: TrainConfig | None = None,
                 raster_block_size: int = 32, raster_cell=(1, 1),
                 pack_grad_sort: bool = True):
        self.config = config or TrainConfig()
        self.iter = 0
        self.raster_block_size = raster_block_size
        # Raster-cell grouping (render_splats cell=): pallas-path perf
        # knob, single-tile default; ignored by the XLA backend.
        self.raster_cell = tuple(raster_cell)
        # pack_grad_sort (render_splats knob): the backward's conic/color
        # cotangents ride the grad re-sort as bf16 pairs (10 -> 7 pool-
        # scale payload rows). ON by default since round 5: quality-gated
        # by a 9k-iter run (0.05 dB parity, docs/RESULTS.md round-5
        # appendix), -6 ms/step measured at the 1M bench point.
        self.pack_grad_sort = pack_grad_sort
        # Adaptive intersection-pool size: sorting the pool dominates step
        # time if it is oversized, so start modest and grow on pressure
        # (checked at refine boundaries, where a host sync happens anyway).
        self._isect_pool = None
        self._ssim = Ssim(self.config.ssim_window_size, 3)
        self._key = jax.random.PRNGKey(self.config.seed)
        self.last_refine_stats = None
        self._prev_stats: StepStats | None = None
        self.total_dropped_records = 0
        # Device-resident ground-truth cache, keyed by the view's host
        # array identity. Re-uploading the gt image every step both wastes
        # host->device bandwidth and — through the axon tunnel — leaks the
        # host transfer buffer (~13 MB/step at 800^2; a 30k-step run was
        # host-OOM-killed at 130 GB RSS before this cache existed).
        # LRU-evicted on a byte budget (not an entry count): 1024 cached
        # 1920x1080 f32 views would be ~24 GB of HBM — more than a v5e chip.
        self._gt_cache: dict[int, tuple] = {}
        self._gt_cache_bytes = 0
        self.gt_cache_byte_budget = 2 << 30
        # Per-instance jitted-fn cache. NOT functools.lru_cache on the
        # methods: that keys a CLASS-level cache on (self, args) and pins
        # dead trainers — with their device gt caches and compiled
        # executables — until 16 newer entries evict them (the viewer
        # builds a fresh trainer per loaded scene).
        self._fn_cache: dict = {}

    # ------------------------------------------------------------------ #

    def init_state(self, splats: Splats) -> TrainState:
        cap = splats.capacity
        return TrainState(
            splats=splats,
            opt=init_adam(splats.params()),
            grad_2d_accum=jnp.zeros((cap,), jnp.float32),
            xy_grad_counts=jnp.zeros((cap,), jnp.int32),
        )

    def step(self, state: TrainState, batch: SceneBatch) -> tuple[TrainState, StepStats]:
        cfg = self.config
        img = np.asarray(batch.gt_image, np.float32)
        h, w, channels = img.shape
        img_size = (w, h)

        lr_mean = cfg.lr_mean_at(self.iter)
        if cfg.scale_mean_lr_by_extent:
            lr_mean *= batch.scene_extent

        # Mid-window overflow response (one step delayed so the read never
        # stalls the dispatch pipeline — the previous step's stats are
        # already materialized): ANY dropped record doubles the pool right
        # away instead of waiting for the next refine boundary.
        if self._prev_stats is not None:
            dropped = int(self._prev_stats.num_dropped)
            if dropped > 0:
                self.total_dropped_records += dropped
                pool_now = self._pool_size(state.splats.capacity)
                self._isect_pool = pool_now * 2
                _log.warning(
                    "intersection pool overflowed: %d records dropped at "
                    "iter %d; growing pool %d -> %d",
                    dropped, self.iter - 1, pool_now, self._isect_pool,
                )

        cam = camera_params(batch.camera, img_size)
        pool = self._pool_size(state.splats.capacity)
        step_fn = self._get_step_fn(state.splats.capacity, img_size, channels,
                                    state.splats.sh_count, pool)

        key = id(batch.gt_image)
        cached = self._gt_cache.get(key)
        if cached is None:
            entry_bytes = img.nbytes
            while (self._gt_cache
                   and self._gt_cache_bytes + entry_bytes
                   > self.gt_cache_byte_budget):
                # Evict least-recently-used (dict preserves insertion order;
                # hits re-insert below, so the front is the LRU entry).
                old = self._gt_cache.pop(next(iter(self._gt_cache)))
                self._gt_cache_bytes -= old[2]
            cached = (batch.gt_image, jax.device_put(img),   # keep the host
                      entry_bytes)                           # ref so the id
            self._gt_cache[key] = cached                     # stays valid
            self._gt_cache_bytes += entry_bytes
        else:
            self._gt_cache.pop(key)          # refresh LRU position
            self._gt_cache[key] = cached
        gt_dev = cached[1]

        pre_splats = state.splats
        state, stats = step_fn(
            state, gt_dev, cam, jnp.float32(lr_mean),
            jnp.int32(self.iter),
        )

        do_refine = (
            self.iter < cfg.max_refine_step
            and self.iter >= cfg.warmup_steps
            # The 1 % trick keeps the reference cadence (iter % every == 1)
            # while making refine_every=1 mean "every step" instead of
            # silently never (iter % 1 == 1 is unsatisfiable).
            and self.iter % cfg.refine_every == 1 % cfg.refine_every
        )
        self.last_refine_stats = None
        if do_refine:
            # Host sync point: also check intersection-pool pressure and
            # grow it (with a recompile) before records start dropping.
            if int(stats.num_isects) > 0.85 * pool:
                self._isect_pool = pool * 2
            state, self.last_refine_stats = self._refine(state, pre_splats)

        self.iter += 1
        self._prev_stats = stats
        return state, stats

    # ------------------------------------------------------------------ #

    def _pool_size(self, capacity: int) -> int:
        if self._isect_pool is None:
            self._isect_pool = min(max(capacity * 16, 1 << 16), 1 << 22)
        return self._isect_pool

    def _get_step_fn(self, *key):
        fn = self._fn_cache.get(("step", key))
        if fn is None:
            fn = self._fn_cache[("step", key)] = self._build_step_fn(*key)
        return fn

    def _get_refine_fn(self, *key):
        fn = self._fn_cache.get(("refine", key))
        if fn is None:
            fn = self._fn_cache[("refine", key)] = self._build_refine_fn(*key)
        return fn

    def _build_step_fn(self, capacity: int, img_size: tuple, channels: int,
                       sh_count: int, max_isects: int):
        cfg = self.config
        w, h = img_size
        ssim = self._ssim
        block = self.raster_block_size

        def loss_fn(params, xy_dummy, gt, cam, active):
            img, aux = render_splats(
                params["means"], params["log_scales"], params["quats"],
                params["sh_coeffs"], params["raw_opacity"],
                cam, img_size, xy_dummy=xy_dummy, active=active,
                block_size=block, max_isects=max_isects,
                cell=self.raster_cell, pack_grad_sort=self.pack_grad_sort,
            )
            pred = img if channels == 4 else img[..., :3]
            l1 = jnp.mean(jnp.abs(pred - gt))
            if cfg.ssim_weight > 0.0:
                ssim_val = ssim.ssim(img[None, ..., :3], gt[None, ..., :3])
                loss = l1 * (1.0 - cfg.ssim_weight) - ssim_val * cfg.ssim_weight
            else:
                loss = l1
            return loss, aux

        def step_fn(state: TrainState, gt, cam: CameraParams, lr_mean, step):
            splats = state.splats
            params = splats.params()
            active = splats.active_mask()
            xy_dummy = jnp.zeros((capacity, 2), jnp.float32)

            (loss, aux), (pgrads, xy_grads) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(params, xy_dummy, gt, cam, active)

            # Densification statistics (train.rs:284-316): screen-space
            # gradient norms scaled to half-image units, gated past warmup.
            gate = (step > cfg.warmup_steps).astype(jnp.float32)
            xys_scaled = xy_grads * jnp.asarray([w / 2.0, h / 2.0], jnp.float32)
            norms = jnp.sqrt(jnp.sum(xys_scaled**2, axis=1))
            # "Seen" = emitted at least one intersection record this frame
            # (the reference counts its compacted visible set the same way,
            # train.rs:300-310) — a direct mask, no scatter needed.
            counts_inc = aux.producing.astype(jnp.int32)
            grad_accum = state.grad_2d_accum + gate * norms
            counts = state.xy_grad_counts + (gate.astype(jnp.int32) * counts_inc)

            # Per-group LRs; SH orders > 0 at lr/20 (train.rs:334-348).
            sh_scale = jnp.concatenate(
                [jnp.ones((1,)), jnp.full((sh_count - 1,), 1.0 / cfg.lr_coeffs_sh_scale)]
            ).reshape(1, sh_count, 1) if sh_count > 1 else jnp.ones((1, 1, 1))
            lrs = {
                "means": lr_mean,
                "raw_opacity": cfg.lr_opac,
                "sh_coeffs": cfg.lr_coeffs_dc * sh_scale,
                "quats": cfg.lr_rotation,
                "log_scales": cfg.lr_scale,
            }
            new_params, opt = adam_step(
                params, pgrads, state.opt, lrs, eps=cfg.adam_eps
            )
            new_state = TrainState(
                splats=splats.with_params(new_params),
                opt=opt,
                grad_2d_accum=grad_accum,
                xy_grad_counts=counts,
            )
            return new_state, StepStats(
                loss=loss, num_visible=aux.num_visible,
                num_isects=aux.num_isects, num_dropped=aux.num_dropped,
                max_strip_isects=aux.num_isects,  # one device = one strip
            )

        return jax.jit(step_fn)

    # ------------------------------------------------------------------ #

    def _refine(self, state: TrainState, pre_splats: Splats):
        cfg = self.config
        cap = state.splats.capacity
        # Pre-grow when clones+splits could exceed capacity: the refine's
        # compaction silently truncates appended rows past `capacity`
        # (while still counting them in the stats), and the post-refine
        # growth below only helps the NEXT refine. Only the very first
        # refine after a large init can hit this (afterwards the
        # cap >= 2*n_live invariant holds).
        n_before = int(np.asarray(state.splats.n_live))
        if 2 * n_before > cap:
            state = self._grow(state, 2 * n_before)
            cap = state.splats.capacity
            pre_splats = self._grow_splats(pre_splats, cap)
        self._key, sub = jax.random.split(self._key)
        refine_idx = self.iter // cfg.refine_every
        # refine_idx > 0: with warmup <= 1 the first refine would land on
        # refine_idx 0 and clobber every opacity at the start of training.
        do_reset = (refine_idx % cfg.reset_alpha_every_refine) == 0 \
            and refine_idx > 0

        refine_fn = self._get_refine_fn(cap, state.splats.sh_count, bool(do_reset))
        state, stats = refine_fn(state, pre_splats, sub)

        n_live = int(stats.n_live)
        # Grow capacity when refinement could overflow next time.
        if 2 * n_live > cap:
            state = self._grow(state, max(2 * n_live, cap * 2))
        elif (cfg.shrink_capacity_on_refine
              and cap > cfg.shrink_factor * max(n_live, 1)):
            # Compaction puts live rows first, so shrinking is a slice.
            state = self._shrink(state, 2 * n_live)
        return state, stats

    def _shrink(self, state: TrainState, new_cap: int) -> TrainState:
        from brush_tpu.splats import round_up_capacity

        new_cap = round_up_capacity(new_cap)
        if new_cap >= state.splats.capacity:
            return state

        def cut(x):
            return x[:new_cap]

        sp = state.splats
        splats = Splats(
            means=cut(sp.means), sh_coeffs=cut(sp.sh_coeffs),
            quats=cut(sp.quats), raw_opacity=cut(sp.raw_opacity),
            log_scales=cut(sp.log_scales), n_live=sp.n_live,
        )
        opt = AdamState(
            m={k: cut(v) for k, v in state.opt.m.items()},
            v={k: cut(v) for k, v in state.opt.v.items()},
            count=state.opt.count,
        )
        return TrainState(
            splats=splats, opt=opt,
            grad_2d_accum=cut(state.grad_2d_accum),
            xy_grad_counts=cut(state.xy_grad_counts),
        )

    def _grow_splats(self, sp: Splats, new_cap: int) -> Splats:
        """Pad a bare Splats to new_cap (same fills as _grow)."""
        pad = new_cap - sp.capacity
        if pad <= 0:
            return sp

        def pad_arr(x, fill=0.0):
            pads = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, pads, constant_values=fill)

        return Splats(
            means=pad_arr(sp.means),
            sh_coeffs=pad_arr(sp.sh_coeffs),
            quats=pad_arr(sp.quats).at[sp.capacity:, 0].set(1.0),
            raw_opacity=pad_arr(sp.raw_opacity, PADDING_RAW_OPACITY),
            log_scales=pad_arr(sp.log_scales, -10.0),
            n_live=sp.n_live,
        )

    def _grow(self, state: TrainState, new_cap: int) -> TrainState:
        from brush_tpu.splats import round_up_capacity

        new_cap = round_up_capacity(new_cap)
        cap = state.splats.capacity
        pad = new_cap - cap
        if pad <= 0:
            return state

        def pad_arr(x, fill=0.0):
            pads = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, pads, constant_values=fill)

        sp = state.splats
        splats = Splats(
            means=pad_arr(sp.means),
            sh_coeffs=pad_arr(sp.sh_coeffs),
            quats=pad_arr(sp.quats).at[cap:, 0].set(1.0),
            raw_opacity=pad_arr(sp.raw_opacity, PADDING_RAW_OPACITY),
            log_scales=pad_arr(sp.log_scales, -10.0),
            n_live=sp.n_live,
        )
        opt = AdamState(
            m={k: pad_arr(v) for k, v in state.opt.m.items()},
            v={k: pad_arr(v) for k, v in state.opt.v.items()},
            count=state.opt.count,
        )
        return TrainState(
            splats=splats,
            opt=opt,
            grad_2d_accum=pad_arr(state.grad_2d_accum),
            xy_grad_counts=pad_arr(state.xy_grad_counts).astype(jnp.int32),
        )

    def _build_refine_fn(self, capacity: int, sh_count: int, do_reset: bool):
        return jax.jit(make_refine_fn(self.config, capacity, do_reset))


def make_refine_fn(cfg: TrainConfig, capacity: int, do_reset: bool):
    """The refine computation as a pure function (unjitted).

    Shared by the single-device trainer (jitted as-is) and the sharded
    trainer (jitted with row-sharded in/out shardings: every operation here
    is elementwise over rows except the stable-compaction argsort and row
    gathers, which GSPMD executes with a transient all-gather — acceptable
    at a refine-every-100-steps cadence; see parallel/trainer.py).
    """

    def refine_fn(state: TrainState, pre: Splats, key):
        post = state.splats
        alive = post.active_mask()

        counts = jnp.maximum(state.xy_grad_counts, 1).astype(jnp.float32)
        grads_avg = state.grad_2d_accum / counts
        big = grads_avg >= cfg.densify_grad_thresh

        scales_post = post.scales()
        max_scale = jnp.max(scales_post, axis=1)
        small = max_scale < cfg.densify_size_thresh

        clone_mask = small & big & alive
        split_mask = (~small) & big & alive
        append_mask = clone_mask | split_mask

        # Split offset samples (train.rs:494-516): Normal(0, 0.5) in the
        # splat frame scaled by the post-step scale, rotated by the
        # post-step quaternion.
        noise = 0.5 * jax.random.normal(key, (capacity, 3)) * scales_post
        offset = quat_rotate(post.quats, noise)
        split_log_scales = jnp.log(jnp.maximum(scales_post / 1.6, 1e-30))

        cm = clone_mask[:, None]
        app_means = jnp.where(cm, pre.means, pre.means + offset)
        app_quats = jnp.where(cm, pre.quats, post.quats)
        app_sh = jnp.where(clone_mask[:, None, None], pre.sh_coeffs, post.sh_coeffs)
        app_opac = jnp.where(clone_mask, pre.raw_opacity, post.raw_opacity)
        app_logs = jnp.where(cm, pre.log_scales, split_log_scales)

        if cfg.faithful_split_bug:
            # The reference's in-place split modifications target clones
            # that are then discarded (train.rs:482-520) — originals
            # keep their post-step mean and scale.
            orig_means = post.means
            orig_logs = post.log_scales
        else:
            sm = split_mask[:, None]
            noise2 = 0.5 * jax.random.normal(
                jax.random.fold_in(key, 1), (capacity, 3)
            ) * scales_post
            offset2 = quat_rotate(post.quats, noise2)
            orig_means = jnp.where(sm, pre.means - offset2, post.means)
            orig_logs = jnp.where(sm, split_log_scales, post.log_scales)

        # Combined candidate set: C originals then C append slots.
        comb = {
            "means": jnp.concatenate([orig_means, app_means]),
            "quats": jnp.concatenate([post.quats, app_quats]),
            "sh_coeffs": jnp.concatenate([post.sh_coeffs, app_sh]),
            "raw_opacity": jnp.concatenate([post.raw_opacity, app_opac]),
            "log_scales": jnp.concatenate([orig_logs, app_logs]),
        }
        valid = jnp.concatenate([alive, append_mask])

        # Prune (train.rs:543-557) on the combined set.
        opac_all = jax.nn.sigmoid(comb["raw_opacity"])
        scale_all = jnp.max(jnp.exp(comb["log_scales"]), axis=1)
        prune_alpha = opac_all < cfg.cull_alpha_thresh
        prune_scale = scale_all > cfg.cull_scale_thresh
        keep = valid & ~prune_alpha & ~prune_scale

        # Stable compaction: kept rows first, original order preserved.
        perm = jnp.argsort(~keep, stable=True)[:capacity]
        n_live = jnp.sum(keep).astype(jnp.int32)
        n_live = jnp.minimum(n_live, capacity)
        row_live = jnp.arange(capacity) < n_live

        def take(x, fill=0.0):
            out = x[perm]
            shape = (-1,) + (1,) * (out.ndim - 1)
            return jnp.where(row_live.reshape(shape), out, fill)

        new_opac = take(comb["raw_opacity"], PADDING_RAW_OPACITY)
        if do_reset:
            # Opacity reset (train.rs:205-209,559-562).
            new_opac = jnp.where(
                row_live,
                inverse_sigmoid(cfg.reset_alpha_value),
                new_opac,
            )

        new_quats = take(comb["quats"])
        new_quats = new_quats.at[:, 0].set(
            jnp.where(row_live, new_quats[:, 0], 1.0)
        )
        splats = Splats(
            means=take(comb["means"]),
            sh_coeffs=take(comb["sh_coeffs"]),
            quats=new_quats,
            raw_opacity=new_opac,
            log_scales=take(comb["log_scales"], -10.0),
            n_live=n_live,
        )

        # Optimizer state surgery: appended rows (perm >= C) start with
        # zero moments; survivors keep theirs.
        if cfg.keep_opt_state_on_refine:
            is_new = (perm >= capacity) | ~row_live

            def fix(x):
                padded = jnp.concatenate([x, jnp.zeros_like(x)])[perm]
                shape = (-1,) + (1,) * (x.ndim - 1)
                return jnp.where(is_new.reshape(shape), 0.0, padded)

            opt = AdamState(
                m={k: fix(v) for k, v in state.opt.m.items()},
                v={k: fix(v) for k, v in state.opt.v.items()},
                count=state.opt.count,
            )
        else:
            opt = init_adam(splats.params())

        stats = RefineStats(
            num_cloned=jnp.sum(clone_mask),
            num_split=jnp.sum(split_mask),
            num_pruned_alpha=jnp.sum(valid & prune_alpha),
            num_pruned_scale=jnp.sum(valid & ~prune_alpha & prune_scale),
            n_live=n_live,
        )
        new_state = TrainState(
            splats=splats,
            opt=opt,
            grad_2d_accum=jnp.zeros((capacity,), jnp.float32),
            xy_grad_counts=jnp.zeros((capacity,), jnp.int32),
        )
        return new_state, stats

    return refine_fn

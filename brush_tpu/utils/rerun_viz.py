"""Rerun visual-debugging streams (reference: brush-viewer/src/panels/rerun.rs).

Parity targets, each an optional stream behind the rerun SDK (not baked into
this image — everything degrades to a no-op when the import fails):

- splat ellipsoid cloud with SH-DC colors and opacity (rerun.rs:54-121)
- dataset cameras as pinhole frusta + their images (rerun.rs:123-161)
- eval renders + per-view PSNR (rerun.rs:163-196)
- per-tile depth / intersection-count heatmaps (rerun.rs:198-229)

Scalars (losses, LRs, counts) go through MetricsLogger; this module carries
the visual streams. Tests inject a stub `rerun` module to capture calls.
"""

from __future__ import annotations

import sys

import numpy as np

from brush_tpu.constants import SH_C0, TILE_WIDTH


def _try_import_rerun():
    try:
        import rerun  # noqa: F401 — optional, injected as a stub in tests

        return sys.modules["rerun"]
    except Exception:
        return None


class RerunVisualizer:
    """Streams splats / cameras / renders / heatmaps to rerun when available.

    Every method is safe to call unconditionally; with no SDK this is a
    no-op shell (mirrors VisualizeTools' optional recording stream).
    """

    def __init__(self, app_id: str = "brush_tpu"):
        self.rr = _try_import_rerun()
        if self.rr is not None:
            try:
                self.rr.init(app_id, spawn=False)
            except Exception:
                self.rr = None

    @property
    def active(self) -> bool:
        return self.rr is not None

    def _time(self, step: int) -> None:
        try:
            self.rr.set_time_sequence("step", step)
        except Exception:
            pass

    # ---- splat cloud (rerun.rs:54-121) ---- #

    def log_splats(self, step: int, splats, max_points: int = 200_000) -> None:
        if not self.active:
            return
        self._time(step)
        n = int(splats.n_live)
        means = np.asarray(splats.means)[:n]
        if n > max_points:
            sel = np.linspace(0, n - 1, max_points).astype(np.int64)
            means = means[sel]
        else:
            sel = slice(None)
        # SH DC -> rgb (the reference logs base color), sigmoid opacity as A.
        dc = np.asarray(splats.sh_coeffs)[:n][sel, 0, :]
        rgb = np.clip(dc * SH_C0 + 0.5, 0.0, 1.0)
        opac = 1.0 / (1.0 + np.exp(-np.asarray(splats.raw_opacity)[:n][sel]))
        colors = np.concatenate([rgb, opac[:, None]], axis=1)
        radii = np.exp(np.asarray(splats.log_scales)[:n][sel]).mean(axis=1)
        self.rr.log(
            "world/splats",
            self.rr.Points3D(means, colors=colors, radii=radii),
        )

    # ---- dataset cameras (rerun.rs:123-161) ---- #

    def log_dataset(self, scene, max_views: int = 32) -> None:
        if not self.active:
            return
        from brush_tpu.camera import quat_to_rotmat

        for i, view in enumerate(scene.views[:max_views]):
            cam = view.camera
            h, w = view.image.shape[:2]
            base = f"world/dataset/{i}"
            self.rr.log(
                base,
                self.rr.Transform3D(
                    translation=np.asarray(cam.position, np.float32),
                    mat3x3=quat_to_rotmat(np.asarray(cam.rotation)),
                ),
            )
            self.rr.log(
                f"{base}/image",
                self.rr.Pinhole(
                    focal_length=float(w / (2.0 * np.tan(cam.fov_x / 2.0))),
                    width=w, height=h,
                ),
            )
            self.rr.log(
                f"{base}/image",
                self.rr.Image((view.image[..., :3] * 255).astype(np.uint8)),
            )

    # ---- eval renders (rerun.rs:163-196) ---- #

    def log_eval(self, step: int, idx: int, rendered, gt, psnr: float) -> None:
        if not self.active:
            return
        self._time(step)
        base = f"eval/view_{idx}"
        self.rr.log(f"{base}/render",
                    self.rr.Image((np.clip(np.asarray(rendered)[..., :3], 0, 1)
                                   * 255).astype(np.uint8)))
        self.rr.log(f"{base}/gt",
                    self.rr.Image((np.clip(np.asarray(gt)[..., :3], 0, 1)
                                   * 255).astype(np.uint8)))
        try:
            self.rr.log(f"{base}/psnr", self.rr.Scalar(float(psnr)))
        except Exception:
            pass

    # ---- tile heatmaps (rerun.rs:198-229) ---- #

    def log_tile_heatmaps(self, step: int, splats, camera, img_size,
                          max_isects: int = 1 << 20) -> None:
        """Per-tile intersection counts and mean depth as images.

        Recomputed through the XLA binning path at debug cadence (the
        reference reads tile_bins / final_index back from its RenderAux).
        """
        if not self.active:
            return
        import jax
        import jax.numpy as jnp

        from brush_tpu.ops.binning import build_intersections
        from brush_tpu.ops.projection import project_splats
        from brush_tpu.ops.rasterize_reference import camera_params

        self._time(step)
        cp = camera_params(camera, img_size)
        proj = project_splats(
            splats.means, splats.log_scales,
            splats.quats / jnp.linalg.norm(
                splats.quats, axis=-1, keepdims=True
            ).clip(1e-12),
            cp.viewmat, cp.focal, cp.pixel_center, img_size,
            active=splats.active_mask(),
        )
        tiles_x = -(-int(img_size[0]) // TILE_WIDTH)
        tiles_y = -(-int(img_size[1]) // TILE_WIDTH)
        opac = jax.nn.sigmoid(splats.raw_opacity)
        isect = build_intersections(proj, opac, (tiles_x, tiles_y), max_isects)
        counts = (np.asarray(isect.ends) - np.asarray(isect.starts)).reshape(
            tiles_y, tiles_x
        )
        # Mean depth of intersecting splats per tile via a tiny segment sum.
        order = np.asarray(isect.order)
        gid = np.asarray(isect.isect_gid)
        depth_c = np.asarray(proj.depth)[order]
        starts = np.asarray(isect.starts)
        ends = np.asarray(isect.ends)
        depth_tiles = np.zeros(tiles_x * tiles_y, np.float32)
        num = int(isect.num_isects)
        cum = np.concatenate([[0.0], np.cumsum(
            depth_c[np.clip(gid[:num], 0, len(depth_c) - 1)]
        )])
        s = np.clip(starts, 0, num)
        e = np.clip(ends, 0, num)
        with np.errstate(invalid="ignore"):
            depth_tiles = np.where(
                e > s, (cum[e] - cum[s]) / np.maximum(e - s, 1), 0.0
            ).reshape(tiles_y, tiles_x)
        self.rr.log("debug/tile_isect_counts",
                    self.rr.DepthImage(counts.astype(np.float32)))
        self.rr.log("debug/tile_mean_depth",
                    self.rr.DepthImage(depth_tiles.astype(np.float32)))

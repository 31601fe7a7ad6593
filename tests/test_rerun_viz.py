"""Rerun visual-stream smoke test with a stub SDK module.

The rerun SDK is optional (not in this image); the reference's equivalent
streams (panels/rerun.rs:54-229) are exercised here against a recording
stub injected into sys.modules: splat cloud, dataset cameras, eval renders,
tile heatmaps.
"""

import sys
import types

import numpy as np
import pytest

from brush_tpu.camera import Camera
from brush_tpu.datasets.scene import Scene, SceneView
from brush_tpu.splats import from_random


class _Recorder:
    def __init__(self):
        self.calls = []

    def _entity(self, kind):
        def make(*a, **k):
            return (kind, a, k)
        return make

    def __getattr__(self, name):
        if name in ("Points3D", "Image", "DepthImage", "Pinhole",
                    "Transform3D", "Scalar"):
            return self._entity(name)
        if name in ("init", "set_time_sequence"):
            return lambda *a, **k: None
        if name == "log":
            return lambda path, entity, **k: self.calls.append(
                (path, entity[0])
            )
        raise AttributeError(name)


@pytest.fixture
def stub_rerun(monkeypatch):
    rec = _Recorder()
    mod = types.ModuleType("rerun")
    mod.__getattr__ = rec.__getattr__
    monkeypatch.setitem(sys.modules, "rerun", mod)
    yield rec


def test_streams_reach_the_sink(stub_rerun):
    from brush_tpu.utils.rerun_viz import RerunVisualizer

    viz = RerunVisualizer()
    assert viz.active

    rng = np.random.default_rng(0)
    splats = from_random(rng, [-1, -1, -1], [1, 1, 1], count=32, sh_degree=1)
    viz.log_splats(5, splats)

    cam = Camera(position=[0, 0, -5.0], rotation=[1, 0, 0, 0],
                 fov_x=1.0, fov_y=1.0)
    img = rng.uniform(0, 1, (32, 48, 3)).astype(np.float32)
    scene = Scene(views=[SceneView(camera=cam, image=img, name="v0")])
    viz.log_dataset(scene)

    viz.log_eval(5, 0, img, img, psnr=31.4)
    viz.log_tile_heatmaps(5, splats, cam, (48, 32), max_isects=4096)

    kinds = {k for _, k in stub_rerun.calls}
    paths = {p for p, _ in stub_rerun.calls}
    assert "Points3D" in kinds                      # splat cloud
    assert "Pinhole" in kinds                       # dataset cameras
    assert any(p.startswith("eval/") for p in paths)
    assert "debug/tile_isect_counts" in paths       # heatmaps
    assert "debug/tile_mean_depth" in paths


def test_inactive_without_sdk(monkeypatch):
    monkeypatch.setitem(sys.modules, "rerun", None)

    from brush_tpu.utils.rerun_viz import RerunVisualizer

    viz = RerunVisualizer()
    assert not viz.active
    # Every stream is a safe no-op.
    rng = np.random.default_rng(0)
    splats = from_random(rng, [-1, -1, -1], [1, 1, 1], count=8, sh_degree=0)
    viz.log_splats(0, splats)
    viz.log_eval(0, 0, np.zeros((8, 8, 3)), np.zeros((8, 8, 3)), 0.0)

"""Viewer server endpoints (reference: brush-viewer's panels + train_loop
message protocol), driven over real HTTP against a live training thread."""

import io
import json
import time
import threading
import urllib.request

import numpy as np
import pytest

from brush_tpu.camera import Camera
from brush_tpu.config import TrainConfig
from brush_tpu.datasets.scene import Dataset, Scene, SceneView
from brush_tpu.splats import from_random
from brush_tpu.viewer.server import RenderService, TrainWorker, ViewerServer

PORT = 8931


def _tiny_dataset(n_views=3, size=32):
    rng = np.random.default_rng(0)
    views = []
    for i in range(n_views):
        theta = 2 * np.pi * i / n_views
        cam = Camera(
            position=[4 * np.sin(theta), 0.0, -4 * np.cos(theta)],
            rotation=[np.cos(theta / 2), 0, -np.sin(theta / 2), 0],
            fov_x=0.8, fov_y=0.8,
        )
        img = rng.uniform(0, 1, size=(size, size, 3)).astype(np.float32)
        views.append(SceneView(name=f"v{i}", camera=cam, image=img))
    return Dataset(train=Scene(views=views), eval=None)


@pytest.fixture(scope="module")
def server():
    ds = _tiny_dataset()
    rng = np.random.default_rng(1)
    splats = from_random(rng, [-1, -1, -1], [1, 1, 1], count=64, sh_degree=0)
    render = RenderService(block_size=16)
    worker = TrainWorker(ds, splats, TrainConfig(warmup_steps=0), render,
                         block_size=16, export_path="/tmp/viewer_test.ply")
    worker.start()
    srv = ViewerServer(render, dataset=ds, worker=worker, port=PORT)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    for _ in range(100):
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{PORT}/api/state",
                                   timeout=1)
            break
        except Exception:
            time.sleep(0.1)
    yield srv
    worker.stop()
    srv.shutdown()


def _get(path):
    return urllib.request.urlopen(f"http://127.0.0.1:{PORT}{path}",
                                  timeout=180).read()


def _post(path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}{path}", data=json.dumps(obj).encode(),
        method="POST")
    return urllib.request.urlopen(req, timeout=180).read()


def test_page_and_state(server):
    assert b"brush_tpu viewer" in _get("/")
    st = json.loads(_get("/api/state"))
    assert st["training"] and st["num_views"] == 3
    # training advances (generous deadline: compiles contend with other
    # test processes for CPU when the suite runs in parallel)
    for _ in range(900):
        if json.loads(_get("/api/state")).get("iter", 0) > 2:
            break
        time.sleep(0.1)
    assert json.loads(_get("/api/state"))["iter"] > 2


def test_frame_and_views(server):
    png = _get("/api/frame?px=0&py=0&pz=-4&qw=1&qx=0&qy=0&qz=0"
               "&fovx=0.8&fovy=0.8&w=64&h=48")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    from PIL import Image

    img = Image.open(io.BytesIO(png))
    assert img.size == (64, 48)
    views = json.loads(_get("/api/views"))
    assert views["views"] == ["v0", "v1", "v2"]
    cam = json.loads(_get("/api/view_cam?i=1"))
    assert len(cam["position"]) == 3 and len(cam["rotation"]) == 4
    thumb = _get("/api/view_image?i=0")
    assert thumb[:8] == b"\x89PNG\r\n\x1a\n"


def test_eval_history_and_presets(server):
    _post("/api/control", {"cmd": "eval"})
    hist = []
    for _ in range(300):
        hist = json.loads(_get("/api/state")).get("eval_history", [])
        if hist:
            break
        time.sleep(0.1)
    assert hist and len(hist[0]) == 3  # [iter, psnr, ssim] rows for the plots
    assert np.isfinite(hist[0][1]) and 0.0 <= hist[0][2] <= 1.0

    presets = json.loads(_get("/api/presets"))
    assert isinstance(presets["presets"], list)


def test_load_new_dataset(server):
    created = {}

    def factory(path):
        ds = _tiny_dataset(n_views=5)
        rng = np.random.default_rng(2)
        splats = from_random(rng, [-1, -1, -1], [1, 1, 1], count=32,
                             sh_degree=0)
        worker = TrainWorker(ds, splats, TrainConfig(warmup_steps=0),
                             server.render, block_size=16)
        created["path"] = path
        return ds, worker

    server.session_factory = factory
    _post("/api/load", {"path": "fake://five-views"})
    assert created["path"] == "fake://five-views"
    st = json.loads(_get("/api/state"))
    assert st["num_views"] == 5
    for _ in range(200):
        if json.loads(_get("/api/state")).get("iter", 0) > 1:
            break
        time.sleep(0.1)
    assert json.loads(_get("/api/state"))["iter"] > 1


def test_controls(server):
    _post("/api/control", {"cmd": "pause"})
    for _ in range(300):
        if json.loads(_get("/api/state")).get("paused"):
            break
        time.sleep(0.1)
    assert json.loads(_get("/api/state"))["paused"]

    _post("/api/control", {"cmd": "export", "path": "/tmp/viewer_test.ply"})
    _post("/api/control", {"cmd": "resume"})
    for _ in range(100):
        st = json.loads(_get("/api/state"))
        if st.get("exported") and not st.get("paused"):
            break
        time.sleep(0.1)
    assert not json.loads(_get("/api/state"))["paused"]
    with open("/tmp/viewer_test.ply", "rb") as f:
        assert f.read(3) == b"ply"

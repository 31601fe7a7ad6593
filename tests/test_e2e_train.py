"""End-to-end: synthetic multi-view dataset -> CLI training -> PSNR gate.

Ground truth images are rendered from a known splat set with our own
renderer; training must recover a model that reproduces held-out views.
Exercises the whole stack: zip dataset loading, point-cloud init, training
with refinement, eval, PLY export, checkpoint resume — through the CLI.
"""

import io
import json
import zipfile

import numpy as np
import pytest

from brush_tpu.camera import Camera, quat_to_rotmat
from brush_tpu.ops.rasterize_reference import camera_params, render_oracle
from brush_tpu.splats import from_random, inverse_sigmoid

ROT_X_90 = np.array([[1.0, 0, 0], [0, 0, -1.0], [0, 1.0, 0]])


def orbit_camera(theta, dist=6.0, fov=1.0):
    """Camera on a circle in the x-z plane, looking at the origin."""
    pos = np.array([dist * np.sin(theta), 0.0, -dist * np.cos(theta)])
    # Forward (+z in camera frame) must point at the origin.
    fwd = -pos / np.linalg.norm(pos)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    rot = np.stack([right, up2, fwd], axis=1)  # columns = camera axes
    from brush_tpu.camera import rotmat_to_quat

    return Camera(position=pos, rotation=rotmat_to_quat(rot), fov_x=fov, fov_y=fov)


def camera_to_nerf_transform(cam: Camera) -> np.ndarray:
    """Invert the loader's basis change (datasets/nerf.py) for fixture data."""
    rot = quat_to_rotmat(cam.rotation)
    m = np.eye(4)
    m[:3, :3] = ROT_X_90.T @ rot
    m[:3, 3] = ROT_X_90.T @ cam.position
    m[:, 1] *= -1.0
    m[:, 2] *= -1.0
    return m


def make_gt_scene(seed=0, n=30):
    rng = np.random.default_rng(seed)
    splats = from_random(rng, [-1.5, -1.5, -1.5], [1.5, 1.5, 1.5], count=n,
                         sh_degree=0)
    splats = splats.replace(
        raw_opacity=splats.raw_opacity.at[:n].set(inverse_sigmoid(0.85)),
        log_scales=splats.log_scales.at[:n].set(np.log(0.35)),
    )
    return splats


def render_gt(splats, cam, size):
    cp = camera_params(cam, (size, size))
    img = render_oracle(
        splats.means, splats.log_scales, splats.quats, splats.sh_coeffs,
        splats.raw_opacity, cp, (size, size), active=splats.active_mask(),
    )
    return np.asarray(img)


def build_dataset_zip(path, size=48, n_views=10, fov=1.0):
    from PIL import Image

    gt = make_gt_scene()
    frames = []
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for i in range(n_views):
            theta = 2 * np.pi * i / n_views
            cam = orbit_camera(theta, fov=fov)
            img = render_gt(gt, cam, size)
            png = io.BytesIO()
            Image.fromarray(
                np.clip(img * 255, 0, 255).astype(np.uint8), "RGBA"
            ).save(png, format="PNG")
            zf.writestr(f"train/r_{i}.png", png.getvalue())
            frames.append(
                {
                    "file_path": f"./train/r_{i}",
                    "transform_matrix": camera_to_nerf_transform(cam).tolist(),
                }
            )
        zf.writestr(
            "transforms_train.json",
            json.dumps({"camera_angle_x": fov, "frames": frames}),
        )
    with open(path, "wb") as f:
        f.write(buf.getvalue())
    return gt


def test_dataset_roundtrip_renders_match(tmp_path):
    """Loaded cameras must reproduce the GT renders exactly — validates the
    NeRF pose conversion end to end."""
    from brush_tpu.datasets import load_dataset
    from brush_tpu.datasets.loading import LoadDatasetArgs

    zip_path = tmp_path / "scene.zip"
    gt = build_dataset_zip(zip_path, size=32, n_views=4)
    ds = load_dataset(str(zip_path), LoadDatasetArgs())
    for view in ds.train.views:
        rerendered = render_gt(gt, view.camera, 32)
        # PNG quantization allows ~1/255 differences.
        np.testing.assert_allclose(rerendered, view.image, atol=0.01)


@pytest.mark.slow
def test_cli_train_eval_render_resume(tmp_path):
    from brush_tpu import cli

    zip_path = str(tmp_path / "scene.zip")
    ckpt_dir = str(tmp_path / "ckpts")
    ply_path = str(tmp_path / "model.ply")
    build_dataset_zip(zip_path, size=48, n_views=10)

    cli.main([
        "train", "--source", zip_path, "--iters", "400",
        "--sh-degree", "0", "--init-count", "120",
        "--eval-split-every", "5", "--block-size", "16",
        "--checkpoint-dir", ckpt_dir, "--checkpoint-every", "300",
        "--export", ply_path, "--log-every", "100",
    ])

    # Eval the exported PLY on the eval split.
    import contextlib
    import io as sio

    out = sio.StringIO()
    with contextlib.redirect_stdout(out):
        cli.main([
            "eval", "--source", zip_path, "--eval-split-every", "5",
            "--ply", ply_path, "--block-size", "16",
        ])
    text = out.getvalue()
    mean_line = [l for l in text.splitlines() if l.startswith("mean:")][0]
    psnr = float(mean_line.split("PSNR")[1].split()[0])
    assert psnr > 16.0, f"e2e PSNR too low: {psnr} \n{text}"

    # Render a view.
    png_path = str(tmp_path / "r.png")
    cli.main([
        "render", "--source", zip_path, "--ply", ply_path,
        "--view", "0", "--out", png_path, "--block-size", "16",
    ])
    from PIL import Image

    img = np.asarray(Image.open(png_path))
    assert img.shape == (48, 48, 4)
    assert img[..., 3].max() > 50  # something rendered

    # Resume from checkpoint for a few more steps.
    cli.main([
        "train", "--source", zip_path, "--iters", "420",
        "--sh-degree", "0", "--init-count", "120",
        "--eval-split-every", "5", "--block-size", "16",
        "--resume", f"{ckpt_dir}/ckpt_final.npz", "--log-every", "100",
    ])

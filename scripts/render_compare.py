"""Render held-out views from a trained model next to ground truth.

Produces the side-by-side grids committed in docs/ as the visual quality
evidence (render | ground truth | abs error) and prints per-view PSNR.

Usage:
  python scripts/render_compare.py <dataset.zip> <model.ply|ckpt.npz> out.jpg \
      [n_views] [--platform cpu]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    src, model_path, out = args[0], args[1], args[2]
    n_views = int(args[3]) if len(args) > 3 else 3

    import jax

    if "--platform" in sys.argv:
        plat = sys.argv[sys.argv.index("--platform") + 1]
        jax.config.update("jax_platforms", plat)

    from PIL import Image

    from brush_tpu.datasets.loading import LoadDatasetArgs, load_dataset
    from brush_tpu.eval import eval_view

    if model_path.endswith(".ply"):
        from brush_tpu.datasets.ply import load_splats_from_ply

        with open(model_path, "rb") as f:
            splats = load_splats_from_ply(f.read())
    else:
        from brush_tpu.utils.checkpoint import load_checkpoint

        state, step, _, _ = load_checkpoint(model_path)
        splats = state.splats
        print(f"checkpoint at step {step}")

    ds = load_dataset(src, LoadDatasetArgs(eval_split_every=8))
    scene = ds.eval or ds.train
    rows = []
    for i, view in enumerate(scene.views[:n_views]):
        ev = eval_view(splats, view.camera, view.image, block_size=512,
                       keep_image=True)
        gt = view.image[..., :3]
        err = np.abs(ev.rendered - gt).mean(axis=-1, keepdims=True)
        err = np.repeat(np.clip(err * 4.0, 0, 1), 3, axis=-1)
        rows.append(np.concatenate(
            [np.clip(ev.rendered, 0, 1), gt, err], axis=1))
        print(f"view {i}: PSNR {ev.psnr:.2f}  SSIM {ev.ssim:.4f}", flush=True)
    grid = np.concatenate(rows, axis=0)
    Image.fromarray((grid * 255).astype(np.uint8), "RGB").save(
        out, quality=90)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

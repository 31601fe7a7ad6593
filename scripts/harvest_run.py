"""Post-training harvest: full eval + PLY export + comparison grid from a
checkpoint.

Usage: python scripts/harvest_run.py <zip> <ckpt.npz> <prefix> [--platform P]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    if "--platform" in sys.argv:
        import jax

        jax.config.update(
            "jax_platforms", sys.argv[sys.argv.index("--platform") + 1]
        )
    src, ckpt, prefix = sys.argv[1], sys.argv[2], sys.argv[3]

    from PIL import Image

    from brush_tpu.datasets.loading import LoadDatasetArgs, load_dataset
    from brush_tpu.datasets.ply import splats_to_ply
    from brush_tpu.eval import eval_view
    from brush_tpu.utils.checkpoint import load_checkpoint

    state, step, _, _ = load_checkpoint(ckpt)
    splats = state.splats
    print(f"checkpoint step {step}, {int(splats.n_live)} splats", flush=True)

    with open(f"{prefix}.ply", "wb") as f:
        f.write(splats_to_ply(splats))
    print(f"wrote {prefix}.ply", flush=True)

    split = None
    if "--eval-split-every" in sys.argv:
        split = int(sys.argv[sys.argv.index("--eval-split-every") + 1])
    ds = load_dataset(src, LoadDatasetArgs(eval_split_every=split))
    scene = ds.eval or ds.train
    psnrs, ssims = [], []
    rows = []
    for i, view in enumerate(scene.views):
        keep = i < 3
        ev = eval_view(splats, view.camera, view.image, block_size=512,
                       keep_image=keep)
        psnrs.append(ev.psnr)
        ssims.append(ev.ssim)
        print(f"view {i}: PSNR {ev.psnr:.2f} SSIM {ev.ssim:.4f}", flush=True)
        if keep:
            gt = view.image[..., :3]
            err = np.repeat(np.clip(np.abs(ev.rendered - gt).mean(
                -1, keepdims=True) * 4, 0, 1), 3, -1)
            rows.append(np.concatenate(
                [np.clip(ev.rendered, 0, 1), gt, err], axis=1))
    print(f"MEAN over {len(psnrs)} views: PSNR {np.mean(psnrs):.3f} "
          f"SSIM {np.mean(ssims):.4f}", flush=True)
    grid = np.concatenate(rows, axis=0)
    h = 280 * len(rows)
    im = Image.fromarray((grid * 255).astype(np.uint8), "RGB")
    im = im.resize((int(im.width * h / im.height), h))
    im.save(f"{prefix}_views.jpg", quality=88)
    print(f"wrote {prefix}_views.jpg", flush=True)


if __name__ == "__main__":
    main()

"""Generate a synthetic NeRF-format dataset zip by rendering a random splat
cloud with the oracle renderer — a self-contained stand-in for lego when no
real datasets are available."""
import io
import json
import os
import sys
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(out="/tmp/synth_scene.zip", n_views=24, size=128, n_splats=80,
         seed=7):
    n_views, size, n_splats, seed = (int(n_views), int(size), int(n_splats),
                                     int(seed))
    import jax
    jax.config.update("jax_platforms", "cpu")
    from PIL import Image

    from brush_tpu.camera import Camera, rotmat_to_quat
    from brush_tpu.ops.rasterize_reference import camera_params, render_oracle
    from brush_tpu import splats as sp

    rng = np.random.default_rng(seed)
    model = sp.from_random(rng, [-1.2, -1.2, -1.2], [1.2, 1.2, 1.2],
                           count=n_splats, sh_degree=0)
    model = model.replace(
        raw_opacity=model.raw_opacity + 3.0,
        log_scales=model.log_scales + 0.8,
    )

    frames = []
    val_frames = []
    buf = io.BytesIO()
    fov = 0.9
    with zipfile.ZipFile(buf, "w") as zf:
        for i in range(n_views + 4):
            split = "val" if i >= n_views else "train"
            theta = (2 * np.pi * i / n_views if split == "train"
                     else 2 * np.pi * (i - n_views + 0.37) / 4)
            elev = 0.35 * np.sin(3 * theta)
            pos = 4.0 * np.array([
                np.sin(theta) * np.cos(elev), np.sin(elev),
                -np.cos(theta) * np.cos(elev),
            ])
            fwd = -pos / np.linalg.norm(pos)          # +Z forward, look at 0
            up = np.array([0.0, 1.0, 0.0])
            right = np.cross(up, fwd); right /= np.linalg.norm(right)
            up2 = np.cross(fwd, right)
            r = np.stack([right, up2, fwd], axis=1)
            quat = rotmat_to_quat(r)
            cam = Camera(position=pos, rotation=quat, fov_x=fov, fov_y=fov)
            cp = camera_params(cam, (size, size))
            img = np.asarray(render_oracle(
                model.means, model.log_scales, model.quats, model.sh_coeffs,
                model.raw_opacity, cp, (size, size),
                active=model.active_mask()))
            u8 = np.clip(img * 255, 0, 255).astype(np.uint8)
            pb = io.BytesIO()
            Image.fromarray(u8, "RGBA").save(pb, format="PNG")
            zf.writestr(f"synth/{split}/r_{i}.png", pb.getvalue())

            # NeRF transforms store OpenGL-style c2w (-Z forward, +Y up);
            # the loader swaps back (nerf_synthetic.rs:56-66).
            c2w = np.eye(4)
            c2w[:3, :3] = r @ np.diag([1.0, -1.0, -1.0])
            c2w[:3, 3] = pos
            (frames if split == "train" else val_frames).append(
                {"file_path": f"./{split}/r_{i}",
                 "transform_matrix": c2w.tolist()})
        zf.writestr("synth/transforms_train.json",
                    json.dumps({"camera_angle_x": fov, "frames": frames}))
        zf.writestr("synth/transforms_val.json",
                    json.dumps({"camera_angle_x": fov, "frames": val_frames}))
    with open(out, "wb") as f:
        f.write(buf.getvalue())
    print(f"wrote {out}: {n_views} views {size}x{size}, {n_splats} splats")


if __name__ == "__main__":
    main(*sys.argv[1:5])

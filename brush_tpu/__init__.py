"""brush_tpu — a TPU-native 3D Gaussian Splatting framework.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of the
reference engine (wartron/brush: Rust + Burn + WGSL compute kernels), built
TPU-first:

- The reference's sparse "visible-only" GPU pipeline (atomic compaction,
  indirect dispatch, radix sorts, CAS gradient atomics) is re-expressed with
  static shapes: masked padded buffers, `lax.sort`-based two-pass ordering,
  cumsum tile binning, and segment-sum gradient reduction.
- Tile rasterization is reformulated from per-pixel scalar loops
  (reference: rasterize.wgsl) into dense (pixels x splats) vector blocks with
  log-space prefix scans for the transmittance product — MXU/VPU-shaped math.
- Multi-device scaling (absent in the reference, which is single-GPU only)
  uses `jax.sharding.Mesh` + `shard_map`: gaussians sharded for projection,
  image tiles sharded for rasterization, gradients reduced over ICI.

Layer map (mirrors reference layers L0-L6, see SURVEY.md §1):
    ops/        device math: projection, SH, compositing, sort, Pallas kernels
    render.py   differentiable render pipeline (reference: brush-render)
    splats.py   gaussian parameter model       (reference: gaussian_splats.rs)
    train.py    training loop + refinement     (reference: brush-train)
    datasets/   COLMAP / nerf-synthetic / PLY  (reference: brush-dataset)
    parallel/   mesh sharding (new capability)
    cli.py      train/eval/render entry points (reference: brush-cli, stubbed there)
"""

__version__ = "0.1.0"

from brush_tpu.camera import Camera  # noqa: F401
from brush_tpu.splats import Splats  # noqa: F401

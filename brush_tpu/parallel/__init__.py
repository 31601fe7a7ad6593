"""Multi-device scaling over a jax.sharding.Mesh (new capability — the
reference is strictly single-GPU, SURVEY.md §2.3)."""

from brush_tpu.parallel.sharding import make_mesh  # noqa: F401
from brush_tpu.parallel.train_step import make_sharded_train_step  # noqa: F401
from brush_tpu.parallel.trainer import ShardedTrainer  # noqa: F401

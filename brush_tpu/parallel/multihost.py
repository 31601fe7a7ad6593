"""Multi-host initialization and process-local data handling.

The reference has no distributed machinery at all (SURVEY.md §2.3); this is
the jax.distributed layer for pod-slice training: every process sees its
local devices, the global mesh spans all of them, and dataset views are
loaded per-process (each host decodes only the views it will feed).
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize with TPU auto-detection when args are None.

    On Cloud TPU pods the arguments are discovered from the environment; for
    CPU multi-process tests pass them explicitly.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def process_view_slice(num_views: int) -> range:
    """The contiguous slice of dataset views this process should host.

    Host data loading is sharded per process (SURVEY.md §5.8); every process
    feeds the same *global* batch order by seeding loaders identically, but
    only decodes its own views.
    """
    p = jax.process_index()
    n = jax.process_count()
    per = -(-num_views // n)
    return range(p * per, min((p + 1) * per, num_views))


def is_coordinator() -> bool:
    return jax.process_index() == 0

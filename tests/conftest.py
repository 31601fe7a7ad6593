"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's CPU-reference test strategy (SURVEY.md §4) and adds
what it lacked: multi-device tests via XLA's host-platform device override.

Note: the environment's sitecustomize registers a remote TPU backend at
interpreter start and pins jax_platforms to it, so the env-var alone is not
enough — we must override the config after jax import, before first use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def assert_close_quantized(got, want, atol=2e-4, flip_tol=0.01,
                           max_flip_frac=2e-3, err_msg=""):
    """allclose that tolerates a few alpha-threshold decision flips.

    The packed record pipeline quantizes color/opacity to u16 steps
    (rasterize_fwd.quantize_*). Against an f32 oracle, the bulk of the
    image must agree within the quantization bound (`atol`), but a
    borderline splat sitting exactly on the alpha >= 1/255 inclusion cut
    (or the T < 1e-4 early-out) can flip, changing a handful of pixels by
    up to ~2 contributions at the threshold (~2/255). Those flips are
    counted and bounded, not hidden by a blanket tolerance.
    """
    import numpy as np

    got = np.asarray(got)
    want = np.asarray(want)
    diff = np.abs(got - want)
    n_flip = int((diff > atol).sum())
    assert diff.max() <= flip_tol, (
        f"{err_msg}: max diff {diff.max():.2e} exceeds even the "
        f"threshold-flip bound {flip_tol:.0e}"
    )
    assert n_flip <= max(1, int(max_flip_frac * diff.size)), (
        f"{err_msg}: {n_flip}/{diff.size} elements beyond atol={atol:.0e} "
        f"— more than the allowed boundary-flip fraction {max_flip_frac}"
    )

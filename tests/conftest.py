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

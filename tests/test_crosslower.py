"""Mosaic cross-lowering guard: the default pipeline must lower for TPU.

Interpret-mode tests accept ops Mosaic cannot lower (it has no
fptoui/uitofp, no i1 loop carries, ...), so a kernel edit can pass the
whole CPU suite and still fail its first hardware compile — which, with
the remote compiler, costs an hour of campaign time to discover. This
lowers the default fwd+bwd pipeline with lowering_platforms=("tpu",) —
the client-side pallas->Mosaic pipeline runs fully; only server-side
Mosaic->LLO errors still need the chip. The full variant matrix lives in
scripts/crosslower_check.py.
"""

import numpy as np


def test_default_pipeline_crosslowers_for_tpu():
    import jax

    from scripts.crosslower_check import build_cases

    cases, args = build_cases()
    by_name = dict(cases)
    for name in ("fwd base", "bwd base"):
        lowered = jax.jit(by_name[name]).trace(*args).lower(
            lowering_platforms=("tpu",))
        text = lowered.as_text()
        assert "tpu_custom_call" in text, f"{name}: no Mosaic kernels emitted"

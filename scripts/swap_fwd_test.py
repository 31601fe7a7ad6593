"""Bisection: run the failing step-3026 gradient with the ROUND-4 forward
raster kernel substituted (everything else current). If grads come out
clean, the NaN lives in the round-5 fused-loop fwd kernel's outputs
(img/log_t/fidx feeding the backward); if they're still NaN, the bug is
elsewhere (bwd kernel / expand / vjp plumbing).

Usage: git show a4a388f:brush_tpu/ops/pallas/rasterize_fwd.py > /tmp/rasterize_fwd_r4.py
       python scripts/swap_fwd_test.py
"""
import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Substitute the r4 kernel module BEFORE anything imports it.
spec = importlib.util.spec_from_file_location(
    "brush_tpu.ops.pallas.rasterize_fwd", "/tmp/rasterize_fwd_r4.py"
)
mod = importlib.util.module_from_spec(spec)
sys.modules["brush_tpu.ops.pallas.rasterize_fwd"] = mod
spec.loader.exec_module(mod)
print("substituted rasterize_fwd from /tmp/rasterize_fwd_r4.py", flush=True)

import runpy

sys.argv = ["localize_nan.py", "pallas"]
runpy.run_path("scripts/localize_nan.py", run_name="__main__")

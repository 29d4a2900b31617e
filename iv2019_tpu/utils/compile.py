"""Centralized jit wrapper with tuned TPU compiler options.

A compiler-flag sweep over the flagship train step (tools/flag_sweep.py,
docs/PERFORMANCE.md round 2) found ``xla_tpu_enable_experimental_fusion_cost_model``
worth ~11 ms/step (234.6 -> 223.2 ms) while every other candidate was
neutral or negative. The options only exist in the TPU compiler, so they are
applied only when the default backend is a TPU (the CPU test mesh rejects
them).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Optional

import jax

__all__ = ["jit", "tpu_compiler_options"]

TPU_COMPILER_OPTIONS: dict[str, str] = {
    "xla_tpu_enable_experimental_fusion_cost_model": "true",
}


@lru_cache(maxsize=1)
def tpu_compiler_options() -> Optional[dict]:
    """The tuned options when running on TPU, else None."""
    try:
        platform = jax.default_backend()
    except Exception:
        return None
    # 'axon' is the tunneled TPU platform in this environment
    if platform in ("tpu", "axon"):
        return dict(TPU_COMPILER_OPTIONS)
    return None


def jit(fun=None, **kw: Any):
    """Drop-in jax.jit that applies the tuned TPU compiler options."""
    opts = tpu_compiler_options()
    if opts:
        merged = dict(opts)
        merged.update(kw.get("compiler_options") or {})
        kw["compiler_options"] = merged
    if fun is None:
        return lambda f: jax.jit(f, **kw)
    return jax.jit(fun, **kw)

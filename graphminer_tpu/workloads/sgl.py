"""Subgraph listing / counting (SgL).

Parity: src/sgl/ — pattern dispatched by name (omp_base.cc:16-52) to generated
kernels (cpu_kernels/{diamond,rectangle,house,pentagon}.h …). TPU: named plans
from core.plan interpreted by the frontier engine.
"""
from __future__ import annotations

from ..core.plan import SGL_PLANS
from ..engine.frontier import count_pattern


def sgl_count(g, pattern: str, chunk: int = 1024, backend: str = "auto") -> int:
    try:
        plan = SGL_PLANS[pattern.lower()]
    except KeyError:
        raise ValueError(f"unknown pattern {pattern!r}; have {sorted(SGL_PLANS)}")
    return count_pattern(g, plan, chunk=chunk, backend=backend)

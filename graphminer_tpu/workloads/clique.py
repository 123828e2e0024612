"""k-clique counting (k-CL).

Parity: src/clique/ — automine_omp.h:2-183 (DAG nested DFS) and
clique{4,5}_warp_edge.cuh GPU kernels. TPU: clique_plan(k) interpreted by the
frontier engine over the oriented DAG.
"""
from __future__ import annotations

from ..core.plan import clique_plan
from ..engine.frontier import count_pattern


def clique_count(g, k: int, chunk: int = 1024, backend: str = "auto",
                 fast: bool = False) -> int:
    """Exact k-clique count.

    fast=True routes k=4 through the MXU wedge-Gram engine
    (ops/clique4.py — the clique4_warp_edge.cuh analogue) and k=3 through
    the stream engine; other k use the plan-interpreting frontier."""
    assert k >= 3
    if fast and not g.is_dag:
        if k == 3:
            from ..ops.stream import triangle_count_stream
            return triangle_count_stream(g)
        if k == 4:
            from ..ops.clique4 import clique4_count_fast
            return clique4_count_fast(g)
    return count_pattern(g, clique_plan(k), chunk=chunk, backend=backend)

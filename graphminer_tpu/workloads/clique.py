"""k-clique counting (k-CL).

Parity: src/clique/ — automine_omp.h:2-183 (DAG nested DFS) and
clique{4,5}_warp_edge.cuh GPU kernels. TPU: clique_plan(k) interpreted by the
frontier engine over the oriented DAG.
"""
from __future__ import annotations

from ..core.plan import clique_plan
from ..engine.frontier import count_pattern


def clique_count(g, k: int, chunk: int = 1024, backend: str = "auto") -> int:
    assert k >= 3
    return count_pattern(g, clique_plan(k), chunk=chunk, backend=backend)

"""Labeled subgraph query (matching/counting).

Parity: src/query/ in the reference — GQL-style labeled subgraph matching
(QueryPlan + NLF candidate filtering + per-level set-op programs executed by
a DFS, omp_base.cc:10-125). TPU redesign: the query pattern is compiled by
plan_from_pattern(labeled=True) into a Plan whose levels carry vertex-label
constraints (the NLF/label filtering becomes label masks on candidate tiles
and label-filtered edge task lists), then executed by the same frontier
engine as every other workload.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

from ..core.pattern_graph import PatternGraph
from ..core.plan import plan_from_pattern
from ..engine.frontier import count_pattern


def query_count(g, query: PatternGraph, chunk: int = 2048) -> int:
    """Number of distinct embeddings (subgraph isomorphisms / |Aut|) of the
    labeled query in the labeled data graph."""
    assert g.vlabels is not None, "query needs a vertex-labeled data graph"
    plan = plan_from_pattern(query, name="query", labeled=True)
    return count_pattern(g, plan, chunk=chunk)


def make_query(edges: Sequence[Tuple[int, int]], vlabels: Sequence[int]
               ) -> PatternGraph:
    return PatternGraph(tuple(int(x) for x in vlabels),
                        tuple(sorted((min(u, v), max(u, v))
                                     for u, v in edges)))

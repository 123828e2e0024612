"""Brute-force pattern counting oracles for small graphs (numpy only).

The differential-test counterpart of the reference's golden-count tables: for
graphs with <~100 vertices we count patterns exactly from the dense adjacency
matrix and compare every framework backend against these numbers.
"""
from __future__ import annotations

import itertools

import numpy as np


def dense_adj(g) -> np.ndarray:
    n = g.n_vertices
    a = np.zeros((n, n), dtype=bool)
    deg = np.diff(g.rowptr)
    src = np.repeat(np.arange(n), deg)
    a[src, g.colidx] = True
    return a


def triangles(g) -> int:
    a = dense_adj(g).astype(np.int64)
    return int(np.trace(a @ a @ a) // 6)


def k_cliques(g, k: int) -> int:
    a = dense_adj(g)
    n = a.shape[0]
    count = 0
    # recursive expansion over candidate sets (ids ascending)
    def rec(cands: np.ndarray, depth: int) -> int:
        if depth == k:
            return 1
        total = 0
        for v in cands:
            total += rec(cands[(cands > v) & a[v][cands]], depth + 1)
        return total
    return rec(np.arange(n), 0)


def count_iso(g, pattern_edges, n_pat, automorphisms: int) -> int:
    """# induced subgraphs isomorphic to the pattern (vertex-induced)."""
    a = dense_adj(g)
    n = a.shape[0]
    pat = np.zeros((n_pat, n_pat), dtype=bool)
    for u, v in pattern_edges:
        pat[u, v] = pat[v, u] = True
    count = 0
    for combo in itertools.permutations(range(n), n_pat):
        sub = a[np.ix_(combo, combo)]
        if np.array_equal(sub, pat):
            count += 1
    return count // automorphisms


def count_noninduced(g, pattern_edges, n_pat, vlabels=None):
    """# subgraph isomorphisms / |Aut| (non-induced embeddings), optionally
    label-constrained. Brute force — small graphs only."""
    from graphminer_tpu.core.pattern_graph import PatternGraph
    a = dense_adj(g)
    n = a.shape[0]
    pat = PatternGraph.from_edges(pattern_edges, n_pat, vlabels=vlabels)
    aut = len(pat.automorphisms())
    gl = g.vlabels if vlabels is not None else None
    count = 0
    for combo in itertools.permutations(range(n), n_pat):
        if vlabels is not None and any(
                int(gl[combo[i]]) != vlabels[i] for i in range(n_pat)):
            continue
        if all(a[combo[u], combo[v]] for u, v in pattern_edges):
            count += 1
    assert count % aut == 0
    return count // aut


PATTERNS = {
    # name: (edges, n_vertices, |Aut|)
    "triangle": ([(0, 1), (0, 2), (1, 2)], 3, 6),
    "wedge": ([(0, 1), (0, 2)], 3, 2),
    "rectangle": ([(0, 1), (1, 2), (2, 3), (3, 0)], 4, 8),
    "diamond": ([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3)], 4, 4),
    "4clique": ([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)], 4, 24),
    "4path": ([(0, 1), (1, 2), (2, 3)], 4, 2),
    "3star": ([(0, 1), (0, 2), (0, 3)], 4, 6),
    "tailedtriangle": ([(0, 1), (0, 2), (1, 2), (2, 3)], 4, 2),
    "house": ([(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (1, 4)], 5, 2),
    "pentagon": ([(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)], 5, 10),
    "hourglass": ([(0, 1), (0, 2), (1, 2), (0, 3), (0, 4), (3, 4)], 5, 8),
}


def motif_counts(g, k: int) -> dict:
    """Induced counts of all k-vertex connected patterns."""
    if k == 3:
        names = ["wedge", "triangle"]
    elif k == 4:
        names = ["4path", "3star", "rectangle", "tailedtriangle", "diamond", "4clique"]
    else:
        raise ValueError(k)
    return {nm: count_iso(g, *PATTERNS[nm]) for nm in names}

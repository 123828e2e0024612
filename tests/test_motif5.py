"""Generic k-motif counting (non-induced enumeration + containment-matrix
inversion) — differential vs a brute-force induced-subgraph oracle, plus
agreement with the independent k=3/k=4 formula backends (the reference's
cross-implementation validation style, SURVEY §4.5)."""
import itertools

import numpy as np
import pytest

from graphminer_tpu.core.pattern_graph import PatternGraph, NAMED_PATTERNS
from graphminer_tpu.io.synth import erdos_renyi
from graphminer_tpu.workloads.motif import (
    motif_generic_count, motif4_count, motif5_count, motif_count,
    _connected_patterns, _containment_matrix, _is_connected)
import oracle


def _induced_oracle(g, k):
    from collections import Counter
    a = oracle.dense_adj(g)
    cnt = Counter()
    for combo in itertools.combinations(range(a.shape[0]), k):
        sub = a[np.ix_(combo, combo)]
        edges = [(i, j) for i in range(k) for j in range(i + 1, k)
                 if sub[i, j]]
        p = PatternGraph.from_edges(edges, k)
        if {v for e in edges for v in e} == set(range(k)) \
                and _is_connected(p):
            cnt[p.canonical_key()] += 1
    return cnt


def test_pattern_enumeration_counts():
    # 2, 6, 21 connected patterns for k=3,4,5 (reference pattern.hh:4-15)
    assert len(_connected_patterns(3)) == 2
    assert len(_connected_patterns(4)) == 6
    assert len(_connected_patterns(5)) == 21


def test_containment_matrix_triangular():
    m = _containment_matrix(5)
    assert np.all(np.diag(m) == 1)
    assert np.all(np.tril(m, -1) == 0)  # sorted by edge count


@pytest.mark.parametrize("k", [3, 4, 5])
def test_generic_vs_bruteforce(k):
    g = erdos_renyi(14, 0.35, seed=3)
    got = motif_generic_count(g, k, chunk=256)
    want = _induced_oracle(g, k)
    for p, c in got.items():
        assert c == want.get(p.canonical_key(), 0), p.edges
    assert sum(got.values()) == sum(want.values())


def test_inversion_agrees_with_formula_backend():
    g = erdos_renyi(25, 0.2, seed=9)
    m4 = motif4_count(g, chunk=256)
    g4 = {p.canonical_key(): c
          for p, c in motif_generic_count(g, 4, chunk=256).items()}
    pairs = [("4path", "4path"), ("3star", "3star"), ("4cycle", "rectangle"),
             ("tailedtriangle", "tailed_triangle"), ("diamond", "diamond"),
             ("4clique", "4clique")]
    for nm, key in pairs:
        assert m4[nm] == g4[NAMED_PATTERNS[key].canonical_key()], nm


def test_motif5_names_and_dispatch():
    g = erdos_renyi(16, 0.3, seed=1)
    out = motif_count(g, 5, chunk=256)
    assert len(out) == 21
    assert "pentagon" in out and "5clique" in out and "hourglass" in out
    want = _induced_oracle(g, 5)
    assert out["pentagon"] == want.get(
        NAMED_PATTERNS["pentagon"].canonical_key(), 0)
    assert out["5clique"] == want.get(
        NAMED_PATTERNS["5clique"].canonical_key(), 0)

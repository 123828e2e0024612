"""Rectangle (4-cycle) fast engine (ops/rectangle.py) — max-anchored
truncated-codegree decomposition vs brute-force oracle, the frontier
engine, and the reference golden (src/sgl/README.md:53 citeseer = 6,059)."""
import numpy as np
import pytest

from graphminer_tpu.io.synth import erdos_renyi, rmat
from graphminer_tpu.ops.rectangle import rectangle_count_fast, _c4_dense
import oracle


def _frontier(g):
    from graphminer_tpu.workloads.sgl import sgl_count
    return sgl_count(g, "rectangle")


def test_dense_closer_vs_oracle(rand_graphs):
    g = rand_graphs[0]                     # n = 24: brute force is feasible
    edges, n_pat, _ = oracle.PATTERNS["rectangle"]
    assert _c4_dense(g) == oracle.count_noninduced(g, edges, n_pat)


@pytest.mark.parametrize("n,p,seed", [(40, 0.3, 0), (64, 0.15, 1),
                                      (80, 0.25, 2), (120, 0.1, 3)])
def test_vs_frontier_core_sweep(n, p, seed):
    g = erdos_renyi(n, p, seed)
    want = _frontier(g)                    # independent generic engine
    # degenerate, partial and whole-graph cores; small cores force real
    # case-B buckets and multi-level case-C recursion
    for core in (8, 32, n):
        got = rectangle_count_fast(g, core=core)
        assert got == want, (core, got, want)


def test_rmat_vs_frontier():
    g = rmat(12, 8, seed=23)
    want = _frontier(g)
    assert want > 0
    assert rectangle_count_fast(g) == want
    assert rectangle_count_fast(g, core=256) == want


def test_citeseer_golden(citeseer):
    # src/sgl/README.md:53 — citeseer 4-cycles = 6,059
    assert rectangle_count_fast(citeseer) == 6059


def test_chunk_invariance():
    g = rmat(11, 8, seed=3)
    a = rectangle_count_fast(g, chunk=64)
    b = rectangle_count_fast(g, chunk=4096)
    assert a == b


def test_workload_routing(citeseer):
    from graphminer_tpu.workloads.sgl import sgl_count
    assert sgl_count(citeseer, "rectangle", backend="fast") == 6059

"""CliqueBigEngine (ops/cliquebig.py): streamed recursive hi/lo k-clique
counting for k >= 6 vs brute-force oracle and the frontier engine
(OSDI Fig-11 large-clique parity, OSDI-experiments-guide.md:138-147)."""
import numpy as np
import pytest

from graphminer_tpu.io.synth import erdos_renyi, rmat
from graphminer_tpu.ops.cliquebig import CliqueBigEngine, cliquebig_count
import oracle


def _frontier(g, k):
    from graphminer_tpu.core.plan import clique_plan
    from graphminer_tpu.engine.frontier import count_pattern
    rg = g.relabel_by_degree(descending=False).orientation()
    return count_pattern(rg, clique_plan(k))


@pytest.mark.parametrize("n,p,seed,k", [
    (30, 0.5, 0, 6),
    (40, 0.45, 1, 6),
    (40, 0.45, 1, 7),
    (48, 0.45, 5, 8),
])
def test_vs_oracle_core_hi_sweep(n, p, seed, k):
    g = erdos_renyi(n, p, seed)
    want = oracle.k_cliques(g, k)
    # degenerate, partial and whole-graph cores; tiny hi forces real lo
    # tasks and real tails
    for core, hi in [(16, 32), (64, 32), (4096, 256)]:
        eng = CliqueBigEngine(g, k, core=core, hi=hi)
        assert eng.count() == want, (core, hi)


def test_clique6_rmat_vs_frontier():
    g = rmat(12, 8, seed=23)
    want = _frontier(g, 6)
    assert want > 0
    assert cliquebig_count(g, 6) == want
    # small core + narrow hi: different split, same count
    assert cliquebig_count(g, 6, core=256, hi=64) == want


def test_clique7_rmat_vs_frontier():
    g = rmat(11, 8, seed=29)
    want = _frontier(g, 7)
    assert cliquebig_count(g, 7) == want


def test_clique6_rmat13_frozen_anchor():
    """Frozen scale anchor: rmat13 ef16 seed7 6-cliques = 631,682,339 —
    verified once against the frontier engine (624 s run) and against the
    alternate core=1024/hi=128 split; pins the full streaming pipeline
    (36M+ prefix tasks through chunked host expansion) at a scale the
    small fixtures never reach."""
    g = rmat(13, 16, seed=7)
    assert cliquebig_count(g, 6) == 631682339


def test_clique6_rmat13_native_dfs_backend():
    """Genuinely independent backend check of the rmat13 anchor: the
    native reference-style DAG DFS counter (gm_kclique — sorted-merge
    intersections, no shared code with the bilinear engines) reproduces
    631,682,339. The rmat14 (3,345,978,434, 19 s) and rmat16
    (59,924,973,905) goldens were verified with the same backend in
    round 5 (scripts/verify history)."""
    from graphminer_tpu import native_bridge
    if native_bridge.get_lib() is None or \
            not hasattr(native_bridge.get_lib(), "gm_kclique"):
        pytest.skip("native lib unavailable")
    g = rmat(13, 16, seed=7).relabel_by_degree(
        descending=False).orientation()
    assert native_bridge.kclique_dfs(g.rowptr, g.colidx, 6) == 631682339


def test_streaming_chunk_invariance():
    """Chunked host expansion must not change the count (the r3 lesson:
    scale engines need tests where their chunking actually engages)."""
    g = rmat(11, 8, seed=3)
    e1 = CliqueBigEngine(g, 6, edge_chunk=128)
    e2 = CliqueBigEngine(g, 6, edge_chunk=1 << 14)
    assert e1.count() == e2.count()


def test_workload_routing():
    from graphminer_tpu.workloads.clique import clique_count
    g = rmat(10, 8, seed=7)
    assert clique_count(g, 6, fast=True) == clique_count(g, 6, fast=False)


def test_k6_device_expansion_path():
    """The k=6 device-side quad expansion (threshold lowered to force it)
    must agree with the host streaming path."""
    from graphminer_tpu.ops.cliquebig import CliqueBigEngine
    g = rmat(12, 8, seed=23)
    host = CliqueBigEngine(g, 6)
    host.DEV6_MIN_TRIS = 1 << 62        # force host streaming
    want = host.count()
    dev = CliqueBigEngine(g, 6)
    dev.DEV6_MIN_TRIS = 0               # force device expansion
    dev.T6 = 1 << 12
    dev.CAP6 = 1 << 16
    dev.QSLAB = 1 << 10
    assert dev.count() == want
    assert dev.n_hi_tasks == host.n_hi_tasks


def test_clique7_rmat12_frozen_anchor():
    """Frozen rmat12 ef16 seed7 anchor: 7-cliques = 632,745,449 — verified
    against an independent (core=512, hi=64) split (different bilinear
    region, lo population and tail). Exercises 3-level prefix chains
    through the native expander at a scale with real hubs."""
    g = rmat(12, 16, seed=7)
    assert cliquebig_count(g, 7) == 632745449


@pytest.mark.slow
def test_clique8_rmat12_frozen_anchor():
    """Frozen rmat12 ef16 seed7 anchor: 8-cliques = 2,295,344,783 (verified
    on two (core, hi) splits in round 4) — the only executable coverage of
    4-level prefix chains at rmat scale (the ER oracle sweep stays tiny)."""
    g = rmat(12, 16, seed=7)
    assert cliquebig_count(g, 8) == 2295344783

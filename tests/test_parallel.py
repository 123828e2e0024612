"""Scheduler + partitioner tests (parity: scheduler.cc, graph_partition.cc)."""
import numpy as np
import pytest

from graphminer_tpu.parallel.scheduler import (round_robin, vertex_chunking,
                                               least_first)
from graphminer_tpu.parallel.partition import (edgecut_partition_1d,
                                               induced_partition_1d,
                                               csr_segmenting)
from graphminer_tpu.workloads.triangle import triangle_count
import oracle


def _check_cover(parts, n):
    allidx = np.sort(np.concatenate(parts))
    assert np.array_equal(allidx, np.arange(n))


def test_round_robin_cover():
    parts = round_robin(4, 10000, chunk=128)
    _check_cover(parts, 10000)
    # chunk-cyclic: first chunk on worker 0
    assert (parts[0][:128] == np.arange(128)).all()


def test_vertex_chunking_cover():
    src = np.random.default_rng(0).integers(0, 1000, 5000).astype(np.int32)
    parts = vertex_chunking(3, src, stride=64)
    _check_cover(parts, 5000)
    # all tasks of the same vertex land on the same worker
    for w, p in enumerate(parts):
        for v in np.unique(src[p])[:10]:
            assert ((src // 64) % 3 == w)[src == v].all()


def test_least_first_balance():
    rng = np.random.default_rng(1)
    ds = rng.integers(1, 1000, 64 * 1024)
    dd = rng.integers(1, 1000, 64 * 1024)
    parts = least_first(4, ds, dd, chunk=1024)
    _check_cover(parts, 64 * 1024)
    est = np.minimum(ds, dd)
    loads = np.array([est[p].sum() for p in parts])
    assert loads.max() / loads.min() < 1.05  # greedy should balance well


def test_induced_partition_triangles(rand_graphs):
    """Per-partition triangle counts over owned-anchor tasks must sum to the
    exact global count (the distributed-counting correctness invariant)."""
    g = rand_graphs[2]
    want = oracle.triangles(g)
    # orientation MUST precede partitioning: local degrees would change the
    # (degree, id) DAG and break the exactly-once counting invariant
    dag_global = g.orientation()
    for n_parts in (2, 3):
        parts = induced_partition_1d(dag_global, n_parts)
        total = 0
        for p in parts:
            dag = p.graph
            src, dst = dag.edge_list()
            own = p.owned_mask[src]
            # em, crude local count via numpy (tests only)
            rp, col = dag.rowptr, dag.colidx
            N = lambda v: col[rp[v]:rp[v + 1]]
            for u, v in zip(src[own], dst[own]):
                total += np.intersect1d(N(u), N(v), True).size
        assert total == want, n_parts


def test_induced_partition_halo_closure(citeseer):
    parts = induced_partition_1d(citeseer, 4)
    assert sum(p.n_owned for p in parts) == citeseer.n_vertices
    for p in parts:
        p.graph.validate()


def test_csr_segmenting_cover(citeseer):
    segs = csr_segmenting(citeseer, 4)
    assert sum(s.n_edges for s in segs) == citeseer.n_edges
    for s in segs:
        s.validate()

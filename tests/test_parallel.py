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


def test_partition_2d_blocks_tile_edges(citeseer):
    """partition2D parity (graph_partition.h:50-55): blocks (i,j) tile the
    edge set exactly, rows are rank-in-cluster, columns stay global."""
    from graphminer_tpu.parallel.partition import partition_2d
    rng = np.random.default_rng(5)
    cids = rng.integers(0, 3, citeseer.n_vertices).astype(np.int32)
    p = partition_2d(citeseer, cids)
    assert p.n_clusters == 3
    total_e = sum(c.size for c in p.colidx)
    assert total_e == citeseer.n_edges
    # per-block: edges really go cluster i -> cluster j
    for i in range(3):
        vs = p.verts_of_cluster[i]
        for j in range(3):
            rp, ci = p.block(i, j)
            assert rp.shape[0] == vs.shape[0] + 1
            if ci.size:
                assert np.all(cids[ci] == j)
            deg = np.diff(rp)
            src_g = np.repeat(vs, deg)
            # every (src, dst) exists in the original adjacency
            for u, v in zip(src_g[:50], ci[:50]):
                assert v in citeseer.colidx[
                    citeseer.rowptr[u]:citeseer.rowptr[u + 1]]


def test_fetch_partitions_roundtrip(tmp_path, citeseer):
    """save + fetch: edges among the selected clusters, global ids
    (fetch_partitions parity). Fetching ALL clusters reproduces the graph;
    a subset yields exactly the edges within the subset's vertex union."""
    from graphminer_tpu.parallel.partition import (partition_2d,
                                                   save_partitions_2d,
                                                   fetch_partitions)
    rng = np.random.default_rng(7)
    cids = rng.integers(0, 4, citeseer.n_vertices).astype(np.int32)
    p = partition_2d(citeseer, cids)
    path = str(tmp_path / "p2d.npz")
    save_partitions_2d(path, p)
    full = fetch_partitions(path, [0, 1, 2, 3])
    assert full.n_edges == citeseer.n_edges
    assert np.array_equal(full.rowptr, citeseer.rowptr)
    assert np.array_equal(full.colidx, citeseer.colidx)
    sub = fetch_partitions(path, [1, 3])
    keep = np.isin(cids, [1, 3])
    deg = np.diff(citeseer.rowptr)
    src = np.repeat(np.arange(citeseer.n_vertices), deg)
    want_e = int((keep[src] & keep[citeseer.colidx]).sum())
    assert sub.n_edges == want_e


def test_triangle_count_segmented(rand_graphs, citeseer):
    """csr_segmenting consumer: column-segmented TC is exact
    (graph_partition.h:44-48 cache blocking, one segment resident/pass)."""
    from graphminer_tpu.parallel.partition import (segment_task_counts,
                                                   triangle_count_segmented)
    g = rand_graphs[2]
    assert triangle_count_segmented(g, 3) == oracle.triangles(g)
    assert triangle_count_segmented(citeseer, 4) == 1166
    # the pruning's measurable benefit: Σ per-segment tasks must be well
    # under the r4 version's n_segments · E re-streaming (power-law ids
    # concentrate neighbors, so most (task, segment) pairs are dead)
    per_seg, e = segment_task_counts(citeseer, 4)
    assert sum(per_seg) < 2 * e, (per_seg, e)

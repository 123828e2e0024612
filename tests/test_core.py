"""Core graph loading / preprocessing tests (reference parity: graph.cc)."""
import numpy as np
import pytest

from graphminer_tpu.core.graph import HostGraph


def test_load_citeseer(citeseer):
    g = citeseer
    assert g.n_vertices == 3312
    assert g.n_edges == 9072
    assert g.max_degree == 99
    g.validate()
    assert g.vlabels is not None and g.vlabels.shape == (3312,)
    assert g.elabels is not None and g.elabels.shape == (9072,)


def test_orientation_halves_edges(citeseer):
    dag = citeseer.orientation()
    assert dag.n_edges == citeseer.n_edges // 2
    assert dag.is_dag
    dag.validate()
    # orientation must be acyclic wrt (degree, id) order: every edge ascends
    deg = citeseer.degrees()
    src = np.repeat(np.arange(dag.n_vertices), np.diff(dag.rowptr))
    dst = dag.colidx
    up = (deg[dst] > deg[src]) | ((deg[dst] == deg[src]) & (dst > src))
    assert up.all()


def test_edge_list_sym_break(citeseer):
    s, d = citeseer.edge_list(sym_break=True)
    assert s.shape[0] == citeseer.n_edges // 2
    assert (s > d).all()
    s2, d2 = citeseer.edge_list(sym_break=True, ascend=True)
    assert (s2 < d2).all()


def test_relabel_by_degree_preserves_structure(citeseer):
    rg = citeseer.relabel_by_degree()
    rg.validate()
    assert rg.n_edges == citeseer.n_edges
    deg = np.sort(np.diff(rg.rowptr))[::-1]
    assert (np.diff(rg.rowptr)[:-1] >= np.diff(rg.rowptr)[1:]).all()
    assert np.array_equal(np.sort(deg), np.sort(citeseer.degrees()))


def test_from_edges_roundtrip(tmp_path):
    from graphminer_tpu.io.loader import save_graph, load_graph
    rng = np.random.default_rng(1)
    src = rng.integers(0, 50, 200)
    dst = rng.integers(0, 50, 200)
    g = HostGraph.from_edges(src, dst, 50, symmetrize=True)
    g.validate()
    prefix = str(tmp_path / "toy" / "graph")
    save_graph(g, prefix)
    g2 = load_graph(prefix)
    assert np.array_equal(g2.rowptr, g.rowptr)
    assert np.array_equal(g2.colidx, g.colidx)


def test_native_csr_from_coo_matches_numpy():
    """gm_csr_from_coo (native/graphcore.cpp) is bit-identical to the numpy
    from_edges path (sort + dedup + symmetrize semantics)."""
    import numpy as np
    from graphminer_tpu import native_bridge as nb
    if nb.get_lib() is None:
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    n, e = 500, 4000
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    rowptr, colidx = nb.csr_from_coo(src, dst, n, symmetrize=True)
    from graphminer_tpu.core.graph import HostGraph
    import os
    os.environ["GRAPHMINER_NO_NATIVE"] = "1"
    nb._lib = None; nb._tried = False
    try:
        want = HostGraph.from_edges(src, dst, n, symmetrize=True)
    finally:
        del os.environ["GRAPHMINER_NO_NATIVE"]
        nb._tried = False
    assert np.array_equal(rowptr, want.rowptr)
    assert np.array_equal(colidx, want.colidx)

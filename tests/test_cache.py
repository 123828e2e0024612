"""Preprocessing persistence (io/cache.py): round-trip + build-once."""
import numpy as np

from graphminer_tpu.io.synth import rmat
from graphminer_tpu.io import cache


def test_graph_roundtrip(tmp_path):
    g = rmat(10, 8, seed=1)
    rg = g.relabel_by_degree(descending=False).orientation()
    cache.save_graph("t_rt", rg, cache_dir=str(tmp_path))
    g2 = cache.load_graph("t_rt", cache_dir=str(tmp_path))
    assert g2.is_dag
    assert np.array_equal(g2.rowptr, rg.rowptr)
    assert np.array_equal(g2.colidx, rg.colidx)


def test_cached_graph_builds_once(tmp_path):
    calls = []

    def build():
        calls.append(1)
        return rmat(9, 8, seed=2)

    g1 = cache.cached_graph("t_once", build, cache_dir=str(tmp_path))
    g2 = cache.cached_graph("t_once", build, cache_dir=str(tmp_path))
    assert len(calls) == 1
    assert np.array_equal(g1.colidx, g2.colidx)


def test_miss_returns_none(tmp_path):
    assert cache.load_graph("nope", cache_dir=str(tmp_path)) is None

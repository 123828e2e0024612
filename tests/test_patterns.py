"""SGL/clique conformance: citeseer goldens + brute-force differential +
map-vs-compact engine agreement."""
import numpy as np
import pytest

from graphminer_tpu.workloads.clique import clique_count
from graphminer_tpu.workloads.sgl import sgl_count
from graphminer_tpu.core.plan import SGL_PLANS, clique_plan
from graphminer_tpu.engine.frontier import count_pattern
import oracle


# Golden counts: src/sgl/README.md:53, src/motif/README.md:52-57 (4-clique),
# plus 5-clique via independent numpy oracle.
CITESEER_GOLDEN = {
    ("sgl", "diamond"): 3730,
    ("sgl", "rectangle"): 6059,
    ("sgl", "house"): 55359,
    ("sgl", "pentagon"): 28394,
    ("clique", 3): 1166,
    ("clique", 4): 255,
    ("clique", 5): 46,
}


@pytest.mark.parametrize("pattern", ["diamond", "rectangle", "house", "pentagon"])
def test_citeseer_sgl_golden(citeseer, pattern):
    assert sgl_count(citeseer, pattern) == CITESEER_GOLDEN[("sgl", pattern)]


@pytest.mark.parametrize("k", [3, 4, 5])
def test_citeseer_clique_golden(citeseer, k):
    assert clique_count(citeseer, k) == CITESEER_GOLDEN[("clique", k)]


def test_cliques_vs_oracle(rand_graphs):
    for g in rand_graphs[:2]:
        for k in (3, 4, 5):
            assert clique_count(g, k, chunk=128) == oracle.k_cliques(g, k)


def test_sgl_vs_oracle(rand_graphs):
    """SGL kernels count NON-induced embeddings for diamond (diamond+6·K4 per
    the reference diamond.h pair semantics); rectangle/house/pentagon plans
    count induced-or-not per their kernel structure — validated against
    brute-force with matching semantics on small graphs."""
    for g in rand_graphs[:2]:
        d = oracle.count_iso(g, *oracle.PATTERNS["diamond"])
        k4 = oracle.count_iso(g, *oracle.PATTERNS["4clique"])
        assert sgl_count(g, "diamond", chunk=128) == d + 6 * k4
        # rectangle kernel counts cycles regardless of chords:
        # C4 induced + diamond (1 chord, 2 ways? no: 1 four-cycle per diamond
        # pair...) — use direct non-induced 4-cycle count:
        a = oracle.dense_adj(g).astype(np.int64)
        a2 = a @ a
        # closed 4-walks based count of 4-cycles
        deg = a.sum(1)
        # tr(A^4) = 8·C4 + 2m + 2·Σ d(d−1); a.sum() == 2m
        c4 = (np.trace(a2 @ a2) - a.sum() - 2 * np.sum(deg * (deg - 1))) // 8
        assert sgl_count(g, "rectangle", chunk=128) == c4


@pytest.mark.parametrize("engine", ["map", "compact"])
def test_engines_agree(rand_graphs, engine):
    g = rand_graphs[1]
    for name in ("diamond", "rectangle", "house", "pentagon"):
        got = count_pattern(g, SGL_PLANS[name], chunk=64, engine=engine)
        ref = count_pattern(g, SGL_PLANS[name], chunk=512, engine="compact")
        assert got == ref, name
    for k in (3, 4, 5):
        got = count_pattern(g, clique_plan(k), chunk=64, engine=engine)
        ref = oracle.k_cliques(g, k)
        assert got == ref


def test_sub_chunk_sizes(rand_graphs):
    g = rand_graphs[2]
    want = count_pattern(g, SGL_PLANS["house"], chunk=1024)
    for chunk, sub in [(16, 8), (128, 32), (4096, 4096)]:
        assert count_pattern(g, SGL_PLANS["house"], chunk=chunk, sub=sub) == want

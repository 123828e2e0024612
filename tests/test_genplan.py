"""Generated plans (plan_from_pattern), SC decomposition, and labeled query —
differential vs brute force + citeseer goldens."""
import numpy as np
import pytest

from graphminer_tpu.core.pattern_graph import NAMED_PATTERNS, PatternGraph
from graphminer_tpu.core.plan import plan_from_pattern
from graphminer_tpu.engine.frontier import count_pattern
from graphminer_tpu.io.synth import labeled_er
from graphminer_tpu.workloads.count import sc_count, hourglass_count
from graphminer_tpu.workloads.query import query_count, make_query
from graphminer_tpu.workloads.sgl import sgl_count
import oracle


@pytest.mark.parametrize("name", ["triangle", "rectangle", "diamond",
                                  "4clique", "4path", "3star",
                                  "tailed_triangle", "pentagon", "hourglass",
                                  "5path", "4star"])
def test_generated_plan_vs_bruteforce(rand_graphs, name):
    pat = NAMED_PATTERNS[name]
    g = rand_graphs[0]
    want = oracle.count_noninduced(g, list(pat.edges), pat.n_vertices)
    got = count_pattern(g, plan_from_pattern(pat, name=name), chunk=256)
    assert got == want, name


def test_generated_plan_matches_handtuned(citeseer):
    """Generated diamond plan (÷|Aut|) must agree with the hand plan."""
    pat = NAMED_PATTERNS["diamond"]
    got = count_pattern(citeseer, plan_from_pattern(pat), chunk=2048)
    assert got == 3730


def test_hourglass_citeseer_golden(citeseer):
    # src/count/README.md:41
    assert hourglass_count(citeseer) == 16034


def test_sc_count_routes(citeseer):
    assert sc_count(citeseer, "hourglass") == 16034
    assert sc_count(citeseer, "diamond") == 2200        # induced (motif table)
    assert sc_count(citeseer, "4clique") == 255


def test_sgl_generic_fallback(rand_graphs):
    g = rand_graphs[0]
    pat = NAMED_PATTERNS["4star"]
    want = oracle.count_noninduced(g, list(pat.edges), pat.n_vertices)
    assert sgl_count(g, "4star", chunk=256) == want


def test_query_labeled_vs_bruteforce():
    g = labeled_er(20, 0.3, n_vlabels=3, seed=5)
    # labeled wedge and labeled triangle queries
    for edges, labels in [
        ([(0, 1), (1, 2)], [1, 2, 1]),
        ([(0, 1), (1, 2), (0, 2)], [1, 2, 3]),
        ([(0, 1), (1, 2), (0, 2)], [2, 2, 2]),
        ([(0, 1), (1, 2), (2, 3)], [1, 1, 2, 2]),
    ]:
        q = make_query(edges, labels)
        want = oracle.count_noninduced(g, edges, len(labels), vlabels=labels)
        got = query_count(g, q, chunk=128)
        assert got == want, (edges, labels)


def test_query_requires_labels(rand_graphs):
    with pytest.raises(AssertionError):
        query_count(rand_graphs[0], make_query([(0, 1)], [1, 1]))

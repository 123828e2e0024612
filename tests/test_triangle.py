"""Triangle counting conformance (golden: src/triangle/README.md:53)."""
import numpy as np
import pytest

from graphminer_tpu.workloads.triangle import triangle_count
import oracle


def test_citeseer_golden(citeseer):
    assert triangle_count(citeseer) == 1166


@pytest.mark.parametrize("backend", ["bc", "bs"])
def test_random_vs_oracle(rand_graphs, backend):
    for g in rand_graphs:
        assert triangle_count(g, chunk=256, backend=backend) == oracle.triangles(g)


def test_chunk_boundary(rand_graphs):
    g = rand_graphs[0]
    want = oracle.triangles(g)
    for chunk in (1, 3, 64, 10000):
        assert triangle_count(g, chunk=chunk) == want

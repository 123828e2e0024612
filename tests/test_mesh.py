"""Multi-device sharded counting on the 8-virtual-CPU mesh — the analogue of
the reference's multi-GPU (multigpu.cu) and MPI (dist_*.cpp) conformance."""
import jax
import numpy as np
import pytest

from graphminer_tpu.core.plan import SGL_PLANS, clique_plan
from graphminer_tpu.parallel.mesh import make_mesh, count_pattern_sharded


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("shape,axes", [
    ((1, 8), ("host", "chip")),
    ((2, 4), ("host", "chip")),   # hierarchical rank×GPU equivalent
    ((8,), ("chip",)),
])
def test_sharded_triangle_citeseer(citeseer, shape, axes):
    mesh = make_mesh(shape=shape, axis_names=axes)
    got = count_pattern_sharded(citeseer, clique_plan(3), mesh=mesh, chunk=256)
    assert got == 1166


def test_sharded_matches_single(rand_graphs, citeseer):
    mesh = make_mesh(shape=(2, 4))
    assert count_pattern_sharded(citeseer, SGL_PLANS["diamond"], mesh=mesh,
                                 chunk=128) == 3730
    assert count_pattern_sharded(citeseer, clique_plan(4), mesh=mesh,
                                 chunk=128) == 255


def test_sharded_uneven_tasks(rand_graphs):
    # task counts not divisible by n_devices × chunk must still be exact
    import oracle
    g = rand_graphs[2]
    mesh = make_mesh(shape=(8,), axis_names=("chip",))
    got = count_pattern_sharded(g, clique_plan(3), mesh=mesh, chunk=64)
    assert got == oracle.triangles(g)

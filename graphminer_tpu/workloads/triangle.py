"""Triangle counting (TC).

Parity: src/triangle/ in the reference — omp_base.cc:5-27 (vertex-parallel
Σ|N(u)∩N(v)| over the DAG) and bs_warp_edge.cuh:1-19 (edge-parallel warp
kernel). TPU redesign: orient once on host, materialize the COO task list,
then a chunked edge-parallel batched intersect-count on device.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.device_graph import DeviceGraph
from ..ops import setops
from ..utils.exec import sum_chunked
from ..types import round_up, LANE


def _edge_tc_kernel(dg: DeviceGraph, width: int, backend: str,
                    src: jax.Array, dst: jax.Array) -> jax.Array:
    a = dg.gather_rows(src, width)
    b = dg.gather_rows(dst, width)
    return setops.intersect_count(a, b, backend=backend)


@functools.partial(jax.jit, static_argnames=("width", "chunk", "backend"))
def _tc_device(dg: DeviceGraph, src, dst, *, width: int, chunk: int,
               backend: str) -> jax.Array:
    fn = functools.partial(_edge_tc_kernel, dg, width, backend)
    return sum_chunked(fn, (src, dst), chunk)


def triangle_count(g, chunk: int = 4096, backend: str = "auto") -> int:
    """Exact triangle count of an undirected graph (HostGraph)."""
    if not g.is_dag:
        g = g.orientation()
    dg = DeviceGraph.from_host(g)
    src, dst = g.edge_list()
    width = max(8, g.max_degree)
    total = _tc_device(dg, jnp.asarray(src), jnp.asarray(dst),
                       width=width, chunk=chunk, backend=backend)
    return int(total)

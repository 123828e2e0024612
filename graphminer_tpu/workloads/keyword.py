"""Graph keyword search (GKS).

Parity: src/keyword/ in the reference — count connected k-vertex subgraphs
that contain exactly one vertex of each keyword label, where every
non-keyword vertex is necessary for connectivity (gks.h, omp_base.cc
is_match/filter/extend_vertex). The reference enumerates with a per-thread
canonicality test; here subgraphs are canonical by construction (sorted
vertex tuples, level-wise dedup) over a BFS frontier — the same
level-synchronous shape as the rest of the framework. CPU-host implementation
(the reference's GKS is OpenMP-only; data sizes are filter-limited).
"""
from __future__ import annotations

from typing import Sequence

import numpy as np


def _connected_without(adj_rows, verts, skip_idx) -> bool:
    """Is the induced subgraph on verts (minus verts[skip_idx]) connected?"""
    keep = [v for i, v in enumerate(verts) if i != skip_idx]
    if len(keep) <= 1:
        return True
    ks = set(keep)
    seen = {keep[0]}
    stack = [keep[0]]
    while stack:
        w = stack.pop()
        for u in adj_rows(w):
            if u in ks and u not in seen:
                seen.add(u)
                stack.append(u)
    return len(seen) == len(keep)


def gks_count(g, k: int, keywords: Sequence[int]) -> int:
    """Count connected k-vertex subgraphs with exactly one vertex per keyword
    label and no removable (non-cut) non-keyword vertices."""
    assert g.vlabels is not None, "keyword search needs vertex labels"
    assert k >= 2 and len(keywords) <= k
    kw = sorted(set(int(x) for x in keywords))
    vl = g.vlabels.astype(np.int64)
    rp, col = g.rowptr, g.colidx
    adj = lambda v: col[rp[v]:rp[v + 1]]

    # frontier: sorted vertex tuples (canonical), seeded at keyword vertices
    seeds = np.nonzero(np.isin(vl, kw))[0].astype(np.int64)
    frontier = seeds[:, None]

    def kw_counts_ok(embs: np.ndarray, final: bool) -> np.ndarray:
        """≤1 (or ==1 when final) vertex of each keyword label."""
        ok = np.ones(embs.shape[0], dtype=bool)
        labs = vl[embs]
        for a in kw:
            c = (labs == a).sum(axis=1)
            ok &= (c == 1) if final else (c <= 1)
        return ok

    for size in range(2, k + 1):
        if frontier.shape[0] == 0:
            return 0
        # vectorized CSR expansion: every member's neighbors, one flat pass
        # (the extend_alloc → insert shape; no per-embedding Python loops)
        n, s = frontier.shape
        flat = frontier.reshape(-1)
        d = (rp[flat + 1] - rp[flat]).astype(np.int64)
        tot = int(d.sum())
        if tot == 0:
            return 0
        parent = np.repeat(np.arange(flat.size, dtype=np.int64) // s, d)
        offs = np.arange(tot, dtype=np.int64) - np.repeat(
            np.cumsum(d) - d, d)
        cand = col[np.repeat(rp[flat], d) + offs].astype(np.int64)
        keep = ~(frontier[parent] == cand[:, None]).any(axis=1)
        if not keep.any():
            return 0
        block = np.concatenate(
            [frontier[parent[keep]], cand[keep][:, None]], axis=1)
        block.sort(axis=1)
        embs = np.unique(block, axis=0)
        embs = embs[kw_counts_ok(embs, final=False)]
        frontier = embs

    final = frontier[kw_counts_ok(frontier, final=True)]
    count = 0
    for emb in final:
        verts = [int(v) for v in emb]
        ok = True
        for i, v in enumerate(verts):
            if int(vl[v]) in kw:
                continue
            # non-keyword vertex must be necessary for connectivity
            if _connected_without(adj, verts, i):
                ok = False
                break
        count += ok
    return count

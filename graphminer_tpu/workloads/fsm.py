"""Frequent subgraph mining (FSM) on vertex-labeled graphs.

Parity: src/fsm/ in the reference — gSpan-style pattern growth with MNI
(minimal image) domain support (omp_base.cc:19-147, domain_support.h:6-74,
canonical.h is_min). TPU redesign, per the reference's own GPU structure
(host-driven level loop, device embedding math — gpu_base.cu:321-513):

* the pattern-space search runs on the host as BFS growth with canonical
  dedup (core/pattern_graph.py replaces DFS-code minimality — exact for the
  small patterns FSM explores);
* embedding lists are padded int32 device arrays [n_emb, nv]; the two
  extension steps (forward: attach labeled neighbor; backward: close a cycle)
  are batched gather+mask+compact kernels — the same compaction primitive as
  the frontier engine;
* MNI support = min over pattern vertices of #distinct image vertices,
  computed per column with sort+diff on device.

Counted result = number of frequent patterns with 1..k edges (the
reference's `total`).
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.device_graph import DeviceGraph
from ..core.pattern_graph import PatternGraph
from ..ops import setops
from ..types import SENTINEL, round_up


# --------------------------------------------------------------------------
# device kernels (jitted per (capacity, nv, width) shape class)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("width", "label"))
def _forward_extend_device(dg: DeviceGraph, vlab: jax.Array, embs: jax.Array,
                           at: int, *, width: int, label: int):
    """embs [B, nv] (SENTINEL rows = padding) -> candidate new vertices.

    Returns (flat new-vertex ids [B*W], flat parent row index [B*W], count).
    A slot is live iff neighbor exists, has `label`, and is not already in
    the embedding."""
    b, nv = embs.shape
    anchors = embs[:, at]
    rows = dg.gather_rows(anchors, width)                  # [B, W]
    ok = rows != SENTINEL
    lab = vlab[jnp.clip(rows, 0, vlab.shape[0] - 1)]
    ok &= lab == label
    # vertex-distinct embeddings (subgraph isomorphism)
    ok &= ~jnp.any(rows[:, :, None] == embs[:, None, :], axis=-1)
    cand = jnp.where(ok, rows, SENTINEL)
    # compact
    flat = cand.reshape(-1)
    mask = flat != SENTINEL
    pos = jnp.cumsum(mask) - 1
    n = jnp.sum(mask)
    cap = flat.shape[0]
    tgt = jnp.where(mask, pos, cap)
    vflat = jnp.full((cap,), SENTINEL, jnp.int32).at[tgt].set(flat, mode="drop")
    parents = jax.lax.broadcasted_iota(jnp.int32, (b, width), 0).reshape(-1)
    pflat = jnp.zeros((cap,), jnp.int32).at[tgt].set(parents, mode="drop")
    return vflat, pflat, n


@functools.partial(jax.jit, static_argnames=("width",))
def _backward_filter_device(dg: DeviceGraph, embs: jax.Array, p: int, q: int,
                            *, width: int):
    """Keep embeddings where graph edge (emb[p], emb[q]) exists.
    Returns (packed embeddings [B, nv], count)."""
    b, nv = embs.shape
    rows = dg.gather_rows(embs[:, p], width)
    ok = setops.connected(embs[:, q], rows)
    ok &= embs[:, p] != SENTINEL
    pos = jnp.cumsum(ok) - 1
    n = jnp.sum(ok)
    tgt = jnp.where(ok, pos, b)
    out = jnp.full((b, nv), SENTINEL, jnp.int32).at[tgt].set(embs, mode="drop")
    return out, n


@jax.jit
def _mni_support_device(embs: jax.Array):
    """Min over columns of #distinct values (ignoring SENTINEL padding)."""
    s = jnp.sort(embs, axis=0)                              # [B, nv]
    valid = s != SENTINEL
    first = valid & jnp.concatenate(
        [jnp.ones((1, s.shape[1]), bool), s[1:] != s[:-1]], axis=0)
    return jnp.min(jnp.sum(first, axis=0))


# --------------------------------------------------------------------------
# host-side search
# --------------------------------------------------------------------------

def _pad_rows(a: np.ndarray, cap: int) -> np.ndarray:
    out = np.full((cap, a.shape[1]), SENTINEL, dtype=np.int32)
    out[: a.shape[0]] = a
    return out


class _FSM:
    def __init__(self, g, minsup: int, max_width: Optional[int] = None):
        assert g.vlabels is not None, "FSM needs vertex labels"
        self.g = g
        self.minsup = minsup
        self.dg = DeviceGraph.from_host(g)
        self.vlab = jnp.asarray(g.vlabels.astype(np.int32))
        self.width = max_width or max(8, g.max_degree)
        freq = np.bincount(g.vlabels.astype(np.int64))
        self.freq_labels = set(int(l) for l in np.nonzero(freq >= minsup)[0])

    def support(self, embs: np.ndarray) -> int:
        if embs.shape[0] == 0:
            return 0
        cap = max(8, 1 << int(np.ceil(np.log2(embs.shape[0]))))
        return int(_mni_support_device(jnp.asarray(_pad_rows(embs, cap))))

    def initial_patterns(self):
        """Frequent single-edge patterns (label pairs la <= lb) +
        embeddings; mirrors omp_base.cc:35-100 incl. frequent-vertex filter."""
        g = self.g
        src, dst = g.edge_list()
        vl = g.vlabels.astype(np.int32)
        la, lb = vl[src], vl[dst]
        keep = la <= lb  # both directions kept when la == lb
        out = {}
        for a, b in {(int(x), int(y)) for x, y in
                     zip(la[keep], lb[keep])}:
            m = keep & (la == a) & (lb == b)
            embs = np.stack([src[m], dst[m]], axis=1).astype(np.int32)
            pat = PatternGraph((a, b), ((0, 1),))
            out[pat.canonical_key()] = (pat, embs)
        return out

    def forward_extend(self, embs: np.ndarray, at: int, label: int,
                       batch: int = 4096) -> np.ndarray:
        nv = embs.shape[1]
        chunks = []
        for s in range(0, embs.shape[0], batch):
            e = embs[s:s + batch]
            cap = max(8, 1 << int(np.ceil(np.log2(e.shape[0]))))
            ep = jnp.asarray(_pad_rows(e, cap))
            vflat, pflat, n = _forward_extend_device(
                self.dg, self.vlab, ep, at, width=self.width, label=label)
            n = int(n)
            if n == 0:
                continue
            v = np.asarray(vflat[:n])
            p = np.asarray(pflat[:n])
            chunks.append(np.concatenate([e[p], v[:, None]], axis=1))
        if not chunks:
            return np.zeros((0, nv + 1), dtype=np.int32)
        return np.concatenate(chunks, axis=0)

    def backward_filter(self, embs: np.ndarray, p: int, q: int,
                        batch: int = 8192) -> np.ndarray:
        nv = embs.shape[1]
        chunks = []
        for s in range(0, embs.shape[0], batch):
            e = embs[s:s + batch]
            cap = max(8, 1 << int(np.ceil(np.log2(e.shape[0]))))
            ep = jnp.asarray(_pad_rows(e, cap))
            out, n = _backward_filter_device(self.dg, ep, p, q,
                                             width=self.width)
            n = int(n)
            if n:
                chunks.append(np.asarray(out[:n]))
        if not chunks:
            return np.zeros((0, nv), dtype=np.int32)
        return np.concatenate(chunks, axis=0)

    def run(self, k_edges: int) -> int:
        frontier = {}
        n_frequent = 0
        for key, (pat, embs) in self.initial_patterns().items():
            if (pat.vlabels[0] in self.freq_labels
                    and pat.vlabels[1] in self.freq_labels
                    and self.support(embs) >= self.minsup):
                frontier[key] = (pat, embs)
        n_frequent += len(frontier)
        seen = set(frontier.keys())

        for level in range(2, k_edges + 1):
            nxt = {}
            for key, (pat, embs) in frontier.items():
                nv = pat.n_vertices
                # forward: attach a new labeled vertex at any pattern vertex
                for at in range(nv):
                    for label in sorted(self.freq_labels):
                        child = pat.add_forward(at, label)
                        ck = child.canonical_key()
                        if ck in seen or ck in nxt:
                            continue
                        ne = self.forward_extend(embs, at, label)
                        if ne.shape[0] and self.support(ne) >= self.minsup:
                            nxt[ck] = (child, ne)
                # backward: close a cycle between non-adjacent vertices
                for p in range(nv):
                    for q in range(p + 1, nv):
                        if pat.has_edge(p, q):
                            continue
                        child = pat.add_backward(p, q)
                        ck = child.canonical_key()
                        if ck in seen or ck in nxt:
                            continue
                        ne = self.backward_filter(embs, p, q)
                        if ne.shape[0] and self.support(ne) >= self.minsup:
                            nxt[ck] = (child, ne)
            seen |= set(nxt.keys())
            n_frequent += len(nxt)
            frontier = nxt
            if not frontier:
                break
        return n_frequent


def fsm_count(g, k_edges: int, minsup: int) -> int:
    """Number of frequent patterns with 1..k_edges edges (MNI support)."""
    return _FSM(g, minsup).run(k_edges)

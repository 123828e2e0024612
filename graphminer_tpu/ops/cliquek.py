"""k-clique counting (k = 4, 5) — hi/lo-split core bilinears on the MXU.

Parity: src/clique/gpu_kernels/clique4_warp_edge.cuh:3-31 and
clique5_warp_edge.cuh (per-edge/per-triangle W = iterated N+ intersections,
then counting adjacent pairs inside W), and the OSDI Fig-11 large-clique
configurations (src/clique/README.md).

TPU reformulation. Over the degree-ascending oriented DAG with the closed
core (top `core` ids), a k-clique a < b < … is anchored at its lowest edge
(a, b). If b ∈ core, every later vertex lies in the core (closure), so the
whole residual problem lives in core bitmaps:

* k = 4:  #4cl(a,b) = #DAG edges inside y₂ = CB[a] & CB[b]  = q(y₂)
* k = 5:  #5cl(a,b) = #DAG triangles inside y₂
                    = Σ_{c ∈ y₂} q(y₂ & C[c])      (per-TRIANGLE tasks)

where q(y) = Σ_{d ∈ y} popcount(C[d] & y) counts DAG edges inside y.

The bilinear q costs |core|² MACs per task if done densely — 99% wasted on
zero bits. Measured on rmat18: the TOP-1024 core ids hold 99.1% of all
wedge-bitmap bits (power law). So q is split by the smaller endpoint d:

* d ∈ HI (top `hi` ids):  the partner is forced ∈ HI (ascending DAG), so
  q_hh(y_hi) = x_hiᵀ B_hh x_hi — a [slab, hi] @ [hi, hi] MXU bilinear,
  16× fewer MACs than the full-core form at hi = 1024.
* d ∈ LO (core below hi): rare (≤ 1% of bits). Enumerated on the host into
  explicit sparse tasks; each costs one fused row-AND + popcount:
    k=4: (a, b, d)    → popcount(CB[a] & CB[b] & C[d])
    k=5: (a, b, c, d) → popcount(CB[a] & CB[b] & C[c] & C[d]),
         c ∈ y₂ ∩ IN(d) (in-neighbors of d inside the core).

If b ∉ core, both endpoints are low-out-degree sub-core vertices: those
edge tasks run the generic bucketed frontier engine with clique_plan(k).
The split is exact and disjoint.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..types import SENTINEL, cdiv, round_up
from .hubcore import _expand_bits

CORE = 4096
HI = 1024
SLAB = 2048
CHUNK_EDGES = 1 << 16       # host bit-expansion chunk


# --------------------------------------------------------------------------
# host-side layout + task enumeration
# --------------------------------------------------------------------------

def _core_bitmaps(rg, cs: int, c: int, words: int):
    """(bm [V, words], C [c, words], INB [c, words]) uint32 host arrays:
    N+ ∩ core bitmaps for all vertices, core rows, core-internal
    in-neighbor (transpose) rows."""
    v = rg.n_vertices
    deg = np.diff(rg.rowptr).astype(np.int64)
    src = np.repeat(np.arange(v, dtype=np.int64), deg)
    col = rg.colidx.astype(np.int64)
    m = col >= cs
    bm = np.zeros((v, words), dtype=np.uint32)
    cc = (col[m] - cs).astype(np.int64)
    np.bitwise_or.at(bm, (src[m], cc >> 5),
                     np.uint32(1) << (cc & 31).astype(np.uint32))
    core = bm[cs:]
    inb = np.zeros((c, words), dtype=np.uint32)
    mm = m & (src >= cs)                      # core→core edges
    sl = (src[mm] - cs).astype(np.int64)
    np.bitwise_or.at(inb, (cc[src[m] >= cs], sl >> 5),
                     np.uint32(1) << (sl & 31).astype(np.uint32))
    return bm, core, inb


def _enum_tasks(bm: np.ndarray, core: np.ndarray, inb: np.ndarray,
                ea: np.ndarray, eb: np.ndarray, c: int, lo_cut: int,
                hi_words: int, k: int):
    """Chunked host enumeration over case-A edges.

    Returns (y2hi, tri, lo) where
      y2hi: int32 [n_edges, hi_words] — the hi-region slice of
            y₂ = CB[a] & CB[b] per case-A edge, MATERIALIZED so the
            count-time hi bilinear reads it sequentially (zero gathers for
            k=4, one aligned row gather for k=5; a column-sliced gather
            from the [V, words] table measured 50× the aligned gather wall)
      tri : k=5 only — int32 [T, 2] triangle tasks (edge_row, c_core_local)
      lo  : int32 [L, k-1] sparse lo tasks (k=4: (a,b,d); k=5: (a,b,c,d)),
            d = core-local id below the word-aligned hi cut `lo_cut`."""
    words = bm.shape[1]
    y2hi = np.empty((ea.shape[0], hi_words), dtype=np.uint32)
    tri_parts, lo_parts = [], []
    for s in range(0, ea.shape[0], CHUNK_EDGES):
        a = ea[s:s + CHUNK_EDGES].astype(np.int64)
        b = eb[s:s + CHUNK_EDGES].astype(np.int64)
        y2 = bm[a] & bm[b]
        y2hi[s:s + CHUNK_EDGES] = y2[:, words - hi_words:]
        if k == 4 and lo_cut == 0:
            continue
        if k == 4:      # only the lo words are ever enumerated
            bits = np.unpackbits(y2[:, : lo_cut // 32].view(np.uint8),
                                 axis=1, bitorder="little")
        else:
            bits = np.unpackbits(y2.view(np.uint8), axis=1,
                                 bitorder="little")
        if k == 5:
            ei, cl = np.nonzero(bits[:, :c])
            tri_parts.append(np.stack(
                [s + ei, cl.astype(np.int64)], axis=1))
        if lo_cut > 0:
            ei, dl = np.nonzero(bits[:, :lo_cut])
            if k == 4:
                lo_parts.append(np.stack(
                    [a[ei], b[ei], dl.astype(np.int64)], axis=1))
            else:
                # c ∈ y₂ ∩ IN(d): second host expansion per (edge, d) pair
                w = y2[ei] & inb[dl]
                wb = np.unpackbits(w.view(np.uint8), axis=1,
                                   bitorder="little")
                pi, cl2 = np.nonzero(wb[:, :c])
                lo_parts.append(np.stack(
                    [a[ei[pi]], b[ei[pi]], cl2.astype(np.int64),
                     dl[pi].astype(np.int64)], axis=1))
    def cat(parts, width):
        if not parts:
            return np.zeros((0, width), dtype=np.int32)
        return np.concatenate(parts).astype(np.int32)
    return y2hi.view(np.int32), cat(tri_parts, 2), cat(lo_parts, k - 1)


def _emit_all(bases, rows, attrs, words: int, n_bits: int, ncol: int,
              cap: int = 32 << 20) -> np.ndarray:
    """Collect the native expander's full output as one [n, ncol] int32
    array (resumable over the bounded buffer)."""
    from .. import native_bridge
    n = rows[0].shape[0]
    parts = []
    buf = np.empty((cap, ncol), np.int32)
    start = 0
    while start < n:
        n_em, nxt = native_bridge.expand_emit(bases, rows, attrs, words,
                                              n_bits, start, cap, buf)
        if n_em == 0 and nxt == start:
            raise RuntimeError("expander cap too small")
        if n_em:
            parts.append(buf[:n_em].copy())
        start = nxt
    return (np.concatenate(parts) if parts
            else np.zeros((0, ncol), np.int32))


def _enum_tasks_native(bm, core, inb, ea, eb, c: int, lo_cut: int,
                       hi_words: int, k: int):
    """Native (C++/OpenMP ctz) version of _enum_tasks' bit enumeration —
    the numpy unpackbits path measured 164 s (k=4) / 255 s (k=5) of prep
    on rmat18; the expander reads rows + emits tasks directly. Returns
    None when the native lib is unavailable."""
    from .. import native_bridge
    lib = native_bridge.get_lib()
    if lib is None or not hasattr(lib, "gm_expand_emit"):
        return None
    words = bm.shape[1]
    n = ea.shape[0]
    y2hi = np.empty((max(n, 1), hi_words), dtype=np.uint32)
    y2hi[:] = 0
    for s in range(0, n, CHUNK_EDGES):
        a = ea[s:s + CHUNK_EDGES].astype(np.int64)
        b = eb[s:s + CHUNK_EDGES].astype(np.int64)
        y2hi[s:s + a.shape[0]] = (bm[a] & bm[b])[:, words - hi_words:]
    ea32 = np.ascontiguousarray(ea.astype(np.int32))
    eb32 = np.ascontiguousarray(eb.astype(np.int32))
    eidx = np.arange(n, dtype=np.int32)
    tri = np.zeros((0, 2), np.int32)
    lo = np.zeros((0, k - 1), np.int32)
    if n:
        if k == 5:
            # (edge_row, c1) triangle tasks over the whole core
            tri = _emit_all([bm, bm], [ea32, eb32], [eidx], words, c, 2)
        if lo_cut > 0:
            ed = _emit_all([bm, bm], [ea32, eb32], [ea32, eb32], words,
                           lo_cut, 3)           # (a, b, d) with d < lo_cut
            if k == 4:
                lo = ed
            elif ed.shape[0]:
                # c ∈ y₂ ∩ IN(d): one more level; output (a, b, d, c) →
                # reorder to (a, b, c, d)
                abdc = _emit_all(
                    [bm, bm, inb],
                    [np.ascontiguousarray(ed[:, 0]),
                     np.ascontiguousarray(ed[:, 1]),
                     np.ascontiguousarray(ed[:, 2])],
                    [np.ascontiguousarray(ed[:, j]) for j in range(3)],
                    words, c, 4)
                lo = abdc[:, [0, 1, 3, 2]]
    return y2hi.view(np.int32), tri, lo


# --------------------------------------------------------------------------
# device kernels
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("words", "hi_words"))
def _hi_adj_bf16(core_dev, *, words: int, hi_words: int):
    """B_hh [hi_dim, hi_dim] bf16: DAG adjacency among the hi-region core
    ids (the top `hi_words` WORDS of the bitmap space — word-aligned; row j
    = core-local id lo_cut + j, zero rows beyond c never match a set bit)."""
    c = core_dev.shape[0]
    hi_dim = hi_words * 32
    lo_cut = words * 32 - hi_dim
    rows = core_dev[lo_cut:, words - hi_words:]    # [c - lo_cut, hi_words]
    x = _expand_bits(rows, hi_dim)
    pad = hi_dim - (c - lo_cut)
    if pad > 0:
        x = jnp.concatenate([x, jnp.zeros((pad, hi_dim), jnp.bfloat16)])
    return x


@functools.partial(jax.jit, static_argnames=("hi_words", "slab"))
def _edge_hi_bilinear(y2hi, bhh, *, hi_words: int, slab: int):
    """k=4 hi part: Σ_e q_hh(y₂_hi) → int32 [n_slabs, 2] lo/hi-16 sums.
    y2hi: [n, hi_words] MATERIALIZED per-edge hi slices — the slab loop is
    a pure sequential stream + MXU dot (no gathers at all)."""
    hi = hi_words * 32
    rows = y2hi.reshape(-1, slab, hi_words)

    def body(y):
        x = _expand_bits(y, hi)
        z = jax.lax.dot_general(x, bhh, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        per = jnp.sum(x.astype(jnp.float32) * z, axis=1).astype(jnp.int32)
        return jnp.stack([jnp.sum(per & 0xFFFF, dtype=jnp.int32),
                          jnp.sum(per >> 16, dtype=jnp.int32)])

    return jax.lax.map(body, rows)


@functools.partial(jax.jit, static_argnames=("hi_words", "slab"))
def _tri_hi_bilinear(y2hi_tab, core_hi, bhh, trow, tcl, *, hi_words: int,
                     slab: int):
    """k=5 hi part: Σ_t q_hh(y₃_hi), y₃_hi = y2hi[edge_row] & C_hi[c].
    Both gathers are full aligned rows from dedicated [*, hi_words]
    tables (a column-sliced gather from the [V, words] table measured
    ~1.2 µs/row — 50× the aligned gather wall)."""
    ne = y2hi_tab.shape[0]
    c = core_hi.shape[0]
    hi = hi_words * 32
    rr = trow.reshape(-1, slab)
    cc = tcl.reshape(-1, slab)

    def body(xs):
        r, cl = xs
        ok = (r >= 0) & (r < ne) & (cl >= 0) & (cl < c)
        ya = y2hi_tab[jnp.where(ok, r, 0)]
        yc = core_hi[jnp.where(ok, cl, 0)]
        y = jnp.where(ok[:, None], ya & yc, 0)
        x = _expand_bits(y, hi)
        z = jax.lax.dot_general(x, bhh, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        per = jnp.sum(x.astype(jnp.float32) * z, axis=1).astype(jnp.int32)
        return jnp.stack([jnp.sum(per & 0xFFFF, dtype=jnp.int32),
                          jnp.sum(per >> 16, dtype=jnp.int32)])

    return jax.lax.map(body, (rr, cc))


@functools.partial(jax.jit, static_argnames=("words", "chunk", "nrow"))
def _lo_popcount(bm, core_dev, cols, *, words: int, chunk: int, nrow: int):
    """Sparse lo tasks: popcount of the AND of 2 bm rows + (nrow-2) core
    rows. cols: int32 [n, nrow] (a, b, [c,] d) — padded rows SENTINEL."""
    v = bm.shape[0]
    c = core_dev.shape[0]
    xx = cols.reshape(-1, chunk, cols.shape[1])

    def body(x):
        ok = x[:, 0] >= 0
        y = bm[jnp.where(ok, x[:, 0], 0)] & \
            bm[jnp.where(ok & (x[:, 1] >= 0), x[:, 1], 0)]
        for j in range(2, x.shape[1]):
            idx = x[:, j]
            okj = ok & (idx >= 0) & (idx < c)
            y = y & core_dev[jnp.where(okj, idx, 0)]
            ok = okj
        pc = jax.lax.population_count(jnp.where(ok[:, None], y, 0))
        return jnp.sum(pc, dtype=jnp.int32)

    return jax.lax.map(body, xx)


# --------------------------------------------------------------------------
# engine
# --------------------------------------------------------------------------

def _pad_rows(x: np.ndarray, mult: int, fill=SENTINEL) -> np.ndarray:
    n = x.shape[0]
    npad = round_up(max(n, mult), mult)
    if npad == n:
        return x
    pad = np.full((npad - n,) + x.shape[1:], fill, dtype=x.dtype)
    return np.concatenate([x, pad])


class CliqueKEngine:
    """Prepared k-clique counter (k = 4 or 5) over the hi/lo core split.

    Exact: hi bilinear (MXU) + sparse lo tasks + sub-core frontier tail.
    Per-task integers < 2^24 (f32-exact); totals summed int64 on host."""

    def __init__(self, g, k: int, core: int = CORE, hi: int = HI,
                 slab: int = SLAB, tail: bool = True):
        assert k in (4, 5), "MXU fast path covers k=4,5; use the frontier"
        from ..core.plan import clique_plan
        from ..engine.frontier import count_pattern
        rg = g if g.is_dag else \
            g.relabel_by_degree(descending=False).orientation()
        self.k = k
        v = rg.n_vertices
        c = min(core, v)
        cs = v - c
        words = round_up(max(1, cdiv(c, 32)), 8)
        self.words = words
        # hi slice must reach the valid bits [0, c): hi_dim >= words*32 - c
        # (top bits are padding when c < the 8-word-rounded bit space)
        self.hi_words = min(max(1, hi // 32, words - c // 32), words)
        lo_cut = (words - self.hi_words) * 32      # word-aligned hi cut
        self.slab = slab

        bm, core_np, inb = _core_bitmaps(rg, cs, c, words)
        src, dst = rg.edge_list()
        case_a = dst >= cs
        self.n_edges = int(src.shape[0])
        ea = src[case_a].astype(np.int64)
        eb = dst[case_a].astype(np.int64)
        self.n_core_edges = int(ea.shape[0])

        self.bm = jnp.asarray(bm.view(np.int32))
        self.core = jnp.asarray(core_np.view(np.int32))
        # dedicated aligned hi-slice core table (column-sliced gathers from
        # the full-width table hit a 50×-slower misaligned path — measured)
        self.core_hi = jnp.asarray(
            np.ascontiguousarray(core_np[:, words - self.hi_words:])
            .view(np.int32))
        self.bhh = _hi_adj_bf16(self.core, words=words,
                                hi_words=self.hi_words)

        nat = _enum_tasks_native(bm, core_np, inb, ea, eb, c, lo_cut,
                                 self.hi_words, k)
        if nat is not None:
            y2hi, tri, lo = nat
        else:
            y2hi, tri, lo = _enum_tasks(bm, core_np, inb, ea, eb, c, lo_cut,
                                        self.hi_words, k)
        self.n_tri = int(tri.shape[0])
        self.n_lo = int(lo.shape[0])
        if k == 4:
            self.y2hi = jnp.asarray(_pad_rows(y2hi, slab, fill=0))
            self.trow = self.tcl = None
        else:
            self.y2hi = jnp.asarray(y2hi) if y2hi.size else \
                jnp.zeros((1, self.hi_words), jnp.int32)
            t2 = _pad_rows(tri, slab)
            self.trow = jnp.asarray(t2[:, 0])
            self.tcl = jnp.asarray(t2[:, 1])
        self.lo_cols = jnp.asarray(_pad_rows(lo, 4096)) if lo.size else None

        self.tail_total = 0
        if tail and (~case_a).any():
            self.tail_total = count_pattern(
                rg, clique_plan(k), chunk=4096,
                tasks=(src[~case_a], dst[~case_a]))

    # tasks per dispatch: long-running single dispatches trip the remote
    # runtime's RPC deadline (observed: a ~40k-slab k=5 dispatch killed the
    # worker); host-chunking bounds each dispatch.
    DISPATCH_TASKS = 16 << 20

    def _hi_total(self, *args) -> int:
        total = 0
        step = round_up(self.DISPATCH_TASKS, self.slab)
        n = args[0].shape[0]
        for s in range(0, n, step):
            if self.k == 4:
                (y2hi,) = args
                lohi = _edge_hi_bilinear(y2hi[s:s + step], self.bhh,
                                         hi_words=self.hi_words,
                                         slab=self.slab)
            else:
                trow, tcl = args
                lohi = _tri_hi_bilinear(self.y2hi, self.core_hi, self.bhh,
                                        trow[s:s + step], tcl[s:s + step],
                                        hi_words=self.hi_words,
                                        slab=self.slab)
            lohi = np.asarray(lohi, dtype=np.int64)
            total += int(lohi[:, 0].sum() + (lohi[:, 1].sum() << 16))
        return total

    def _hi_args(self):
        return (self.y2hi,) if self.k == 4 else (self.trow, self.tcl)

    def _lo_total(self) -> int:
        if self.lo_cols is None:
            return 0
        parts = _lo_popcount(self.bm, self.core, self.lo_cols,
                             words=self.words, chunk=4096,
                             nrow=int(self.lo_cols.shape[1]))
        return int(np.asarray(parts, dtype=np.int64).sum())

    def count(self) -> int:
        return (self._hi_total(*self._hi_args())
                + self._lo_total() + self.tail_total)

    def timed_slope(self, samples: int = 3):
        """Marginal k-clique edge throughput via the full-vs-half slope over
        the hi-bilinear pass (the dominant term; see stream.timed_slope)."""
        import time
        args_f = self._hi_args()
        n = args_f[0].shape[0]
        nh = max(self.slab, n // 2 // self.slab * self.slab)
        args_h = tuple(a[:nh] for a in args_f)
        _ = self._hi_total(*args_f)
        _ = self._hi_total(*args_h)
        tf, th = [], []
        for i in range(samples):
            t0 = time.time()
            _ = self._hi_total(*(jnp.roll(a, i + 1, axis=0)
                                 for a in args_f))
            tf.append(time.time() - t0)
            t0 = time.time()
            _ = self._hi_total(*(jnp.roll(a, i + 1, axis=0)
                                 for a in args_h))
            th.append(time.time() - t0)
        dt = min(tf) - min(th)
        # edge-equivalents: tasks for k=4 ARE edges; k=5 tasks are
        # triangles — report task throughput scaled back to case-A edges
        full_tasks = self.n_core_edges if self.k == 4 else self.n_tri
        de = full_tasks - min(nh, full_tasks)
        if dt < 0.1 * min(tf):
            # slope washed out by fixed dispatch costs — report the honest
            # dispatch-inclusive rate instead of an inflated quotient
            tasks_per_s = full_tasks / min(tf)
        else:
            tasks_per_s = de / dt
        scale = self.n_core_edges / max(full_tasks, 1)
        return {"edges_per_s": tasks_per_s * scale,
                "tasks_per_s": tasks_per_s,
                "latency_s": min(tf), "times_full": tf, "times_half": th}


def cliquek_count_fast(g, k: int, core: int = CORE, hi: int = HI) -> int:
    """Exact k-clique count (k = 4, 5) via the hi/lo MXU engine."""
    return CliqueKEngine(g, k, core=core, hi=hi).count()

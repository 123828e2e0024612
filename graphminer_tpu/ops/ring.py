"""Ring engine: memory-lean bucketed edge counting — O(V·row + E·4B) HBM.

Successor of the materialized stream (ops/stream.py, O(E·row_w) HBM — 3.28 GB
for rmat18, ~35 GB for LiveJournal). The ring engine holds every row ONCE and
pays per task only an int32 index or a short list slot, so LiveJournal-class
graphs fit a single chip:

* Phase C — tasks whose dst lands in the CORE (top `core` ids of the
  degree-ascending relabeled DAG; the large majority of oriented edges on
  power-law graphs). Tasks are grouped BY SRC (forward CSR order): each src's
  core bitmap row CB[u] is stored once per bucket row, and each task
  contributes one core-local dst index. Count = popcount(CB[u] & CORE[dst]).
  The 4096-row core table is 2 MB — VMEM-resident in the Pallas kernel
  (ops/pallas_ring.py); the XLA path uses a fused gather.
  Parity: the cached two-phase fetch+intersect of the reference GPU library
  (include/set_intersect.cuh:39-105, search.cuh:53-79) — the shared-memory
  cache becomes the VMEM-resident core table.

* Phase T — tasks whose dst is OUTSIDE the core: both endpoints are sub-core
  (low out-degree), so |N+(u) ∩ N+(v)| is a short sorted-LIST intersection.
  Per task the src's out-list is materialized at its true width class; the
  dst's out-list likewise. Broadcast-compare costs wa·wb per task — tracked
  to the real degrees by the (wa, wb) bucket classes, never max_degree.
  Parity: the merge intersection of VertexSet.h:265-289 as a batched
  vector op.

Both phases run in ONE fused dispatch returning int32 partial sums (or
per-task counts for workloads that need them, e.g. diamond's Σ C(tri_e, 2)).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..types import SENTINEL, cdiv, round_up

CORE = 4096
# src core-out-degree classes for phase C (dst-index slots per src row)
C_CLASSES = (4, 16, 64, 256, 1024, 4096)
# out-degree classes for phase T list rows
T_CLASSES = (8, 32, 128, 512, 2048)
# tasks per lax.map step (large: small steps serialize — prof_popcount.py)
TASK_BLOCK = 1 << 20


def _class_of(w: np.ndarray, classes) -> np.ndarray:
    b = np.asarray(classes)
    assert w.size == 0 or int(w.max()) <= classes[-1], \
        "width classes must cover the data (see _cover)"
    return b[np.searchsorted(classes, w, side="left")].astype(np.int32)


def _cover(classes, maxw: int):
    """Extend the class ladder (doubling) until it covers maxw."""
    out = [c for c in classes if c < maxw]
    top = out[-1] if out else 8
    while top < maxw:
        top *= 2
    out.append(top)
    return tuple(out)


@dataclasses.dataclass(frozen=True)
class CBucket:
    """Phase-C bucket: srcs whose core-out-degree class is `wc`."""
    wc: int
    src_bm: jax.Array    # int32 [n, words] core bitmaps, one row per src
    dst_loc: jax.Array   # int32 [n, wc] core-local dst ids, SENTINEL padded
    n_tasks: int
    row_tasks: Optional[np.ndarray] = None   # host int32 [n] tasks per row


@dataclasses.dataclass(frozen=True)
class TBucket:
    """Phase-T bucket: tasks with src out-class wa, dst out-class wb."""
    wa: int
    wb: int
    src_rows: jax.Array  # int32 [n, wa] sorted out-lists, SENTINEL padded
    dst_rows: jax.Array  # int32 [n, wb]
    n_tasks: int


@dataclasses.dataclass(frozen=True)
class RingLayout:
    core_bm: jax.Array   # int32 [C, words] core rows' bitmaps (closed core)
    words: int
    core_start: int
    core_size: int
    cbuckets: Tuple[CBucket, ...]
    tbuckets: Tuple[TBucket, ...]
    n_tasks: int         # total oriented edges
    n_core_tasks: int

    def nbytes(self) -> int:
        n = self.core_bm.size
        for b in self.cbuckets:
            n += b.src_bm.size + b.dst_loc.size
        for b in self.tbuckets:
            n += b.src_rows.size + b.dst_rows.size
        return n * 4


def _pack_bitmaps(cols_local: np.ndarray, row_of: np.ndarray, n_rows: int,
                  words: int) -> np.ndarray:
    """Scatter core-local column ids into packed uint32 bitmaps."""
    bm = np.zeros((n_rows, words), dtype=np.uint32)
    np.bitwise_or.at(bm, (row_of, cols_local >> 5),
                     np.uint32(1) << (cols_local & 31).astype(np.uint32))
    return bm.view(np.int32)


def build_ring(g, core: int = CORE, c_classes=C_CLASSES,
               t_classes=T_CLASSES) -> RingLayout:
    """g: undirected host graph (or already-oriented DAG). Relabels
    ascending by degree, orients, splits tasks into phase C / phase T."""
    rg = g if g.is_dag else g.relabel_by_degree(descending=False).orientation()
    v = rg.n_vertices
    c = min(core, v)
    cs = v - c
    words = round_up(max(1, cdiv(c, 32)), 8)

    deg = np.diff(rg.rowptr).astype(np.int64)
    src = np.repeat(np.arange(v, dtype=np.int64), deg)
    col = rg.colidx.astype(np.int64)
    in_core = col >= cs

    # ---- phase C: group core-dst tasks by src ------------------------------
    # rows are sorted ascending, core ids are the largest → the core part is
    # the row SUFFIX; per-src core out-degree:
    wc = np.bincount(src[in_core], minlength=v).astype(np.int64)
    csrc = np.nonzero(wc)[0]
    core_cols = (col[in_core] - cs).astype(np.int32)   # core-local, src-major
    core_src = src[in_core]
    # bitmaps of N+(u) ∩ core for every src that has core out-neighbors
    rank = np.full(v, -1, dtype=np.int64)
    rank[csrc] = np.arange(csrc.shape[0])
    src_bm_all = _pack_bitmaps(core_cols, rank[core_src], csrc.shape[0], words)

    starts = np.concatenate([[0], np.cumsum(wc[csrc])[:-1]])
    if csrc.size:
        c_classes = _cover(c_classes, int(wc[csrc].max()))
    cls = _class_of(wc[csrc], c_classes)
    cbuckets = []
    n_core_tasks = int(wc.sum())
    for k in c_classes:
        m = cls == k
        if not m.any():
            continue
        n_d = int(m.sum())
        n_pad = round_up(n_d, 8)
        dl = np.full((n_pad, k), SENTINEL, dtype=np.int32)
        st, ln = starts[m], wc[csrc][m]
        pos = st[:, None] + np.arange(k, dtype=np.int64)[None, :]
        valid = np.arange(k)[None, :] < ln[:, None]
        dl[:n_d][valid] = core_cols[np.minimum(pos, core_cols.shape[0] - 1)][valid]
        bm = np.zeros((n_pad, words), dtype=np.int32)
        bm[:n_d] = src_bm_all[m]
        rt = np.zeros(n_pad, dtype=np.int32)
        rt[:n_d] = ln
        cbuckets.append(CBucket(wc=k, src_bm=jnp.asarray(bm),
                                dst_loc=jnp.asarray(dl),
                                n_tasks=int(ln.sum()), row_tasks=rt))

    # ---- phase T: sub-core-dst tasks as (src list, dst list) pairs ---------
    tsrc = src[~in_core].astype(np.int64)
    tdst = col[~in_core].astype(np.int64)
    tbuckets = []
    if tsrc.size:
        t_classes = _cover(t_classes,
                           int(max(deg[tsrc].max(), deg[tdst].max())))
        wa = _class_of(deg[tsrc], t_classes)
        wb = _class_of(deg[tdst], t_classes)
        key = wa.astype(np.int64) * 65536 + wb
        order = np.lexsort((tdst, key))
        tsrc, tdst, key = tsrc[order], tdst[order], key[order]
        change = np.nonzero(np.diff(key))[0] + 1
        bstarts = np.concatenate([[0], change])
        bstops = np.concatenate([change, [key.shape[0]]])
        rowptr, colidx = rg.rowptr, rg.colidx
        for b, e in zip(bstarts, bstops):
            ka, kb = int(key[b] // 65536), int(key[b] % 65536)
            n_d = int(e - b)
            n_pad = round_up(n_d, 8)
            sr = _gather_lists(rowptr, colidx, tsrc[b:e], ka, n_pad)
            dr = _gather_lists(rowptr, colidx, tdst[b:e], kb, n_pad)
            tbuckets.append(TBucket(wa=ka, wb=kb, src_rows=jnp.asarray(sr),
                                    dst_rows=jnp.asarray(dr), n_tasks=n_d))

    core_rows = np.arange(cs, v, dtype=np.int64)
    cb_rank = np.zeros(c, dtype=np.int64)
    core_bm = np.zeros((c, words), dtype=np.uint32)
    # core rows: out-neighbors all in core (closure under ascending ids)
    cdeg = deg[core_rows]
    csrc2 = np.repeat(np.arange(c, dtype=np.int64), cdeg)
    ccol = np.concatenate([rg.colidx[rg.rowptr[x]:rg.rowptr[x + 1]]
                           for x in core_rows]) if cdeg.sum() else \
        np.empty(0, dtype=np.int32)
    del cb_rank
    if ccol.size:
        ccl = (ccol.astype(np.int64) - cs).astype(np.int32)
        assert ccl.min() >= 0, "core not closed under out-neighbors"
        np.bitwise_or.at(core_bm, (csrc2, ccl >> 5),
                         np.uint32(1) << (ccl & 31).astype(np.uint32))

    return RingLayout(core_bm=jnp.asarray(core_bm.view(np.int32)),
                      words=words, core_start=cs, core_size=c,
                      cbuckets=tuple(cbuckets), tbuckets=tuple(tbuckets),
                      n_tasks=int(col.shape[0]), n_core_tasks=n_core_tasks)


def _gather_lists(rowptr, colidx, vids: np.ndarray, width: int,
                  n_pad: int) -> np.ndarray:
    """[n_pad, width] out-lists (host gather), SENTINEL padded/truncated."""
    out = np.full((n_pad, width), SENTINEL, dtype=np.int32)
    st = rowptr[vids]
    ln = np.minimum(rowptr[vids + 1] - st, width)
    pos = st[:, None] + np.arange(width, dtype=np.int64)[None, :]
    valid = np.arange(width)[None, :] < ln[:, None]
    out[:vids.shape[0]][valid] = colidx[np.minimum(pos, colidx.shape[0] - 1)][valid]
    return out


# --------------------------------------------------------------------------
# count kernels (XLA path; the Pallas phase-C kernel is in pallas_ring.py)
# --------------------------------------------------------------------------

def _cbucket_partials(core_bm, src_bm, dst_loc, *, words: int, wc: int,
                      per_task: bool):
    """popcount(CB[u] & CORE[dst]) per task via fused gather."""
    c = core_bm.shape[0]
    n = src_bm.shape[0]
    # cap the [chunk, wc, words] gathered-row intermediate at ~64 MB in case
    # XLA materializes it (RESOURCE_EXHAUSTED observed at larger steps)
    chunk = max(8, min(TASK_BLOCK // max(wc * words // 8, 8),
                       (64 << 20) // (wc * words * 4)))
    n_chunks = cdiv(n, chunk)
    pad = n_chunks * chunk - n
    if pad:
        src_bm = jnp.concatenate([src_bm, jnp.zeros((pad, words), jnp.int32)])
        dst_loc = jnp.concatenate(
            [dst_loc, jnp.full((pad, wc), SENTINEL, jnp.int32)])
    sb = src_bm.reshape(n_chunks, chunk, words)
    dl = dst_loc.reshape(n_chunks, chunk, wc)

    def body(xs):
        s, d = xs
        ok = (d >= 0) & (d < c)
        rows = core_bm[jnp.where(ok, d, 0)]           # fused gather
        rows = jnp.where(ok[:, :, None], rows, 0)
        pc = jax.lax.population_count(s[:, None, :] & rows)
        if per_task:
            return jnp.sum(pc, axis=2, dtype=jnp.int32)   # [chunk, wc]
        return jnp.sum(pc, dtype=jnp.int32)

    return jax.lax.map(body, (sb, dl))


def _tbucket_partials(src_rows, dst_rows, *, wa: int, wb: int,
                      per_task: bool):
    """|list_a ∩ list_b| per task via broadcast compare."""
    n = src_rows.shape[0]
    chunk = max(8, TASK_BLOCK // max(wa * wb // 4, 8))
    n_chunks = cdiv(n, chunk)
    pad = n_chunks * chunk - n
    if pad:
        z = jnp.full((pad, wa), SENTINEL, jnp.int32)
        src_rows = jnp.concatenate([src_rows, z])
        dst_rows = jnp.concatenate(
            [dst_rows, jnp.full((pad, wb), SENTINEL, jnp.int32)])
    sa = src_rows.reshape(n_chunks, chunk, wa)
    sb = dst_rows.reshape(n_chunks, chunk, wb)

    def body(xs):
        a, b = xs
        m = (a[:, :, None] == b[:, None, :]) & (a != SENTINEL)[:, :, None]
        if per_task:
            return jnp.sum(m, axis=(1, 2), dtype=jnp.int32)  # [chunk]
        return jnp.sum(m, dtype=jnp.int32)

    return jax.lax.map(body, (sa, sb))


@functools.partial(jax.jit, static_argnames=("cspec", "tspec", "words"))
def _ring_partials(core_bm, carrays, tarrays, salt, *, cspec, tspec,
                   words: int):
    """ONE dispatch over all buckets → concatenated int32 partial sums.
    salt permutes the output order only (benchmark dispatch distinctness)."""
    outs = []
    for (src_bm, dst_loc), wc in zip(carrays, cspec):
        outs.append(_cbucket_partials(core_bm, src_bm, dst_loc, words=words,
                                      wc=wc, per_task=False))
    for (sr, dr), (wa, wb) in zip(tarrays, tspec):
        outs.append(_tbucket_partials(sr, dr, wa=wa, wb=wb, per_task=False))
    parts = jnp.concatenate(outs) if outs else jnp.zeros((1,), jnp.int32)
    return jnp.roll(parts, salt)


class RingEngine:
    """Prepared triangle counter over the ring layout.

    Parity: the fused fast path for src/triangle (omp_base.cc:5-27,
    bs_warp_edge.cuh) at O(V·row + E·4B) device memory."""

    def __init__(self, g, core: int = CORE, use_pallas: Optional[bool] = None):
        self.layout = build_ring(g, core=core)
        lay = self.layout
        self.carrays = tuple((b.src_bm, b.dst_loc) for b in lay.cbuckets)
        self.cspec = tuple(b.wc for b in lay.cbuckets)
        self.tarrays = tuple((b.src_rows, b.dst_rows) for b in lay.tbuckets)
        self.tspec = tuple((b.wa, b.wb) for b in lay.tbuckets)
        self.n_edges = lay.n_tasks
        # Pallas phase-C kernel (ops/pallas_ring.py) is explicit opt-in:
        # it is the fast path on direct-attached TPUs, but remote-tunneled
        # runtimes (axon) hang on Mosaic compilation — measured, see
        # pallas_ring.py docstring.
        self.use_pallas = bool(use_pallas)
        if self.use_pallas:
            from . import pallas_ring
            self._pallas = pallas_ring
        else:
            self._pallas = None

    def partials(self, salt: int = 0):
        if self._pallas is not None:
            return self._pallas.ring_partials(
                self.layout, self.carrays, self.cspec, self.tarrays,
                self.tspec, jnp.int32(salt))
        return _ring_partials(self.layout.core_bm, self.carrays, self.tarrays,
                              jnp.int32(salt), cspec=self.cspec,
                              tspec=self.tspec, words=self.layout.words)

    def count(self) -> int:
        from ..utils.profiling import PROFILER
        PROFILER.count("edge_tasks", self.n_edges)
        PROFILER.count("set_ops_level2", self.n_edges)  # 1 intersection/task
        with PROFILER.phase("device_count"):
            return int(np.asarray(self.partials(), dtype=np.int64).sum())

    def timed_count(self, iters: int = 8):
        """(count, seconds/iter) — `iters` salted back-to-back dispatches,
        ONE host pull inside the timed window (see stream.timed_count)."""
        import time
        _ = self.count()
        t0 = time.time()
        outs = [self.partials(salt=i + 1) for i in range(iters)]
        _ = np.asarray(outs[-1])
        dt = (time.time() - t0) / iters
        totals = [int(np.asarray(o, dtype=np.int64).sum()) for o in outs]
        if any(t != totals[0] for t in totals):
            raise RuntimeError(f"salted dispatches disagree: {totals}")
        return totals[0], dt

    def _frac(self, denom: int = 8) -> "RingEngine":
        """First-1/denom-rows view of every bucket (slope timing; the small
        fraction keeps the time delta well above tunnel jitter)."""
        h = lambda n: max(8, n // denom // 8 * 8)
        eng = object.__new__(RingEngine)
        eng.layout = self.layout
        eng.carrays = tuple((bm[: h(bm.shape[0])], dl[: h(dl.shape[0])])
                            for bm, dl in self.carrays)
        eng.cspec = self.cspec
        eng.tarrays = tuple((sr[: h(sr.shape[0])], dr[: h(dr.shape[0])])
                            for sr, dr in self.tarrays)
        eng.tspec = self.tspec
        eng._pallas = self._pallas
        eng.use_pallas = self.use_pallas
        eng.n_edges = (
            sum(int(b.row_tasks[: h(b.row_tasks.shape[0])].sum())
                for b in self.layout.cbuckets)
            + sum(min(b.n_tasks, h(b.src_rows.shape[0]))
                  for b in self.layout.tbuckets))
        return eng

    def timed_slope(self, samples: int = 5):
        """Marginal device throughput via the full-vs-half two-size slope
        (cancels the ~25 ms tunnel dispatch cost; see stream.timed_slope)."""
        import time
        half = self._frac(8)
        _ = self.count()
        _ = half.count()

        def sample(eng, salt):
            t0 = time.time()
            _ = np.asarray(eng.partials(salt=salt))
            return time.time() - t0

        tf, th = [], []
        for i in range(samples):
            tf.append(sample(self, 2 * i + 1))
            th.append(sample(half, 2 * i + 2))
        dt = min(tf) - min(th)
        de = self.n_edges - half.n_edges
        return {"edges_per_s": de / max(dt, 1e-9), "latency_s": min(tf),
                "times_full": tf, "times_half": th,
                "tasks_full": self.n_edges, "tasks_half": half.n_edges}


def triangle_count_ring(g, core: int = CORE, **kw) -> int:
    """Exact TC via the memory-lean ring engine."""
    return RingEngine(g, core=core, **kw).count()

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

* Phase T — tasks whose dst is OUTSIDE the core (both endpoints sub-core).
  |N+(u) ∩ N+(v)| = popcount(CB[u] & CB[v]) + |T[u] ∩ T[v]| over the hub
  row encoding: the bitmap part fused-gathers two rows per task from the
  O(V·words) bitmap table; the tail part gathers each side's SHORT tail
  from per-class tail tables (every vertex's tail stored ONCE at its own
  width class — memory O(E), never O(Σ tail²) like per-task list
  materialization would be). Parity: the merge intersection of
  VertexSet.h:265-289 as batched vector ops.

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
    """Phase-T tail-compare bucket: tasks where BOTH endpoints have
    non-empty tails, keyed by their tail-width classes. Carries only row
    slots into the per-class tail tables."""
    ta: int              # tail-table index for src side
    tv: int              # tail-table index for dst side
    src_slot: jax.Array  # int32 [n] row in tail_tables[ta], SENTINEL padded
    dst_slot: jax.Array  # int32 [n] row in tail_tables[tv]
    n_tasks: int


@dataclasses.dataclass(frozen=True)
class RingLayout:
    core_bm: jax.Array   # int32 [C, words] core rows' bitmaps (closed core)
    bm_table: Optional[jax.Array]  # int32 [V, words] all-vertex core bitmaps
    tail_tables: Tuple[jax.Array, ...]  # per-class [n_k, wt_k] sorted tails
    words: int
    core_start: int
    core_size: int
    cbuckets: Tuple[CBucket, ...]
    tbuckets: Tuple[TBucket, ...]
    t_src: Optional[jax.Array]   # int32 [nt] tail-task src ids (bm pass)
    t_dst: Optional[jax.Array]   # int32 [nt] tail-task dst ids
    n_tasks: int         # total oriented edges
    n_core_tasks: int

    def nbytes(self) -> int:
        n = self.core_bm.size
        if self.bm_table is not None:
            n += self.bm_table.size
        for t in self.tail_tables:
            n += t.size
        for b in self.cbuckets:
            n += b.src_bm.size + b.dst_loc.size
        for b in self.tbuckets:
            n += b.src_slot.size + b.dst_slot.size
        if self.t_src is not None:
            n += self.t_src.size + self.t_dst.size
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

    # ---- phase T: sub-core-dst tasks --------------------------------------
    # |N+(u) ∩ N+(v)| = popcount(CB[u] & CB[v]) + |T[u] ∩ T[v]|. The bitmap
    # part fused-gathers from bm_table [V, words]; the tail part gathers each
    # side's short tail from per-class tables (each tail stored ONCE).
    tsrc = src[~in_core].astype(np.int64)
    tdst = col[~in_core].astype(np.int64)
    tbuckets = []
    tail_tables = []
    bm_table = None
    t_src_d = t_dst_d = None
    if tsrc.size:
        # all-vertex core bitmaps (sub-core rows only are ever gathered, but
        # a single [V, words] table keeps indices direct)
        bm = np.zeros((v, words), dtype=np.uint32)
        np.bitwise_or.at(bm, (core_src, core_cols >> 5),
                         np.uint32(1) << (core_cols & 31).astype(np.uint32))
        bm_table = jnp.asarray(bm.view(np.int32))
        npad_t = round_up(tsrc.shape[0], 8)
        ts = np.full(npad_t, SENTINEL, np.int32)
        td = np.full(npad_t, SENTINEL, np.int32)
        ts[: tsrc.shape[0]] = tsrc
        td[: tdst.shape[0]] = tdst
        t_src_d, t_dst_d = jnp.asarray(ts), jnp.asarray(td)

        # tails: out-neighbors below cs = sorted row prefix, per vertex
        tw = np.bincount(src[~in_core], minlength=v).astype(np.int64)
        has = np.nonzero(tw)[0]
        classes = _cover(t_classes, int(tw[has].max())) if has.size else ()
        cls_idx = np.full(v, -1, dtype=np.int64)
        slot = np.full(v, -1, dtype=np.int64)
        widths = []
        for ki, k in enumerate(classes):
            mem = has[(_class_of(tw[has], classes) == k)]
            if mem.size == 0:
                widths.append(0)
                tail_tables.append(jnp.zeros((1, int(k)), jnp.int32))
                continue
            widths.append(int(k))
            cls_idx[mem] = ki
            slot[mem] = np.arange(mem.size)
            rows = _gather_lists(rg.rowptr, rg.colidx, mem, int(k),
                                 round_up(mem.size, 8))
            rows = np.where((rows != SENTINEL) & (rows < cs), rows, SENTINEL)
            tail_tables.append(jnp.asarray(rows))
        # tail-compare buckets: both sides with non-empty tails
        both = (tw[tsrc] > 0) & (tw[tdst] > 0)
        bs, bd = tsrc[both], tdst[both]
        if bs.size:
            key = cls_idx[bs] * 64 + cls_idx[bd]
            order = np.argsort(key, kind="stable")
            bs, bd, key = bs[order], bd[order], key[order]
            change = np.nonzero(np.diff(key))[0] + 1
            b0 = np.concatenate([[0], change])
            b1 = np.concatenate([change, [key.shape[0]]])
            for b, e in zip(b0, b1):
                ia, iv = int(key[b] // 64), int(key[b] % 64)
                n_d = int(e - b)
                n_pad = round_up(n_d, 8)
                sl_a = np.full(n_pad, SENTINEL, np.int32)
                sl_v = np.full(n_pad, SENTINEL, np.int32)
                sl_a[:n_d] = slot[bs[b:e]]
                sl_v[:n_d] = slot[bd[b:e]]
                tbuckets.append(TBucket(ta=ia, tv=iv,
                                        src_slot=jnp.asarray(sl_a),
                                        dst_slot=jnp.asarray(sl_v),
                                        n_tasks=n_d))

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
                      bm_table=bm_table, tail_tables=tuple(tail_tables),
                      words=words, core_start=cs, core_size=c,
                      cbuckets=tuple(cbuckets), tbuckets=tuple(tbuckets),
                      t_src=t_src_d, t_dst=t_dst_d,
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


def _bm_pairs_partials(bm_table, src, dst, *, words: int):
    """popcount(CB[u] & CB[v]) summed over flat tail tasks (fused gathers)."""
    v = bm_table.shape[0]
    n = src.shape[0]
    chunk = max(8, min(TASK_BLOCK, (64 << 20) // (2 * words * 4)))
    n_chunks = cdiv(n, chunk)
    pad = n_chunks * chunk - n
    if pad:
        src = jnp.concatenate([src, jnp.full((pad,), SENTINEL, jnp.int32)])
        dst = jnp.concatenate([dst, jnp.full((pad,), SENTINEL, jnp.int32)])
    ss = src.reshape(n_chunks, chunk)
    dd = dst.reshape(n_chunks, chunk)

    def body(xs):
        u, w = xs
        oku = (u >= 0) & (u < v)
        okw = (w >= 0) & (w < v)
        a = jnp.where(oku[:, None], bm_table[jnp.where(oku, u, 0)], 0)
        b = jnp.where(okw[:, None], bm_table[jnp.where(okw, w, 0)], 0)
        return jnp.sum(jax.lax.population_count(a & b), dtype=jnp.int32)

    return jax.lax.map(body, (ss, dd))


def _tail_pairs_partials(table_a, table_b, sa, sb, *, per_task: bool):
    """|T[u] ∩ T[v]| per task via per-class tail-table gathers + compare."""
    wa, wb = table_a.shape[1], table_b.shape[1]
    n = sa.shape[0]
    chunk = max(8, min(TASK_BLOCK // max(wa * wb // 8, 8),
                       (64 << 20) // ((wa + wb) * 4)))
    n_chunks = cdiv(n, chunk)
    pad = n_chunks * chunk - n
    if pad:
        sa = jnp.concatenate([sa, jnp.full((pad,), SENTINEL, jnp.int32)])
        sb = jnp.concatenate([sb, jnp.full((pad,), SENTINEL, jnp.int32)])
    aa = sa.reshape(n_chunks, chunk)
    bb = sb.reshape(n_chunks, chunk)
    na, nb = table_a.shape[0], table_b.shape[0]

    def body(xs):
        ia, ib = xs
        oka = (ia >= 0) & (ia < na)
        okb = (ib >= 0) & (ib < nb)
        ra = jnp.where(oka[:, None], table_a[jnp.where(oka, ia, 0)],
                       SENTINEL)
        rb = jnp.where(okb[:, None], table_b[jnp.where(okb, ib, 0)],
                       SENTINEL)
        m = (ra[:, :, None] == rb[:, None, :]) & (ra != SENTINEL)[:, :, None]
        if per_task:
            return jnp.sum(m, axis=(1, 2), dtype=jnp.int32)
        return jnp.sum(m, dtype=jnp.int32)

    return jax.lax.map(body, (aa, bb))


@functools.partial(jax.jit,
                   static_argnames=("cspec", "tspec", "words", "has_t"))
def _ring_partials(core_bm, carrays, bm_table, t_src, t_dst, tail_tables,
                   tslot_arrays, salt, *, cspec, tspec, words: int,
                   has_t: bool):
    """ONE dispatch over all buckets → concatenated int32 partial sums.
    salt permutes the output order only (benchmark dispatch distinctness)."""
    outs = []
    for (src_bm, dst_loc), wc in zip(carrays, cspec):
        outs.append(_cbucket_partials(core_bm, src_bm, dst_loc, words=words,
                                      wc=wc, per_task=False))
    if has_t:
        outs.append(_bm_pairs_partials(bm_table, t_src, t_dst, words=words))
        for (sa, sb), (ia, iv) in zip(tslot_arrays, tspec):
            outs.append(_tail_pairs_partials(tail_tables[ia],
                                             tail_tables[iv], sa, sb,
                                             per_task=False))
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
        self.tslot_arrays = tuple((b.src_slot, b.dst_slot)
                                  for b in lay.tbuckets)
        self.tspec = tuple((b.ta, b.tv) for b in lay.tbuckets)
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
        lay = self.layout
        if self._pallas is not None:
            return self._pallas.ring_partials(
                lay, self.carrays, self.cspec, self.tslot_arrays, self.tspec,
                jnp.int32(salt))
        bm = lay.bm_table if lay.bm_table is not None else lay.core_bm
        ts = lay.t_src if lay.t_src is not None else \
            jnp.full((8,), SENTINEL, jnp.int32)
        td = lay.t_dst if lay.t_dst is not None else ts
        return _ring_partials(lay.core_bm, self.carrays, bm, ts, td,
                              lay.tail_tables, self.tslot_arrays,
                              jnp.int32(salt), cspec=self.cspec,
                              tspec=self.tspec, words=lay.words,
                              has_t=lay.t_src is not None)

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
        lay = self.layout
        nt = lay.t_src.shape[0] if lay.t_src is not None else 0
        eng.layout = dataclasses.replace(
            lay,
            t_src=lay.t_src[: h(nt)] if nt else lay.t_src,
            t_dst=lay.t_dst[: h(nt)] if nt else lay.t_dst)
        eng.tslot_arrays = tuple((sa[: h(sa.shape[0])],
                                  sb[: h(sb.shape[0])])
                                 for sa, sb in self.tslot_arrays)
        eng.tspec = self.tspec
        eng._pallas = self._pallas
        eng.use_pallas = self.use_pallas
        n_t_half = min(h(nt), lay.n_tasks - lay.n_core_tasks) if nt else 0
        eng.n_edges = (
            sum(int(b.row_tasks[: h(b.row_tasks.shape[0])].sum())
                for b in self.layout.cbuckets) + n_t_half)
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

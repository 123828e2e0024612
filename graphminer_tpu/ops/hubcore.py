"""Hub-bitmap + closed-core MXU engine for edge-parallel counting.

TPU-first redesign of two reference strategies at once:
 * the cmap/ccode connectivity map (include/cmap.h — O(1) membership test)
   becomes a per-vertex PACKED BITMAP over the high-degree core, tested with
   vector AND + population_count on the VPU;
 * the matrix/ GEMM subsystem (src/matrix/omp_mm.cpp:104-215 — dense
   high-degree block counted via A@A ⊙ A) becomes an int8 MXU contraction
   over bit-expanded core bitmap rows.

Layout. Vertices are relabeled ascending by degree and the graph oriented
toward higher (degree, id) (graph.cc:233-279 semantics), so every out-edge
points to a HIGHER id and the core [V-C, V) is CLOSED under out-neighbors.
Each vertex row of the device table is

    [ CB: words int32 — bitmap of N+(v) ∩ core over the core universe
    | T : wt_pad int32 slots — N+(v) \\ core, sorted, SENTINEL padded ]

For an edge (u, v):
    |N+(u) ∩ N+(v)| = popcount(CB[u] & CB[v]) + |T[u] ∩ T[v]|
and T[v] is empty whenever v is in the core (closure), so mixed edges are
pure popcount. Core-core edges never become tasks at all — the masked MXU
product counts them in bulk:
    Σ_{(u,v) ∈ E_core} |N+(u) ∩ N+(v)| = Σ_uv (A Aᵀ)_uv ⊙ A_uv
(out-row intersection = row·row dot, hence A Aᵀ masked by A).

Cost per task edge: two row gathers (~10-25 ns — the TPU gather wall) +
128-word popcount (~0.5 ns) + a narrow broadcast-compare (tails are short
because high-degree targets live in the bitmap). All bucket groups run in
ONE dispatch; partial sums return as an int32 vector summed on the host in
Python ints (exact for arbitrarily large totals; device int64 is unavailable
without x64 mode).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..types import SENTINEL, round_up, cdiv

# T-slot width classes (powers of four — tails are short by design).
T_CLASSES = (0, 16, 64, 256, 1024, 4096)
DEFAULT_CORE = 4096
DEFAULT_CHUNK = 32768
SMALL_CHUNK = 4096


# --------------------------------------------------------------------------
# layout construction (host, vectorized numpy — one-time per graph)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class HubLayout:
    """Device-resident hub-bitmap table for a degree-ascending oriented DAG."""
    table: jax.Array        # int32 [V, words + wt_pad]
    words: int              # core bitmap words (= padded C/32)
    core_start: int         # cs; core = ids [cs, V)
    core_size: int          # C = V - cs
    wt_pad: int             # padded T width (0 if no vertex has a tail)
    t_width: np.ndarray     # host int32 [V] — true T width per vertex
    n_vertices: int

    @property
    def row_width(self) -> int:
        return self.words + self.wt_pad


def build_hub_layout(g, core: int = DEFAULT_CORE) -> HubLayout:
    """g must be relabel_by_degree(descending=False).orientation() output."""
    assert g.is_dag, "hub layout requires the oriented DAG"
    v = g.n_vertices
    c = min(core, v)
    cs = v - c
    words = round_up(max(1, cdiv(c, 32)), 8)

    deg = np.diff(g.rowptr).astype(np.int64)
    src = np.repeat(np.arange(v, dtype=np.int64), deg)
    col = g.colidx.astype(np.int64)

    is_core_nb = col >= cs
    # T width per vertex = # out-neighbors below cs. Rows are sorted
    # ascending and core ids are the largest, so T is the row PREFIX.
    t_width = np.bincount(src[~is_core_nb], minlength=v).astype(np.int32)
    wt_max = int(t_width.max(initial=0))
    wt_pad = round_up(max(8, wt_max), 8) if wt_max else 0

    table = np.zeros((v, words + wt_pad), dtype=np.uint32)
    cu = src[is_core_nb]
    cc = col[is_core_nb] - cs
    np.bitwise_or.at(table, (cu, cc >> 5),
                     np.uint32(1) << (cc & 31).astype(np.uint32))
    if wt_pad:
        tpart = np.full((v, wt_pad), SENTINEL, dtype=np.int32)
        tu = src[~is_core_nb]
        tv = col[~is_core_nb].astype(np.int32)
        row_starts = np.concatenate(
            [[0], np.cumsum(t_width, dtype=np.int64)[:-1]])
        slot = np.arange(tu.shape[0], dtype=np.int64) - row_starts[tu]
        tpart[tu, slot] = tv
        table[:, words:] = tpart.view(np.uint32)

    table_d = jax.device_put(table.view(np.int32))
    return HubLayout(table=table_d, words=words, core_start=cs, core_size=c,
                     wt_pad=wt_pad, t_width=t_width, n_vertices=v)


# --------------------------------------------------------------------------
# task bucketing (host)
# --------------------------------------------------------------------------

def t_class_of(w: np.ndarray) -> np.ndarray:
    """Smallest T_CLASSES entry >= w (0 stays 0)."""
    bounds = np.asarray(T_CLASSES)
    idx = np.searchsorted(bounds, w, side="left")
    return bounds[idx].astype(np.int32)


# group kinds
KIND_COREDST = 0   # dst in core: popcount-only, v-row from the small core
                   # table (VMEM-scale -> ~5x cheaper gather), sorted by src
KIND_MIXED = 1     # either T empty: popcount-only, generic gathers
KIND_TT = 2        # both T nonempty: popcount + tail broadcast-compare


def bucket_tail_tasks(layout: HubLayout, src: np.ndarray, dst: np.ndarray):
    """Group non-core-core edge tasks for the fused dispatch:

    * KIND_COREDST — dst in the core (T[dst] empty by closure): kernel is
      popcount-only and the v-side bitmap comes from the [C, words] core
      slice, small enough that XLA's gather runs at VMEM-resident speed.
      Sorted by src (CSR order -> sorted+repeated u-gather).
    * KIND_MIXED — either endpoint's T empty for another reason:
      popcount-only with generic gathers.
    * KIND_TT — both T nonempty: bucketed by (t_class(wt_u), t_class(wt_v)),
      sorted by dst for gather locality.

    Returns a list of (src_tasks, dst_tasks, kind, wa, wb)."""
    cs = layout.core_start
    wtu = layout.t_width[src]
    wtv = layout.t_width[dst]
    coredst = dst >= cs
    poponly = (np.minimum(wtu, wtv) == 0) & ~coredst
    tt = ~coredst & ~poponly
    groups = []
    if coredst.any():
        s, d = src[coredst], dst[coredst]
        o = np.argsort(s, kind="stable")
        groups.append((s[o], d[o], KIND_COREDST, 0, 0))
    if poponly.any():
        s, d = src[poponly], dst[poponly]
        o = np.argsort(d, kind="stable")
        groups.append((s[o], d[o], KIND_MIXED, 0, 0))
    if tt.any():
        s, d = src[tt], dst[tt]
        wa = t_class_of(layout.t_width[s])
        wb = t_class_of(layout.t_width[d])
        key = wa.astype(np.int64) * 8192 + wb
        o = np.lexsort((d, key))
        s, d, key = s[o], d[o], key[o]
        change = np.nonzero(np.diff(key))[0] + 1
        starts = np.concatenate([[0], change])
        stops = np.concatenate([change, [key.shape[0]]])
        for b, e in zip(starts, stops):
            groups.append((s[b:e], d[b:e], KIND_TT,
                           int(key[b] // 8192), int(key[b] % 8192)))
    return groups


def pack_groups(groups, chunk: int = DEFAULT_CHUNK):
    """Pad each group's task arrays to a chunk multiple, reshape to
    [n_chunks, chunk], and ship to device. Small groups drop to SMALL_CHUNK
    to bound padding waste (two chunk shapes total → few compiled variants).
    Returns (device_arrays, static_spec); spec = ((kind, wa, wb, ck), ...)."""
    arrs, spec = [], []
    for src, dst, kind, wa, wb in groups:
        n = src.shape[0]
        ck = chunk if n > chunk // 2 else min(SMALL_CHUNK, chunk)
        n_chunks = max(1, cdiv(n, ck))
        pad = n_chunks * ck - n
        s = np.pad(src.astype(np.int32), (0, pad), constant_values=SENTINEL)
        d = np.pad(dst.astype(np.int32), (0, pad), constant_values=SENTINEL)
        arrs.append((jnp.asarray(s.reshape(n_chunks, ck)),
                     jnp.asarray(d.reshape(n_chunks, ck))))
        spec.append((kind, wa, wb, ck))
    return tuple(arrs), tuple(spec)


# --------------------------------------------------------------------------
# device kernels
# --------------------------------------------------------------------------

def _gather_rows(table, ids, width: int, words: int):
    """Gather [B, width] prefix rows; invalid ids (e.g. SENTINEL task
    padding) -> bitmap part 0 and T part SENTINEL, contributing exactly 0."""
    v = table.shape[0]
    safe = jnp.clip(ids, 0, v - 1)
    ok = (ids >= 0) & (ids < v)
    rows = table[:, :width][safe]
    bm = jnp.where(ok[:, None], rows[:, :words], 0)
    if width > words:
        t = jnp.where(ok[:, None], rows[:, words:], SENTINEL)
        return bm, t
    return bm, None


def _chunk_counts(table, words: int, kind: int, wa: int, wb: int,
                  core_start: int, su, dv):
    """Per-chunk int32 Σ of |N+(u) ∩ N+(v)| over the task chunk (su, dv)."""
    bmu, tu = _gather_rows(table, su, words + wa, words)
    if kind == KIND_COREDST:
        # v-side bitmap from the small [C, words] core slice — C is a few
        # thousand rows, so the gather runs at VMEM-resident speed
        ctable = table[core_start:, :words]
        c = ctable.shape[0]
        ci = dv - core_start
        ok = (ci >= 0) & (ci < c)
        bmv = jnp.where(ok[:, None], ctable[jnp.clip(ci, 0, c - 1)], 0)
        tv = None
    else:
        bmv, tv = _gather_rows(table, dv, words + wb, words)
    hub = jnp.sum(jax.lax.population_count(bmu & bmv), dtype=jnp.int32)
    if tu is None or tv is None:
        return hub
    # broadcast-compare tail intersection; a-side SENTINEL slots are invalid
    # (real ids never equal SENTINEL, so b-side padding can't false-match)
    m = jnp.any(tu[:, :, None] == tv[:, None, :], axis=-1) & (tu != SENTINEL)
    return hub + jnp.sum(m, dtype=jnp.int32)


def _tail_partials_body(table, group_arrays, spec, words: int,
                        core_start: int):
    outs = []
    for (schunks, dchunks), (kind, wa, wb, _ck) in zip(group_arrays, spec):
        body = functools.partial(_chunk_counts, table, words, kind, wa, wb,
                                 core_start)
        outs.append(jax.lax.map(lambda xs: body(xs[0], xs[1]),
                                (schunks, dchunks)))
    return jnp.concatenate(outs) if outs else jnp.zeros((1,), jnp.int32)


@functools.partial(jax.jit, static_argnames=("spec", "words", "core_start"))
def _tail_partials(table, group_arrays, *, spec, words: int,
                   core_start: int):
    """ONE dispatch over all bucket groups -> int32 per-chunk partial sums
    concatenated across groups. Per-chunk bound: chunk * max_count < 2^31."""
    return _tail_partials_body(table, group_arrays, spec, words, core_start)


@functools.partial(jax.jit, static_argnames=("words", "c", "tile"))
def _core_gemm_partials(table, *, words: int, c: int, tile: int):
    """Σ (A Aᵀ) ⊙ A over the closed core via int8 MXU, from bit-expanded
    bitmap rows. Returns per-ROW int32 partials [n_tiles * tile] (row sums
    are < deg·C <= C² < 2^31; the host sums them exactly).

    Exactness: int8 0/1 operands, dot length words*32 < 2^24, int32
    accumulation on the MXU (verified bit-exact vs numpy)."""
    v = table.shape[0]
    cb = table[v - c:, :words]  # [c, words] bitmap rows of core vertices
    cpad = words * 32
    n_tiles = cdiv(c, tile)
    rpad = n_tiles * tile - c
    shifts = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 32), 2)

    def expand(rows):  # [n, words] int32 -> [n, words*32] int8 0/1
        bits = jax.lax.shift_right_logical(rows[:, :, None], shifts) & 1
        return bits.reshape(rows.shape[0], cpad).astype(jnp.int8)

    dense = expand(cb)              # [c, cpad]; bit j == core vertex j
    if rpad:
        dense_rows = jnp.pad(dense, ((0, rpad), (0, 0)))
    else:
        dense_rows = dense

    def body(i, acc):
        rows = jax.lax.dynamic_slice(dense_rows, (i * tile, 0), (tile, cpad))
        # out-row intersection: (A Aᵀ)[u, v] = Σ_w A[u, w] A[v, w]
        prod = jax.lax.dot_general(rows, dense, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        mask = rows[:, :c]          # A[u, v] — bit v of u's row
        masked = prod * mask.astype(jnp.int32)
        rowsums = jnp.sum(masked, axis=1, dtype=jnp.int32)   # [tile]
        return jax.lax.dynamic_update_slice(acc, rowsums, (i * tile,))

    init = jnp.zeros((n_tiles * tile,), jnp.int32)
    return jax.lax.fori_loop(0, n_tiles, body, init)


def _core_gemm_body(table, words: int, c: int, tile: int):
    """Non-jit body shared by the standalone and fused entry points."""
    return _core_gemm_partials.__wrapped__(table, words=words, c=c, tile=tile)


@functools.partial(jax.jit, static_argnames=("spec", "words", "core_start",
                                             "c", "tile"))
def _fused_partials(table, group_arrays, *, spec, words: int,
                    core_start: int, c: int, tile: int):
    """Tail groups + core GEMM in ONE dispatch -> (tail_partials,
    core_partials). Saves a tunnel round-trip per count."""
    tails = _tail_partials_body(table, group_arrays, spec, words, core_start)
    cores = _core_gemm_body(table, words, c, tile)
    return tails, cores


# --------------------------------------------------------------------------
# engine
# --------------------------------------------------------------------------

class TriangleEngine:
    """Prepared single-dispatch triangle counter over the hub layout.

    Parity: the fused fast path for src/triangle (omp_base.cc:5-27 /
    bs_warp_edge.cuh) and src/matrix/omp_mm.cpp in one engine. The heavy
    prep (relabel, orient, layout build, bucketing) happens once; count()
    runs one tail dispatch + one core dispatch."""

    def __init__(self, g, core: int = DEFAULT_CORE,
                 chunk: int = DEFAULT_CHUNK):
        if g.is_dag:
            raise ValueError("TriangleEngine wants the undirected graph")
        rg = g.relabel_by_degree(descending=False).orientation()
        self.g = rg
        self.layout = build_hub_layout(rg, core=core)
        lay = self.layout
        src, dst = rg.edge_list()
        cs = lay.core_start
        tail = (src < cs) | (dst < cs)
        groups = bucket_tail_tasks(lay, src[tail], dst[tail])
        self.group_arrays, self.spec = pack_groups(groups, chunk=chunk)
        self.n_tail_tasks = int(tail.sum())
        self._tile = 256

    def count_tail(self) -> int:
        lay = self.layout
        if not self.group_arrays:
            return 0
        parts = _tail_partials(lay.table, self.group_arrays,
                               spec=self.spec, words=lay.words,
                               core_start=lay.core_start)
        return int(np.asarray(parts, dtype=np.int64).sum())

    def count_core(self) -> int:
        lay = self.layout
        if lay.core_size < 2:
            return 0
        parts = _core_gemm_partials(lay.table, words=lay.words,
                                    c=lay.core_size, tile=self._tile)
        return int(np.asarray(parts, dtype=np.int64).sum())

    def count(self) -> int:
        lay = self.layout
        if not self.group_arrays:
            return self.count_core()
        if lay.core_size < 2:
            return self.count_tail()
        tails, cores = _fused_partials(lay.table, self.group_arrays,
                                       spec=self.spec, words=lay.words,
                                       core_start=lay.core_start,
                                       c=lay.core_size, tile=self._tile)
        return (int(np.asarray(tails, dtype=np.int64).sum())
                + int(np.asarray(cores, dtype=np.int64).sum()))


def triangle_count_fast(g, core: int = DEFAULT_CORE,
                        chunk: int = DEFAULT_CHUNK) -> int:
    """Exact TC via the hub-bitmap + closed-core MXU engine."""
    return TriangleEngine(g, core=core, chunk=chunk).count()

"""Set-algebra kernel vocabulary over padded sorted vertex rows (pure XLA).

This is the TPU redesign of the reference's L2 layer — VertexSet.h:265-342
(intersection_set/num, difference_set/num, *_except, bounded) and the CUDA
mirror include/set_intersect.cuh / set_difference.cuh. Instead of per-warp
merge/binary-search loops, every op is a batched dense computation over tiles:

  a : int32 [B, Da]  "query" side — any order, invalid slots = SENTINEL
  b : int32 [B, Db]  "base"  side — sorted ascending, SENTINEL-padded tail

Invariant (replaces VertexSet buffer pooling): original CSR adjacency rows are
always the sorted b-side; derived sets (partial-embedding candidate sets) stay
on the a-side as SENTINEL-masked rows and never need re-sorting.

Two backends:
  * bc — all-pairs broadcast compare, O(Da·Db) pure VPU ops, no gathers.
        Wins for small widths (the common case after DAG orientation).
  * bs — vectorized binary search (log2 Db compare+gather steps).
        Wins for large Db.
The gather-free fast paths (hub bitmaps, streams, the ring engine) live in
ops/hubcore.py, ops/stream.py and ops/ring.py; this module is the generic
vocabulary the plan-interpreting frontier engine uses.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..types import SENTINEL

# Width product above which the binary-search backend is selected by "auto"
# on CPU. On TPU the broadcast backend wins at every width we ever use: the
# bs backend's take_along_axis gathers run at ~1e8 elem/s on TPU (measured)
# while the VPU does compare+reduce at ~1e11+/s, so bc is ~always right there.
_BC_THRESHOLD = 128 * 256


def _default_backend() -> str:
    return "bc" if jax.default_backend() != "cpu" else "auto_cpu"


def _valid(a: jax.Array, upper: Optional[jax.Array]) -> jax.Array:
    v = a != SENTINEL
    if upper is not None:
        up = upper if upper.ndim == a.ndim else upper[:, None]
        v &= a < up
    return v


def _member_bc(a: jax.Array, b: jax.Array) -> jax.Array:
    """[B, Da] bool: a[i,j] ∈ b[i,:]. Broadcast compare (no gathers)."""
    return jnp.any(a[:, :, None] == b[:, None, :], axis=-1)


def _member_bs(a: jax.Array, b: jax.Array) -> jax.Array:
    """[B, Da] bool via branchless vectorized binary search in sorted b."""
    db = b.shape[-1]
    nbits = max(1, (db - 1).bit_length())
    pos = jnp.zeros(a.shape, dtype=jnp.int32)
    # classic power-of-two descent: find last position with b[pos] <= a
    for shift in range(nbits - 1, -1, -1):
        cand = pos + (1 << shift)
        cand_ok = cand < db
        bv = jnp.take_along_axis(b, jnp.minimum(cand, db - 1), axis=-1)
        pos = jnp.where(cand_ok & (bv <= a), cand, pos)
    b0 = jnp.take_along_axis(b, pos, axis=-1)
    return b0 == a


def member(a: jax.Array, b: jax.Array, backend: str = "auto") -> jax.Array:
    """Membership mask of a's slots in sorted rows b. SENTINEL slots -> False
    is NOT guaranteed here (SENTINEL matches SENTINEL padding); callers mask
    with _valid. Use the public ops below unless you know what you're doing."""
    if backend == "auto":
        backend = _default_backend()
    if backend == "auto_cpu":
        backend = "bc" if a.shape[-1] * b.shape[-1] <= _BC_THRESHOLD else "bs"
    if backend == "bc":
        return _member_bc(a, b)
    if backend == "bs":
        return _member_bs(a, b)
    raise ValueError(f"unknown setops backend {backend!r}; use auto|bc|bs")


# ---- public vocabulary ---------------------------------------------------

def intersect_count(a: jax.Array, b: jax.Array,
                    upper: Optional[jax.Array] = None,
                    backend: str = "auto") -> jax.Array:
    """|a ∩ b| per row, counting only a-values < upper. → int32 [B].

    Parity: intersection_num / intersection_num(…,upper) VertexSet.h:278-289."""
    m = member(a, b, backend) & _valid(a, upper)
    return jnp.sum(m, axis=-1, dtype=jnp.int32)


def intersect(a: jax.Array, b: jax.Array,
              upper: Optional[jax.Array] = None,
              backend: str = "auto") -> jax.Array:
    """a ∩ b as a SENTINEL-masked copy of a (order preserved).

    Parity: intersection_set VertexSet.h:265-276."""
    m = member(a, b, backend) & _valid(a, upper)
    return jnp.where(m, a, SENTINEL)


def difference_count(a: jax.Array, b: jax.Array,
                     upper: Optional[jax.Array] = None,
                     backend: str = "auto") -> jax.Array:
    """|a \\ b| per row (a-values < upper only). → int32 [B].

    Parity: difference_num VertexSet.h:303-318."""
    m = ~member(a, b, backend) & _valid(a, upper)
    return jnp.sum(m, axis=-1, dtype=jnp.int32)


def difference(a: jax.Array, b: jax.Array,
               upper: Optional[jax.Array] = None,
               backend: str = "auto") -> jax.Array:
    """a \\ b as a SENTINEL-masked copy of a.

    Parity: difference_set VertexSet.h:291-301."""
    m = ~member(a, b, backend) & _valid(a, upper)
    return jnp.where(m, a, SENTINEL)


def bounded(a: jax.Array, upper: jax.Array) -> jax.Array:
    """Keep only values strictly below upper (symmetry-break truncation).

    Parity: VertexSet::bounded VertexSet.h:240-255 (binary-search truncation —
    here a mask; semantics identical)."""
    up = upper if upper.ndim == a.ndim else upper[:, None]
    return jnp.where(a < up, a, SENTINEL)


def exclude(a: jax.Array, ancestors: jax.Array) -> jax.Array:
    """Remove explicit ancestor vertices (the *_except variants,
    VertexSet.h:320-342). ancestors: int32 [B, K]."""
    hit = jnp.any(a[:, :, None] == ancestors[:, None, :], axis=-1)
    return jnp.where(hit, SENTINEL, a)


def count_valid(a: jax.Array, upper: Optional[jax.Array] = None) -> jax.Array:
    """Number of live slots per row. → int32 [B]."""
    return jnp.sum(_valid(a, upper), axis=-1, dtype=jnp.int32)


def connected(x: jax.Array, b: jax.Array, backend: str = "auto") -> jax.Array:
    """[B] bool: scalar-per-row x ∈ sorted row b (edge test)."""
    m = member(x[:, None], b, backend)[:, 0]
    return m & (x != SENTINEL)

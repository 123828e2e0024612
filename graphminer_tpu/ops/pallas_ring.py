"""Pallas TPU kernel for the ring engine's phase C — VMEM-resident core.

The XLA phase-C path (ops/ring.py) pays the row-gather wall (~50-100M
tasks/s measured) fetching core rows per task. This kernel removes it: the
2 MB core-bitmap table lives in VMEM for the whole launch (constant-index
BlockSpec → fetched once), src bitmap rows stream through the normal Pallas
pipeline, and per-task dst rows are direct VMEM reads at scalar-prefetched
indices — the TPU analogue of the reference's shared-memory cached
binary-search intersection (include/set_intersect.cuh:39-105,
search.cuh:53-79).

Status (round 5): EXECUTED ON HARDWARE, EXACT. The rounds-3/4 tunnel
Mosaic compile hang is fixed by the runtime's new AOT compile helper
(scripts/repro_mosaic_hang.py now passes in 0.8 s); this kernel ran the
full ring phase C on the chip with exact golden counts — rmat14
(2,860,691) and rmat18 (82,947,332), 2026-08-21. Scalar-prefetch operands
must fit the 1 MB SMEM, so big buckets split into <= SMEM_IDS-index
launches.

Performance: this v1 kernel is scalar-loop-bound (sequential per-slot
row reads inside fori_loop) — measured 0.8M edge-tasks/s vs the fused XLA
stream path's 134M on the same rmat18 ring layout. RingEngine therefore
still defaults to use_pallas=False; the kernel stands as the working
Pallas on-ramp (correctness-proven on hardware), and the production hot
path remains the word-span-sliced XLA stream (ops/stream.py, ~1.3-2.9B
edge-tasks/s).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..types import SENTINEL, cdiv

BLK = 256            # src rows per grid step


def _kernel(dloc_ref, src_ref, core_ref, out_ref, *, wc: int, words: int):
    """One grid step: BLK src rows × wc dst slots.

    dloc_ref: scalar-prefetched flat [n * wc] core-local dst ids.
    src_ref:  [BLK, words] src bitmaps (pipelined VMEM block).
    core_ref: [C, words] core table (constant block — resident).
    out_ref:  [n_steps, 1] int32 SMEM partial sums (full-array block:
              Mosaic requires the last two block dims divisible by (8, 128)
              or equal to the array dims — a per-step (1, 1) block is
              rejected; the sequential grid writes one slot per step)."""
    step = pl.program_id(0)
    base = step * BLK * wc
    c = core_ref.shape[0]

    def row_body(r, acc):
        srow = src_ref[pl.ds(r, 1), :]

        def slot_body(s, a):
            idx = dloc_ref[base + r * wc + s]
            ok = (idx >= 0) & (idx < c)
            row = core_ref[pl.ds(jnp.where(ok, idx, 0), 1), :]
            pc = jnp.sum(jax.lax.population_count(srow & row),
                         dtype=jnp.int32)
            return a + jnp.where(ok, pc, 0)

        return jax.lax.fori_loop(0, wc, slot_body, acc)

    out_ref[step, 0] = jax.lax.fori_loop(0, BLK, row_body, jnp.int32(0))


try:  # pallas imports kept local-failure-safe (CPU-only wheels)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


#: max scalar-prefetch indices per launch — the flat dst_loc operand lives
#: in SMEM (1 MB on v5e; measured hard error beyond it), so big buckets
#: split into multiple launches of <= SMEM_IDS indices
SMEM_IDS = 1 << 17


def cbucket_partials_pallas(core_bm, src_bm, dst_loc, *, words: int, wc: int,
                            interpret: bool = False):
    """Phase-C partial sums [n_steps] int32 via the VMEM-core kernel.

    Traced with x64 OFF: the package enables global x64 (exact int64 host
    accumulation), but under x64 the kernel's Python-int index arithmetic
    promotes to i64 and Mosaic's i64→i32 convert fallback recurses
    infinitely (observed RecursionError in _convert_element_type_lowering_
    rule). All kernel math is explicit int32."""
    assert HAVE_PALLAS
    rows = max(BLK, SMEM_IDS // max(wc, 1) // BLK * BLK)
    with jax.enable_x64(False):
        if src_bm.shape[0] <= rows:
            return _cbucket_partials_pallas_x32(
                core_bm, src_bm, dst_loc, words=words, wc=wc,
                interpret=interpret)
        outs = [
            _cbucket_partials_pallas_x32(
                core_bm, src_bm[s:s + rows], dst_loc[s:s + rows],
                words=words, wc=wc, interpret=interpret)
            for s in range(0, src_bm.shape[0], rows)]
        return jnp.concatenate(outs)


def _cbucket_partials_pallas_x32(core_bm, src_bm, dst_loc, *, words: int,
                                 wc: int, interpret: bool = False):
    n = src_bm.shape[0]
    npad = cdiv(n, BLK) * BLK
    if npad > n:
        src_bm = jnp.concatenate(
            [src_bm, jnp.zeros((npad - n, words), jnp.int32)])
        dst_loc = jnp.concatenate(
            [dst_loc, jnp.full((npad - n, wc), SENTINEL, jnp.int32)])
    n_steps = npad // BLK
    c = core_bm.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((BLK, words), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, words), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_steps, 1), lambda i, s: (0, 0),
                               memory_space=pltpu.SMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, wc=wc, words=words),
        out_shape=jax.ShapeDtypeStruct((n_steps, 1), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(dst_loc.reshape(-1), src_bm, core_bm)
    return out.reshape(-1)


def ring_partials(layout, carrays, cspec, barrays, bspec, tslot_arrays,
                  tspec, salt, interpret: bool = False):
    """Drop-in for ring._ring_partials with the Pallas phase-C kernel;
    the phase-T bitmap buckets and tail tables stay on the XLA path (the
    dense rank-indexed [len(csrc), words] bm_table does not fit VMEM; see
    module docstring)."""
    from . import ring as _ring
    outs = []
    for (src_bm, dst_loc), wc in zip(carrays, cspec):
        outs.append(cbucket_partials_pallas(
            layout.core_bm, src_bm, dst_loc, words=layout.words, wc=wc,
            interpret=interpret))
    for (src_bm, dst_loc), wc in zip(barrays, bspec):
        outs.append(_ring._cbucket_partials(
            layout.bm_table, src_bm, dst_loc, words=layout.words, wc=wc,
            per_task=False))
    for (sa, sb), (ia, iv) in zip(tslot_arrays, tspec):
        outs.append(_ring._tail_pairs_partials(
            layout.tail_tables[ia], layout.tail_tables[iv], sa, sb,
            per_task=False))
    parts = jnp.concatenate(outs) if outs else jnp.zeros((1,), jnp.int32)
    return jnp.roll(parts, salt)

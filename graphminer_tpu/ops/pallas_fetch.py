"""Pallas row-fetch primitives: explicit double-buffered DMA of adjacency
rows from an HBM table, bypassing XLA's gather lowering.

Measured motivation: XLA row-gather from a [V, W] table tops out around
4e7 rows/s on v5e (25ns/row equivalent), far below what pipelined DMA can do.
This module provides the building block used by the fused intersect kernels:
stream an index list, keep N_BUF row DMAs in flight, hand each arrived row to
a compute callback.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fetch_sum_kernel(idx_ref, table_ref, out_ref, scratch, sems, *,
                      block: int, n_buf: int):
    """Sum table rows given by idx (demo/microbench kernel).

    idx_ref: [T] int32 in SMEM (scalar prefetch); table_ref: [V, W] in HBM;
    scratch: [n_buf, W] VMEM; out_ref: [1, W] VMEM accumulator."""
    t = idx_ref.shape[0]

    def get_dma(slot, i):
        return pltpu.make_async_copy(
            table_ref.at[idx_ref[i]], scratch.at[slot], sems.at[slot])

    for i in range(min(n_buf, t)):
        # jnp.int32 wrappers: x64 mode would otherwise make these i64 consts
        get_dma(jnp.int32(i), jnp.int32(i)).start()

    def body(i, acc):
        slot = jax.lax.rem(i, jnp.int32(n_buf))
        get_dma(slot, i).wait()
        acc = acc + scratch[slot]

        @pl.when(i + n_buf < t)
        def _():
            get_dma(slot, i + jnp.int32(n_buf)).start()

        return acc

    # int32 bounds keep loop indices i32 under x64 mode (Mosaic requires i32)
    acc = jax.lax.fori_loop(jnp.int32(0), jnp.int32(t), body,
                            jnp.zeros_like(out_ref[0]))
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("n_buf",))
def fetch_rows_sum(idx: jax.Array, table: jax.Array, n_buf: int = 8):
    """Microbenchmark entry: Σ_i table[idx[i]] via pipelined row DMA."""
    t = idx.shape[0]
    v, w = table.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_buf, w), jnp.int32),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
    )
    kernel = functools.partial(_fetch_sum_kernel, block=t, n_buf=n_buf)
    # The package enables global x64 (exact int64 count accumulation), but
    # Mosaic requires i32 index maps — trace the pallas call with x64 off.
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, w), jnp.int32),
            grid_spec=grid_spec,
        )(idx, table)

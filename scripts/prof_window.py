"""Microbenchmarks for the stream-engine design (round 2).

Question: given tasks sorted by dst, what is the fastest way to get each
task's dst row when the chunk's dsts live in a small contiguous WINDOW of
the row table?

  m0 stream    : sequential src-row stream read + AND + popcount (upper bound,
                 no dst side at all)
  m1 take      : window = dynamic_slice(table); rows = window[local_idx]
                 (XLA gather from a window-sized array)
  m2 onehot    : rows = onehot(local_idx) @ window_bytes (bf16 MXU gather,
                 exact because bytes <= 255)
  m3 pallas    : Pallas kernel, window DMA'd to VMEM, per-task dynamic row
                 reads + AND + popcount in VMEM

All variants compute sum(popcount(src_row & dst_row)) over T tasks and must
agree. Timing: best of 3 over rolled task streams (axon memoizes identical
dispatches).
"""
import os
import sys
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = int(sys.argv[1]) if len(sys.argv) > 1 else 784 * 1024
W = int(sys.argv[4]) if len(sys.argv) > 4 else 128
ND = 56 * 1024     # dst table rows
CAP = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
SPAN = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

rng = np.random.default_rng(0)
table_h = rng.integers(0, 2**31 - 1, size=(ND, W), dtype=np.int32)
# dst-sorted tasks: local idx within a window whose start advances slowly
nchunks = T // CAP
starts_h = np.minimum(np.arange(nchunks) * max(1, (ND - SPAN) // nchunks),
                      ND - SPAN).astype(np.int32)
lidx_h = np.sort(rng.integers(0, SPAN, size=(nchunks, CAP)), axis=1)
lidx_h = lidx_h.astype(np.int32)
src_h = rng.integers(0, 2**31 - 1, size=(T, W), dtype=np.int32)

table = jnp.asarray(table_h)
# bytes view for the one-hot variant: [ND, 4W] bf16
# keep bytes unsigned (int32): int8 would overflow values >= 128 to negatives
tbytes = jnp.asarray(
    ((table_h[:, :, None].view(np.uint8)).reshape(ND, 4 * W)).astype(np.int32))
starts = jnp.asarray(starts_h)
lidx = jnp.asarray(lidx_h)
src_stream = jnp.asarray(src_h.reshape(nchunks, CAP, W))


def _best(fn, mkargs, n=5):
    best = 1e9
    for i in range(n):
        args = mkargs(i + 1)
        jax.block_until_ready(args)
        t0 = time.time()
        out = fn(*args)
        r = int(np.asarray(out, dtype=np.int64).sum())
        best = min(best, time.time() - t0)
    return best, r


def timed(fn_full, fn_half, mkargs, mkargs_half, what):
    out0 = fn_full(*mkargs(0))
    ref = int(np.asarray(out0, dtype=np.int64).sum())
    bf, _ = _best(fn_full, mkargs)
    bh, _ = _best(fn_half, mkargs_half)
    dev = bf - bh          # time for T/2 tasks net of dispatch floor
    tasks_s = (T / 2) / max(dev, 1e-9)
    print(f"{what:28s} full={bf*1e3:7.1f}ms half={bh*1e3:7.1f}ms "
          f"slope={dev*1e3:7.1f}ms/half  {tasks_s/1e6:8.1f}M tasks/s",
          flush=True)
    return ref


def roll_tasks(i):
    # permute chunks (same totals, different buffer contents)
    return (jnp.roll(src_stream, i, axis=0), jnp.roll(starts, i, axis=0),
            jnp.roll(lidx, i, axis=0))


NH = nchunks // 2


def roll_tasks_half(i):
    a, b, c = roll_tasks(i)
    return (a[:NH], b[:NH], c[:NH])


# ---- m0: stream-only upper bound -------------------------------------------
@jax.jit
def m0(srcs, starts, lidx):
    def body(xs):
        s, _, _ = xs
        return jnp.sum(jax.lax.population_count(s), dtype=jnp.int32)
    return jax.lax.map(body, (srcs, starts, lidx))


# ---- m1: windowed take ------------------------------------------------------
@jax.jit
def m1(srcs, starts, lidx):
    def body(xs):
        s, st, li = xs
        win = jax.lax.dynamic_slice(table, (st, 0), (SPAN, W))
        rows = win[li]
        return jnp.sum(jax.lax.population_count(s & rows), dtype=jnp.int32)
    return jax.lax.map(body, (srcs, starts, lidx))


# ---- m2: one-hot byte GEMM --------------------------------------------------
@jax.jit
def m2(srcs, starts, lidx):
    iot = jax.lax.broadcasted_iota(jnp.int32, (CAP, SPAN), 1)

    def body(xs):
        s, st, li = xs
        win = jax.lax.dynamic_slice(tbytes, (st, 0), (SPAN, 4 * W))
        oneh = (li[:, None] == iot).astype(jnp.bfloat16)
        rowsb = jnp.dot(oneh, win.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        rowsb = rowsb.astype(jnp.int32)           # exact bytes 0..255
        sb = s[:, :, None].view(jnp.uint8).reshape(CAP, 4 * W).astype(jnp.int32)
        return jnp.sum(jax.lax.population_count(sb & rowsb), dtype=jnp.int32)
    return jax.lax.map(body, (srcs, starts, lidx))


# ---- m3: pallas window kernel ----------------------------------------------
def _kernel(starts_ref, lidx_ref, src_ref, table_ref, out_ref, win, acc, sem):
    c = pl.program_id(0)
    st = starts_ref[c]
    dma = pltpu.make_async_copy(table_ref.at[pl.ds(st, SPAN)], win, sem)
    dma.start()
    dma.wait()
    def body(t, total):
        row = win[lidx_ref[c * CAP + t], :]
        return total + jnp.sum(
            jax.lax.population_count(src_ref[t, :] & row), dtype=jnp.int32)

    out_ref[0, 0, 0] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(CAP),
                                         body, jnp.int32(0))


def m3(nck):
  @jax.jit
  def m3_(srcs, starts, lidx):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nck,),
        in_specs=[
            pl.BlockSpec((1, CAP, W), lambda c, s, l: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda c, s, l: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((SPAN, W), jnp.int32),
            pltpu.VMEM((8, W), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    def kern(starts_ref, lidx_ref, src_ref, table_ref, out_ref, win, acc, sem):
        _kernel(starts_ref, lidx_ref, src_ref[0], table_ref, out_ref, win,
                acc, sem)

    with jax.enable_x64(False):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((nck, 8, 128), jnp.int32),
            grid_spec=grid_spec,
        )(starts, lidx.reshape(-1), srcs, table)[:, 0, 0]
  return m3_


# ---- m3b: pallas, 8-row batched reads ---------------------------------------
def _kernel8(starts_ref, lidx_ref, src_ref, table_ref, out_ref, win, sem):
    c = pl.program_id(0)
    st = starts_ref[c]
    dma = pltpu.make_async_copy(table_ref.at[pl.ds(st, SPAN)], win, sem)
    dma.start()
    dma.wait()
    def body(t8, total):
        # read 8 rows one by one, stack, AND against 8 src rows
        rows = jnp.stack([win[lidx_ref[c * CAP + t8 * 8 + j], :]
                          for j in range(8)])
        sl = src_ref[pl.ds(t8 * 8, 8), :]
        return total + jnp.sum(jax.lax.population_count(sl & rows),
                               dtype=jnp.int32)

    out_ref[0, 0, 0] = jax.lax.fori_loop(jnp.int32(0), jnp.int32(CAP // 8),
                                         body, jnp.int32(0))


def m3b(nck):
  @jax.jit
  def m3b_(srcs, starts, lidx):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nck,),
        in_specs=[
            pl.BlockSpec((1, CAP, W), lambda c, s, l: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda c, s, l: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((SPAN, W), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    def kern(starts_ref, lidx_ref, src_ref, table_ref, out_ref, win, sem):
        _kernel8(starts_ref, lidx_ref, src_ref[0], table_ref, out_ref, win,
                 sem)

    with jax.enable_x64(False):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((nck, 8, 128), jnp.int32),
            grid_spec=grid_spec,
        )(starts, lidx.reshape(-1), srcs, table)[:, 0, 0]
  return m3b_


def main():
    print(f"T={T} W={W} ND={ND} CAP={CAP} SPAN={SPAN} nchunks={nchunks}",
          flush=True)
    timed(m0, m0, roll_tasks, roll_tasks_half, "m0 stream-only")
    r1 = timed(m1, m1, roll_tasks, roll_tasks_half, "m1 windowed take")
    r2 = timed(m2, m2, roll_tasks, roll_tasks_half, "m2 one-hot byte GEMM")
    assert r1 == r2, (r1, r2)
    if not int(os.environ.get("PROF_PALLAS", "1")):
        return
    try:
        m3f, m3h = m3(nchunks), m3(NH)
        r3 = timed(m3f, m3h, roll_tasks, roll_tasks_half,
                   "m3 pallas row reads")
        assert r3 == r1, (r3, r1)
    except Exception as e:
        print("m3 failed:", str(e)[:500])
    try:
        bf, bh = m3b(nchunks), m3b(NH)
        r3b = timed(bf, bh, roll_tasks, roll_tasks_half,
                    "m3b pallas 8-row reads")
        assert r3b == r1, (r3b, r1)
    except Exception as e:
        print("m3b failed:", str(e)[:500])


if __name__ == "__main__":
    main()

"""Round-2 profiling: where do the rmat18 TC milliseconds go?

Times the hubcore tail gather-groups and the spoke GEMM separately, and
calibrates the Pallas pipelined row-DMA rate (ops/pallas_fetch.py) at the
row widths the tail kernel would use — the data that decides whether the
fused Pallas tail kernel is worth building and at what width.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from graphminer_tpu.io.synth import rmat
from graphminer_tpu.ops import hubcore
from graphminer_tpu.ops.pallas_fetch import fetch_rows_sum

N_ITER = 3


def timeit(fn, variants):
    _ = fn(*variants[0])
    best = 1e9
    for args in variants:
        t0 = time.time()
        _ = fn(*args)
        best = min(best, time.time() - t0)
    return best


def main():
    print("backend:", jax.default_backend())
    t0 = time.time()
    g = rmat(18, 16, seed=7)
    eng = hubcore.TriangleEngine(g)
    lay = eng.layout
    print(f"prep={time.time()-t0:.1f}s V={eng.g.n_vertices} E={eng.g.n_edges} "
          f"tail_tasks={eng.n_tail_tasks} words={lay.words} "
          f"wt_pad={lay.wt_pad} core={lay.core_size} "
          f"spoke_rows={eng.spoke.shape[0]}")
    print("groups:", [(wa, wb, ck, int(s.size)) for (s, _), (wa, wb, ck)
                      in zip(eng.group_arrays, eng.spec)])

    # --- tail only ---
    def run_tail(ga):
        parts = hubcore._tail_partials(
            eng.tables.src_rows, eng.tables.dst_rows, ga,
            spec=eng.spec, words=lay.words)
        return int(np.asarray(parts, dtype=np.int64).sum())

    variants = []
    for i in range(N_ITER):
        ga = tuple((jnp.roll(s, i + 1, axis=0), jnp.roll(d, i + 1, axis=0))
                   for s, d in eng.group_arrays)
        variants.append((ga,))
    t0 = time.time()
    tail_best = timeit(run_tail, variants)
    print(f"tail: compile+first={time.time()-t0:.1f}s best={tail_best*1e3:.1f}ms")

    # --- spoke only ---
    def run_spoke(spoke):
        parts = hubcore._spoke_gemm_partials(
            lay.table, spoke, words=lay.words, c=lay.core_size,
            tile=eng._tile)
        return int(np.asarray(parts, dtype=np.int64).sum())

    sp_variants = [(jnp.roll(eng.spoke, i + 1, axis=0),) for i in range(N_ITER)]
    t0 = time.time()
    spoke_best = timeit(run_spoke, sp_variants)
    print(f"spoke: compile+first={time.time()-t0:.1f}s best={spoke_best*1e3:.1f}ms")

    # --- pallas row fetch calibration ---
    for w in (8, 32, 128, 256):
        tbl = jax.random.randint(jax.random.PRNGKey(0), (1 << 18, w),
                                 0, 100, dtype=jnp.int32)
        for n in (1 << 16, 1 << 19):
            idx_v = [jax.random.randint(jax.random.PRNGKey(i + 1), (n,),
                                        0, 1 << 18, dtype=jnp.int32)
                     for i in range(N_ITER)]
            try:
                best = timeit(lambda ix: np.asarray(
                    fetch_rows_sum(ix, tbl, n_buf=16)).sum(),
                    [(ix,) for ix in idx_v])
            except Exception as e:
                print(f"pallas fetch w={w} n={n}: FAIL {type(e).__name__}: {e}"
                      [:300])
                break
            print(f"pallas fetch w={w:4d} n={n:7d}: {best*1e3:8.2f}ms "
                  f"{best/n*1e9:7.2f} ns/row {n*w*4/best/1e9:7.2f} GB/s")


if __name__ == "__main__":
    main()

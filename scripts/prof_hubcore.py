"""Split timing of the hubcore engine's two dispatches (tail gathers vs
spoke GEMM) on the live chip, with roll-variants to defeat the axon
runtime's execution memoization."""
import sys
import time

import jax.numpy as jnp
import numpy as np

from graphminer_tpu.io.synth import rmat
from graphminer_tpu.ops import hubcore

SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 18
CORE = int(sys.argv[2]) if len(sys.argv) > 2 else hubcore.DEFAULT_CORE
TILE = int(sys.argv[3]) if len(sys.argv) > 3 else 512

g = rmat(SCALE, 16, seed=7)
eng = hubcore.TriangleEngine(g, core=CORE, tile=TILE)
lay = eng.layout
print(f"V={eng.g.n_vertices} E={eng.g.n_edges} tail={eng.n_tail_tasks} "
      f"spoke_rows={eng.spoke.shape[0]} words={lay.words} core={lay.core_size}",
      flush=True)

# --- tail dispatch ---
t0 = time.time()
tot_tail = eng.count_tail()
print(f"tail compile+run {time.time()-t0:.1f}s total={tot_tail}", flush=True)
best = 1e9
for i in range(3):
    ga = tuple((jnp.roll(s, i + 1, axis=0), jnp.roll(d, i + 1, axis=0))
               for s, d in eng.group_arrays)
    t0 = time.time()
    parts = hubcore._tail_partials(eng.tables.src_rows, eng.tables.dst_rows,
                                   ga, spec=eng.spec, words=lay.words)
    tt = int(np.asarray(parts, dtype=np.int64).sum())
    best = min(best, time.time() - t0)
    assert tt == tot_tail
print(f"tail best {best*1e3:.1f}ms  ({eng.n_tail_tasks/best/1e6:.1f}M tasks/s)",
      flush=True)

# --- spoke dispatch ---
t0 = time.time()
tot_spoke = eng.count_core()
print(f"spoke compile+run {time.time()-t0:.1f}s total={tot_spoke}", flush=True)
best = 1e9
nrows = eng.spoke.shape[0]
for i in range(3):
    sp = jnp.roll(eng.spoke, (i + 1) * TILE, axis=0)  # tile-aligned roll
    t0 = time.time()
    parts = hubcore._spoke_gemm_partials(lay.table, sp, words=lay.words,
                                         c=lay.core_size, tile=TILE)
    tt = int(np.asarray(parts, dtype=np.int64).sum())
    best = min(best, time.time() - t0)
    assert tt == tot_spoke, (tt, tot_spoke)
macs = nrows * (lay.words * 32) ** 2
print(f"spoke best {best*1e3:.1f}ms  rows={nrows} "
      f"({macs/best/1e12:.1f} TOPS effective)", flush=True)

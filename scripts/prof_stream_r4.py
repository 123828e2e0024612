"""Round-4 headline profiling: where do the stream engine's edges/s go?

Per-bucket slope timing of the rmat18 stream (full vs half rows, min over
samples — cancels the ~25 ms tunnel round trip) against each bucket's HBM
byte volume. The microbench SoL is ~800 GB/s total-stream traffic
(scripts/prof_popcount.py p0); buckets far below that are the optimization
targets.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from graphminer_tpu.io import cache
from graphminer_tpu.ops import stream as S

cache.enable_compile_cache()
g = cache.load_graph("rmat18_ef16_s7_dag")
assert g is not None

t0 = time.time()
eng = S.StreamEngine(g)
print(f"prep {time.time()-t0:.1f}s  buckets={len(eng.stream.buckets)} "
      f"tasks={eng.n_edges}", flush=True)

words = eng.words


def bucket_partials(dst_rows, src_rows, salt, *, wtv, chunk_d):
    parts = S._bucket_counts_body(dst_rows, src_rows, words=words, wtv=wtv,
                                  chunk_d=chunk_d)
    return jnp.roll(parts, salt)


jit_bp = jax.jit(bucket_partials, static_argnames=("wtv", "chunk_d"))


def timeit(fn, n=3):
    _ = np.asarray(fn(0))
    ts = []
    for i in range(n):
        t0 = time.time()
        _ = np.asarray(fn(i + 1))
        ts.append(time.time() - t0)
    return min(ts)


rows = []
tot_bytes = 0
for b in eng.stream.buckets:
    d, s = b.dst_rows, b.src_rows
    nb = (d.size + s.size) * 4
    tot_bytes += nb
    cd = S._chunk_d_for(b.width)
    tf = timeit(lambda salt: jit_bp(d, s, jnp.int32(salt), wtv=b.wtv,
                                    chunk_d=cd))
    h = max(8, d.shape[0] // 2 // 8 * 8)
    th = timeit(lambda salt: jit_bp(d[:h], s[:h], jnp.int32(salt), wtv=b.wtv,
                                    chunk_d=cd))
    dt = tf - th
    half_tasks = int(b.row_tasks[:h].sum())
    de = b.n_tasks - half_tasks
    gbps = (nb / 2) / max(dt, 1e-9) / 1e9
    print(f"w={b.width:5d} wtv={b.wtv:3d} wta={b.wta:4d} n_dst={b.n_dst:7d} "
          f"tasks={b.n_tasks:8d} bytes={nb/1e6:8.1f}MB full={tf*1e3:7.1f}ms "
          f"half={th*1e3:7.1f}ms slope={de/max(dt,1e-9)/1e6:7.1f}M/s "
          f"{gbps:6.0f} GB/s", flush=True)

print(f"total stream bytes {tot_bytes/1e9:.2f} GB", flush=True)
sl = eng.timed_slope(samples=5)
print(f"fused slope {sl['edges_per_s']/1e6:.1f}M edges/s "
      f"latency {sl['latency_s']*1e3:.1f}ms "
      f"full times {[round(t*1e3,1) for t in sl['times_full']]}", flush=True)

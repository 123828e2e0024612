"""Fused row-gather throughput: sum(popcount(stream & table[idx])) as ONE
XLA op (no lax.map), vs table size. If this runs near HBM rate even for
large tables, per-task row materialization (ops/stream.py) is unnecessary.

Timing: K back-to-back dispatches with rolled inputs, ONE readback at the
end; reported per-iter amortizes the ~27ms tunnel round-trip.
"""
import sys, time
import jax, jax.numpy as jnp
import numpy as np

T = int(sys.argv[1]) if len(sys.argv) > 1 else 802816
W = 128
K = 8
rng = np.random.default_rng(0)
stream = jnp.asarray(rng.integers(0, 2**31 - 1, size=(T, W), dtype=np.int32))

def timed(fn, mkargs, iters=K):
    r0 = int(np.asarray(fn(*mkargs(0)), dtype=np.int64).sum())
    t0 = time.time()
    outs = [fn(*mkargs(i + 1)) for i in range(iters)]
    _ = np.asarray(outs[-1])
    dt = (time.time() - t0) / iters
    return dt, r0

for ND in (4096, 16384, 65536, 262144):
    table = jnp.asarray(rng.integers(0, 2**31 - 1, size=(ND, W), dtype=np.int32))
    idx_h = rng.integers(0, ND, size=T, dtype=np.int32)
    idx = jnp.asarray(idx_h)
    idx_sorted = jnp.asarray(np.sort(idx_h))

    @jax.jit
    def g0(s, ix, tb=table):
        return jnp.sum(jax.lax.population_count(s & tb[ix]), dtype=jnp.int32)

    for name, ii in (("rand", idx), ("sorted", idx_sorted)):
        dt, _ = timed(g0, lambda i: (jnp.roll(stream, i, 0), jnp.roll(ii, i * 37)))
        print(f"ND={ND:7d} {name:6s} fused take+pc: {dt*1e3:7.2f}ms/iter "
              f"-> {T/dt/1e6:8.1f}M tasks/s", flush=True)

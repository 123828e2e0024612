"""Measure TPU primitive throughputs that bound the set-op kernel design.

Axon tunnel facts this script works around:
 * ~25 ms fixed dispatch+D2H round-trip -> time TWO sizes per op and use the
   slope (per-element cost), not the raw rate.
 * identical executions are memoized -> every iteration gets distinct inputs.
 * closed-over arrays are baked into the remote-compile request (HTTP 413)
   -> all big arrays are jit ARGUMENTS.
"""
import time

import jax
import jax.numpy as jnp

V = 262144
N_ITER = 3


def timed(fn, variants):
    _ = int(fn(*variants[0]))
    t0 = time.time()
    for args in variants:
        _ = int(fn(*args))
    return (time.time() - t0) / len(variants)


def slope(name, fn, mk_variants, n_small, n_big, work_per_item, unit):
    dts = timed(fn, mk_variants(n_small))
    dtb = timed(fn, mk_variants(n_big))
    per_item = (dtb - dts) / (n_big - n_small)
    rate = work_per_item / per_item
    print(f"{name:36s} small={dts*1e3:7.1f}ms big={dtb*1e3:8.1f}ms "
          f"slope={per_item*1e9:8.2f} ns/item  {rate/1e9:9.2f} {unit}")
    return per_item


def main():
    key = jax.random.PRNGKey(0)
    print("backend:", jax.default_backend())

    # ---- row gather from padded table ----
    for w in (128, 512):
        table = jax.random.randint(key, (V, w), 0, V, dtype=jnp.int32)

        @jax.jit
        def grow(t, ix):
            return jnp.sum(t[ix], dtype=jnp.int32)

        def mk(n):
            return [(table,
                     jax.random.randint(jax.random.PRNGKey(i + 1), (n,), 0, V,
                                        dtype=jnp.int32))
                    for i in range(N_ITER)]
        slope(f"row-gather w={w} (GB/s)", grow, mk, 8192, 1 << 20, w * 4,
              "GB/s")

    # ---- bc intersect ----
    for w, nb in ((16, 1 << 21), (64, 1 << 20), (256, 1 << 17)):
        @jax.jit
        def bc(a, b):
            m = jnp.any(a[:, :, None] == b[:, None, :], axis=-1)
            return jnp.sum(m, dtype=jnp.int32)

        def mk(n, w=w):
            out = []
            for i in range(N_ITER):
                a = jax.random.randint(jax.random.PRNGKey(i), (n, w), 0,
                                       4 * w, dtype=jnp.int32)
                b = jnp.sort(jax.random.randint(jax.random.PRNGKey(i + 7),
                                                (n, w), 0, 4 * w,
                                                dtype=jnp.int32), axis=-1)
                out.append((a, b))
            return out
        slope(f"bc intersect w={w} (Gcmp/s)", bc, mk, 8192, nb, w * w,
              "Gcmp/s")

    # ---- packed popcount (no gather) ----
    @jax.jit
    def pop(x, y):
        return jnp.sum(jax.lax.population_count(x & y), dtype=jnp.int32)

    def mkp(n):
        return [(jax.random.randint(jax.random.PRNGKey(i), (n, 128),
                                    -2**31, 2**31 - 1, dtype=jnp.int32),
                 jax.random.randint(jax.random.PRNGKey(i + 7), (n, 128),
                                    -2**31, 2**31 - 1, dtype=jnp.int32))
                for i in range(N_ITER)]
    slope("AND+popcount 128w (Gbit/s)", pop, mkp, 8192, 1 << 20, 128 * 32,
          "Gbit/s")

    # ---- fused edge kernel: gather 2 bitmap rows + AND + popcount ----
    for words in (32, 128):
        hb = jax.random.randint(key, (V, words), -2**31, 2**31 - 1,
                                dtype=jnp.int32)

        @jax.jit
        def edgepop(h, u, v):
            return jnp.sum(jax.lax.population_count(h[u] & h[v]),
                           dtype=jnp.int32)

        def mke(n, hb=hb):
            return [(hb,
                     jax.random.randint(jax.random.PRNGKey(i + 40), (n,), 0,
                                        V, dtype=jnp.int32),
                     jax.random.randint(jax.random.PRNGKey(i + 80), (n,), 0,
                                        V, dtype=jnp.int32))
                    for i in range(N_ITER)]
        per = slope(f"edge hub-pop {words}w (Medge/s)", edgepop, mke,
                    1 << 17, 1 << 21, 1, "edge/ns")
        print(f"    -> {1/per/1e6:.1f} M edges/s")


if __name__ == "__main__":
    main()

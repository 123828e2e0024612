"""Gather-wall experiments: XLA row-gather with random vs sorted vs repeated
indices, small vs large tables, and bitmap-row popcount kernels.
Slope method (two sizes) to cancel the ~25 ms tunnel round-trip.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

V = 262144
N_ITER = 3


def timed(fn, variants):
    _ = int(fn(*variants[0]))
    t0 = time.time()
    for args in variants:
        _ = int(fn(*args))
    return (time.time() - t0) / len(variants)


def slope(name, fn, mk_variants, n_small, n_big):
    dts = timed(fn, mk_variants(n_small))
    dtb = timed(fn, mk_variants(n_big))
    per = (dtb - dts) / (n_big - n_small)
    print(f"{name:44s} slope={per*1e9:8.2f} ns/row")
    return per


def main():
    key = jax.random.PRNGKey(0)
    print("backend:", jax.default_backend())

    W = 128
    table = jax.random.randint(key, (V, W), 0, V, dtype=jnp.int32)

    @jax.jit
    def grow(t, ix):
        return jnp.sum(t[ix], dtype=jnp.int32)

    def mk_rand(n):
        return [(table, jax.random.randint(jax.random.PRNGKey(i + 1), (n,),
                                           0, V, dtype=jnp.int32))
                for i in range(N_ITER)]

    def mk_sorted(n):
        return [(table, jnp.sort(jax.random.randint(jax.random.PRNGKey(i + 1),
                                                    (n,), 0, V,
                                                    dtype=jnp.int32)))
                for i in range(N_ITER)]

    def mk_repeat(n):
        # CSR-src-like: sorted with ~16x repeats
        return [(table, jnp.sort(jax.random.randint(jax.random.PRNGKey(i + 1),
                                                    (n,), 0, V // 16,
                                                    dtype=jnp.int32)))
                for i in range(N_ITER)]

    slope("gather w=128 random", grow, mk_rand, 8192, 1 << 20)
    slope("gather w=128 sorted", grow, mk_sorted, 8192, 1 << 20)
    slope("gather w=128 sorted+repeated(16x)", grow, mk_repeat, 8192, 1 << 20)

    # small table (VMEM-resident scale)
    tsmall = jnp.asarray(table[:8192])

    def mk_small(n):
        return [(tsmall, jax.random.randint(jax.random.PRNGKey(i + 1), (n,),
                                            0, 8192, dtype=jnp.int32))
                for i in range(N_ITER)]
    slope("gather w=128 small-table(8192 rows)", grow, mk_small, 8192, 1 << 20)

    # narrow rows
    t16 = jnp.asarray(table[:, :16])

    def mk16(n):
        return [(t16, jax.random.randint(jax.random.PRNGKey(i + 1), (n,),
                                         0, V, dtype=jnp.int32))
                for i in range(N_ITER)]
    slope("gather w=16 random", grow, mk16, 8192, 1 << 20)

    # one-gather edge kernel: u-row broadcast-free (v gather only) + popcount
    @jax.jit
    def onepop(t, urows, v):
        return jnp.sum(jax.lax.population_count(urows & t[v]),
                       dtype=jnp.int32)

    def mk1(n):
        return [(table,
                 jax.random.randint(jax.random.PRNGKey(i + 3), (n, W),
                                    -2**31, 2**31 - 1, dtype=jnp.int32),
                 jax.random.randint(jax.random.PRNGKey(i + 5), (n,), 0, V,
                                    dtype=jnp.int32))
                for i in range(N_ITER)]
    slope("edge 1-gather+pop 128w", onepop, mk1, 8192, 1 << 20)

    # scatter rows (permutation write)
    @jax.jit
    def scat(rows, ix):
        out = jnp.zeros_like(rows)
        out = out.at[ix].set(rows)
        return jnp.sum(out[0], dtype=jnp.int32)

    def mks(n):
        return [(jax.random.randint(jax.random.PRNGKey(i + 3), (n, W),
                                    -2**31, 2**31 - 1, dtype=jnp.int32),
                 jax.random.permutation(jax.random.PRNGKey(i), n)
                 .astype(jnp.int32))
                for i in range(N_ITER)]
    slope("scatter-permute rows w=128", scat, mks, 8192, 1 << 19)


if __name__ == "__main__":
    main()

"""What bounds the stream AND+popcount: HBM, popcount lowering, or lax.map?

Variants over [T, W] int32 src stream (+ same-shape dst stream for the AND):
  p0: sum(popcount(a & b))  one fused op, whole array
  p1: sum(popcount(a))      one fused op (half traffic)
  p2: sum(a & b)            no popcount (is popcount the bottleneck?)
  p3: bf16 dot-based popcount: expand AND to bits via 8x uint4 LUT? skip;
      instead: popcount via two int16 halves and a 2^11 LUT? skip.
  p4: lax.map over CAP-task chunks of p0 (the engine's shape)
Slope method (T vs T/2) cancels the tunnel round-trip.
"""
import sys, time
import jax, jax.numpy as jnp
import numpy as np

T = int(sys.argv[1]) if len(sys.argv) > 1 else 802816
W = 128
CAP = 8192
rng = np.random.default_rng(0)
a_h = rng.integers(0, 2**31 - 1, size=(T, W), dtype=np.int32)
b_h = rng.integers(0, 2**31 - 1, size=(T, W), dtype=np.int32)
a = jnp.asarray(a_h); b = jnp.asarray(b_h)

def best(fn, args_fn, n=4):
    fn(*args_fn(0)).block_until_ready()
    ts = []
    for i in range(1, n + 1):
        args = args_fn(i)
        jax.block_until_ready(args)
        t0 = time.time(); fn(*args).block_until_ready(); ts.append(time.time() - t0)
    return min(ts)

def slope(name, fn):
    roll = lambda i: (jnp.roll(a, i, 0), jnp.roll(b, i, 0))
    rollh = lambda i: (jnp.roll(a, i, 0)[:T//2], jnp.roll(b, i, 0)[:T//2])
    tf = best(fn, roll); th = best(fn, rollh)
    per = (tf - th) / (T / 2)
    print(f"{name:34s} full={tf*1e3:7.2f}ms half={th*1e3:7.2f}ms "
          f"-> {1/per/1e6:8.1f}M tasks/s  {1/per*W*4/1e9:7.1f} GB/s(a-side)",
          flush=True)

@jax.jit
def p0(x, y):
    return jnp.sum(jax.lax.population_count(x & y), dtype=jnp.int32)

@jax.jit
def p1(x, y):
    return jnp.sum(jax.lax.population_count(x), dtype=jnp.int32)

@jax.jit
def p2(x, y):
    return jnp.sum(x & y, dtype=jnp.int32)

@jax.jit
def p2b(x, y):
    return jnp.sum(x, dtype=jnp.int32)

@jax.jit
def p4(x, y):
    xs = x.reshape(-1, CAP, W); ys = y.reshape(-1, CAP, W)
    return jax.lax.map(
        lambda t: jnp.sum(jax.lax.population_count(t[0] & t[1]),
                          dtype=jnp.int32), (xs, ys))

# popcount via 8-bit halves + bf16 matmul LUT: bytes -> one-hot? too big.
# popcount via SWAR in int32 (~7 ops) to compare against the builtin:
@jax.jit
def p5(x, y):
    v = x & y
    v = v - ((v >> 1) & 0x55555555)
    v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
    v = (v + (v >> 4)) & 0x0F0F0F0F
    v = (v * 0x01010101) >> 24
    return jnp.sum(v, dtype=jnp.int32)

print(f"T={T} W={W} bytes/side={T*W*4/1e6:.0f}MB", flush=True)
slope("p2b sum only (1 stream)", p2b)
slope("p2  AND+sum (2 streams)", p2)
slope("p1  popcount+sum (1 stream)", p1)
slope("p0  AND+popcount+sum", p0)
slope("p5  AND+SWAR popcount", p5)
slope("p4  lax.map AND+popcount", p4)

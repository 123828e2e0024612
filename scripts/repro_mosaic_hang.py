"""Pinned repro: Mosaic (Pallas) compilation hangs on the axon tunnel.

Measured 2026-08-21 on this session's tunneled TPU v5 lite chip:

  * plain XLA programs compile and run (the fused stream TC program
    compiles in ~178 s cold and then counts rmat18 exactly at 759M
    edge-tasks/s marginal — scripts/prof_stream_r4.py methodology);
  * the TRIVIAL pallas_call below — one 8x128 int32 elementwise multiply,
    no grid, no scalar prefetch — never returns: the process blocks inside
    the remote Mosaic compile with ~0 CPU for >20 minutes (two separate
    sessions, r3 and r4), and does not respond to SIGTERM while blocked.

Run under `timeout 120` — if it prints "OK" the runtime has been fixed and
ops/pallas_ring.py's kernel (which passes interpret-mode equivalence tests)
can be un-gated by default.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    x = jnp.ones((8, 128), jnp.int32)
    t0 = time.time()
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    print(f"OK: {np.asarray(out)[0, 0]} in {time.time() - t0:.1f}s")

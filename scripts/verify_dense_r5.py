"""Independent dense-numpy verification of the rectangle/house fast
engines at rmat14 (V = 16384 — dense codegree matrices fit host RAM).

rectangle: C4 = (1/2) Σ_{u<v} C(W_uv, 2), W = A² (each cycle counted at
both diagonals — a different identity family than the engine's
max-anchored truncated form).
house:     per-edge tri = W at edges, T3 = A³ at edges;
           house = Σ_e tri·(T3 − deg(u) − deg(v) + 1 − 2(tri − 1)).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
from graphminer_tpu.io.synth import rmat


def main(scale=14, ef=16):
    g = rmat(scale, ef, seed=7)
    v = g.n_vertices
    a = np.zeros((v, v), dtype=np.float32)
    deg = np.diff(g.rowptr)
    srcs = np.repeat(np.arange(v), deg)
    a[srcs, g.colidx] = 1.0
    t0 = time.time()
    w = (a @ a).astype(np.int64)        # codegree; max < 2^24 → f32 exact
    iu = np.triu_indices(v, 1)
    ww = w[iu]
    c4 = int((ww * (ww - 1) // 2).sum() // 2)
    print(f"dense rectangle rmat{scale} = {c4} ({time.time()-t0:.0f}s)",
          flush=True)
    t0 = time.time()
    a3 = (w.astype(np.float64) @ a.astype(np.float64))  # < 2^31 exact f64
    keep = g.colidx > srcs
    eu, ev = srcs[keep], g.colidx[keep]
    tri = w[eu, ev]
    t3 = a3[eu, ev].astype(np.int64)
    degl = deg.astype(np.int64)
    sq = t3 - degl[eu] - degl[ev] + 1
    house = int((tri * (sq - 2 * (tri - 1))).sum())
    print(f"dense house rmat{scale} = {house} ({time.time()-t0:.0f}s)",
          flush=True)


if __name__ == "__main__":
    main(*(int(x) for x in sys.argv[1:]))

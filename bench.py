"""Headline benchmark — prints ONE JSON line for the driver.

Metric: triangle-counting throughput (oriented edges/s) on an RMAT-18
power-law graph (~262k vertices, Graph500 params) on one chip, using the
hub-bitmap + spoke-GEMM MXU engine (ops/hubcore.py). The reference's
headline TC numbers are GPU edge-throughput on LiveJournal-class graphs
(OSDI'22, V100); RMAT-18 stands in because the large datasets are external
downloads. vs_baseline is measured against 1.0e9 edges/s — the
order-of-magnitude V100 edge rate of the reference's tc_gpu_base
(OSDI'22 Fig. 7 scale).
"""
import json
import os
import sys
import time

BENCH_BASELINE_EDGES_PER_S = 1.0e9

SCALE = int(os.environ.get("BENCH_SCALE", "18"))
EDGE_FACTOR = int(os.environ.get("BENCH_EDGE_FACTOR", "16"))
GOLDEN = {18: 82947332}


def _retry(fn, n=3, what=""):
    """The tunneled chip occasionally drops a dispatch with a transient
    UNAVAILABLE infra error; retry a couple of times before giving up."""
    for attempt in range(n):
        try:
            return fn()
        except Exception as e:  # jax.errors.JaxRuntimeError and friends
            if attempt == n - 1 or "UNAVAILABLE" not in str(e):
                raise
            sys.stderr.write(f"transient error in {what} "
                             f"(attempt {attempt + 1}): {e}\n")
            time.sleep(5)


def main():
    import jax.numpy as jnp
    import numpy as np
    from graphminer_tpu.io.synth import rmat
    from graphminer_tpu.ops import hubcore

    t0 = time.time()
    g = rmat(SCALE, EDGE_FACTOR, seed=7)
    eng = hubcore.TriangleEngine(g)
    E = eng.g.n_edges
    sys.stderr.write(f"rmat{SCALE}: V={eng.g.n_vertices} E(dag)={E} "
                     f"tail_tasks={eng.n_tail_tasks} "
                     f"prep={time.time()-t0:.1f}s\n")

    t0 = time.time()
    total = _retry(eng.count, what="count")
    compile_s = time.time() - t0
    want = GOLDEN.get(SCALE)
    if want is not None and total != want:
        sys.stderr.write(f"WRONG COUNT {total} != {want}\n")
        sys.exit(1)

    # The axon runtime memoizes executions with identical inputs; time over
    # chunk-permuted task buffers (identical totals, distinct buffers).
    n_iter = 3
    variants = []
    for i in range(n_iter):
        ga = tuple((jnp.roll(s, i + 1, axis=0), jnp.roll(d, i + 1, axis=0))
                   for s, d in eng.group_arrays)
        variants.append(ga)
    lay = eng.layout
    best = 1e9
    for ga in variants:
        def run(ga=ga):
            tails, spokes = hubcore._fused_partials(
                lay.table, eng.spoke, eng.tables.src_rows,
                eng.tables.dst_rows, ga, spec=eng.spec, words=lay.words,
                c=lay.core_size, tile=eng._tile)
            return (int(np.asarray(tails, dtype=np.int64).sum())
                    + int(np.asarray(spokes, dtype=np.int64).sum()))
        t0 = time.time()
        tot = _retry(run, what="timed iter")
        best = min(best, time.time() - t0)
        assert tot == total, (tot, total)
    edges_per_s = E / best
    sys.stderr.write(f"triangles={total} compile={compile_s:.1f}s "
                     f"best={best*1e3:.1f}ms\n")

    print(json.dumps({
        "metric": f"tc_edges_per_s_rmat{SCALE}",
        "value": edges_per_s,
        "unit": "edges/s",
        "vs_baseline": edges_per_s / BENCH_BASELINE_EDGES_PER_S,
    }))


if __name__ == "__main__":
    main()

"""Headline benchmark — prints ONE JSON line for the driver.

Metric: triangle-counting throughput (oriented edges/s) on an RMAT-18 power-law
graph (~262k vertices, Graph500 params) on one chip. The reference's headline
TC numbers are GPU edge-throughput on LiveJournal-class graphs (OSDI'22, V100);
RMAT-18 stands in because the large datasets are external downloads.
vs_baseline is measured against BENCH_BASELINE = 1.0e9 edges/s — the
order-of-magnitude V100 edge rate of the reference's tc_gpu_base on
LiveJournal-class inputs (OSDI'22 Fig. 7 scale).
"""
import json
import os
import sys
import time

BENCH_BASELINE_EDGES_PER_S = 1.0e9

SCALE = int(os.environ.get("BENCH_SCALE", "18"))
EDGE_FACTOR = int(os.environ.get("BENCH_EDGE_FACTOR", "16"))
CHUNK = int(os.environ.get("BENCH_CHUNK", "8192"))


def main():
    import jax
    import jax.numpy as jnp
    from graphminer_tpu.io.synth import rmat
    from graphminer_tpu.core.device_graph import DeviceGraph
    from graphminer_tpu.workloads.triangle import _tc_device

    t0 = time.time()
    g = rmat(SCALE, EDGE_FACTOR, seed=7).orientation()
    sys.stderr.write(f"rmat{SCALE}: V={g.n_vertices} E(dag)={g.n_edges} "
                     f"maxdeg(dag)={g.max_degree} build={time.time()-t0:.1f}s\n")

    dg = DeviceGraph.from_host(g)
    src, dst = g.edge_list()
    src, dst = jnp.asarray(src), jnp.asarray(dst)
    width = max(8, g.max_degree)

    run = lambda s, d: _tc_device(dg, s, d, width=width, chunk=CHUNK,
                                  backend="auto")
    t0 = time.time()
    total = int(run(src, dst))
    compile_s = time.time() - t0
    # The axon runtime memoizes executions with identical inputs and its
    # block_until_ready is unreliable; time over rotated task lists (identical
    # totals, distinct buffers) and force a D2H value fetch per iteration.
    n_iter = 3
    variants = [(jnp.roll(src, i + 1), jnp.roll(dst, i + 1))
                for i in range(n_iter)]
    for s, d in variants:
        int(jnp.sum(s))  # materialize inputs before the timed region
    t0 = time.time()
    for s, d in variants:
        total = int(run(s, d))
    dt = (time.time() - t0) / n_iter
    edges_per_s = g.n_edges / dt
    sys.stderr.write(f"triangles={int(total)} compile={compile_s:.1f}s "
                     f"run={dt*1e3:.1f}ms\n")

    print(json.dumps({
        "metric": f"tc_edges_per_s_rmat{SCALE}",
        "value": edges_per_s,
        "unit": "edges/s",
        "vs_baseline": edges_per_s / BENCH_BASELINE_EDGES_PER_S,
    }))


if __name__ == "__main__":
    main()

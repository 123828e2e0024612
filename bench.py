"""Headline benchmark — prints ONE JSON line for the driver.

Metric: triangle-counting throughput (oriented edges/s) on an RMAT-18
power-law graph (~262k vertices, Graph500 params) on one chip, using the
bucketed reverse-CSR stream engine (ops/stream.py). The reference's
headline TC numbers are GPU edge-throughput on LiveJournal-class graphs
(OSDI'22, V100); RMAT-18 stands in because the large datasets are external
downloads. vs_baseline is measured against 1.0e9 edges/s — the
order-of-magnitude V100 edge rate of the reference's tc_gpu_base
(OSDI'22 Fig. 7 scale).

Timing: the tunneled chip adds ~27 ms of host-pull latency per readback and
memoizes executions by input content, so the engine launches N salted
dispatches back-to-back and divides (StreamEngine.timed_count) — the
sustained back-to-back count throughput.
"""
import json
import os
import sys
import time

BENCH_BASELINE_EDGES_PER_S = 1.0e9

SCALE = int(os.environ.get("BENCH_SCALE", "18"))
EDGE_FACTOR = int(os.environ.get("BENCH_EDGE_FACTOR", "16"))
ITERS = int(os.environ.get("BENCH_ITERS", "8"))
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
    from graphminer_tpu.io.synth import rmat
    from graphminer_tpu.ops.stream import StreamEngine

    t0 = time.time()
    g = rmat(SCALE, EDGE_FACTOR, seed=7)
    eng = StreamEngine(g)
    E = eng.n_edges
    sys.stderr.write(f"rmat{SCALE}: V={g.n_vertices} E(dag)={E} "
                     f"stream={eng.stream.nbytes()/1e9:.2f}GB "
                     f"prep={time.time()-t0:.1f}s\n")

    t0 = time.time()
    total = _retry(eng.count, what="warmup count")
    compile_s = time.time() - t0
    want = GOLDEN.get(SCALE)
    if want is not None and total != want:
        sys.stderr.write(f"WRONG COUNT {total} != {want}\n")
        sys.exit(1)

    total2, dt = _retry(lambda: eng.timed_count(iters=ITERS),
                        what="timed count")
    assert total2 == total, (total2, total)
    edges_per_s = E / dt
    sys.stderr.write(f"triangles={total} compile={compile_s:.1f}s "
                     f"per-iter={dt*1e3:.1f}ms (x{ITERS})\n")

    print(json.dumps({
        "metric": f"tc_edges_per_s_rmat{SCALE}",
        "value": edges_per_s,
        "unit": "edges/s",
        "vs_baseline": edges_per_s / BENCH_BASELINE_EDGES_PER_S,
    }))


if __name__ == "__main__":
    main()

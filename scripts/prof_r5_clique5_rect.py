"""Round-5 chip probe: rebuilt 5-clique engine + rectangle engine.

Measures on the tunneled chip: clique5 rmat18 count (golden
55,374,832,965) + slope, rectangle rmat14 (cross-check vs CPU run
571,816,674) and rmat18/20 one-shot times.
"""
import gc
import sys
import time

sys.path.insert(0, "/root/repo")
from graphminer_tpu.io import cache
from graphminer_tpu.io.cache import enable_compile_cache
from graphminer_tpu.io.synth import rmat

enable_compile_cache()


def dag(scale, ef=16):
    def build():
        g = rmat(scale, ef, seed=7)
        return g.relabel_by_degree(descending=False).orientation()
    return cache.cached_graph(f"rmat{scale}_ef{ef}_s7_dag", build)


def main():
    if "clique5" in sys.argv:
        from graphminer_tpu.ops.cliquek import CliqueKEngine
        t0 = time.time()
        ck = CliqueKEngine(dag(18), 5)
        print(f"clique5 prep {time.time()-t0:.1f}s "
              f"n_tri={ck.n_tri} n_lo={ck.n_lo} "
              f"buckets={[(c.shape[1], r.shape[0]) for r, c, _, _ in ck.tri_buckets]}",
              flush=True)
        t0 = time.time()
        tot = ck.count()
        print(f"clique5 rmat18 = {tot} warm {time.time()-t0:.1f}s "
              f"(golden 55374832965: {'OK' if tot == 55374832965 else 'WRONG'})",
              flush=True)
        s = ck.timed_slope(samples=3)
        print(f"clique5 slope: edges/s={s['edges_per_s']/1e6:.2f}M "
              f"tasks/s={s['tasks_per_s']/1e6:.1f}M latency={s['latency_s']:.2f}s "
              f"tf={['%.2f' % x for x in s['times_full']]}", flush=True)
        ck = None
        gc.collect()

    if "rect" in sys.argv:
        from graphminer_tpu.ops.rectangle import rectangle_count_fast
        for scale, want in ((14, 571816674), (18, None), (20, None)):
            try:
                g = rmat(scale, 16, seed=7)
                t0 = time.time()
                n = rectangle_count_fast(g)
                dt = time.time() - t0
                chk = "" if want is None else \
                    (" OK" if n == want else f" WRONG(!= {want})")
                print(f"rect rmat{scale} = {n} in {dt:.1f}s{chk}", flush=True)
            except Exception as e:
                print(f"rect rmat{scale} failed: {type(e).__name__}: {e}",
                      flush=True)
            g = None
            gc.collect()


if __name__ == "__main__":
    main()

def stream_probe():
    from graphminer_tpu.ops.stream import StreamEngine
    import numpy as np
    t0 = time.time()
    eng = StreamEngine(dag(18))
    print(f"stream prep {time.time()-t0:.1f}s bytes={eng.stream.nbytes()/1e9:.3f}GB "
          f"buckets={len(eng.stream.buckets)}", flush=True)
    t0 = time.time()
    tot = eng.count()
    print(f"stream rmat18 tri={tot} compile+warm {time.time()-t0:.1f}s "
          f"({'OK' if tot == 82947332 else 'WRONG'})", flush=True)
    s = eng.timed_slope(samples=9)
    tf = sorted(s['times_full'])
    print(f"stream slope={s['edges_per_s']/1e6:.0f}M edges/s "
          f"latency min={min(s['times_full'])*1e3:.1f}ms "
          f"median={tf[len(tf)//2]*1e3:.1f}ms th_min={min(s['times_half'])*1e3:.1f}ms",
          flush=True)


if __name__ == "__main__" and "stream" in sys.argv:
    stream_probe()

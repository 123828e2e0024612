"""Round-5 chip probe #2: rmat19 headline candidates + fixed engines."""
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


def p(*a):
    print(*a, flush=True)


def main():
    if "stream19" in sys.argv:
        from graphminer_tpu.ops.ring import RingEngine
        from graphminer_tpu.ops.stream import StreamEngine
        g = dag(19)
        t0 = time.time()
        eng = StreamEngine(g)
        p(f"stream19 prep {time.time()-t0:.1f}s "
          f"bytes={eng.stream.nbytes()/1e9:.3f}GB")
        t0 = time.time()
        tot = eng.count()
        p(f"stream19 tri={tot} warm {time.time()-t0:.1f}s")
        s = eng.timed_slope(samples=9)
        tf, th = sorted(s["times_full"]), sorted(s["times_half"])
        med = lambda x: x[len(x) // 2]
        de = s["tasks_full"] - s["tasks_half"]
        p(f"stream19 slope_min={s['edges_per_s']/1e6:.0f}M "
          f"slope_med={de/max(med(tf)-med(th),1e-9)/1e6:.0f}M "
          f"tf_min={min(tf)*1e3:.1f} tf_med={med(tf)*1e3:.1f} "
          f"th_min={min(th)*1e3:.1f} th_med={med(th)*1e3:.1f} ms")
        eng = None
        gc.collect()
        t0 = time.time()
        ring = RingEngine(g, use_pallas=False)
        rtot = ring.count()
        p(f"ring19 tri={rtot} ({time.time()-t0:.1f}s) "
          f"{'CROSS-OK' if rtot == tot else 'MISMATCH'}")
        ring = None
        g = None
        gc.collect()

    if "rect" in sys.argv:
        from graphminer_tpu.ops.rectangle import rectangle_count_fast
        for scale in (18, 20):
            try:
                g = rmat(scale, 16, seed=7)
                t0 = time.time()
                n = rectangle_count_fast(g)
                p(f"rect rmat{scale} = {n} in {time.time()-t0:.1f}s")
                if scale == 18:
                    t0 = time.time()
                    n2 = rectangle_count_fast(g, core=1024)
                    p(f"rect rmat{scale} core=1024 = {n2} in "
                      f"{time.time()-t0:.1f}s "
                      f"{'SPLIT-OK' if n2 == n else 'MISMATCH'}")
            except Exception as e:
                p(f"rect rmat{scale} failed: {type(e).__name__}: "
                  f"{str(e)[:300]}")
            g = None
            gc.collect()

    if "clique5" in sys.argv:
        from graphminer_tpu.ops.cliquek import CliqueKEngine
        t0 = time.time()
        ck = CliqueKEngine(dag(18), 5)
        p(f"clique5 prep {time.time()-t0:.1f}s n_tri={ck.n_tri} "
          f"n_lo={ck.n_lo} hi_words={ck.hi_words}")
        t0 = time.time()
        tot = ck.count()
        p(f"clique5 rmat18 = {tot} warm {time.time()-t0:.1f}s "
          f"({'OK' if tot == 55374832965 else 'WRONG'})")
        s = ck.timed_slope(samples=3)
        p(f"clique5 slope: edges/s={s['edges_per_s']/1e6:.2f}M "
          f"tasks/s={s['tasks_per_s']/1e6:.1f}M "
          f"latency={s['latency_s']:.2f}s")
        ck = None
        gc.collect()

    if "house" in sys.argv:
        from graphminer_tpu.ops.house import house_count_fast
        try:
            g = rmat(18, 16, seed=7)
            t0 = time.time()
            n = house_count_fast(g)
            p(f"house rmat18 = {n} in {time.time()-t0:.1f}s")
        except Exception as e:
            p(f"house rmat18 failed: {type(e).__name__}: {str(e)[:300]}")
        g = None
        gc.collect()


if __name__ == "__main__":
    main()

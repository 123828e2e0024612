"""Partitioned + multi-process counting (parallel/distributed.py).

The 2-process test is the reference's `mpirun -np 2` smoke (SURVEY §4.6) as
jax.distributed over CPU: two spawned processes, each counting its own
induced halo partition, allgather-summed to the exact golden count.
"""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

from graphminer_tpu.core.plan import TRIANGLE, DIAMOND, RECTANGLE, clique_plan
from graphminer_tpu.parallel.distributed import (count_pattern_partitioned,
                                                 plan_halo_hops)
from graphminer_tpu.io.synth import rmat


def test_plan_halo_hops():
    from graphminer_tpu.core.plan import HOUSE, PENTAGON
    assert plan_halo_hops(TRIANGLE) == 1
    assert plan_halo_hops(clique_plan(5)) == 1
    assert plan_halo_hops(DIAMOND) == 1
    assert plan_halo_hops(RECTANGLE) == 2
    assert plan_halo_hops(HOUSE) == 2
    assert plan_halo_hops(PENTAGON) == 2


@pytest.fixture(scope="module")
def citeseer():
    from graphminer_tpu import load_graph
    return load_graph("/root/reference/inputs/citeseer/graph")


def test_partitioned_triangles(citeseer):
    for n in (2, 3):
        assert count_pattern_partitioned(citeseer, TRIANGLE, n) == 1166


def test_partitioned_diamond(citeseer):
    assert count_pattern_partitioned(citeseer, DIAMOND, 2) == 3730


def test_partitioned_rectangle_needs_2hop(citeseer):
    # rectangle walks away from v0 → hops=2 (auto-selected)
    assert count_pattern_partitioned(citeseer, RECTANGLE, 2) == 6059


def test_partitioned_rmat_4clique():
    g = rmat(11, 8, seed=13)
    from graphminer_tpu.workloads.clique import clique_count
    want = clique_count(g, 4)
    assert count_pattern_partitioned(g, clique_plan(4), 3) == want


_WORKER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    from graphminer_tpu import load_graph
    from graphminer_tpu.core.plan import TRIANGLE
    from graphminer_tpu.parallel.distributed import (init_distributed,
                                                     count_pattern_multiprocess)
    from graphminer_tpu.parallel.partition import induced_partition_1d
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    init_distributed(coordinator=coord, num_processes=nproc, process_id=pid)
    g = load_graph("/root/reference/inputs/citeseer/graph")
    gd = g.orientation()
    part = induced_partition_1d(gd, nproc, hops=1)[pid]
    print(f"STATS pid={pid} owned={part.n_owned} "
          f"local_edges={part.graph.n_edges}", flush=True)
    total = count_pattern_multiprocess(g, TRIANGLE)
    print(f"TOTAL={total}", flush=True)
    assert total == 1166, total
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _run_procs(tmp_path, nproc, timeout=220):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no virtual-device forcing in workers
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(nproc), str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd="/root/repo", env=env, text=True) for i in range(nproc)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert "TOTAL=1166" in out, out[-2000:]
        assert f"STATS pid={i} " in out, out[-2000:]
    return outs


@pytest.mark.timeout(240)
def test_two_process_allreduce(tmp_path):
    """jax.distributed 2-process CPU run matching the citeseer golden —
    the `mpirun -np 2 tc_dist_cpu` equivalence."""
    _run_procs(tmp_path, 2)


@pytest.mark.timeout(420)
def test_four_process_allreduce(tmp_path):
    """4-process spawn (the north-star's 4-way multi-host shape): each
    rank prints its partition stats (owned vertices, halo-local edges) and
    the allgather-summed global count must be the exact golden."""
    outs = _run_procs(tmp_path, 4, timeout=400)
    stats = [l for out in outs for l in out.splitlines()
             if l.startswith("STATS")]
    assert len(stats) == 4

"""GKS differential tests vs brute force."""
import itertools

import numpy as np
import pytest

from graphminer_tpu.io.synth import labeled_er
from graphminer_tpu.workloads.keyword import gks_count


def oracle_gks(g, k, keywords):
    vl = g.vlabels.astype(int)
    kw = sorted(set(keywords))
    n = g.n_vertices
    rp, col = g.rowptr, g.colidx
    adj = lambda v: set(int(x) for x in col[rp[v]:rp[v + 1]])

    def connected(vs):
        vs = list(vs)
        seen = {vs[0]}
        stack = [vs[0]]
        vset = set(vs)
        while stack:
            w = stack.pop()
            for u in adj(w):
                if u in vset and u not in seen:
                    seen.add(u); stack.append(u)
        return len(seen) == len(vs)

    count = 0
    for combo in itertools.combinations(range(n), k):
        labs = [int(vl[v]) for v in combo]
        if any(labs.count(a) != 1 for a in kw):
            continue
        if not connected(combo):
            continue
        ok = True
        for v in combo:
            if int(vl[v]) in kw:
                continue
            rest = [w for w in combo if w != v]
            if connected(rest):
                ok = False
                break
        count += ok
    return count


@pytest.mark.parametrize("seed,n,p,k,kw", [
    (0, 18, 0.25, 3, (1, 2, 3)),
    (1, 20, 0.2, 4, (1, 2, 3)),
    (2, 16, 0.35, 3, (1, 2)),
    (3, 14, 0.3, 4, (1, 2, 3, 4)),
])
def test_gks_vs_oracle(seed, n, p, k, kw):
    g = labeled_er(n, p, n_vlabels=max(kw) + 1, seed=seed)
    assert gks_count(g, k, kw) == oracle_gks(g, k, kw)


def test_gks_citeseer_smoke(citeseer):
    got = gks_count(citeseer, 3, (1, 2, 3))
    assert got >= 0

"""k-motif counting (k-MC): all induced connected k-vertex pattern counts.

Parity: src/motif/ in the reference — the *formula* backend
(omp_formula.cc:39-47, cmap_formula.h): enumerate only the expensive patterns
(triangles per edge, 4-cliques, 4-cycles), derive the rest arithmetically by
inclusion–exclusion over non-induced counts. This maps perfectly onto TPU:
two frontier-engine enumerations + batched per-edge intersect counts + dense
degree arithmetic, instead of 6 nested-loop passes.

Counts are exact and match the reference's README tables
(src/motif/README.md:49-60) — verified on citeseer in tests.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..core.plan import clique_plan, RECTANGLE
from ..engine.frontier import count_pattern
from .triangle import triangle_count, triangles_per_edge

MOTIF3_NAMES = ("wedge", "triangle")
MOTIF4_NAMES = ("4path", "3star", "4cycle", "tailedtriangle", "diamond", "4clique")


def _comb2(x):
    return x * (x - 1) // 2


def _comb3(x):
    return x * (x - 1) * (x - 2) // 6


def motif3_count(g, chunk: int = 4096) -> Dict[str, int]:
    """Induced 3-motifs: wedges = Σ C(d,2) − 3T, triangles = T."""
    t = triangle_count(g, chunk=chunk)
    d = g.degrees().astype(np.int64)
    wedges = int(_comb2(d).sum()) - 3 * t
    return {"wedge": wedges, "triangle": t}


def motif4_count(g, chunk: int = 2048) -> Dict[str, int]:
    """Induced 4-motifs via pattern decomposition.

    Non-induced building blocks:
      k4        — 4-clique enumeration (DAG frontier engine)
      c4_ni     — rectangle enumeration (= C4 + D + 3·K4)
      diamond_ni = Σ_e C(tri_e, 2)
      tt_ni      = Σ_v t_v (d_v − 2)
      p4_ni      = Σ_e (d_u−1)(d_v−1) − 3T
      s3_ni      = Σ_v C(d_v, 3)
    then invert the containment matrix (verified against brute force)."""
    d = g.degrees().astype(np.int64)
    src, dst = g.edge_list(sym_break=True)

    tri_e = np.asarray(triangles_per_edge(g, src, dst, chunk=chunk),
                       dtype=np.int64)
    t_total = int(tri_e.sum()) // 3

    # per-vertex triangle participation: each triangle at v contributes to 2
    # of v's incident edges
    t2 = np.zeros(g.n_vertices, dtype=np.int64)
    np.add.at(t2, src, tri_e)
    np.add.at(t2, dst, tri_e)
    t_v = t2 // 2

    k4 = count_pattern(g, clique_plan(4), chunk=chunk)
    c4_ni = count_pattern(g, RECTANGLE, chunk=chunk)

    diamond_ni = int(_comb2(tri_e).sum())
    tt_ni = int((t_v * (d - 2)).sum())
    p4_ni = int(((d[src] - 1) * (d[dst] - 1)).sum()) - 3 * t_total
    s3_ni = int(_comb3(d).sum())

    K4 = k4
    D = diamond_ni - 6 * K4
    C4 = c4_ni - D - 3 * K4
    TT = tt_ni - 4 * D - 12 * K4
    S3 = s3_ni - TT - 2 * D - 4 * K4
    P4 = p4_ni - 2 * TT - 4 * C4 - 6 * D - 12 * K4
    return {"4path": P4, "3star": S3, "4cycle": C4, "tailedtriangle": TT,
            "diamond": D, "4clique": K4}


def motif_count(g, k: int, chunk: int = 2048) -> Dict[str, int]:
    if k == 3:
        return motif3_count(g, chunk=chunk)
    if k == 4:
        return motif4_count(g, chunk=chunk)
    raise NotImplementedError(f"k={k} motifs not yet supported (have 3, 4)")

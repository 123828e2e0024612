"""Pattern-file input (pattern.cc:80 read_adj_file + the CSR binaries in
codegen/input_patterns/*): arbitrary-pattern parity with the reference's
`sgl <graph> <pattern_file>` CLI."""
import os

import numpy as np
import pytest

from graphminer_tpu.core.pattern_graph import PatternGraph, NAMED_PATTERNS
from graphminer_tpu.workloads.sgl import sgl_count

PAT_DIR = "/root/reference/codegen/input_patterns"

# reference pattern dir -> (named equivalent, citeseer golden
# src/sgl/README.md:53 / src/count/README.md:41 / triangle/README.md:53)
CASES = {
    "triangle": ("triangle", 1166),
    "diamond": ("diamond", 3730),
    "cyc4": ("rectangle", 6059),
    "hourglass": ("hourglass", 16034),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_binary_pattern_files_citeseer(citeseer, name):
    equiv, want = CASES[name]
    pat = PatternGraph.from_file(os.path.join(PAT_DIR, name))
    # structural equivalence with the named pattern
    assert pat.canonical_key() == NAMED_PATTERNS[equiv].canonical_key()
    assert sgl_count(citeseer, f"@{PAT_DIR}/{name}") == want


def test_adj_text_pattern(tmp_path, citeseer):
    # pattern.cc read_adj_file 2-int lines: a diamond as edge list
    f = tmp_path / "diamond.txt"
    f.write_text("0 1\n0 2\n1 2\n1 3\n2 3\n")
    assert sgl_count(citeseer, f"@{f}") == 3730


def test_adj_text_labeled_parse(tmp_path):
    # 4-int lines carry vertex labels (LABELLED mode)
    f = tmp_path / "lab.txt"
    f.write_text("0 5 1 7\n1 7 2 5\n")
    pat = PatternGraph.from_file(str(f))
    assert pat.n_vertices == 3
    assert pat.vlabels == (5, 7, 5)
    assert pat.edges == ((0, 1), (1, 2))


def test_cli_pattern_file(citeseer):
    from graphminer_tpu.__main__ import main
    out = main(["sgl", "/root/reference/inputs/citeseer/graph",
                f"@{PAT_DIR}/diamond", "--cpu", "--json"])
    assert out is None or True  # main prints; smoke only

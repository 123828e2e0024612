"""CLI surface (__main__.py): workload dispatch, flags, profiler output."""
import json

from graphminer_tpu.__main__ import main

CITESEER = "/root/reference/inputs/citeseer/graph"


def run_cli(capsys, *args):
    assert main(list(args) + ["--json"]) == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_cli_tc(capsys):
    out = run_cli(capsys, "tc", CITESEER, "--cpu")
    assert out["total"] == 1166


def test_cli_tc_fast_and_profile(capsys):
    out = run_cli(capsys, "tc", CITESEER, "--cpu", "--fast", "--profile")
    assert out["total"] == 1166
    assert "profile" in out


def test_cli_clique4_fast(capsys):
    out = run_cli(capsys, "clique", CITESEER, "4", "--cpu", "--fast")
    assert out["total"] == 255


def test_cli_sgl_diamond_fast(capsys):
    out = run_cli(capsys, "sgl", CITESEER, "diamond", "--cpu", "--fast")
    assert out["total"] == 3730


def test_cli_tc_partitioned(capsys):
    out = run_cli(capsys, "tc", CITESEER, "--cpu", "--partition", "2",
                  "--profile")
    assert out["total"] == 1166
    assert out["profile"]["set_intersections_per_s"] > 0


def test_cli_fsm_elabels_conformance(capsys):
    """The fsm subcommand must load EDGE labels: the frozen citeseer anchor
    (4 frequent @ k<=3 minsup=100, independently numpy-verified) only
    reproduces with (vlabel, elabel, vlabel) pattern keys — the r4 CLI
    dropped use_elabel and computed the collapsed count instead."""
    out = run_cli(capsys, "fsm", CITESEER, "2", "100", "--cpu")
    assert out["total"] == 4


def test_cli_query_labeled_triangles(capsys):
    """query subcommand (reference query_omp_base parity). Frozen citeseer
    anchors: labeled triangles (0,0,3) = 11 and (0,0,0) = 116, verified
    against a direct numpy triangle enumeration + label-multiset count."""
    out = run_cli(capsys, "query", CITESEER, "0,0,3:0-1,0-2,1-2", "--cpu")
    assert out["total"] == 11
    out = run_cli(capsys, "query", CITESEER, "0,0,0:0-1,0-2,1-2", "--cpu")
    assert out["total"] == 116


def test_cli_unknown_backend_raises(capsys):
    import pytest
    with pytest.raises(ValueError):
        run_cli(capsys, "tc", CITESEER, "--cpu", "--backend", "pallas")

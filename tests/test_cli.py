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


def test_cli_unknown_backend_raises(capsys):
    import pytest
    with pytest.raises(ValueError):
        run_cli(capsys, "tc", CITESEER, "--cpu", "--backend", "pallas")

"""CLI surface (tsrollup/cli.py): build → score → query round-trip using
main() directly (the spark-submit drive of the same surface is the verify
recipe; this pins the argument wiring)."""

import json
import os
import shutil

from tsrollup.cli import main
from tsrollup.synth import write_fixture

from .conftest import FIXTURE_DIR

BASE = os.path.join(FIXTURE_DIR, "cli")


def test_cli_build_query_roundtrip(spark, capsys):
    fx = write_fixture(os.path.join(BASE, "fx"), 10_000, 10, seed=5)
    out = os.path.join(BASE, "store")
    shutil.rmtree(out, ignore_errors=True)

    assert main(["build", "--input", fx, "--out", out]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["input_rows"] > 0
    assert "derive_fused" in summary["phases"]

    assert main([
        "query", "--out", out,
        "--start", "2024-01-01T00:00:00", "--end", "2024-01-09T00:00:00",
        "--resolution", "3600", "--limit", "3",
    ]) == 0
    q = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert q["rows"] > 0 and q["tier"] == "1h"
    assert len(q["sample"]) == 3

    assert main([
        "query", "--decoded", "--out", out,
        "--start", "2024-01-01T00:00:00", "--end", "2024-01-09T00:00:00",
        "--resolution", "3600", "--limit", "2", "--metric", "tok_mean",
    ]) == 0
    qd = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert qd["rows"] >= q["rows"]  # decoded serves the gap-filled contract
    assert qd["sample"][0]["metric"] == "tok_mean"

    assert main(["score", "--out", out, "--tier", "1h"]) == 0
    sc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sc["tier"] == "1h" and sc["anomalies"] >= 0

    # --now-day threads retention awareness into the planner: with the
    # range inside every horizon the same rows come back; the arg wiring
    # (not just the default) is exercised
    assert main([
        "query", "--out", out,
        "--start", "2024-01-01T00:00:00", "--end", "2024-01-09T00:00:00",
        "--resolution", "3600", "--limit", "1", "--now-day", "2024-01-09",
    ]) == 0
    qn = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert qn["rows"] == q["rows"] and qn["tier"] == "1h"

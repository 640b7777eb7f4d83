"""CLI smoke tests for the batch jobs (subprocess — own JVM)."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_rollup_cli_gate_requires_sources():
    """--gate-manifest without --required-sources fails FAST (argparse
    error before any JVM boots — exit code 2, no Spark banner)."""
    r = subprocess.run(
        [sys.executable, str(REPO / "jobs" / "rollup.py"),
         "--input", "/nonexistent", "--output", "/tmp/x",
         "--gate-manifest", "/tmp/m"],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 2
    assert "required-sources" in r.stderr
    assert "SparkSession" not in r.stderr  # validated pre-JVM


def test_rollup_cli_end_to_end(tmp_path):
    """The full CLI on a tiny generated input: runs, writes tiers,
    prints the metrics JSON line."""
    from ecov003_l2t_stars_spark.sources.transcripts import (
        GenSpec,
        write_transcripts_parquet,
    )

    inp = tmp_path / "turns.parquet"
    write_transcripts_parquet(str(inp), GenSpec(n_convs=40))
    out = tmp_path / "tiers"
    r = subprocess.run(
        [sys.executable, str(REPO / "jobs" / "rollup.py"),
         "--input", str(inp), "--output", str(out),
         "--n-buckets", "4", "--master", "local[4]",
         "--tiers", "1h,1d", "--smooth-tiers", "1h"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.loads(r.stdout.strip().splitlines()[-1])
    assert metrics["buckets_processed"] == 4
    assert metrics["rows_processed"] > 0
    assert (out / "rollup_1h").exists()
    assert (out / "rollup_1d").exists()
    assert (out / "checkpoints").exists()

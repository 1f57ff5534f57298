"""Opt-in execution-shape gate (SPARK_GRAFT_SHAPE_GATE=1).

Each axis re-runs the DuckDB-oracle compare under a runtime shape the
production target presents and local[32] doesn't: a different
partition count, no AQE, the interpreted expression engine, hostile
Arrow batch boundaries, the RocksDB state store, the row-based
parquet reader. A session is a per-process singleton, so each axis
runs in a subprocess via ``python -m tests.shape_probe <axis>`` (see
that module).

Round-12 baseline: all six axes green over the full registry.
Budget ~10-20 min per wide axis — the same class of opt-in as the
sf0.1 scale gate, not part of the default suite.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SHAPE_GATE") != "1",
    reason="execution-shape gate is opt-in: SPARK_GRAFT_SHAPE_GATE=1",
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize(
    "axis",
    [
        "partitions7",
        "aqe_off",
        "no_codegen",
        "arrow137",
        "rocksdb",
        "no_vectorized_reader",
    ],
)
def test_shape_axis(axis):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    proc = subprocess.run(
        [sys.executable, "-m", "tests.shape_probe", axis],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    tail = "\n".join(proc.stdout.splitlines()[-5:])
    assert proc.returncode == 0, f"axis {axis} failed:\n{tail}\n{proc.stderr[-800:]}"
    assert "FAILS: []" in proc.stdout, tail

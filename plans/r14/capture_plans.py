"""Capture .explain("formatted") for every bench-flagged query.

Usage: python plans/r14/capture_plans.py <suffix> [names...]
Writes plans/r14/<query>_<suffix>.txt (suffix = before|after).
Round-14 optimization-round evidence artifact (guide §1 / §7.2).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

from beam_pyspark_runner_spark.queries import REGISTRY
from beam_pyspark_runner_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or [n for n, q in REGISTRY.items() if q.bench]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="capture_plans")
    out_dir = os.path.dirname(os.path.abspath(__file__))
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(f"captured {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()

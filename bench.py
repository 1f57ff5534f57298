"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized executor-side via a count() over the
result (no driver collect of payload rows) after a warm-up that loads
file indexes and JIT; timing covers plan+execute per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

from beam_pyspark_runner_spark.queries import REGISTRY
from beam_pyspark_runner_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(app_name="bench")

    names = [n for n, q in REGISTRY.items() if q.bench]
    # Warm-up: JVM/codegen/file-index warm, not cached data.
    REGISTRY[names[0]].fn(spark, sf_dir).count()
    # Streaming machinery warm-up (state-store + micro-batch classes load
    # lazily; ~3 s of one-time class-loading is startup, not throughput).
    # A 1-row rate stream drained to a memory sink touches no fixture data.
    import pyspark.sql.functions as _F

    (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .withWatermark("timestamp", "0 seconds")
        .groupBy(_F.window("timestamp", "1 second"))
        .count()
        .writeStream.format("memory").queryName("bench_warmup")
        .outputMode("complete")
        .trigger(availableNow=True).start().awaitTermination()
    )

    # Median of 3 runs per query (round-5 verdict ask #2): single-shot
    # timings on a shared host showed ±15% swings (pagerank/q10/ivf in
    # BENCH_r05) that were host variance, not plan changes. The total is
    # the SUM OF MEDIANS, so one loaded-host outlier can no longer move
    # the headline number. Override with SPARK_GRAFT_BENCH_REPS=1 for a
    # quick iteration loop.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    timings: dict[str, float] = {}
    for name in names:
        samples = []
        for _ in range(reps):
            start = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - start)
        timings[name] = round(sorted(samples)[len(samples) // 2], 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())

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

    timings: dict[str, float] = {}
    for name in names:
        start = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - start, 4)

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

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

    # Median of N WARM runs per query (round-5 verdict ask #2; ADVICE-r6
    # methodology fixes): single-shot timings on a shared host showed
    # ±15% swings that were host variance, not plan changes.
    # Semantics, stated where the numbers are made: each query gets ONE
    # untimed warm-up run (OS page cache + codegen), then the published
    # number is the MEDIAN OF >= `reps` WARM runs — deliberately the
    # steady-state cost, not the cold-cache cost, and NOT comparable to
    # pre-r6 single-shot history (noted in README). Sub-second queries
    # (ADVICE-r6 / verdict #3: the join_inner/q18 ±40% jitter) take 5
    # samples — scheduler noise dominates at that magnitude. The total
    # is the SUM OF MEDIANS, so one loaded-host outlier cannot move the
    # headline. SPARK_GRAFT_BENCH_REPS=1 = quick iteration loop:
    # single shot, no warm-up, no extra fast-query reps.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    fast_reps = max(reps, int(os.environ.get("SPARK_GRAFT_BENCH_REPS_FAST", "5")))

    def median(xs: list[float]) -> float:
        xs = sorted(xs)
        mid = len(xs) // 2
        if len(xs) % 2:
            return xs[mid]
        return (xs[mid - 1] + xs[mid]) / 2.0

    # Host-noise legibility (round-8 verdict #5): publish min alongside
    # the median and stamp 1-min loadavg before/after the sweep. A
    # loaded-host run shows median >> min and a high load stamp, so a
    # drift-vs-last-round adjudication needs no re-measure cycle.
    # Round-11 addition: loadavg can read 0.4 while the VM runs ~2x
    # slow (hypervisor frequency capping shows neither in loadavg nor
    # in steal%), so also stamp a fixed single-thread spin calibration
    # — cross-round query-time comparisons divide by this first.
    def _cpu_calib() -> float:
        t0 = time.perf_counter()
        acc = 0
        for i in range(10_000_000):
            acc += i * i
        return round(time.perf_counter() - t0, 4)

    cpu_calib = _cpu_calib()
    load_before = round(os.getloadavg()[0], 2)
    timings: dict[str, float] = {}
    stats: dict[str, dict[str, float]] = {}
    for name in names:
        fn = REGISTRY[name].fn
        if reps > 1:
            fn(spark, sf_dir).count()  # per-query warm-up, untimed
        samples: list[float] = []
        while True:
            start = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - start)
            want = reps if (reps == 1 or median(samples) >= 1.0) else fast_reps
            if len(samples) >= want:
                break
        timings[name] = round(median(samples), 4)
        stats[name] = {
            "reps": len(samples),
            "min": round(min(samples), 4),
            "median": timings[name],
        }

    total = round(sum(timings.values()), 4)
    # The driver records only the LAST ~2000 chars of stdout, so the
    # one contract JSON line must fit whole inside that tail (the r9/
    # r10 artifacts landed parsed=null because per-query rep stats
    # pushed the line past the capture). Per-query medians stay on the
    # line (~900 chars for 22 queries); the full rep stats go to a
    # sidecar file next to this script instead of stdout.
    sidecar = {
        "query_stats": stats,
        "loadavg_1m": {
            "before": load_before,
            "after": round(os.getloadavg()[0], 2),
        },
        "cpu_calib_sec": {"before": cpu_calib, "after": _cpu_calib()},
        "sf": sf,
        "total_sec": total,
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_stats.json"),
        "w",
    ) as fh:
        json.dump(sidecar, fh, indent=1)
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

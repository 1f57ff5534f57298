"""Streaming execution helpers.

``run_stream_to_df`` executes a streaming DataFrame to completion with
``Trigger.AvailableNow`` (process-everything-then-stop) into a named
memory sink and returns the result as a batch DataFrame. This makes
every streaming query oracle-checkable: the same event-time logic must
produce the same result whether the input arrives as one batch or as a
replayed stream — which is exactly Structured Streaming's contract.

On a real cluster the memory sink would be a Delta/Kafka/parquet sink;
nothing else changes — the transformation graph is identical.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_sink_counter = itertools.count()


def read_parquet_stream(
    spark: SparkSession, path: str, schema: T.StructType, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over a parquet path (schema must be explicit —
    streaming sources don't infer). ``maxFilesPerTrigger`` forces multi-
    batch execution so stateful operators actually exercise state."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def run_stream_to_df(
    streaming_df: DataFrame, output_mode: str = "complete", timeout_sec: int = 300
) -> DataFrame:
    """Run a streaming DataFrame to exhaustion (AvailableNow) and return
    the final memory-sink table as a batch DataFrame.

    State-store sizing: a stateful stream instantiates one state-store
    per shuffle partition, and that count is FROZEN into the checkpoint
    at stream start — so it must be sized to key cardinality and
    throughput, not inherited from the batch default. The local replay
    harness holds thousands of keys, where 32 store instances' per-batch
    maintenance dominates wall-clock (measured 3.7 s → 2.1 s at 8 on the
    tumbling bench; round-13 re-measure: 8 → 4 roughly halves it again —
    p8 [2.6..3.5] vs p4 [1.5..1.7] — and 2 is no better than 4, so 4 is
    the local floor where maintenance stops dominating); production
    streams set ``spark.graft.stream.partitions`` explicitly (hundreds,
    for millions of keys). Partition count never affects results — only
    where state lives.

    Python-stateful streams (applyInPandasWithState) get a WIDER default
    (round-14, guide §4/§2.2): their per-partition cost is dominated not
    by store maintenance but by the per-key Python protocol (per-key
    Arrow slice→pandas conversion, GroupState construct, json+pickle
    state round-trip — pyspark's serializer, ~ms/key), which parallelizes
    one Python worker per partition. Measured on the session-timeout
    state stage at sf0.1/local[32], interleaved min-of-4: p4 5.44 s,
    p8 4.42, p16 3.77, p32 4.48 (maintenance overtakes) — optimum at
    half the task slots, so the default derives from defaultParallelism
    rather than a local constant (8-core hosts derive 4, unchanged).
    JVM-stateful streams keep the maintenance floor of 4."""
    spark = streaming_df.sparkSession
    key = "spark.sql.shuffle.partitions"
    saved = spark.conf.get(key)
    target = spark.conf.get("spark.graft.stream.partitions", "")
    if not target:
        try:
            analyzed = streaming_df._jdf.queryExecution().analyzed().toString()
            py_stateful = "FlatMapGroupsInPandasWithState" in analyzed
        except Exception:  # noqa: BLE001 — plan introspection is best-effort
            py_stateful = False
        if py_stateful:
            target = str(max(4, spark.sparkContext.defaultParallelism // 2))
        else:
            target = str(min(4, int(saved)))
    name = f"stream_result_{next(_sink_counter)}"
    spark.conf.set(key, target)
    try:
        # the stream captures the conf at start(); restore right after so
        # concurrent/subsequent batch plans keep the session default
        query = (
            streaming_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set(key, saved)
    try:
        if not query.awaitTermination(timeout_sec):
            raise TimeoutError(f"streaming query {name} did not finish in {timeout_sec}s")
    finally:
        if query.isActive:
            query.stop()
    return streaming_df.sparkSession.table(name)

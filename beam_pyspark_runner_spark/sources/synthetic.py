"""Custom Python DataSource: a split-parallel deterministic generator.

The reference's entire source surface is line-oriented text
(``/root/reference/beam_pyspark_runner/transform_evaluators.py:22-26``).
Beyond the full builtin reader set (readers.py), this module shows the
modern way to add a NEW source to Spark from Python: the Spark 4
DataSource API (SPARK-44076). The source describes its own *splits*
(``partitions()``), each executor reads only its split, and Catalyst
treats the scan like any other relation — so a custom connector
parallelizes across 1000 executors exactly like parquet does, instead
of funneling through a driver-side iterator.

The demo source generates rows by pure integer arithmetic on the row
id, so any slice of it is computable anywhere — and, crucially for this
repo's correctness protocol, DuckDB can reproduce the identical table
from ``range()``, giving the custom-connector path a value-hash oracle.

Scale notes (100 TB): splits are the unit of parallelism and there is
no driver-side data path at all; a real connector (REST cursor, Kafka
range, scientific format) keeps this exact shape and swaps the split
enumeration + per-split iterator.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

try:  # Spark >= 4 (SPARK-44076); gate so older builds still import us
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )

    HAVE_PYTHON_DATASOURCE = True
except ImportError:  # pragma: no cover
    HAVE_PYTHON_DATASOURCE = False
    DataSource = object  # type: ignore[assignment,misc]
    DataSourceReader = object  # type: ignore[assignment,misc]
    DataSourceStreamReader = object  # type: ignore[assignment,misc]
    InputPartition = object  # type: ignore[assignment,misc]


# Deterministic row formula (Knuth multiplicative hash on the row id).
# Mirrored 1:1 by synth_rows_oracle_sql below — keep the two in sync.
_MOD = 2_147_483_647  # 2^31 - 1, keeps every product < 2^53 (exact double)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class SyntheticRowsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", 100_000))
        self.num_parts = int(options.get("parts", 32))

    def partitions(self):
        step = max(1, -(-self.rows // self.num_parts))
        return [
            _RangePartition(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            h = (i * 2654435761) % _MOD
            yield i, h % 97, float(h % 10_000) / 100.0


class SyntheticRowsDataSource(DataSource):
    """``spark.read.format("synthetic_rows").option("rows", N)`` source."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_rows"

    def schema(self) -> str:
        return "id bigint, bucket int, v double"

    def reader(self, schema) -> SyntheticRowsReader:
        return SyntheticRowsReader(self.options)


class SyntheticStreamReader(DataSourceStreamReader):
    """Partition-parallel STREAMING reader over the same generator.

    This is the executor-side streaming connector API (not the driver-
    prefetching ``SimpleDataSourceStreamReader``): the engine asks the
    driver only for offsets and split boundaries; every ``read(split)``
    runs on an executor. Offsets are plain row positions, so replay
    between two committed offsets (``partitions(start, end)``) is exact
    — the property checkpoint recovery depends on.

    Under ``Trigger.AvailableNow`` Spark snapshots ``latestOffset()``
    once and drains up to it, so the reader reports everything available
    and relies on splits (``chunk`` rows each) for parallelism. A live
    deployment would instead return the current tail of a Kafka range /
    REST cursor on each ``latestOffset()`` poll; nothing else changes.
    """

    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", 20_000))
        self.chunk = int(options.get("chunk", 4_096))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def latestOffset(self) -> dict:
        return {"i": self.rows}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["i"], end["i"]
        if hi <= lo:
            return [_RangePartition(lo, lo)]
        return [
            _RangePartition(o, min(o + self.chunk, hi))
            for o in range(lo, hi, self.chunk)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            h = (i * 2654435761) % _MOD
            yield i, h % 97, float(h % 10_000) / 100.0

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: the generator is stateless


class SyntheticStreamDataSource(DataSource):
    """``spark.readStream.format("synthetic_stream")`` source."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_stream"

    def schema(self) -> str:
        return "id bigint, bucket int, v double"

    def streamReader(self, schema) -> SyntheticStreamReader:
        return SyntheticStreamReader(self.options)


def register_synthetic_source(spark: SparkSession) -> None:
    """Idempotently register the custom sources with this session."""
    if not HAVE_PYTHON_DATASOURCE:
        raise NotImplementedError(
            "the Python DataSource API needs Spark >= 4 (SPARK-44076)"
        )
    spark.dataSource.register(SyntheticRowsDataSource)
    spark.dataSource.register(SyntheticStreamDataSource)


def synth_rows_oracle_sql(rows: int) -> str:
    """DuckDB replica of the generator for oracle comparison."""
    return f"""
    SELECT CAST(range AS BIGINT) AS id,
           CAST((range * 2654435761) % {_MOD} % 97 AS INTEGER) AS bucket,
           CAST((range * 2654435761) % {_MOD} % 10000 AS DOUBLE) / 100.0 AS v
    FROM range({rows})
    """


if HAVE_PYTHON_DATASOURCE:
    from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage

    class _ShardCommit(WriterCommitMessage):
        def __init__(self, staged_path: str, rows: int) -> None:
            self.staged_path = staged_path
            self.rows = rows

    class JsonShardWriter(DataSourceWriter):
        """Executor-side writer with a real two-phase commit: each task
        streams its rows to a UNIQUELY-NAMED staged JSONL shard and
        returns (path, rows) as its commit message; only the driver's
        ``commit()`` renames staged shards into place and writes the
        ``_MANIFEST`` — so readers (who go through the manifest) never
        observe a partial job, and ``abort()`` leaves the target
        untouched. This is the task-commit protocol every distributed
        sink needs (speculative/retried tasks write distinct staged
        files; losers are simply never committed). Local FS here; on a
        cluster the same shape runs against any shared/object store
        with atomic rename or manifest-pointer semantics.
        """

        def __init__(self, options: dict) -> None:
            self.path = options["path"]

        def write(self, iterator):
            import json
            import os
            import uuid

            staging = os.path.join(self.path, "_staging")
            os.makedirs(staging, exist_ok=True)
            shard = os.path.join(staging, f"shard-{uuid.uuid4().hex}.jsonl")
            n = 0
            with open(shard, "w") as f:
                for row in iterator:
                    # json.dumps uses repr-shortest floats: doubles
                    # round-trip bit-exactly through the shard
                    f.write(json.dumps(row.asDict()) + "\n")
                    n += 1
            return _ShardCommit(shard, n)

        def commit(self, messages) -> None:
            import json
            import os

            final = []
            for m in messages:
                if m is None:
                    continue
                dest = os.path.join(self.path, os.path.basename(m.staged_path))
                os.replace(m.staged_path, dest)
                final.append({"file": os.path.basename(dest), "rows": m.rows})
            with open(os.path.join(self.path, "_MANIFEST"), "w") as f:
                json.dump(sorted(final, key=lambda x: x["file"]), f)

        def abort(self, messages) -> None:
            import os

            for m in messages:
                if m is not None and os.path.exists(m.staged_path):
                    os.remove(m.staged_path)

    class JsonShardSinkDataSource(DataSource):
        """``df.write.format("jsonl_shards").option("path", p)`` sink."""

        @classmethod
        def name(cls) -> str:
            return "jsonl_shards"

        def writer(self, schema, overwrite: bool) -> JsonShardWriter:
            return JsonShardWriter(self.options)

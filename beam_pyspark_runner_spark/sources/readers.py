"""Readers for the engine.

The reference supports exactly one source, line-oriented text
(``/root/reference/beam_pyspark_runner/transform_evaluators.py:22-26``);
here we provide the full Spark source surface (text/csv/json/parquet/orc)
plus loaders for the driver's TPC-H-ish parquet testdata.

All readers return plain DataFrames so Catalyst keeps pushdown/pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Parquet SCHEMA cache per (file path, mtime, size): metadata only —
# never rows, never results. Without it every load_table() call runs a
# footer-read job (~0.1-0.3 s driver-side) even for a table read
# moments earlier in the same process; a metastore/Iceberg catalog
# provides exactly this in production. The mtime+size key means a
# changed fixture at the same path can never serve a stale schema.
_SCHEMA_CACHE: dict[tuple[str, float, int], T.StructType] = {}


def _parquet_schema(spark: SparkSession, path: str) -> T.StructType:
    try:
        st = os.stat(path)
        key = (path, st.st_mtime, st.st_size)
    except OSError:
        # directory-less path semantics (globs etc.): no safe cache key
        return spark.read.parquet(path).schema
    if key not in _SCHEMA_CACHE:
        _SCHEMA_CACHE[key] = spark.read.parquet(path).schema
    return _SCHEMA_CACHE[key]


# Parquet ROWCOUNT cache (footer statistic, same mtime+size key and the
# same rationale as the schema cache above): used only for plan-gate
# decisions (e.g. "is this dimension broadcastable"), never as a query
# result. Reading the footer via pyarrow avoids a per-call Spark job.
_ROWCOUNT_CACHE: dict[tuple[str, float, int], int] = {}


def parquet_rowcount(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Exact row count of one testdata table from parquet footer
    metadata — a metadata read, not a data scan."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        st = os.stat(path)
        key = (path, st.st_mtime, st.st_size)
    except OSError:
        return load_table(spark, sf_dir, name).count()
    if key not in _ROWCOUNT_CACHE:
        try:
            import pyarrow.parquet as pq

            _ROWCOUNT_CACHE[key] = pq.ParquetFile(path).metadata.num_rows
        except Exception:
            _ROWCOUNT_CACHE[key] = load_table(spark, sf_dir, name).count()
    return _ROWCOUNT_CACHE[key]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (columnar scan; filters/projections push down).

    ``events.ts`` has shipped in two fixture encodings across driver
    rounds: parquet TIMESTAMP(NANOS) (arrives as raw-nanos BIGINT under
    the session's ``nanosAsLong`` flag) and plain TIMESTAMP(MICROS)
    (arrives as TIMESTAMP_NTZ under Spark 4's NTZ inference). Normalize
    both to session-zoned TimestampType here so every downstream query —
    windows, watermarks, the DuckDB oracle compare — sees one stable
    type. The session timezone is UTC (session.py), so the NTZ→TS cast
    is a pure re-tag of the same wall-clock instant, byte-identical to
    DuckDB's naive-timestamp reading.
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # Fallback for sessions not built by session.get_spark (the
        # external driver passes its own): a TIMESTAMP(NANOS) fixture
        # fails the scan outright without nanosAsLong. Idempotent — and
        # a no-op for micros-encoded fixtures.
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # The NTZ→TimestampType re-tag below is only identity when the
        # session timezone is UTC. Sessions built by session.get_spark
        # already are; the external driver supplies its own session, so
        # pin it here too — otherwise every instant (and hour-window
        # boundary) would shift relative to the DuckDB naive-ts oracle.
        if spark.conf.get("spark.sql.session.timeZone", "") != "UTC":
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.schema(_parquet_schema(spark, path)).parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # nanos-as-long fixture: lossless floor to micros (the
            # fixture's instants are exactly microsecond-granular).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif not isinstance(ts_type, T.TimestampType):
            # TIMESTAMP_NTZ (or anything else timestamp-like): re-tag as
            # session-zoned. Session tz is UTC, so values are unchanged.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.schema(_parquet_schema(spark, path)).parquet(path)


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register testdata tables as temp views for spark.sql queries."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented text source: one row per line, column ``value: string``.

    Reference parity: ``ReadFromText`` (transform_evaluators.py:22-26);
    globs are handled natively by Spark's file index.
    """
    return spark.read.text(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    **options,
) -> DataFrame:
    reader = spark.read.options(header=header, **options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None, **options
) -> DataFrame:
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


_SPREAD_PROBE_CACHE: dict[tuple, int] = {}


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's default parallelism.

    Use before CPU-heavy narrow transforms (shingling, per-vector math):
    the testdata parquet files are single-row-group, so Spark cannot split
    them below one task per file and a heavy map stage would run on 1-3
    cores. The round-robin shuffle moves only the compact input rows and
    buys full parallelism for the expensive compute that follows. At
    production scale the same helper is a no-op decision: sources with
    many splits already saturate the cluster, and the guard below skips
    the shuffle when the input is already wide enough.

    The width probe (``df.rdd.getNumPartitions()``) materializes the
    physical plan on the driver — cheap for a parquet scan, but a real
    cost when called mid-pipeline on a wide plan. On a cluster, set
    ``spark.graft.spread=off`` (sources there split properly, the helper
    is pure overhead) or ``spark.graft.spread=force`` to skip the probe
    and always reshuffle.
    """
    mode = df.sparkSession.conf.get("spark.graft.spread", "auto")
    if mode == "off":
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if mode != "force":
        # Probe-result cache: the physical-plan materialization behind
        # getNumPartitions costs ~50-70 ms per call even when the file
        # index is warm. A scan's partition count is a pure function of
        # (file set, session parallelism) — filters/projections never
        # change split generation — so the probe result is cached on
        # that key (metadata only; repeated bench/gate invocations of
        # the same query stop re-paying the plan walk).
        try:
            files = tuple(sorted(df.inputFiles()))
            # non-file-backed plans all report (), which would collide
            key = (files, target) if files else None
        except Exception:
            key = None
        if key is not None and key in _SPREAD_PROBE_CACHE:
            width = _SPREAD_PROBE_CACHE[key]
        else:
            width = df.rdd.getNumPartitions()
            if key is not None:
                _SPREAD_PROBE_CACHE[key] = width
        if width >= target:
            return df
    return df.repartition(target)

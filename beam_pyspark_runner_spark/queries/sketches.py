"""Sketch operators: count-min frequency estimation, heavy hitters.

A sketch the reference cannot express (its only aggregation machinery is
CombinePerKey, SURVEY.md §2.1 op 6) and Spark only offers opaquely
(``count_min_sketch`` returns an undecodable binary). Building the
sketch from first principles in DataFrame ops keeps it fully
oracle-checkable: the md5-derived bucket hashes (functions/hashing.py)
and integer counts are bit-identical in DuckDB.

Scale notes (100 TB): the sketch build is one partial-aggregated
groupBy over (depth × rows) exploded keys — the sketch itself is
DEPTH×WIDTH rows regardless of input size, so estimation joins against
a broadcast-sized table. This is the structure for approximate
frequency/heavy-hitter queries where exact per-key counts would need an
unbounded-cardinality shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from beam_pyspark_runner_spark.functions.hashing import h32, h32_sql
from beam_pyspark_runner_spark.queries.registry import register
from beam_pyspark_runner_spark.sources.readers import load_table

CMS_DEPTH = 4
CMS_WIDTH = 64


def _bucket(dd: Column, key: Column) -> Column:
    return h32(F.concat_ws("-", F.lit("cms"), dd, key)) % CMS_WIDTH


def _bucket_sql(dd: str, key: str) -> str:
    expr = "'cms-' || " + dd + " || '-' || " + key
    return f"({h32_sql(expr)} % {CMS_WIDTH})"


_CMS_SQL = f"""
    d(dd) AS (SELECT unnest(range({CMS_DEPTH}))),
    cells AS (
        SELECT dd, {_bucket_sql('dd', 'l_suppkey')} AS bucket, COUNT(*) AS c
        FROM lineitem, d GROUP BY 1, 2
    )
"""


def _sketch_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rows = li.select("l_suppkey").withColumn(
        "dd", F.explode(F.array(*[F.lit(i) for i in range(CMS_DEPTH)]))
    )
    return (
        rows.select("dd", _bucket(F.col("dd"), F.col("l_suppkey")).alias("bucket"))
        .groupBy("dd", "bucket")
        .agg(F.count("*").alias("c"))
    )


@register(
    "cms_build",
    oracle=f"WITH {_CMS_SQL} SELECT dd, bucket, c FROM cells",
    tags=("sketch", "count_min", "aggregate"),
)
def cms_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch build over supplier keys: DEPTH hash rows × WIDTH
    buckets of collision counts. One partial-aggregated shuffle whose
    output is a constant-size table — the input-size independence is the
    whole point of the sketch."""
    return _sketch_df(spark, sf_dir)


@register(
    "cms_estimate_vs_exact",
    oracle=f"""
    WITH {_CMS_SQL},
    exact AS (SELECT l_suppkey, COUNT(*) AS exact_n FROM lineitem GROUP BY 1),
    probes AS (
        SELECT e.l_suppkey, e.exact_n, d.dd,
               {_bucket_sql('d.dd', 'e.l_suppkey')} AS bucket
        FROM exact e, d
    )
    SELECT p.l_suppkey, p.exact_n, MIN(c.c) AS cms_estimate,
           MIN(c.c) >= p.exact_n AS upper_bound_holds
    FROM probes p JOIN cells c ON c.dd = p.dd AND c.bucket = p.bucket
    GROUP BY p.l_suppkey, p.exact_n
    """,
    tags=("sketch", "count_min", "approx", "join"),
)
def cms_estimate_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min estimation: freq(key) ≈ min over hash rows of the key's
    bucket counts — never an underestimate (upper_bound_holds must be
    true for every key; the smoke/oracle gates verify it). The sketch
    side of the estimation join is constant-size → broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    sketch = _sketch_df(spark, sf_dir)
    exact = li.groupBy("l_suppkey").agg(F.count("*").alias("exact_n"))
    probes = exact.withColumn(
        "dd", F.explode(F.array(*[F.lit(i) for i in range(CMS_DEPTH)]))
    ).withColumn("bucket", _bucket(F.col("dd"), F.col("l_suppkey")))
    return (
        probes.join(F.broadcast(sketch), ["dd", "bucket"])
        .groupBy("l_suppkey", "exact_n")
        .agg(F.min("c").alias("cms_estimate"))
        .select(
            "l_suppkey",
            "exact_n",
            "cms_estimate",
            (F.col("cms_estimate") >= F.col("exact_n")).alias("upper_bound_holds"),
        )
    )

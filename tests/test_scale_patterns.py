"""Scale-hardening pattern tests (SURVEY.md §7 M8).

These verify the *plan shapes* that matter at 100 TB, not just results:
bucketed co-located joins must not shuffle, partitioned writes must
prune at read time, and the skew-salting helper must be bit-identical
to the direct aggregation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from beam_pyspark_runner_spark.functions.numeric import dsum
from beam_pyspark_runner_spark.functions.skew import salted_decimal_sum
from beam_pyspark_runner_spark.sources.readers import load_table, spread

from tests.conftest import SF_CORRECT


def _executed_plan(df) -> str:
    df.collect()  # let AQE finalize
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Both sides bucketed on the join key → SortMergeJoin with zero
    Exchange: the co-location contract a 100 TB fact-fact join needs."""
    o = load_table(spark, SF_CORRECT, "orders")
    li = load_table(spark, SF_CORRECT, "lineitem")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    (
        o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", str(tmp_path / "bkt_orders"))
        .mode("overwrite").saveAsTable("bkt_orders")
    )
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", str(tmp_path / "bkt_lineitem"))
        .mode("overwrite").saveAsTable("bkt_lineitem")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("bkt_lineitem")
            .join(
                spark.table("bkt_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        plan = _executed_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "SortMergeJoin" in plan
    assert "SelectedBucketsCount: 8 out of 8" in plan
    # result sanity vs direct join
    direct = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, direct.collect()))
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_partitioned_write_prunes_at_read(spark, tmp_path):
    """Hive-partitioned parquet layout: a filter on the partition column
    must prune directories (PartitionFilters), not scan-and-discard."""
    path = str(tmp_path / "li_by_flag")
    li = load_table(spark, SF_CORRECT, "lineitem")
    li.write.partitionBy("l_returnflag").mode("overwrite").parquet(path)
    back = spark.read.parquet(path).filter(F.col("l_returnflag") == "R")
    plan = back.queryExecution().executedPlan().toString() if hasattr(back, "queryExecution") else back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "l_returnflag" in plan.split("PartitionFilters")[1][:200]
    expected = li.filter(F.col("l_returnflag") == "R").count()
    assert back.count() == expected


def test_salted_sum_bit_identical(spark):
    li = load_table(spark, SF_CORRECT, "lineitem")
    salted = salted_decimal_sum(
        li, ["l_returnflag"], "l_quantity", "s", n_salts=16, salt_on="l_orderkey"
    )
    direct = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("s"), F.count("*").alias("s_count")
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, direct.collect()))


def test_spread_guard_skips_wide_inputs(spark):
    """spread() must be a no-op when the input already has >= default
    parallelism partitions (production sources are pre-split)."""
    df = spark.range(0, 1000, 1, spark.sparkContext.defaultParallelism * 2)
    assert spread(df) is df
    narrow = spark.range(0, 1000, 1, 1)
    assert spread(narrow).rdd.getNumPartitions() == spark.sparkContext.defaultParallelism

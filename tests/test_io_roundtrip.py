"""IO breadth: every supported format round-trips losslessly.

Reference parity note: the reference reads text and writes text only
(SURVEY.md §2.4 row 1); this engine adds CSV/JSON/Parquet/ORC both ways
plus partitioned parquet layouts.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from beam_pyspark_runner_spark.sources import readers, writers

from tests.conftest import SF_SMOKE


def _sample(spark):
    return (
        readers.load_table(spark, SF_SMOKE, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .limit(200)
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_parquet_roundtrip(spark, tmp_path):
    df = _sample(spark)
    p = str(tmp_path / "p")
    writers.write_parquet(df, p)
    assert _rows(readers.read_parquet(spark, p)) == _rows(df)


def test_orc_roundtrip(spark, tmp_path):
    df = _sample(spark)
    p = str(tmp_path / "o")
    writers.write_orc(df, p)
    assert _rows(readers.read_orc(spark, p)) == _rows(df)


def test_csv_roundtrip_with_schema(spark, tmp_path):
    df = _sample(spark)
    p = str(tmp_path / "c")
    writers.write_csv(df, p)
    back = readers.read_csv(
        spark, p, schema="o_orderkey bigint, o_orderstatus string, o_totalprice double"
    )
    assert _rows(back) == _rows(df)


def test_json_roundtrip_with_schema(spark, tmp_path):
    df = _sample(spark)
    p = str(tmp_path / "j")
    writers.write_json(df, p)
    back = readers.read_json(
        spark, p, schema="o_orderkey bigint, o_orderstatus string, o_totalprice double"
    )
    assert _rows(back) == _rows(df)


def test_text_roundtrip_and_glob(spark, tmp_path):
    df = _sample(spark).select(
        F.concat_ws("|", "o_orderkey", "o_orderstatus").alias("value")
    )
    p = str(tmp_path / "t")
    writers.write_text(df, p)
    back = readers.read_text(spark, p + "/part-*.txt")
    assert _rows(back) == _rows(df)


def test_partitioned_parquet_roundtrip(spark, tmp_path):
    df = _sample(spark)
    p = str(tmp_path / "pp")
    writers.write_parquet(df, p, partition_by=["o_orderstatus"])
    back = readers.read_parquet(spark, p).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    # partition column type survives via string; normalize before compare
    assert _rows(back.withColumn("o_orderstatus", F.col("o_orderstatus").cast("string"))) == _rows(df)

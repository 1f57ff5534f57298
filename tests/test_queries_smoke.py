"""Smoke tests: every registered query runs at sf0.001 and returns a
stable schema; spot-check correctness invariants that the DuckDB oracle
can't express (dedup recall, LSH consistency). The full oracle gate is
``python -m tests.oracle_check`` (sf0.01), which the driver replicates.
"""

from __future__ import annotations

import pytest

from beam_pyspark_runner_spark.queries import REGISTRY
from tests.conftest import SF_SMOKE

# Streaming queries are slower (state store + micro-batches); keep the
# per-query smoke cheap and run streaming in a dedicated test.
_STREAMING = {n for n, q in REGISTRY.items() if "streaming" in q.tags}


@pytest.mark.parametrize("name", sorted(set(REGISTRY) - _STREAMING))
def test_query_runs(spark, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_SMOKE)
    rows = df.collect()
    assert df.columns, name
    assert rows is not None


def test_streaming_queries_run(spark):
    for name in sorted(_STREAMING):
        df = REGISTRY[name].fn(spark, SF_SMOKE)
        assert df.count() >= 0, name


def test_every_query_has_oracle_or_reason(spark):
    for name, q in REGISTRY.items():
        assert q.oracle is None or "SELECT" in q.oracle.upper(), name


def test_minhash_finds_planted_near_dups(spark):
    """MinHash-LSH candidates must cover the exact-Jaccard pairs (j>=0.5
    planted dups have j≈0.98 ⇒ band-match probability ≈ 1)."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["ngram_jaccard_pairs"].fn(spark, SF_SMOKE).collect()
    }
    cand = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["minhash_lsh_candidates"].fn(spark, SF_SMOKE).collect()
    }
    assert exact, "fixture should contain planted near-duplicates"
    assert exact <= cand, f"LSH missed pairs: {exact - cand}"


def test_cosine_topk_shape(spark):
    rows = REGISTRY["cosine_topk"].fn(spark, SF_SMOKE).collect()
    by_query = {}
    for r in rows:
        by_query.setdefault(r.query_id, []).append(r)
    for qid, nbrs in by_query.items():
        assert len(nbrs) == 10
        sims = [r.cosine for r in sorted(nbrs, key=lambda r: r.rnk)]
        assert sims == sorted(sims, reverse=True)
        assert all(-1.0 <= s <= 1.0 for s in sims)


def test_events_load_pins_utc_session(spark):
    """ADVICE r4: the external driver supplies its own SparkSession with
    an arbitrary session timezone; load_table('events') must pin UTC
    before the NTZ re-tag or every instant shifts vs the naive-ts
    oracle. Simulate the foreign session by flipping the tz first."""
    import datetime as dt

    import duckdb

    from beam_pyspark_runner_spark.sources.readers import load_table

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = load_table(spark, SF_SMOKE, "events")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        got = df.agg({"ts": "min"}).collect()[0][0]
        want = duckdb.sql(
            f"SELECT min(ts) FROM read_parquet('{SF_SMOKE}/events.parquet')"
        ).fetchone()[0]
        assert got.replace(tzinfo=None) == want.replace(tzinfo=None), (got, want)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_sweep_line_invariants(spark):
    """max_concurrent_intervals: month peaks dominate month-end values,
    and the timeline's final month must close at zero open orders
    (every +1 has exactly one -1)."""
    from beam_pyspark_runner_spark.queries import REGISTRY

    rows = (
        REGISTRY["max_concurrent_intervals"]
        .fn(spark, SF_SMOKE)
        .orderBy("month")
        .collect()
    )
    assert rows, "empty sweep line"
    for r in rows:
        assert 0 <= r["eom_open"] <= r["max_open"], r
    assert rows[-1]["eom_open"] == 0, rows[-1]


def test_interval_union_invariants(spark):
    """interval_union_coverage: union length never exceeds the span,
    and islands never outnumber the intervals they merge."""
    from beam_pyspark_runner_spark.queries import REGISTRY

    for r in REGISTRY["interval_union_coverage"].fn(spark, SF_SMOKE).collect():
        assert r["covered_days"] <= r["span_days"], r
        assert 1 <= r["n_islands"] <= r["n_orders"], r


def test_fifo_allocation_conserves_quantity(spark):
    """fifo_inventory_allocation: no lot over-allocates, and per part
    the total allocated equals min(total supply, total demand) — the
    conservation law of FIFO matching."""
    from collections import defaultdict

    import pyspark.sql.functions as F

    from beam_pyspark_runner_spark.queries import REGISTRY
    from beam_pyspark_runner_spark.sources.readers import load_table

    rows = REGISTRY["fifo_inventory_allocation"].fn(spark, SF_SMOKE).collect()
    supply, alloc = defaultdict(float), defaultdict(float)
    for r in rows:
        assert -1e-9 <= r["allocated"] <= r["availqty"] + 1e-9, r
        assert r["leftover"] >= -1e-9, r
        supply[r["ps_partkey"]] += r["availqty"]
        alloc[r["ps_partkey"]] += r["allocated"]
    demand = {
        r["l_partkey"]: r["d"]
        for r in load_table(spark, SF_SMOKE, "lineitem")
        .groupBy("l_partkey")
        .agg(F.sum("l_quantity").alias("d"))
        .collect()
    }
    for pk, s in supply.items():
        expected = min(s, demand.get(pk, 0.0))
        assert abs(alloc[pk] - expected) < 1e-6, (pk, alloc[pk], expected)

"""Unit tests for the oracle-compare harness itself (tests/oracle_check.py).

The entire correctness story rests on _canon/_hash_rows treating both
engines' values identically — pin the canonicalization edge cases.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from tests.oracle_check import _canon, _hash_rows


def test_canon_float_edge_cases():
    assert _canon(-0.0) == _canon(0.0)  # signed zero normalized
    assert _canon(float("nan")) == "nan"
    assert _canon(1.5) == float.hex(1.5)  # exact bits, not repr rounding
    assert _canon(0.1 + 0.2) != _canon(0.3)  # hex form is bit-exact


def test_canon_decimal_matches_equal_float():
    assert _canon(Decimal("2.50")) == _canon(2.5)


def test_canon_bool_vs_int_distinct_from_strings():
    assert _canon(True) == "1" and _canon(False) == "0"
    assert _canon(1) == "1"  # bool/int unify (engines disagree on type)
    assert _canon(None) == "∅"


def test_canon_temporal():
    assert (
        _canon(dt.datetime(2024, 1, 1, 12, 0, 0, tzinfo=dt.timezone.utc))
        == _canon(dt.datetime(2024, 1, 1, 12, 0, 0))
    )  # tz stripped after UTC session normalization
    assert _canon(dt.date(2024, 1, 1)) == "2024-01-01"


def test_canon_containers():
    assert _canon([1, [2.0, None]]) == "[1,[" + float.hex(2.0) + ",∅]]"
    assert _canon({"b": 1, "a": 2}) == _canon({"a": 2, "b": 1})  # key order free
    assert _canon(b"\x00\xff") == "00ff"


def test_hash_rows_column_and_row_order_invariant():
    n1, h1 = _hash_rows(["b", "a"], [(1, "x"), (2, "y")])
    n2, h2 = _hash_rows(["a", "b"], [("y", 2), ("x", 1)])
    assert (n1, h1) == (n2, h2)
    # different values → different hash
    _, h3 = _hash_rows(["a", "b"], [("y", 2), ("x", 99)])
    assert h3 != h1


# --- driver-window invariants (the external gate checks the FIRST 50
# registry entries; these pin the curated ordering in queries/__init__) ---

def test_driver_window_spans_all_operator_families():
    """Every operator family must have first-hand driver signal: either
    a seat in the CURRENT window or a green row in a past
    CORRECTNESS_r*.json. (Until round 8 this required a window seat per
    family; once a family is fully driver-certified, burning seats on
    re-certs contradicts the rotate-to-never-checked discipline, so the
    invariant widened to window ∪ cumulative-certified.)"""
    import glob
    import json
    from pathlib import Path

    from beam_pyspark_runner_spark.queries import DRIVER_WINDOW, REGISTRY

    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
    window = list(REGISTRY)[:50]
    assert window == list(DRIVER_WINDOW)  # reorder actually applied

    certified = set(window)
    root = Path(__file__).resolve().parent.parent
    # A query counts as certified only on hash_match (values verified),
    # never on rows_match alone — right row count with wrong values must
    # not satisfy family coverage (round-10 ADVICE fix). The one query
    # that is rows-only BY DESIGN (no SQL-expressible oracle) is listed
    # explicitly.
    rows_only_by_design = {"cosine_topk_vectorized"}
    for path in glob.glob(str(root / "CORRECTNESS_r*.json")):
        for name, rec in json.load(open(path)).items():
            if rec.get("hash_match") or (
                name in rows_only_by_design and rec.get("rows_match")
            ):
                certified.add(name)
    covered = {
        t for n in certified if n in REGISTRY for t in REGISTRY[n].tags
    }
    required = {
        "pipeline_api", "metrics", "tpch", "join", "window", "event_time",
        "streaming", "dedup", "similarity", "text_analysis", "multimodal",
        "sketch", "pandas_udf", "udtf", "group_by_key", "array_fns",
    }
    assert required <= covered, required - covered
    # and the window itself stays family-diverse (no monoculture):
    window_tags = {t for n in window for t in REGISTRY[n].tags}
    assert len(required & window_tags) >= 10, sorted(required & window_tags)


def test_driver_window_queries_all_have_full_oracles():
    """Rows-only queries (no SQL oracle) read as red 'err' rows in the
    driver's report — they must sit past the 50-entry window."""
    from beam_pyspark_runner_spark.queries import DRIVER_WINDOW, REGISTRY

    for name in DRIVER_WINDOW:
        assert REGISTRY[name].oracle is not None, name


def test_empty_at_small_sf_queries_are_nonempty_at_scale(spark):
    """Round-6 verdict #4: queries tagged empty_ok_at_small_sf return 0
    rows at the sf0.01 gate, where their oracle match is trivially
    satisfiable. This pin is their real certification: at sf0.1 each
    must be NON-empty and still oracle-MATCH — and the tag list must
    stay exactly the set of queries that are legitimately empty small,
    so the tag can't quietly spread to mask real regressions."""
    from beam_pyspark_runner_spark.queries import REGISTRY
    from tests.oracle_check import compare, duckdb_conn

    tagged = sorted(
        n for n, q in REGISTRY.items() if "empty_ok_at_small_sf" in q.tags
    )
    assert tagged == ["join_anti", "source_overlap_matrix"]
    con = duckdb_conn("/root/testdata/sf0.1")
    try:
        for name in tagged:
            q = REGISTRY[name]
            r = compare(spark, con, name, q.fn, q.oracle, "/root/testdata/sf0.1")
            assert r["status"] == "MATCH", r
            assert r["spark_rows"] > 0, (name, "still empty at sf0.1")
    finally:
        con.close()


def test_bench_contract_line_fits_driver_tail():
    """The driver records only the LAST ~2000 chars of bench.py's
    stdout, so the one contract JSON line must fit whole inside that
    tail (BENCH_r9/r10 landed parsed=null when per-query rep stats
    pushed it past the capture). Reconstruct the line exactly as
    bench.py prints it, with worst-case-width timings, and pin the
    budget with headroom for the total/metric fields."""
    import json

    from beam_pyspark_runner_spark.queries import REGISTRY

    names = [n for n, q in REGISTRY.items() if q.bench]
    assert names, "headline set must be non-empty"
    line = json.dumps(
        {
            "metric": "headline_queries_total_sec",
            "value": 9999.9999,
            "unit": "sec",
            "queries": {n: 9999.9999 for n in names},
            "sf": 0.1,
        }
    )
    assert len(line) < 1900, (len(line), "bench JSON line would overflow")


def test_round14_prestage_matches_remaining_debt():
    """Round-13 (round-12 verdict #4): the pre-staged round-14 window
    tail must equal EXACTLY the queries with no driver signal once the
    round-13 window lands — registry minus cumulative hash-certified
    (rows-only for the one by-design exemption) minus the current
    window. A drift here means round 14 would either burn a seat on a
    certified query or strand one past the close of cumulative
    coverage."""
    import glob
    import json
    from pathlib import Path

    from beam_pyspark_runner_spark.queries import (
        DRIVER_WINDOW,
        REGISTRY,
        ROUND_14_PRESTAGE,
    )

    rows_only_by_design = {"cosine_topk_vectorized"}
    certified = set()
    root = Path(__file__).resolve().parent.parent
    for path in glob.glob(str(root / "CORRECTNESS_r*.json")):
        for name, rec in json.load(open(path)).items():
            if rec.get("hash_match") or (
                name in rows_only_by_design and rec.get("rows_match")
            ):
                certified.add(name)
    remaining = [
        n
        for n in REGISTRY
        if n not in certified and n not in DRIVER_WINDOW
    ]
    assert sorted(remaining) == sorted(ROUND_14_PRESTAGE), (
        sorted(set(remaining) ^ set(ROUND_14_PRESTAGE))
    )
    assert len(ROUND_14_PRESTAGE) == len(set(ROUND_14_PRESTAGE))

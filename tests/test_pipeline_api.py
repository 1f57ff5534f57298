"""E2E tests of the fluent pipeline API, mirroring the reference's own
test suite (/root/reference/tests/pyspark_runner_test.py:15-154) case
for case — Create, branching DAG, FlatMap, Map, global combine,
GroupByKey, text-sink round-trip, AsDict side input — plus the fixes we
make to its documented bugs (SURVEY.md §2.5).

Comparisons are multisets: PCollections are unordered.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from beam_pyspark_runner_spark.operators import CombineFn, Pipeline


def as_multiset(rows):
    return Counter(tuple(r) for r in rows)


# reference: test_create (pyspark_runner_test.py:53-56)
def test_create(spark):
    p = Pipeline(spark)
    got = p.create([1]).collect()
    assert as_multiset(got) == as_multiset([(1,)])


# reference: test_create_and_map_and_branching (pyspark_runner_test.py:58-70)
def test_branching_dag(spark):
    p = Pipeline(spark)
    base = p.create([1, 2, 3, 4]).map(F.col("value") * 4)
    b1 = base.map(F.col("value") + 1)
    b2 = base.map(F.col("value") + 3)  # dangling leaf also evaluates
    assert as_multiset(b1.collect()) == as_multiset([(5,), (9,), (13,), (17,)])
    assert as_multiset(b2.collect()) == as_multiset([(7,), (11,), (15,), (19,)])


# reference: test_create_and_flat_map (pyspark_runner_test.py:72-77)
def test_flat_map(spark):
    p = Pipeline(spark)
    got = p.create([[1], [3, 4]], schema="value array<bigint>").flat_map(
        F.col("value")
    ).collect()
    assert as_multiset(got) == as_multiset([(1,), (3,), (4,)])


# reference: test_create_and_map (pyspark_runner_test.py:79-82)
def test_map_python_rows(spark):
    p = Pipeline(spark)
    got = (
        p.create([1, 2, 3, 4])
        .map_rows(lambda row: row[0] * 10, "value bigint")
        .collect()
    )
    assert as_multiset(got) == as_multiset([(10,), (20,), (30,), (40,)])


# reference: test_create_and_reduce (pyspark_runner_test.py:84-95) — a
# custom CombineFn (sum via lambdas) applied globally
def test_combine_globally_custom(spark):
    p = Pipeline(spark)
    fn = CombineFn(
        create=lambda: 0,
        add=lambda acc, v: acc + v,
        merge=lambda a, b: a + b,
        output_type="bigint",
    )
    got = p.create([1, 2, 3, 4, 10]).combine_globally(fn, out="total").collect()
    assert got == [(20,)]


def test_combine_globally_builtin(spark):
    p = Pipeline(spark)
    got = p.create([1, 2, 3, 4, 10]).combine_globally("sum", out="total").collect()
    assert got == [(20,)]


# reference: test_create_map_and_groupby (pyspark_runner_test.py:97-103)
def test_group_by_key(spark):
    p = Pipeline(spark)
    got = (
        p.create([1, 2], schema="value bigint")
        .map_kv(F.col("value") * 2, F.col("value"))
        .group_by_key()
        .collect()
    )
    assert {(r[0], tuple(sorted(r[1]))) for r in got} == {(2, (1,)), (4, (2,))}


# reference: test_write_to_text (pyspark_runner_test.py:105-133)
def test_write_text_roundtrip(spark, tmp_path):
    p = Pipeline(spark)
    out = str(tmp_path / "sink")
    (
        p.create([1, 2], schema="value bigint")
        .map_kv(F.col("value") * 2, F.col("value"))
        .write_text(out)
    )
    lines = {r.value for r in spark.read.text(out).collect()}
    assert lines == {"2,1", "4,2"}


# reference: test_pardo_side_input (pyspark_runner_test.py:135-154) — the
# AsDict multimap side input, plus the scalable broadcast-join form
def test_as_dict_side_input(spark):
    p = Pipeline(spark)
    side = p.create(
        [("key1", ["value1a", "value1b"]), ("key2", ["value2a"])],
        schema="key string, value array<string>",
    )
    lookup = side.as_dict()
    assert lookup == {"key1": ["value1a", "value1b"], "key2": ["value2a"]}
    main = p.create(["key1", "key2"], schema="value string")
    got = main.map_rows(lambda row: (row[0], len(lookup[row[0]])), "key string, n bigint")
    assert as_multiset(got.collect()) == as_multiset([("key1", 2), ("key2", 1)])


def test_broadcast_join_side_input(spark):
    p = Pipeline(spark)
    side = p.create(
        [("key1", 10), ("key2", 20)], schema="key string, factor bigint"
    )
    main = p.create([("key1", 1), ("key2", 2), ("key3", 3)], schema="key string, value bigint")
    got = main.broadcast_join(side, "key").to_df().select("key", F.col("value") * F.col("factor"))
    assert as_multiset(got.collect()) == as_multiset([("key1", 10), ("key2", 40)])


# side-input view semantics (reference transform_evaluators.py:39-48)
def test_as_singleton_and_list(spark):
    p = Pipeline(spark)
    assert p.create([42]).as_singleton() == 42
    with pytest.raises(ValueError):
        p.create([1, 2]).as_singleton()
    assert sorted(p.create([3, 1, 2]).as_list()) == [1, 2, 3]


# flatten (reference eval_Flatten, transform_evaluators.py:81-82)
def test_flatten(spark):
    p = Pipeline(spark)
    a = p.create([1, 2])
    b = p.create([2, 3])
    got = a.flatten(b).collect()
    assert as_multiset(got) == as_multiset([(1,), (2,), (2,), (3,)])  # duplicates kept


# multi-output ParDo — reference bug §2.5#4, fixed here
def test_partition_multi_output(spark):
    p = Pipeline(spark)
    parts = p.create([1, 2, 3, 4, 5]).partition(
        F.col("value") <= 2, F.col("value") == 3
    )
    assert as_multiset(parts[0].collect()) == as_multiset([(1,), (2,)])
    assert as_multiset(parts[1].collect()) == as_multiset([(3,)])
    assert as_multiset(parts[2].collect()) == as_multiset([(4,), (5,)])


# yield-None emits nothing — reference bug §2.5#1, fixed here
def test_flat_map_rows_none_yields_nothing(spark):
    p = Pipeline(spark)
    got = (
        p.create([1, 2, 3])
        .flat_map_rows(
            lambda row: [row[0]] if row[0] % 2 else [None], "value bigint"
        )
        .collect()
    )
    assert as_multiset(got) == as_multiset([(1,), (3,)])


# combine_per_key with custom + builtin fns
def test_combine_per_key(spark):
    p = Pipeline(spark)
    data = p.create(
        [("a", 1), ("a", 2), ("b", 5)], schema="key string, value bigint"
    )
    got = data.combine_per_key("sum", out="total").collect()
    assert as_multiset(got) == as_multiset([("a", 3), ("b", 5)])

    fn = CombineFn(
        create=lambda: 1.0,
        add=lambda acc, v: acc * v,
        merge=lambda a, b: a * b,
        output_type="double",
    )
    got = data.combine_per_key(fn, out="product").collect()
    assert as_multiset(got) == as_multiset([("a", 2.0), ("b", 5.0)])


def test_cogroup_by_key(spark):
    p = Pipeline(spark)
    left = p.create([("k1", 1), ("k1", 2)], schema="key string, value bigint")
    right = p.create([("k1", 9), ("k2", 7)], schema="key string, value bigint")
    got = {
        (r["key"], tuple(sorted(r["left_values"])), tuple(sorted(r["right_values"])))
        for r in left.co_group_by_key(right).collect()
    }
    assert got == {("k1", (1, 2), (9,)), ("k2", (), (7,))}


def test_unknown_combiner_raises(spark):
    p = Pipeline(spark)
    with pytest.raises(ValueError, match="unknown builtin combiner"):
        p.create([("a", 1)], schema="key string, value bigint").combine_per_key(
            "not_a_combiner"
        ).collect()


def test_count_per_element_top_distinct(spark):
    p = Pipeline(spark)
    words = p.create(["a", "b", "a", "c", "a", "b"], schema="value string")
    counts = words.count_per_element().collect()
    assert as_multiset(counts) == as_multiset([("a", 3), ("b", 2), ("c", 1)])
    top = words.count_per_element().top(1, by="value")
    assert top.collect() == [("a", 3)]
    assert as_multiset(words.distinct().collect()) == as_multiset([("a",), ("b",), ("c",)])


# wordcount — the reference README's own demo (README.md:50-55)
def test_wordcount_end_to_end(spark, tmp_path):
    src = tmp_path / "input.txt"
    src.write_text("the quick brown fox\nthe lazy dog\n")
    p = Pipeline(spark)
    got = (
        p.read_text(str(src))
        .flat_map(F.split(F.col("value"), " "))
        .count_per_element()
        .collect()
    )
    expected = [("the", 2), ("quick", 1), ("brown", 1), ("fox", 1), ("lazy", 1), ("dog", 1)]
    assert as_multiset(got) == as_multiset(expected)


def test_fanout_persist(spark):
    """A node consumed by >1 downstream gets persisted exactly once."""
    p = Pipeline(spark)
    base = p.create(list(range(100))).map(F.col("value") * 2)
    b1 = base.combine_globally("sum", out="v")
    b2 = base.combine_globally("count", out="v")
    df1, df2 = p.ctx.lower(b1.node, b2.node)
    assert len(p.ctx._persisted) == 1
    assert df1.collect()[0][0] == sum(range(100)) * 2
    assert df2.collect()[0][0] == 100
    p.ctx.unpersist_all()


# metrics/counters — the surface the reference leaves unimplemented
# (reference pyspark_runner.py:30-31: metrics() raises NotImplementedError)
def test_metrics_counters_and_distribution(spark):
    p = Pipeline(spark)
    seen = p.counter("t", "rows_seen")
    odd = p.counter("t", "odd_rows")
    dist = p.distribution("t", "values")

    def kernel(batches):
        for pdf in batches:
            seen.inc(len(pdf))
            odd.inc(int((pdf["value"] % 2 == 1).sum()))
            for v in pdf["value"]:
                dist.update(int(v))
            yield pdf

    out = p.create(list(range(10))).par_do(kernel, "value bigint")
    assert out.to_df().count() == 10
    q = p.metrics.query()
    assert q[("t", "rows_seen")] == 10
    assert q[("t", "odd_rows")] == 5
    assert q[("t", "values")] == {"count": 10, "sum": 45, "min": 0, "max": 9}


def test_metrics_observe_no_extra_job(spark):
    p = Pipeline(spark)
    pc = (
        p.create(list(range(20)))
        .observe("t", "scan", F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .filter(F.col("value") >= 10)
    )
    assert pc.to_df().count() == 10
    got = p.metrics.query()[("t", "scan")]
    assert got == {"n": 20, "total": 190}


def test_metrics_to_df_snapshot(spark):
    p = Pipeline(spark)
    c = p.counter("ns", "c1")

    def kernel(batches):
        for pdf in batches:
            c.inc(len(pdf))
            yield pdf

    p.create([1, 2, 3]).par_do(kernel, "value bigint").to_df().count()
    rows = {(r.namespace, r.metric): r.value for r in p.metrics.to_df().collect()}
    assert rows == {("ns", "c1"): 3.0}


class _Reading:
    """Deliberately schema-less user type for the opaque escape hatch."""

    def __init__(self, sensor, values):
        self.sensor = sensor
        self.values = values

    def scaled(self, k):
        return _Reading(self.sensor, [v * k for v in self.values])


def test_opaque_elements_roundtrip_and_transform(spark):
    """Arbitrary Python objects ride a pickled blob column end to end:
    create → map (method call) → flat_map (1→N) → collect, and the
    boundary back to schema-ful land via map_rows."""
    from beam_pyspark_runner_spark.operators.pipeline import Pipeline

    p = Pipeline(spark)
    readings = [_Reading("a", [1, 2]), _Reading("b", [3])]
    pc = (
        p.create_opaque(readings)
        .map_opaque(lambda r: r.scaled(10))
        .flat_map_opaque(lambda r: [(r.sensor, v) for v in r.values])
    )
    assert sorted(pc.collect_opaque()) == [("a", 10), ("a", 20), ("b", 30)]
    # cross back into schema-ful land
    back = (
        pc.map_opaque(lambda t: t)  # still opaque
        .flat_map_opaque(lambda t: [t])
        .collect_opaque()
    )
    assert sorted(back) == [("a", 10), ("a", 20), ("b", 30)]


def test_opaque_skips_none_in_flat_map(spark):
    from beam_pyspark_runner_spark.operators.pipeline import Pipeline

    p = Pipeline(spark)
    out = (
        p.create_opaque([1, 2, 3])
        .flat_map_opaque(lambda x: [x, None, -x])
        .collect_opaque()
    )
    assert sorted(out) == [-3, -2, -1, 1, 2, 3]


def test_par_do_full_dofn_lifecycle(spark, tmp_path):
    """All four DoFn hooks fire with correct cardinality and ordering:
    setup once per task, start_bundle/finish_bundle once per Arrow batch
    (bundle == batch), teardown once per task after the last bundle.
    The hooks share the setup() state via the pickled closure graph, so
    each task's output row carries its own observed counts."""
    import pandas as pd

    marker_dir = tmp_path / "teardown"
    marker_dir.mkdir()
    shared = {"setup": 0, "sb": 0, "fb": 0}

    def setup():
        shared["setup"] += 1
        return shared

    def start_bundle(s):
        assert s is shared
        s["sb"] += 1

    def finish_bundle(s):
        # ordering: every finish follows its start
        assert s["sb"] == s["fb"] + 1
        s["fb"] += 1

    def teardown(s):
        import os
        import uuid

        (
            open(os.path.join(str(marker_dir), uuid.uuid4().hex), "w")
        ).write(f"{s['setup']},{s['sb']},{s['fb']}")

    def fn(batches):
        rows = 0
        for pdf in batches:
            assert shared["sb"] == shared["fb"] + 1  # inside a bundle
            rows += len(pdf)
        yield pd.DataFrame(
            {
                "rows": [rows],
                "setups": [shared["setup"]],
                "sb": [shared["sb"]],
                "fb": [shared["fb"]],
            }
        )

    p = Pipeline(spark)
    out = (
        p.create(list(range(1000)))
        .par_do(
            fn,
            "rows bigint, setups bigint, sb bigint, fb bigint",
            setup=setup,
            teardown=teardown,
            start_bundle=start_bundle,
            finish_bundle=finish_bundle,
        )
        .collect()
    )
    assert sum(r["rows"] for r in out) == 1000
    for r in out:
        assert r["setups"] == 1  # setup once per task
        assert r["sb"] == r["fb"]  # every bundle started was finished
        assert (r["rows"] == 0) or r["sb"] >= 1
    # teardown ran once per task, after the final finish_bundle
    markers = list(marker_dir.iterdir())
    assert len(markers) == len(out)
    for m in markers:
        setups, sb, fb = map(int, m.read_text().split(","))
        assert setups == 1 and sb == fb


# reference bug §2.5#2: WindowInto was a silent NoOp; here it has semantics
def test_window_into_fixed(spark):
    """Fixed 1h windows: combine_per_key groups per (key, window)."""
    rows = [
        ("a", "2024-01-01 00:10:00", 1.0),
        ("a", "2024-01-01 00:50:00", 2.0),
        ("a", "2024-01-01 01:10:00", 4.0),
        ("b", "2024-01-01 00:20:00", 8.0),
    ]
    p = Pipeline(spark)
    col = (
        p.from_df(
            spark.createDataFrame(rows, "key string, ts string, value double")
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        .window_into(size="1 hour")
        .combine_per_key("sum")
    )
    got = {(r["key"], str(r["window_start"])[11:13]): r["value"] for r in col.collect()}
    assert got == {("a", "00"): 3.0, ("a", "01"): 4.0, ("b", "00"): 8.0}


def test_window_into_sliding_multiplies_elements(spark):
    """Sliding 1h/30m: each element lands in 2 windows (Beam's model)."""
    rows = [("a", "2024-01-01 00:40:00", 1.0)]
    p = Pipeline(spark)
    col = (
        p.from_df(
            spark.createDataFrame(rows, "key string, ts string, value double")
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        .window_into(size="1 hour", slide="30 minutes")
        .combine_per_key("count")
    )
    out = col.collect()
    assert len(out) == 2  # windows [00:00,01:00) and [00:30,01:30)
    assert all(r["value"] == 1 for r in out)


def test_window_into_session_gap(spark):
    """Session windows (30m gap) merge at grouping time; a >gap pause
    splits sessions. global_windows() afterwards restores global groups."""
    rows = [
        ("a", "2024-01-01 00:00:00", 1.0),
        ("a", "2024-01-01 00:20:00", 1.0),  # same session (20m < 30m)
        ("a", "2024-01-01 02:00:00", 1.0),  # new session
    ]
    df = spark.createDataFrame(rows, "key string, ts string, value double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    p = Pipeline(spark)
    sessions = (
        p.from_df(df).window_into(gap="30 minutes", ts="ts").combine_per_key("count")
    )
    out = sorted(
        (r["key"], str(r["window_start"]), r["value"]) for r in sessions.collect()
    )
    assert [v for _, _, v in out] == [2, 1]
    assert out[0][1].startswith("2024-01-01 00:00")

    windowed = p.from_df(df).window_into(size="1 hour")
    total = windowed.global_windows().combine_per_key("count").collect()
    assert [(r["key"], r["value"]) for r in total] == [("a", 3)]


def test_window_into_assignment_invariants(spark):
    """Window-assignment laws over 500 seeded-random timestamps: every
    element's window contains its ts, fixed windows are size-exact and
    epoch-aligned, and sliding assignment emits exactly size/slide rows
    per element, each window containing the ts."""
    import random

    rng = random.Random(42)
    base = 1_700_000_000  # 2023-11-14T22:13:20Z
    rows = [(i, base + rng.randrange(0, 7 * 24 * 3600)) for i in range(500)]
    df = spark.createDataFrame(rows, "key long, epoch long").select(
        "key", F.timestamp_seconds("epoch").alias("ts")
    )
    p = Pipeline(spark)

    fixed = p.from_df(df).window_into(size="1 hour").to_df().collect()
    assert len(fixed) == 500
    for r in fixed:
        assert r["window_start"] <= r["ts"] < r["window_end"]
        delta = r["window_end"] - r["window_start"]
        assert delta.total_seconds() == 3600
        assert r["window_start"].minute == 0 and r["window_start"].second == 0

    sliding = (
        p.from_df(df).window_into(size="1 hour", slide="20 minutes").to_df().collect()
    )
    assert len(sliding) == 500 * 3  # size/slide = 3 windows per element
    per_key = {}
    for r in sliding:
        assert r["window_start"] <= r["ts"] < r["window_end"]
        per_key.setdefault(r["key"], set()).add(r["window_start"])
    assert all(len(ws) == 3 for ws in per_key.values())


def test_windowed_custom_combinefn_fixed(spark):
    """WindowInto + CombinePerKey(custom fn) — the reference's
    bread-and-butter composition (overrides.py:58-75 +
    transform_evaluators.py:89-100). Custom fold must group per
    (key, window) exactly like a builtin."""
    rows = [
        ("a", "2024-01-01 00:10:00", 1.0),
        ("a", "2024-01-01 00:50:00", 2.0),
        ("a", "2024-01-01 01:10:00", 4.0),
        ("b", "2024-01-01 00:20:00", 8.0),
    ]
    # product-combiner: not expressible as any builtin
    fn = CombineFn(
        create=lambda: 1.0,
        add=lambda acc, v: acc * v,
        merge=lambda a, b: a * b,
    )
    p = Pipeline(spark)
    col = (
        p.from_df(
            spark.createDataFrame(rows, "key string, ts string, value double")
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        .window_into(size="1 hour")
        .combine_per_key(fn)
    )
    got = {(r["key"], str(r["window_start"])[11:13]): r["value"] for r in col.collect()}
    assert got == {("a", "00"): 2.0, ("a", "01"): 4.0, ("b", "00"): 8.0}


def test_windowed_custom_combinefn_session(spark):
    """Custom CombineFn under session windows: merged-session grouping
    with the same [first_ts, last_ts + gap) bounds F.session_window
    assigns for builtins."""
    rows = [
        ("a", "2024-01-01 00:00:00", 2.0),
        ("a", "2024-01-01 00:20:00", 3.0),   # same session
        ("a", "2024-01-01 02:00:00", 5.0),   # new session (>30m gap)
        ("b", "2024-01-01 00:05:00", 7.0),
    ]
    fn = CombineFn(
        create=lambda: 1.0,
        add=lambda acc, v: acc * v,
        merge=lambda a, b: a * b,
    )
    df = spark.createDataFrame(rows, "key string, ts string, value double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    p = Pipeline(spark)
    custom = (
        p.from_df(df).window_into(gap="30 minutes", ts="ts").combine_per_key(fn)
    )
    got = sorted(
        (r["key"], str(r["window_start"]), str(r["window_end"]), r["value"])
        for r in custom.collect()
    )
    # builtin twin pins the window bounds custom must reproduce
    builtin = (
        p.from_df(df).window_into(gap="30 minutes", ts="ts").combine_per_key("sum")
    )
    want_bounds = sorted(
        (r["key"], str(r["window_start"]), str(r["window_end"]))
        for r in builtin.collect()
    )
    assert [(k, s, e) for k, s, e, _ in got] == want_bounds
    assert [v for *_, v in got] == [6.0, 5.0, 7.0]


def test_windowed_custom_combine_globally(spark):
    """CombineGlobally on a windowed PCollection: one value per window."""
    rows = [
        ("2024-01-01 00:10:00", 1.0),
        ("2024-01-01 00:50:00", 2.0),
        ("2024-01-01 01:10:00", 4.0),
    ]
    fn = CombineFn(
        create=lambda: 0.0,
        add=lambda acc, v: acc + v * v,
        merge=lambda a, b: a + b,
    )
    p = Pipeline(spark)
    col = (
        p.from_df(
            spark.createDataFrame(rows, "ts string, value double")
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        .window_into(size="1 hour")
        .combine_globally(fn)
    )
    got = {str(r["window_start"])[11:13]: r["value"] for r in col.collect()}
    assert got == {"00": 5.0, "01": 16.0}


def test_rewindowing_replaces_prior_assignment(spark):
    """window_into on an already-windowed PCol replaces the assignment
    (no duplicate window_start/window_end columns)."""
    rows = [("a", "2024-01-01 00:40:00", 1.0)]
    p = Pipeline(spark)
    col = (
        p.from_df(
            spark.createDataFrame(rows, "key string, ts string, value double")
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        .window_into(size="15 minutes")
        .window_into(size="1 hour")
        .combine_per_key("count")
    )
    out = col.collect()
    assert len(out) == 1
    assert str(out[0]["window_start"]).endswith("00:00:00")


def test_session_spec_cleared_after_grouping(spark):
    """A second grouping on an aggregated (session-windowed) PCol groups
    on the materialized window columns — it must not try to re-inject
    F.session_window on the long-gone ts column."""
    rows = [
        ("a", "2024-01-01 00:00:00", 1.0),
        ("a", "2024-01-01 00:10:00", 2.0),
        ("a", "2024-01-01 02:00:00", 4.0),
    ]
    p = Pipeline(spark)
    sessions = (
        p.from_df(
            spark.createDataFrame(rows, "key string, ts string, value double")
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        .window_into(gap="30 minutes", ts="ts")
        .combine_per_key("sum")
    )
    # second grouping: total per key across its sessions
    total = sessions.global_windows().combine_per_key("sum")
    assert [(r["key"], r["value"]) for r in total.collect()] == [("a", 7.0)]


def test_composite_transform_apply_and_pipe(spark):
    """Beam composite parity: a reusable PCol→PCol callable applies via
    .apply() and the | operator, composing into one flat plan."""
    import pyspark.sql.functions as F

    from beam_pyspark_runner_spark.operators.pipeline import Pipeline

    def count_words(pcol):  # a "composite PTransform"
        return (
            pcol.flat_map(F.split(F.col("value"), " "), out="word")
            .map_kv(F.col("word"), F.lit(1))
            .combine_per_key("sum", out="n")
        )

    p = Pipeline(spark)
    src = p.create([("a b a",), ("b c",)], schema="value string")
    via_apply = {tuple(r) for r in src.apply(count_words).collect()}
    via_pipe = {tuple(r) for r in (src | count_words).collect()}
    assert via_apply == via_pipe == {("a", 2), ("b", 2), ("c", 1)}

    import pytest

    with pytest.raises(TypeError):
        src.apply(lambda pc: 42)


def test_map_rows_with_exception_handling_partitions_exactly(spark):
    """Every element lands in exactly one of (ok, dead-letter); error
    rows carry the element repr and 'ExcType: message'."""
    from beam_pyspark_runner_spark.operators.pipeline import Pipeline

    p = Pipeline(spark)
    src = p.create([(i,) for i in range(20)], schema="k long")
    ok, err = src.map_rows_with_exception_handling(
        lambda row: (row[0], 100 // (row[0] % 4)), schema="k long, q long"
    )
    ok_rows = ok.collect()
    err_rows = err.collect()
    assert len(ok_rows) + len(err_rows) == 20
    assert {r["k"] for r in ok_rows} == {i for i in range(20) if i % 4}
    assert all(
        r["error"].startswith("ZeroDivisionError:") for r in err_rows
    )
    assert all(r["element"] == f"({int(r['element'][1:-2])},)" for r in err_rows)


def test_map_rows_exception_handling_wrong_arity_dead_letters(spark):
    """A wrong-arity tuple (or a list) return from fn must dead-letter
    THAT element with a descriptive error instead of mis-shaping the
    whole Arrow batch into an opaque column-count failure (ADVICE r5)."""
    from beam_pyspark_runner_spark.operators.pipeline import Pipeline

    p = Pipeline(spark)
    src = p.create([(i,) for i in range(6)], schema="k long")

    def fn(row):
        if row[0] == 2:
            return (row[0],)  # one field short of the declared schema
        if row[0] == 4:
            return [row[0], row[0] * 10]  # a list is not a tuple
        return (row[0], row[0] * 10)

    ok, err = src.map_rows_with_exception_handling(fn, schema="k long, q long")
    ok_rows = ok.collect()
    err_rows = err.collect()
    assert {r["k"] for r in ok_rows} == {0, 1, 3, 5}
    assert len(err_rows) == 2
    assert all(r["error"].startswith("ValueError:") for r in err_rows)
    assert any("1 fields" in r["error"] for r in err_rows)


def test_as_multimap_groups_duplicate_keys(spark):
    """AsMultimap (Beam view the reference NotImplementedErrors on):
    duplicate keys accumulate into lists; singleton keys get 1-lists."""
    from beam_pyspark_runner_spark.operators.pipeline import Pipeline

    p = Pipeline(spark)
    src = p.create(
        [("a", 1), ("b", 2), ("a", 3), ("c", 4)], schema="k string, v long"
    )
    mm = src.as_multimap()
    assert {k: sorted(v) for k, v in mm.items()} == {
        "a": [1, 3], "b": [2], "c": [4]
    }


def test_combine_per_key_partition_fold_many_keys(spark):
    """Round-13 internals pin: the custom-CombineFn path folds per
    PARTITION (mapInPandas over a key-hash repartition), holding one
    accumulator per key in a dict. Many keys sharing a partition, keys
    split across Arrow batches, and a null key must each fold
    independently and exactly once."""
    from beam_pyspark_runner_spark.operators.combiners import combine_per_key

    n_keys, per_key = 97, 5  # 97 keys >> 32 shuffle partitions: keys share partitions
    rows = [(f"k{i:02d}", j + 1) for i in range(n_keys) for j in range(per_key)]
    rows += [(None, 100), (None, 1)]  # null key is a group of its own
    df = spark.createDataFrame(rows, "key string, value bigint")

    trace = []  # extract sees exactly one acc per key
    fn = CombineFn(
        create=lambda: 0,
        add=lambda acc, v: acc + int(v),
        merge=lambda a, b: a + b,
        extract=lambda acc: trace.append(acc) or float(acc * 2),
        output_type="double",
    )
    got = dict(
        (r["key"], r["total"])
        for r in combine_per_key(df, "key", "value", fn, out="total").collect()
    )
    want = {f"k{i:02d}": 2.0 * sum(range(1, per_key + 1)) for i in range(n_keys)}
    want[None] = 2.0 * 101
    assert got == want

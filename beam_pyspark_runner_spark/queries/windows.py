"""Window-function queries: ranking, analytic (lag/lead), frames, top-k per key.

No reference implementation exists (SURVEY.md §2.4 — RDDs are unordered);
this is new surface the reference's Top.PerKey composite only approximates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from beam_pyspark_runner_spark.functions.numeric import dsum_sql
from beam_pyspark_runner_spark.queries.registry import register
from beam_pyspark_runner_spark.sources.readers import load_table


@register(
    "top_k_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rnk FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS rnk
        FROM customer
    ) WHERE rnk <= 5
    """,
    tags=("window", "top_k_per_key", "row_number"),
    bench=True,
)
def top_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per key (reference: combiners.Top.PerKey, a bounded heap
    CombineFn). Spark pattern: row_number over a partitioned window —
    with AQE this runs as WindowGroupLimit (heap per partition) and never
    materializes full per-key sorts. c_custkey tiebreak = deterministic."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.select("c_mktsegment", "c_custkey", "c_acctbal")
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
    )


@register(
    "rank_dense_rank",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
           DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_orderstatus) AS status_dense,
           NTILE(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS quartile
    FROM orders WHERE o_totalprice > 450000
    """,
    tags=("window", "rank"),
)
def rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    by_price = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    by_status = W.partitionBy("o_orderpriority").orderBy("o_orderstatus")
    by_price_asc = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(by_price).cast("long").alias("price_rank"),
        F.dense_rank().over(by_status).cast("long").alias("status_dense"),
        F.ntile(4).over(by_price_asc).cast("long").alias("quartile"),
    )


@register(
    "lag_lead_delta",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           CAST(o_totalprice - COALESCE(LAG(o_totalprice) OVER w, o_totalprice) AS DOUBLE) AS delta
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window", "lag", "lead"),
)
def lag_lead_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        prev.alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (F.col("o_totalprice") - F.coalesce(prev, F.col("o_totalprice")))
        .cast("double")
        .alias("delta"),
    )


@register(
    "running_total_frame",
    oracle=f"""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_avg_3
    FROM orders
    """,
    tags=("window", "frame", "running_sum"),
)
def running_total_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS frames. The running sum accumulates in exact decimal —
    a double running sum would drift differently between engines; the
    3-row moving average is a fixed 3-term double sum, deterministic in
    frame order in both engines."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(38,10)"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_total"),
        (
            F.sum(F.col("o_totalprice").cast("decimal(38,10)"))
            .over(w.rowsBetween(-2, W.currentRow))
            .cast("double")
            / F.count("*").over(w.rowsBetween(-2, W.currentRow)).cast("double")
        ).alias("moving_avg_3"),
    )


@register(
    "first_last_per_group",
    oracle="""
    WITH ranked AS (
        SELECT o_custkey, o_orderkey, o_orderdate,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn_d
        FROM orders
    )
    SELECT o_custkey,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order,
           MAX(CASE WHEN rn_a = 1 THEN o_orderkey END) AS first_orderkey,
           MAX(CASE WHEN rn_d = 1 THEN o_orderkey END) AS last_orderkey
    FROM ranked GROUP BY o_custkey
    """,
    tags=("window", "first_last", "aggregate"),
)
def first_last_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last element per key by time (ties broken by orderkey) via
    min_by/max_by on a composite struct — one aggregation, no sort."""
    o = load_table(spark, sf_dir, "orders")
    key = F.struct("o_orderdate", "o_orderkey")
    return o.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        F.min_by("o_orderkey", key).alias("first_orderkey"),
        F.max_by("o_orderkey", key).alias("last_orderkey"),
    )


@register(
    "analytic_functions",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           ntile(4) OVER w AS price_quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           first_value(o_orderkey) OVER wf AS cheapest_key,
           nth_value(o_orderkey, 2) OVER wf AS second_key
    FROM orders
    WHERE o_orderkey < 2000
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey),
           wf AS (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window", "analytic", "ntile", "percent_rank"),
)
def analytic_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full analytic-function surface in one window: ntile, percent_rank,
    cume_dist (default running frame) plus first_value/nth_value over the
    full-partition frame. Both windows share one partition+sort, so the
    plan has a single exchange and sort feeding two Window nodes."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        F.ntile(4).over(w).cast("long").alias("price_quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("o_orderkey").over(wf).alias("cheapest_key"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_key"),
    )


@register(
    "above_group_avg",
    oracle="""
    WITH w AS (
        SELECT c_custkey, c_nationkey, c_acctbal,
               CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(38,10)))
                              OVER (PARTITION BY c_nationkey), 2) AS DOUBLE)
               / CAST(COUNT(*) OVER (PARTITION BY c_nationkey) AS DOUBLE) AS nation_avg
        FROM customer
    )
    SELECT c_custkey, c_nationkey, c_acctbal,
           CAST(c_acctbal - nation_avg AS DOUBLE) AS above_by
    FROM w WHERE c_acctbal > nation_avg
    """,
    tags=("window", "correlated", "scalar_subquery"),
)
def above_group_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated 'above my group's average' — the decorrelated form: a
    windowed AVG per nation computed in one pass (no per-row subquery, no
    re-scan), then a filter. The window AVG accumulates in exact decimal:
    an unordered-partition double SUM would sum in arbitrary row order
    and drift between runs/engines (functions/numeric.py discipline)."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey")
    nation_avg = (
        F.sum(F.col("c_acctbal").cast("decimal(38,10)")).over(w)
        .cast("decimal(38,2)")
        .cast("double")
        / F.count("*").over(w).cast("double")
    )
    return (
        c.select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            nation_avg.alias("nation_avg"),
        )
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            (F.col("c_acctbal") - F.col("nation_avg")).alias("above_by"),
        )
    )


@register(
    "range_interval_frame",
    # dsum discipline applied to a window frame: decimal-accumulate, one
    # ROUND, one double cast — frame membership is identical in both
    # engines (RANGE over event time), so sums are bit-identical.
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(38,10))) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ), 2) AS DOUBLE) AS trailing_1h_value
    FROM events
    """,
    tags=("window", "range_frame", "event_time"),
)
def range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per-user trailing-1-hour rolling sum —
    frame membership is defined by event-time distance, not row count
    (ROWS frames, the running_total_frame twin, cannot express this).
    Spark's rangeBetween needs a numeric ordering key, so the frame runs
    over unix microseconds with a 3.6e9 µs lower bound — semantically
    identical to the oracle's RANGE INTERVAL '1 HOUR' over the
    timestamp. One hash shuffle on user_id, sort within partition; at
    100 TB this is the standard sliding-feature shape (trailing spend,
    rate limits) and stays a single window stage."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    trailing = (
        F.sum(F.col("value").cast("decimal(38,10)"))
        .over(w)
        .cast("decimal(38,2)")
        .cast("double")
    )
    return e.select(
        "event_id", "user_id", "ts", trailing.alias("trailing_1h_value")
    )


@register(
    "scd2_history",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           o_orderdate AS valid_from,
           LEAD(o_orderdate) OVER w AS valid_to,
           CASE WHEN LEAD(o_orderdate) OVER w IS NULL
                THEN 'current' ELSE 'expired' END AS state
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window_fns", "scd2", "interval", "lead"),
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 reconstruction: turn a change log
    (one row per version) into [valid_from, valid_to) intervals via LEAD,
    flagging the open-ended current version. The canonical prep step for
    point-in-time (as-of) joins against a versioned dimension. One shuffle
    on the entity key; windows are per-entity, so parallelism is the
    number of entities — no global sort, no skew beyond version counts.
    Tie-safe: the sort key includes the version id (o_orderkey)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    valid_to = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("valid_from"),
        valid_to.alias("valid_to"),
        F.when(valid_to.isNull(), "current").otherwise("expired").alias("state"),
    )


@register(
    "max_concurrent_intervals",
    oracle="""
    WITH oc AS (
        SELECT o_orderdate AS start_ts, c.close_ts
        FROM orders
        JOIN (SELECT l_orderkey, MAX(l_shipdate) AS close_ts
              FROM lineitem GROUP BY 1) c ON c.l_orderkey = o_orderkey
    ),
    ev AS (
        SELECT start_ts AS ts, 1 AS d FROM oc
        UNION ALL
        SELECT close_ts, -1 FROM oc
    ),
    pt AS (SELECT ts, CAST(SUM(d) AS BIGINT) AS d FROM ev GROUP BY 1),
    run AS (SELECT ts, SUM(d) OVER (ORDER BY ts) AS open_now FROM pt)
    SELECT date_trunc('month', ts) AS month,
           CAST(MAX(open_now) AS BIGINT) AS max_open,
           CAST(arg_max(open_now, ts) AS BIGINT) AS eom_open
    FROM run GROUP BY 1
    """,
    tags=("bounded_window", "window_fns", "sweep_line", "intervals", "concurrency"),
)
def max_concurrent_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum concurrent open intervals per month — the sweep-line
    (+1 at open, -1 at close) over order lifetimes [o_orderdate,
    max(l_shipdate)]. The classic "how many X were in flight at once"
    question (capacity planning, session concurrency, license peaks),
    which naive interval self-joins answer in O(n²).

    Tie-free by construction: deltas are SUMMED PER DISTINCT TIMESTAMP
    before the running sum, so same-instant opens/closes net out and no
    engine-specific tie order can change any prefix value.

    Scale shape (the global_rank_bucketed discipline): a naive
    ``SUM(d) OVER (ORDER BY ts)`` collapses the whole timeline onto one
    task. Instead the running sum is split by a TIME-PREFIX bucket (the
    month): (1) per-month local running sums in parallel, (2) per-month
    total deltas — a months-sized table — cumulated into offsets with a
    trivially-small window, (3) broadcast offsets back; global
    concurrency = offset + local. Works because the bucket is a prefix
    of the sort key itself. Cost: one shuffle on month + a tiny agg,
    regardless of row count."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    close = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("close_ts"))
    oc = o.join(close, o.o_orderkey == close.l_orderkey).select(
        F.col("o_orderdate").alias("start_ts"), "close_ts"
    )
    ev = oc.select(F.col("start_ts").alias("ts"), F.lit(1).alias("d")).unionAll(
        oc.select(F.col("close_ts").alias("ts"), F.lit(-1).alias("d"))
    )
    pt = ev.groupBy("ts").agg(F.sum("d").cast("long").alias("d"))
    pt = pt.withColumn(
        "month", F.date_trunc("month", F.col("ts")).cast("date")
    )
    local = pt.withColumn(
        "local_run",
        F.sum("d").over(
            W.partitionBy("month").orderBy("ts")
            .rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    totals = pt.groupBy("month").agg(F.sum("d").alias("t"))
    offsets = totals.select(
        "month",
        F.coalesce(
            F.sum("t").over(
                W.orderBy("month").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("offset"),
    )
    run = local.join(F.broadcast(offsets), "month").select(
        "month", "ts", (F.col("offset") + F.col("local_run")).alias("open_now")
    )
    return run.groupBy("month").agg(
        F.max("open_now").cast("long").alias("max_open"),
        F.max_by("open_now", "ts").cast("long").alias("eom_open"),
    )


@register(
    "interval_union_coverage",
    oracle="""
    WITH iv AS (
        SELECT o_custkey AS custkey, o_orderkey,
               o_orderdate AS s_ts, c.close_ts AS e_ts
        FROM orders
        JOIN (SELECT l_orderkey, MAX(l_shipdate) AS close_ts
              FROM lineitem GROUP BY 1) c ON c.l_orderkey = o_orderkey
    ),
    flagged AS (
        SELECT custkey, s_ts, e_ts,
               CASE WHEN MAX(e_ts) OVER (
                        PARTITION BY custkey
                        ORDER BY s_ts, e_ts, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) IS NULL
                    OR s_ts > MAX(e_ts) OVER (
                        PARTITION BY custkey
                        ORDER BY s_ts, e_ts, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    )
                    THEN 1 ELSE 0 END AS new_island
        FROM iv
    ),
    numbered AS (
        SELECT custkey, s_ts, e_ts,
               SUM(new_island) OVER (
                   PARTITION BY custkey ORDER BY s_ts, e_ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS island
        FROM flagged
    ),
    islands AS (
        SELECT custkey, island,
               MIN(s_ts) AS i_start, MAX(e_ts) AS i_end,
               COUNT(*) AS n_orders
        FROM numbered GROUP BY 1, 2
    )
    SELECT custkey,
           CAST(SUM(n_orders) AS BIGINT) AS n_orders,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(date_diff('day', i_start, i_end)) AS BIGINT)
               AS covered_days,
           CAST(date_diff('day', MIN(i_start), MAX(i_end)) AS BIGINT)
               AS span_days
    FROM islands GROUP BY custkey
    """,
    tags=("window_fns", "gaps_islands", "interval_merge", "coverage"),
)
def interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge each customer's overlapping order lifetimes into maximal
    busy ISLANDS and measure true coverage — union length, island
    count, active span. The interval-union question ("how long was
    this machine/account/patient actually active, double-counting
    nothing") that a naive SUM(end−start) over-counts whenever
    intervals overlap. Pure gaps-and-islands: an interval starts a new
    island iff its start exceeds the running MAX(end) of everything
    before it (any overlap or touch extends the island), island id =
    running count of those starts, then two tiers of per-key
    aggregation.

    Ties at identical (start, end) are ordered by o_orderkey in the
    flag window; the island-id window needs only (start, end) since
    same-instant rows share an island by construction. Durations are
    integer days — no float anywhere.

    Scale: one shuffle on custkey; both windows and both aggregations
    reuse that partitioning (ReusedExchange), parallelism = customers.
    The flag-window is ROWS-framed running max — O(1) state per row,
    no self-join against earlier intervals."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    close = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("e_ts"))
    iv = o.join(close, o.o_orderkey == close.l_orderkey).select(
        F.col("o_custkey").alias("custkey"),
        "o_orderkey",
        F.col("o_orderdate").alias("s_ts"),
        "e_ts",
    )
    wf = (
        W.partitionBy("custkey")
        .orderBy("s_ts", "e_ts", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prev_end = F.max("e_ts").over(wf)
    flagged = iv.select(
        "custkey",
        "s_ts",
        "e_ts",
        F.when(
            prev_end.isNull() | (F.col("s_ts") > prev_end), 1
        ).otherwise(0).alias("new_island"),
    )
    wn = (
        W.partitionBy("custkey")
        .orderBy("s_ts", "e_ts")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    numbered = flagged.select(
        "custkey", "s_ts", "e_ts", F.sum("new_island").over(wn).alias("island")
    )
    islands = numbered.groupBy("custkey", "island").agg(
        F.min("s_ts").alias("i_start"),
        F.max("e_ts").alias("i_end"),
        F.count("*").alias("n_orders"),
    )
    return islands.groupBy("custkey").agg(
        F.sum("n_orders").cast("long").alias("n_orders"),
        F.count("*").cast("long").alias("n_islands"),
        F.sum(F.datediff("i_end", "i_start")).cast("long").alias("covered_days"),
        F.datediff(F.max("i_end"), F.min("i_start"))
        .cast("long")
        .alias("span_days"),
    )


# --- Hampel filter (robust rolling outlier screen) (round 7, session 4) -----
# Median of a SORTED array (1-based element_at in both dialects); even
# windows interpolate the two middles — identical expression text.
def _arr_median(arr: str) -> str:
    return (
        f"CASE WHEN size({arr}) % 2 = 1"
        f" THEN CAST(element_at({arr},"
        f"      CAST((size({arr}) + 1) DIV 2 AS INT)) AS DOUBLE)"
        f" ELSE (CAST(element_at({arr},"
        f"            CAST(size({arr}) DIV 2 AS INT)) AS DOUBLE)"
        f"       + CAST(element_at({arr},"
        f"              CAST(size({arr}) DIV 2 + 1 AS INT)) AS DOUBLE))"
        f"      / 2.0 END"
    )


def _arr_median_duck(arr: str) -> str:
    return (
        f"CASE WHEN len({arr}) % 2 = 1"
        f" THEN CAST({arr}[(len({arr}) + 1) // 2] AS DOUBLE)"
        f" ELSE (CAST({arr}[len({arr}) // 2] AS DOUBLE)"
        f"       + CAST({arr}[len({arr}) // 2 + 1] AS DOUBLE)) / 2.0 END"
    )


_HAMPEL_K = 1.4826  # consistency constant: MAD -> sigma under normality
_HAMPEL_T = 3.0
# Threshold multiplier precomputed in Python: emitting T*K as separate
# SQL literals would multiply a DECIMAL-parsed constant per engine
# (DuckDB's bare-literal decimal->double path is not correctly
# rounded); one Python double, string-cast into both plans, is.
_HAMPEL_THRESH = _HAMPEL_T * _HAMPEL_K


@register(
    "hampel_filter",
    oracle=f"""
    WITH daily AS (
        SELECT n.n_name AS nation, CAST(o.o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2
    ),
    win AS (
        SELECT nation, day, cents,
               list_sort(list(cents) OVER (
                   PARTITION BY nation ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS arr
        FROM daily
    ),
    med AS (
        SELECT nation, day, cents, arr,
               {_arr_median_duck('arr')} AS rolling_med
        FROM win
    ),
    mad AS (
        SELECT nation, day, cents, rolling_med,
               {_arr_median_duck("list_sort(list_transform(arr, x -> abs(CAST(x AS DOUBLE) - rolling_med)))")}
                   AS rolling_mad
        FROM med
    )
    SELECT nation, day,
           CAST(cents AS DOUBLE) / 100.0 AS revenue,
           rolling_med / 100.0 AS rolling_med,
           rolling_mad / 100.0 AS rolling_mad,
           abs(CAST(cents AS DOUBLE) - rolling_med) / 100.0 AS deviation
    FROM mad
    WHERE abs(CAST(cents AS DOUBLE) - rolling_med)
          > CAST('{_HAMPEL_THRESH!r}' AS DOUBLE) * rolling_mad
    """,
    tags=("windows", "robust_statistics", "hampel", "outlier_detection",
          "time_series"),
)
def hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel identifier over per-nation daily revenue: flag days where
    |x − rolling median| > {_HAMPEL_T}·{_HAMPEL_K}·rolling MAD — the
    robust alternative to z-score screens (value_outliers,
    seasonal_adjusted_anomaly): median/MAD have a 50% breakdown point,
    so a burst of bad days cannot drag the baseline the way it drags a
    mean/σ screen, which is why Hampel is the standard telemetry
    despiker. The ±3-day window materializes as a per-row SORTED array
    (7 longs — constant memory), median and MAD are pure array
    expressions over it (exact integer cents until the final halving/
    division, identical element_at arithmetic in both engines), and
    series edges naturally use their shorter windows. Scale: windows
    partition by nation (no global sort); at 100 TB the same shape
    runs per (series key), the array never exceeding the window
    length."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "customer").select(
                "c_custkey", "c_nationkey"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").select(
                    "n_nationkey", "n_name"
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
            .cast("long")
            .alias("cents")
        )
    )
    w = W.partitionBy("nation").orderBy("day").rowsBetween(-3, 3)
    win = daily.select(
        "nation",
        "day",
        "cents",
        F.sort_array(F.collect_list("cents").over(w)).alias("arr"),
    )
    med = win.withColumn("rolling_med", F.expr(_arr_median("arr")))
    mad = med.withColumn(
        "rolling_mad",
        F.expr(
            _arr_median(
                "sort_array(transform(arr,"
                " x -> abs(CAST(x AS DOUBLE) - rolling_med)))"
            )
        ),
    )
    dev = F.abs(F.col("cents").cast("double") - F.col("rolling_med"))
    return mad.filter(
        dev > F.lit(_HAMPEL_THRESH) * F.col("rolling_mad")
    ).select(
        "nation",
        "day",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        (F.col("rolling_med") / 100.0).alias("rolling_med"),
        (F.col("rolling_mad") / 100.0).alias("rolling_mad"),
        (dev / 100.0).alias("deviation"),
    )


# --- period-to-date running totals (round 7, session 4) ---------------------
@register(
    "period_to_date_totals",
    oracle="""
    WITH daily AS (
        SELECT n.n_name AS nation, CAST(o.o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2
    )
    SELECT nation, day,
           CAST(cents AS DOUBLE) / 100.0 AS day_revenue,
           CAST(SUM(cents) OVER (
               PARTITION BY nation, date_trunc('year', day)
               ORDER BY day) AS DOUBLE) / 100.0 AS ytd,
           CAST(SUM(cents) OVER (
               PARTITION BY nation, date_trunc('quarter', day)
               ORDER BY day) AS DOUBLE) / 100.0 AS qtd,
           CAST(SUM(cents) OVER (
               PARTITION BY nation, date_trunc('month', day)
               ORDER BY day) AS DOUBLE) / 100.0 AS mtd
    FROM daily
    """,
    tags=("windows", "period_to_date", "bi_semantics", "running_total"),
)
def period_to_date_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-/quarter-/month-to-date running revenue per nation — the
    period-resetting cumulative semantics every BI layer (MDX's YTD(),
    DAX's TOTALYTD) builds on top of SQL, expressed as what it really
    is: the SAME ordered cumulative sum under three different PARTITION
    keys (nation × period start), all three computed over the one
    daily aggregate in one pass. Resets are free — they ARE the
    partition boundaries, no CASE logic, no self-joins, no calendar
    spine needed for the totals themselves. Integer-cents sums (exact,
    order-independent within the frame), day granularity keeps each
    partition's window small; the corpus-sized work is the single
    daily rollup, and the windows run over the (nation × day) table —
    tiny at any corpus scale. Distinct days are unique per partition,
    so the default RANGE frame and ROWS agree — no peer-row
    ambiguity."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "customer").select(
                "c_custkey", "c_nationkey"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").select(
                    "n_nationkey", "n_name"
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
            .cast("long")
            .alias("cents")
        )
    )

    def ptd(trunc: str):
        w = (
            W.partitionBy(
                "nation", F.date_trunc(trunc, F.col("day"))
            ).orderBy("day")
        )
        return (F.sum("cents").over(w).cast("double") / 100.0)

    return daily.select(
        "nation",
        "day",
        (F.col("cents").cast("double") / 100.0).alias("day_revenue"),
        ptd("year").alias("ytd"),
        ptd("quarter").alias("qtd"),
        ptd("month").alias("mtd"),
    )

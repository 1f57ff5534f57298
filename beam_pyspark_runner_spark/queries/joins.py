"""Join queries: equi/semi/anti/outer/broadcast/range/as-of, CoGroupByKey.

Reference parity: the reference's only join primitive is the
``CoGroupByKey`` composite (tag-ParDo + Flatten + GroupByKey,
SURVEY.md §2.3); everything else here is new surface. Join strategy
notes are on each query — at 100 TB the dimension joins (region,
nation, supplier, part at TPC-H ratios) must broadcast, and only
fact-fact joins (orders⋈lineitem) may shuffle, ideally co-bucketed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from beam_pyspark_runner_spark.functions.numeric import dsum, dsum_sql
from beam_pyspark_runner_spark.queries.registry import register
from beam_pyspark_runner_spark.sources.readers import load_table


@register(
    "join_inner",
    oracle=f"""
    SELECT c.c_mktsegment, COUNT(*) AS n_orders, {dsum_sql('o.o_totalprice')} AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=("join", "inner"),
    bench=True,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer is 10× smaller than orders → broadcast hint removes the shuffle
    on the fact side entirely (orders streams through a BroadcastHashJoin)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("revenue"))
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    tags=("join", "left_outer"),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    tags=("join", "semi", "subquery_exists"),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS ⇒ left_semi: no row duplication, right side never materialized
    into the output; Catalyst builds the hash table on the filtered side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    # empty_ok_at_small_sf: every sf0.01 customer has an order, so the
    # anti-join is legitimately empty there; the sf0.1 gate (where
    # order-less customers exist) is the non-trivial certification.
    tags=("join", "anti", "subquery_not_exists", "empty_ok_at_small_sf"),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_multiway",
    oracle=f"""
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_customers, {dsum_sql('c.c_acctbal')} AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    tags=("join", "multiway", "broadcast"),
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema chain: both dims broadcast → zero shuffles before the agg."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("n_customers"), dsum("c_acctbal").alias("total_acctbal"))
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation, {dsum_sql('CAST(l.l_extendedprice AS DECIMAL(10,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))')} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
    tags=("join", "multiway", "tpch"),
    bench=True,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape. Fact-fact orders⋈lineitem shuffles on orderkey;
    supplier/nation/region broadcast; region filter prunes before the join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dsum(
                F.col("l_extendedprice").cast("decimal(10,2)")
                * (
                    F.lit(1).cast("decimal(3,2)")
                    - F.col("l_discount").cast("decimal(3,2)")
                )
            ).alias("revenue")
        )
    )


@register(
    "cogroup_counts",
    oracle="""
    SELECT k.custkey,
           COALESCE(c.n_c, 0) AS n_customer_rows,
           COALESCE(o.n_o, 0) AS n_order_rows
    FROM (SELECT c_custkey AS custkey FROM customer
          UNION SELECT o_custkey FROM orders) k
    LEFT JOIN (SELECT c_custkey, COUNT(*) AS n_c FROM customer GROUP BY 1) c
           ON k.custkey = c.c_custkey
    LEFT JOIN (SELECT o_custkey, COUNT(*) AS n_o FROM orders GROUP BY 1) o
           ON k.custkey = o.o_custkey
    """,
    tags=("cogroup", "join", "full_outer"),
)
def cogroup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CoGroupByKey re-expressed: per-side pre-aggregation then full outer
    join on key. Pre-aggregating before the join shrinks shuffle volume —
    the Beam expansion (tag+flatten+GBK) shuffles raw rows instead."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_custkey").alias("custkey"))
        .agg(F.count("*").alias("n_customer_rows"))
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count("*").alias("n_order_rows"))
    )
    return (
        c.join(o, "custkey", "full_outer")
        .select(
            "custkey",
            F.coalesce("n_customer_rows", F.lit(0)).alias("n_customer_rows"),
            F.coalesce("n_order_rows", F.lit(0)).alias("n_order_rows"),
        )
    )


@register(
    "range_join",
    oracle=f"""
    WITH bands(band_name, lo, hi) AS (
        VALUES ('tiny', 0.0, 10.0), ('small', 10.0, 20.0),
               ('medium', 20.0, 35.0), ('large', 35.0, 51.0)
    )
    SELECT b.band_name, COUNT(*) AS n_items, {dsum_sql('l.l_extendedprice')} AS revenue
    FROM lineitem l JOIN bands b ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.band_name
    """,
    tags=("join", "range"),
)
def range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join against a tiny band table: broadcast nested loop.
    With a broadcast side this costs one pass over the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    # VALUES, not createDataFrame: a driver-local literal list plans as
    # a LocalRelation the optimizer can constant-fold and the broadcast
    # audit can prove bounded; createDataFrame round-trips through an
    # RDD and leaves an opaque LogicalRDD leaf (round-10).
    bands = spark.sql(
        """
        SELECT * FROM VALUES
            ('tiny',   0.0D, 10.0D),
            ('small', 10.0D, 20.0D),
            ('medium',20.0D, 35.0D),
            ('large', 35.0D, 51.0D)
        AS bands(band_name, lo, hi)
        """
    )
    return (
        li.join(
            F.broadcast(bands),
            (li.l_quantity >= bands.lo) & (li.l_quantity < bands.hi),
        )
        .groupBy("band_name")
        .agg(F.count("*").alias("n_items"), dsum("l_extendedprice").alias("revenue"))
    )


@register(
    "asof_join",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, e.event_id AS last_event_id, e.ts AS last_event_ts
    FROM (SELECT o_orderkey, o_custkey,
                 TIMESTAMP '2024-01-01' + to_seconds(o_orderkey % 2592000) AS o_ts
          FROM orders) o
    ASOF JOIN events e
      ON o.o_custkey % 50 = e.user_id AND o.o_ts >= e.ts
    """,
    tags=("join", "asof"),
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: most recent event at or before each order's (synthetic)
    timestamp, per user. Spark has no ASOF primitive; the scalable pattern
    is union-the-sides + one window pass:

      tag rows left/right, union, then `last(right_cols, ignorenulls)` over
      (key ORDER BY ts, side_tag ROWS UNBOUNDED PRECEDING) carries the
      latest right row forward onto each left row.

    Right-side tag (0) sorts before left (1) at equal ts so ties mean "at
    or before". One shuffle over |L|+|R| rows — survives 100 TB, unlike
    join-then-max (|L|×|R| intermediate). Rows with no prior event are
    dropped to match ASOF's inner semantics.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_custkey") % 50).alias("k"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit("2024-01-01").cast("timestamp"))
            + (F.col("o_orderkey") % 2592000)
        ).alias("ts"),
        F.lit(1).alias("is_left"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp").alias("event_ts"),
    )
    e = load_table(spark, sf_dir, "events").select(
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("long").alias("o_custkey"),
        F.col("user_id").alias("k"),
        "ts",
        F.lit(0).alias("is_left"),
        F.col("event_id"),
        F.col("ts").alias("event_ts"),
    )
    w = (
        W.partitionBy("k")
        .orderBy(F.col("ts"), F.col("is_left"), F.col("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        o.unionByName(e)
        .withColumn("last_event_id", F.last("event_id", ignorenulls=True).over(w))
        .withColumn("last_event_ts", F.last("event_ts", ignorenulls=True).over(w))
        .filter((F.col("is_left") == 1) & F.col("last_event_id").isNotNull())
        .select("o_orderkey", "o_custkey", "last_event_id", "last_event_ts")
    )


# --- TPC-H Q3 shape: shipping priority (bench: fact-fact join + top-k) -------
@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {dsum_sql("CAST(l.l_extendedprice AS DECIMAL(10,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))")} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    tags=("tpch", "join", "top_k"),
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape. Customer is the small side (filtered on segment) —
    broadcast into orders; orders⋈lineitem is the fact-fact shuffle on
    orderkey. Top-10 is TakeOrderedAndProject (per-partition heaps), never
    a global sort. All three filters push to their scans."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    one = F.lit(1).cast("decimal(3,2)")
    rev = F.col("l_extendedprice").cast("decimal(10,2)") * (
        one - F.col("l_discount").cast("decimal(3,2)")
    )
    return (
        li.join(
            o.join(c, o.o_custkey == c.c_custkey).select(
                "o_orderkey", "o_orderdate", "o_orderpriority"
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(rev).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "join_full_outer",
    oracle=f"""
    WITH c AS (
        SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
        FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY 1
    ),
    s AS (
        SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
        FROM supplier WHERE s_acctbal > 5000 GROUP BY 1
    )
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
    tags=("join", "full_outer"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two filtered per-nation aggregates; the filters
    make each side miss some nations so both null-extension directions
    are exercised. Aggregate-first keeps the outer join tiny (≤ nation
    cardinality per side) — at 100 TB the join inputs are already
    reduced, so the full-outer itself is a broadcast-size problem, never
    a fact-fact shuffle."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count("*").alias("n_customers"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return c.join(s, c.c_nk == s.s_nk, "full_outer").select(
        F.coalesce("c_nk", "s_nk").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@register(
    "salted_skew_join",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_events,
           {dsum_sql('value')} AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("join", "skew", "salting"),
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicitly salted equi-join (functions/skew.py:salted_join): the
    event fact side is salted on event_id, the customer dim replicated
    8×, and the join runs on (key, salt) — the manual fix for a hot join
    key when the dim can't broadcast and AQE's runtime skew split
    doesn't trigger. The oracle is the PLAIN join: salting must be
    invisible in the result multiset, and the decimal sum makes the
    post-join aggregate order-proof."""
    from beam_pyspark_runner_spark.functions.skew import salted_join

    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        salted_join(e, c, "user_id", "c_custkey", salt_on="event_id", n_salts=8)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("total_value"))
    )


@register(
    "bucketed_join_colocated",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_items,
           {dsum_sql('l_extendedprice')} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
    tags=("join", "bucketing", "colocated", "sink", "catalog"),
)
def bucketed_join_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join via pre-bucketed tables: both sides written with
    bucketBy(8) + sortBy on the join key, then joined through the
    catalog — Spark proves co-location from the bucket spec and plans
    the join with ZERO shuffle exchanges (pinned by
    tests/test_scale_patterns.py). This is the 100 TB contract for a
    repeatedly-joined fact pair: pay the bucketed write once, skip the
    orders⋈lineitem shuffle on every subsequent query. The oracle is the
    plain join — bucketing must be invisible in the result."""
    import hashlib
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), f"bprs_bkt_{tag}")
    o_tbl, li_tbl = f"bkt_orders_{tag}", f"bkt_lineitem_{tag}"
    (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", os.path.join(base, "orders"))
        .mode("overwrite")
        .saveAsTable(o_tbl)
    )
    (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_extendedprice")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", os.path.join(base, "lineitem"))
        .mode("overwrite")
        .saveAsTable(li_tbl)
    )
    return (
        spark.table(li_tbl)
        .join(
            spark.table(o_tbl),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_items"), dsum("l_extendedprice").alias("revenue"))
    )


@register(
    "cross_join_small_dims",
    oracle="""
    SELECT r_name, o_orderpriority
    FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders)
    """,
    tags=("join", "cross_join"),
)
def cross_join_small_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product of two bounded sides (5 regions × 5
    priorities). The distinct-priority side is an aggregate of the fact
    table, broadcast into a BroadcastNestedLoopJoin — the only sane
    cross-join shape at scale: a cartesian is legitimate ONLY when one
    side is provably tiny (dimension scaffolding, parameter grids);
    anything else is a plan bug, which is why non-broadcast
    CartesianProduct is asserted absent in the ANN plan tests."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    pr = load_table(spark, sf_dir, "orders").select("o_orderpriority").distinct()
    return r.crossJoin(F.broadcast(pr))


@register(
    "null_safe_join",
    oracle="""
    WITH c AS (
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN NULL ELSE c_nationkey END AS nk
        FROM customer
    ),
    n AS (
        SELECT n_nationkey AS nk, n_name FROM nation
        UNION ALL SELECT NULL, 'UNKNOWN'
    )
    SELECT n.n_name, COUNT(*) AS n_customers
    FROM c JOIN n ON c.nk IS NOT DISTINCT FROM n.nk
    GROUP BY n.n_name
    """,
    tags=("join", "null_safe", "null_semantics"),
)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): debtor customers
    get a NULL nation key, the dimension carries an explicit NULL →
    'UNKNOWN' row, and the null-safe predicate routes them there — where
    a plain equi-join silently drops every NULL-keyed row. <=> stays a
    hash-joinable equi-key in Catalyst (NULL hashes as one key group),
    so the plan is an ordinary BroadcastHashJoin, not a theta join."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, F.lit(None))
        .otherwise(F.col("c_nationkey"))
        .alias("nk"),
    )
    # VALUES, not createDataFrame, for the NULL sentinel row: keeps the
    # union arm a LocalRelation (provably bounded) instead of an opaque
    # LogicalRDD (round-10).
    n = (
        load_table(spark, sf_dir, "nation")
        .select(F.col("n_nationkey").alias("nk"), "n_name")
        .unionByName(
            spark.sql(
                "SELECT CAST(NULL AS INT) AS nk, 'UNKNOWN' AS n_name"
            )
        )
    )
    return (
        c.join(F.broadcast(n), c.nk.eqNullSafe(n.nk))
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "pandas_cogroup_reconcile",
    oracle="""
    SELECT o.o_orderkey AS orderkey,
           COUNT(l.l_orderkey) AS n_lines,
           CAST(COALESCE(SUM(l.l_quantity), 0) AS DOUBLE) AS total_qty
    FROM orders o
    LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey % 10 = 3
    GROUP BY 1
    """,
    tags=("cogroup", "pandas_cogroup", "applyInPandas", "reconciliation"),
)
def pandas_cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CoGrouped-Pandas API surface — ``dfA.groupBy(k).cogroup(
    dfB.groupBy(k)).applyInPandas(fn)``: both sides of a key arrive in
    ONE Python function as two aligned pandas frames, the Beam
    CoGroupByKey-then-DoFn composition (cogroup_counts is its
    declarative twin) for reconciliation logic that genuinely wants
    imperative access to both groups at once. Kernel math is
    order-independent (count + sum of integral doubles < 2^53) so the
    Arrow crossing stays deterministic; the 10% orderkey filter is
    pushed to BOTH scans before the cogroup shuffle.

    Scale: one co-partitioned shuffle on the key (same as a join), then
    Arrow-batched group pairs; per-group memory is the group size —
    the same bound Beam's CoGroupByKey imposes, but Arrow-columnar
    instead of pickled iterables."""
    import pandas as pd

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 3)
        .select("o_orderkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 10 == 3)
        .select("l_orderkey", "l_quantity")
    )

    def reconcile(key: tuple, o_pdf: pd.DataFrame, l_pdf: pd.DataFrame) -> pd.DataFrame:
        if o_pdf.empty:  # line items whose order is absent: not our rows
            return pd.DataFrame({"orderkey": [], "n_lines": [], "total_qty": []})
        return pd.DataFrame(
            {
                "orderkey": [key[0]],
                "n_lines": [len(l_pdf)],
                "total_qty": [float(l_pdf["l_quantity"].sum()) if len(l_pdf) else 0.0],
            }
        )

    return (
        o.groupBy("o_orderkey")
        .cogroup(li.groupBy("l_orderkey"))
        .applyInPandas(
            reconcile, "orderkey bigint, n_lines bigint, total_qty double"
        )
    )


@register(
    "item_cf_recommend",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
        SELECT a.l_partkey AS i, b.l_partkey AS j, COUNT(*) AS cooc
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2
    ),
    deg AS (SELECT l_partkey AS p, COUNT(*) AS d FROM li GROUP BY 1),
    scored AS (
        SELECT i, j, cooc,
               CAST(cooc AS DOUBLE)
                   / sqrt(CAST(di.d AS DOUBLE) * CAST(dj.d AS DOUBLE))
                   AS sim
        FROM pairs
        JOIN deg di ON di.p = i
        JOIN deg dj ON dj.p = j
        WHERE cooc >= 2
    )
    SELECT i AS part, j AS similar_part, cooc, sim
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY i ORDER BY sim DESC, j ASC
        ) AS rn
        FROM scored
    ) WHERE rn <= 3
    """,
    tags=("join", "collaborative_filtering", "item_item", "recommendation"),
)
def item_cf_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering (Sarwar et al., WWW'01 /
    Amazon's item-to-item): parts co-ordered together, scored by cosine
    over co-occurrence — sim(i,j) = cooc/√(deg_i·deg_j) — with top-3
    neighbors per item. The recommendation engine's batch precompute.

    Scale shape: the pair stage is the pagerank edge build (in-group
    HOF expansion bounded by per-order fan-out, one groupBy — no fact
    self-join on the Spark side); degrees are an item-cardinality
    partial agg joined in WITHOUT a forced broadcast (AQE broadcasts a
    catalog-sized table, hash-joins a web-scale one); min-support
    prunes the long tail before scoring; the top-k window partitions by
    item over the support-filtered pair table. √ on doubles is
    correctly rounded in both engines — deterministic, unlike libm
    log."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    per_order = li.distinct().groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    pairs = (
        per_order.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, x -> filter("
                    "transform(ps, y -> struct(x AS i, y AS j)), "
                    "p -> p.i != p.j)))"
                )
            ).alias("p")
        )
        .select("p.i", "p.j")
        .groupBy("i", "j")
        .agg(F.count("*").alias("cooc"))
        .filter(F.col("cooc") >= 2)
    )
    deg = li.distinct().groupBy("l_partkey").agg(F.count("*").alias("d"))
    di = deg.select(F.col("l_partkey").alias("i"), F.col("d").alias("di"))
    dj = deg.select(F.col("l_partkey").alias("j"), F.col("d").alias("dj"))
    scored = (
        pairs.join(di, "i")
        .join(dj, "j")
        .select(
            "i", "j", "cooc",
            (
                F.col("cooc").cast("double")
                / F.sqrt(F.col("di").cast("double") * F.col("dj").cast("double"))
            ).alias("sim"),
        )
    )
    w = W.partitionBy("i").orderBy(F.col("sim").desc(), F.col("j").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("i").alias("part"),
            F.col("j").alias("similar_part"),
            "cooc",
            "sim",
        )
    )


@register(
    "negative_sampling_pairs",
    oracle="""
    WITH cand AS (
        SELECT o.o_orderkey,
               (o.o_orderkey * 7919 + i.i * 104729) % 2000 AS neg_partkey,
               CAST(i.i AS BIGINT) AS sample_idx
        FROM orders o
        CROSS JOIN (SELECT unnest(range(1, 3)) AS i) i
    )
    SELECT c.o_orderkey AS orderkey, c.neg_partkey, c.sample_idx
    FROM cand c
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = c.o_orderkey AND l.l_partkey = c.neg_partkey
    )
    """,
    tags=("join", "negative_sampling", "training_pairs", "anti_join"),
)
def negative_sampling_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training
    (word2vec / two-tower recsys): per order, 2 candidate non-purchased
    parts drawn by PURE MODULAR ARITHMETIC over the contiguous part-key
    space — no catalog broadcast, no RNG, no cross join against the
    item table — then a single anti-join scrubs accidental positives
    (the textbook rejection step). Every engine, partitioning, and
    retry produces the same negatives: reproducible training data, the
    property random samplers lose the moment a task retries.

    Shape: candidates are generated row-local (2 rows per positive
    context), the anti-join keys on (order, part) — at 100 TB that is
    a hash join of two id-pair streams; the accepted-candidate rate is
    1 − |positives|/|catalog| ≈ 1, so rejection barely thins it. The
    2000 modulus is the sf0.01 catalog size, kept literal so the
    DuckDB oracle is engine-identical at every sf; production passes
    |catalog| (or a capped hot-item range) as the parameter."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    cand = o.select(
        "o_orderkey",
        F.explode(F.array(F.lit(1), F.lit(2))).alias("sample_idx"),
    ).select(
        "o_orderkey",
        ((F.col("o_orderkey") * 7919 + F.col("sample_idx") * 104729) % 2000).alias(
            "neg_partkey"
        ),
        F.col("sample_idx").cast("long").alias("sample_idx"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.col("l_partkey").alias("neg_partkey"),
    )
    return cand.join(li, ["o_orderkey", "neg_partkey"], "left_anti").select(
        F.col("o_orderkey").alias("orderkey"), "neg_partkey", "sample_idx"
    )


@register(
    "asof_join_tolerance",
    oracle="""
    WITH o AS (
        SELECT o_orderkey, o_custkey, o_custkey % 50 AS k,
               TIMESTAMP '2024-01-01' + to_seconds(o_orderkey % 2592000) AS o_ts
        FROM orders
    ),
    m AS (
        SELECT o.o_orderkey, o.o_custkey, o.o_ts,
               e.event_id AS last_event_id, e.ts AS last_event_ts
        FROM o ASOF LEFT JOIN events e
          ON o.k = e.user_id AND o.o_ts >= e.ts
    )
    SELECT o_orderkey, o_custkey,
           CASE WHEN last_event_ts IS NOT NULL
                     AND o_ts - last_event_ts <= INTERVAL '1 hour'
                THEN last_event_id END AS last_event_id,
           CASE WHEN last_event_ts IS NOT NULL
                     AND o_ts - last_event_ts <= INTERVAL '1 hour'
                THEN last_event_ts END AS last_event_ts
    FROM m
    """,
    tags=("join", "asof", "tolerance", "left_join"),
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT as-of join with a TOLERANCE — pandas' merge_asof(tolerance=)
    semantics at cluster scale: every left row survives, and a match
    older than 1 hour is returned as NULL instead of a stale carry-
    forward (the staleness guard a feature-store lookup needs — a
    price from last week must not silently back a trade today). Same
    union + window forward-fill as asof_join (one shuffle over
    |L|+|R|), with the tolerance applied as a post-window predicate on
    the carried timestamp — no extra pass, no range join."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_custkey") % 50).alias("k"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit("2024-01-01").cast("timestamp"))
            + (F.col("o_orderkey") % 2592000)
        ).alias("ts"),
        F.lit(1).alias("is_left"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp").alias("event_ts"),
    )
    e = load_table(spark, sf_dir, "events").select(
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("long").alias("o_custkey"),
        F.col("user_id").alias("k"),
        "ts",
        F.lit(0).alias("is_left"),
        F.col("event_id"),
        F.col("ts").alias("event_ts"),
    )
    w = (
        W.partitionBy("k")
        .orderBy(F.col("ts"), F.col("is_left"), F.col("event_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = (
        o.unionByName(e)
        .withColumn("le_id", F.last("event_id", ignorenulls=True).over(w))
        .withColumn("le_ts", F.last("event_ts", ignorenulls=True).over(w))
        .filter(F.col("is_left") == 1)
    )
    fresh = F.col("le_ts").isNotNull() & (
        F.col("ts").cast("long") - F.col("le_ts").cast("long") <= 3600
    )
    return carried.select(
        "o_orderkey",
        "o_custkey",
        F.when(fresh, F.col("le_id")).alias("last_event_id"),
        F.when(fresh, F.col("le_ts")).alias("last_event_ts"),
    )


@register(
    "record_linkage_score",
    oracle="""
    WITH b AS (
        SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
               CASE WHEN c_custkey % 13 = 0 THEN 'MACHINERY'
                    ELSE c_mktsegment END AS seg2,
               CASE WHEN c_custkey % 17 = 0
                    THEN CAST(c_acctbal + 500 AS DECIMAL(12,2))
                    ELSE c_acctbal END AS bal2,
               c_acctbal
        FROM customer
    ),
    scored AS (
        SELECT a.c_custkey AS key_a, r.c_custkey AS key_b,
               (CASE WHEN a.c_name = r.c_name THEN 6 ELSE 0 END
                + CASE WHEN a.c_mktsegment = r.seg2 THEN 2 ELSE 0 END
                + CASE WHEN abs(CAST(a.c_acctbal - r.bal2 AS DOUBLE)) < 0.01
                       THEN 3 ELSE 0 END) AS score
        FROM customer a JOIN b r
          ON a.c_nationkey = r.c_nationkey
         AND a.c_custkey % 100 = r.c_custkey % 100
    )
    SELECT CASE WHEN score >= 9 THEN 'link'
                WHEN score >= 6 THEN 'possible'
                ELSE 'non_link' END AS decision,
           COUNT(*) AS n_pairs,
           CAST(MIN(score) AS BIGINT) AS min_score,
           CAST(MAX(score) AS BIGINT) AS max_score
    FROM scored GROUP BY 1
    """,
    tags=("join", "record_linkage", "entity_resolution", "blocking"),
)
def record_linkage_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage (Fellegi–Sunter-style scoring): two customer
    files — the second deterministically perturbed (every 13th segment
    flipped, every 17th balance shifted) — compared within BLOCKS
    (nation × custkey-mod-100), each pair scored by weighted field
    agreement and classified link / possible / non-link. The
    entity-resolution engine core: blocking bounds the candidate space
    (here ~|C|²/2500 per nation instead of |C|²), the comparison
    vector is pure CASE arithmetic in codegen, and thresholds are the
    reviewable knobs. At 100 TB the block key IS the shuffle key; skew
    in a block (one giant city) is handled like any hot join key —
    salt or AQE."""
    c = load_table(spark, sf_dir, "customer")
    b = c.select(
        F.col("c_custkey").alias("key_b"),
        F.col("c_nationkey").alias("nat_b"),
        (F.col("c_custkey") % 100).alias("blk_b"),
        F.col("c_name").alias("name_b"),
        F.when(F.col("c_custkey") % 13 == 0, F.lit("MACHINERY"))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg_b"),
        F.when(
            F.col("c_custkey") % 17 == 0,
            (F.col("c_acctbal") + 500).cast("decimal(12,2)"),
        )
        .otherwise(F.col("c_acctbal"))
        .alias("bal_b"),
    )
    a = c.select(
        F.col("c_custkey").alias("key_a"),
        F.col("c_nationkey").alias("nat_a"),
        (F.col("c_custkey") % 100).alias("blk_a"),
        F.col("c_name").alias("name_a"),
        F.col("c_mktsegment").alias("seg_a"),
        F.col("c_acctbal").alias("bal_a"),
    )
    pairs = a.join(
        b, (a.nat_a == b.nat_b) & (a.blk_a == b.blk_b)
    )
    score = (
        F.when(F.col("name_a") == F.col("name_b"), 6).otherwise(0)
        + F.when(F.col("seg_a") == F.col("seg_b"), 2).otherwise(0)
        + F.when(
            F.abs((F.col("bal_a") - F.col("bal_b")).cast("double")) < 0.01, 3
        ).otherwise(0)
    )
    decision = (
        F.when(score >= 9, "link")
        .when(score >= 6, "possible")
        .otherwise("non_link")
    )
    return pairs.select(score.alias("score"), decision.alias("decision")).groupBy(
        "decision"
    ).agg(
        F.count("*").alias("n_pairs"),
        F.min("score").cast("long").alias("min_score"),
        F.max("score").cast("long").alias("max_score"),
    )


@register(
    "join_fanout_audit",
    oracle="""
    WITH l AS (SELECT o_orderkey AS k, COUNT(*) AS nl FROM orders GROUP BY 1),
    r AS (SELECT l_orderkey AS k, COUNT(*) AS nr FROM lineitem GROUP BY 1),
    m AS (SELECT l.k, l.nl, COALESCE(r.nr, 0) AS nr FROM l LEFT JOIN r USING (k))
    SELECT CAST(SUM(nl * nr) AS BIGINT) AS predicted_join_rows,
           CAST(MAX(nl * nr) AS BIGINT) AS max_key_fanout,
           CAST(COUNT(*) FILTER (WHERE nl * nr > 5) AS BIGINT)
               AS keys_over_fanout_5,
           CAST(COUNT(*) FILTER (WHERE nr = 0) AS BIGINT) AS unmatched_left_keys
    FROM m
    """,
    tags=("join", "fanout_audit", "cardinality_estimation", "pre_join_check"),
)
def join_fanout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join fan-out audit: EXACT predicted output size, the worst
    single-key explosion, and the hot-key count for a prospective join
    — computed from per-key COUNTS on each side, never from the join
    itself. This is the guard you run before an unfamiliar 100 TB ⋈
    100 TB: two partial aggregates (each output ≤ its key cardinality)
    and one key-aligned merge of count rows replace the join whose
    cost you're trying to predict; Σ(nl·nr) is the exact row count a
    plain inner join would produce, and max(nl·nr) is the skew
    headline that decides salting before any executor OOMs discover
    it empirically."""
    o = load_table(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k")
    )
    l_cnt = o.groupBy("k").agg(F.count("*").alias("nl"))
    r_cnt = li.groupBy("k").agg(F.count("*").alias("nr"))
    m = l_cnt.join(r_cnt, "k", "left").select(
        "nl", F.coalesce(F.col("nr"), F.lit(0)).alias("nr")
    )
    prod = F.col("nl") * F.col("nr")
    return m.agg(
        F.sum(prod).cast("long").alias("predicted_join_rows"),
        F.max(prod).cast("long").alias("max_key_fanout"),
        F.count(F.when(prod > 5, 1)).alias("keys_over_fanout_5"),
        F.count(F.when(F.col("nr") == 0, 1)).alias("unmatched_left_keys"),
    )


@register(
    "asof_join_nearest",
    oracle="""
    WITH o AS (
        SELECT o_orderkey, o_custkey, o_custkey % 50 AS k,
               TIMESTAMP '2024-01-01' + to_seconds(o_orderkey % 2592000) AS ts,
               1 AS is_left,
               CAST(NULL AS BIGINT) AS event_id,
               CAST(NULL AS TIMESTAMP) AS event_ts
        FROM orders
    ),
    e AS (
        SELECT CAST(NULL AS BIGINT) AS o_orderkey,
               CAST(NULL AS BIGINT) AS o_custkey,
               user_id AS k, ts, 0 AS is_left, event_id, ts AS event_ts
        FROM events
    ),
    u AS (SELECT * FROM o UNION ALL SELECT * FROM e),
    w AS (
        SELECT *,
               last_value(event_id IGNORE NULLS) OVER wb AS prev_id,
               last_value(event_ts IGNORE NULLS) OVER wb AS prev_ts,
               first_value(event_id IGNORE NULLS) OVER wf AS next_id,
               first_value(event_ts IGNORE NULLS) OVER wf AS next_ts
        FROM u
        WINDOW wb AS (PARTITION BY k ORDER BY ts, is_left, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY k ORDER BY ts, is_left, event_id
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT o_orderkey, o_custkey,
           CASE WHEN next_id IS NULL THEN prev_id
                WHEN prev_id IS NULL THEN next_id
                WHEN date_diff('second', prev_ts, ts)
                     <= date_diff('second', ts, next_ts) THEN prev_id
                ELSE next_id END AS nearest_event_id,
           CASE WHEN next_id IS NULL THEN prev_ts
                WHEN prev_id IS NULL THEN next_ts
                WHEN date_diff('second', prev_ts, ts)
                     <= date_diff('second', ts, next_ts) THEN prev_ts
                ELSE next_ts END AS nearest_event_ts
    FROM w
    WHERE is_left = 1 AND (prev_id IS NOT NULL OR next_id IS NOT NULL)
    """,
    tags=("join", "asof", "nearest"),
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, NEAREST direction (pandas merge_asof
    direction='nearest'): each order matches its closest event in time
    per user — whichever side of the order it falls on. Same
    union-the-sides single-shuffle plan as `asof_join`, with TWO window
    passes over the identical sort (backward carry = last non-null over
    the preceding frame, forward carry = first non-null over the
    following frame — the second window reuses the first's shuffle and
    sort), then an integer-second distance compare; ties at equal
    distance prefer the earlier event, equal-timestamp events count as
    distance 0 via the backward carry. Still one shuffle over |L|+|R|
    rows — the join-then-min-distance formulation would be |L|×|R|."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_custkey") % 50).alias("k"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit("2024-01-01").cast("timestamp"))
            + (F.col("o_orderkey") % 2592000)
        ).alias("ts"),
        F.lit(1).alias("is_left"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp").alias("event_ts"),
    )
    e = load_table(spark, sf_dir, "events").select(
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("long").alias("o_custkey"),
        F.col("user_id").alias("k"),
        "ts",
        F.lit(0).alias("is_left"),
        F.col("event_id"),
        F.col("ts").alias("event_ts"),
    )
    base = W.partitionBy("k").orderBy(F.col("ts"), F.col("is_left"), F.col("event_id"))
    wb = base.rowsBetween(W.unboundedPreceding, W.currentRow)
    wf = base.rowsBetween(W.currentRow, W.unboundedFollowing)
    u = (
        o.unionByName(e)
        .withColumn("prev_id", F.last("event_id", ignorenulls=True).over(wb))
        .withColumn("prev_ts", F.last("event_ts", ignorenulls=True).over(wb))
        .withColumn("next_id", F.first("event_id", ignorenulls=True).over(wf))
        .withColumn("next_ts", F.first("event_ts", ignorenulls=True).over(wf))
    )
    d_prev = F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")
    d_next = F.unix_timestamp("next_ts") - F.unix_timestamp("ts")
    pick_prev = (
        F.col("next_id").isNull()
        | (F.col("prev_id").isNotNull() & (d_prev <= d_next))
    )
    return (
        u.filter(
            (F.col("is_left") == 1)
            & (F.col("prev_id").isNotNull() | F.col("next_id").isNotNull())
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.when(pick_prev, F.col("prev_id"))
            .otherwise(F.col("next_id"))
            .alias("nearest_event_id"),
            F.when(pick_prev, F.col("prev_ts"))
            .otherwise(F.col("next_ts"))
            .alias("nearest_event_ts"),
        )
    )


GRID_RADIUS_M = 5000  # radius and grid-cell size, integer meters
_COORD_MOD = 1_000_000  # coordinates live in [0, 1000 km) as integer meters


@register(
    "grid_radius_join",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey AS id,
               (('0x' || substr(md5('gx-' || c_custkey), 1, 8))::BIGINT)
                   % {_COORD_MOD} AS x,
               (('0x' || substr(md5('gy-' || c_custkey), 1, 8))::BIGINT)
                   % {_COORD_MOD} AS y
        FROM customer
    ),
    cells AS (
        SELECT id, x, y,
               x // {GRID_RADIUS_M} AS cx, y // {GRID_RADIUS_M} AS cy
        FROM pts
    ),
    expanded AS (
        SELECT c.id, c.x, c.y, c.cx + dx.d AS cx, c.cy + dy.d AS cy
        FROM cells c,
             (VALUES (-1), (0), (1)) dx(d),
             (VALUES (-1), (0), (1)) dy(d)
    )
    SELECT a.id AS cust_a, b.id AS cust_b,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist_sq_m
    FROM expanded a
    JOIN cells b ON a.cx = b.cx AND a.cy = b.cy AND a.id < b.id
    WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
          <= {GRID_RADIUS_M} * {GRID_RADIUS_M}
    """,
    tags=("join", "spatial", "grid_bucketing", "radius_join", "self_join"),
)
def grid_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial RADIUS self-join via grid bucketing: all point pairs
    within {GRID_RADIUS_M} m of each other, where each point gets
    deterministic planar integer-meter coordinates hashed from its key
    (the fixture has no geo columns; the PLAN is the deliverable).
    The pattern is the scalable form of "find nearby pairs": cell size
    = radius, so any qualifying pair shares one of 9 neighboring
    cells — the LEFT side explodes to its 3×3 cell neighborhood (9×,
    constant), the RIGHT side stays at its home cell, the join is a
    plain equi-join on cell id, and the exact distance filter runs
    only within matched cells. Candidate fan-in is bounded by points-
    per-cell² summed over cells — local density, never corpus² — the
    same df-bounding argument as ppjoin's prefixes, in 2-D. A pair
    matches exactly once (the right side's home cell is unique), so
    no post-join dedup. All-integer squared distances: value-hashes
    exactly, no trig, no floats (a geodesic variant swaps the metric;
    the bucketing is unchanged)."""
    from beam_pyspark_runner_spark.functions.hashing import h32

    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        F.pmod(
            h32(F.concat_ws("-", F.lit("gx"), F.col("c_custkey"))),
            F.lit(_COORD_MOD),
        ).alias("x"),
        F.pmod(
            h32(F.concat_ws("-", F.lit("gy"), F.col("c_custkey"))),
            F.lit(_COORD_MOD),
        ).alias("y"),
    )
    cells = pts.select(
        "id", "x", "y",
        F.floor(F.col("x") / GRID_RADIUS_M).alias("cx"),
        F.floor(F.col("y") / GRID_RADIUS_M).alias("cy"),
    )
    offsets = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    expanded = (
        cells.select(
            "id", "x", "y", "cx", "cy", F.explode(offsets).alias("dx")
        )
        .select(
            "id", "x", "y", "dx", "cy", (F.col("cx") + F.col("dx")).alias("cx"),
            F.explode(offsets).alias("dy"),
        )
        .select("id", "x", "y", "cx", (F.col("cy") + F.col("dy")).alias("cy"))
    )
    a = expanded.alias("a")
    b = cells.alias("b")
    dist_sq = (F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x")) + (
        F.col("a.y") - F.col("b.y")
    ) * (F.col("a.y") - F.col("b.y"))
    return (
        a.join(
            b,
            (F.col("a.cx") == F.col("b.cx"))
            & (F.col("a.cy") == F.col("b.cy"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(dist_sq <= GRID_RADIUS_M * GRID_RADIUS_M)
        .select(
            F.col("a.id").alias("cust_a"),
            F.col("b.id").alias("cust_b"),
            dist_sq.alias("dist_sq_m"),
        )
    )


BITEMPORAL_AUDIT_TS = "2024-01-10"  # knowledge-time cutoff for the audit leg
BITEMPORAL_LAG_DAYS = 1  # dim updates become KNOWN this long after validity


@register(
    "bitemporal_asof_join",
    oracle=f"""
    WITH dim AS (
        SELECT o_custkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rk
        FROM orders
    ),
    versions AS (
        SELECT o_custkey, rk,
               TIMESTAMP '2024-01-01' + (rk - 1) * INTERVAL 3 DAY AS valid_from,
               TIMESTAMP '2024-01-01' + (rk - 1) * INTERVAL 3 DAY
                   + INTERVAL {BITEMPORAL_LAG_DAYS} DAY AS recorded_at
        FROM dim
    ),
    j AS (
        SELECT e.event_id,
               MAX(v.rk) AS rk_now,
               MAX(CASE WHEN v.recorded_at <= TIMESTAMP '{BITEMPORAL_AUDIT_TS}'
                        THEN v.rk END) AS rk_audit
        FROM events e
        LEFT JOIN versions v
          ON v.o_custkey = e.user_id AND v.valid_from <= e.ts
        GROUP BY e.event_id
    )
    SELECT rk_audit AS version_rank,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) FILTER (
               WHERE rk_now IS DISTINCT FROM rk_audit) AS BIGINT) AS n_stale
    FROM j GROUP BY rk_audit
    """,
    tags=("join", "bitemporal", "asof", "point_in_time", "feature_store"),
)
def bitemporal_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITEMPORAL as-of enrichment: for every event, the dimension
    version that was valid AT THE EVENT'S time (valid time) **as known
    at a fixed audit timestamp** (knowledge time) — the two-axis query
    that makes yesterday's feature values reproducible today. Versions
    become KNOWN {BITEMPORAL_LAG_DAYS} day after they become valid
    (late-arriving dimension updates — the realistic case), so the
    audit leg lags the full-knowledge leg wherever an update hadn't
    landed yet; ``n_stale`` counts exactly those events, the
    training-serving-skew exposure a feature platform must report.
    Both legs come from ONE join pass: qualifying versions per event,
    then an unconditional MAX(rk) (current knowledge) next to a
    knowledge-filtered conditional MAX (audit knowledge) in the same
    aggregate — no second scan, no second shuffle. Join fan-in is
    bounded by versions-per-entity; the event-keyed aggregate is the
    only corpus-sized shuffle. NULL version_rank = events before any
    known version (reported, not dropped)."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

    rk = F.row_number().over(
        W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    )
    anchor = F.lit("2024-01-01").cast("timestamp")
    versions = o.select("o_custkey", rk.alias("rk")).select(
        "o_custkey",
        "rk",
        (anchor + F.expr("make_dt_interval(3 * (rk - 1))")).alias("valid_from"),
        (
            anchor
            + F.expr(f"make_dt_interval(3 * (rk - 1) + {BITEMPORAL_LAG_DAYS})")
        ).alias("recorded_at"),
    )
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    audit = F.lit(BITEMPORAL_AUDIT_TS).cast("timestamp")
    j = (
        e.join(
            versions,
            (F.col("user_id") == F.col("o_custkey"))
            & (F.col("valid_from") <= F.col("ts")),
            "left",
        )
        .groupBy("event_id")
        .agg(
            F.max("rk").alias("rk_now"),
            F.max(F.when(F.col("recorded_at") <= audit, F.col("rk"))).alias(
                "rk_audit"
            ),
        )
    )
    stale = F.when(
        ~F.col("rk_now").eqNullSafe(F.col("rk_audit")), 1
    )
    return j.groupBy(F.col("rk_audit").cast("long").alias("version_rank")).agg(
        F.count("*").cast("long").alias("n_events"),
        F.count(stale).cast("long").alias("n_stale"),
    )


# --- binned interval join (round 7) ---
IVL_BIN_DAYS = 64  # bin width; must be >= max interval length (30 d)
IVL_EPOCH = "1992-01-01"  # day-number origin for bin arithmetic


@register(
    "binned_interval_join",
    oracle=f"""
    WITH ivl AS (
        SELECT l_quantity,
               date_diff('day', TIMESTAMP '{IVL_EPOCH}', l_shipdate) AS s,
               date_diff('day', TIMESTAMP '{IVL_EPOCH}', l_shipdate)
                   + 1 + (l_orderkey + l_linenumber) % 30 AS e
        FROM lineitem
    ),
    pts AS (
        SELECT DISTINCT o_orderdate AS d,
               date_diff('day', TIMESTAMP '{IVL_EPOCH}', o_orderdate) AS dd
        FROM orders
    )
    SELECT p.d AS order_date,
           CAST(COUNT(*) AS BIGINT) AS n_inflight,
           {dsum_sql('i.l_quantity')} AS qty_inflight
    FROM pts p JOIN ivl i ON i.s <= p.dd AND p.dd <= i.e
    GROUP BY p.d
    """,
    tags=("join", "interval_join", "range_join", "binning", "event_time"),
)
def binned_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval RANGE JOIN rewritten as an EQUI-join via date
    binning — the 1-D sibling of grid_radius_join and the standard
    rescue for Spark's worst join shape: a raw BETWEEN predicate
    compiles to BroadcastNestedLoopJoin (or cartesian), O(|points|·
    |intervals|) comparisons. With bin width {IVL_BIN_DAYS} d >= the
    max interval length (30 d), every interval covers at most 2 bins
    (explode is a <=2x constant expansion), every point lives in
    exactly 1 bin, so bin-equality is a complete candidate filter and
    each qualifying (point, interval) pair is matched EXACTLY once —
    no dedup pass. The exact BETWEEN runs only within matched bins.
    Business shape: shipments in flight per order date (interval =
    ship date + deterministic 1..30-day transit). Scale: both sides
    shuffle once on the bin key; candidate fan-in is bounded by rows
    per bin (local temporal density), never |points|x|intervals|;
    quantities accumulate in exact decimal."""
    def day(c):
        return F.datediff(
            F.col(c).cast("date"), F.lit(IVL_EPOCH).cast("date")
        ).cast("long")

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"
    )
    ivl = li.select(
        "l_quantity",
        day("l_shipdate").alias("s"),
        (
            day("l_shipdate")
            + 1
            + F.pmod(F.col("l_orderkey") + F.col("l_linenumber"), F.lit(30))
        ).alias("e"),
    )
    ivl_binned = ivl.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / IVL_BIN_DAYS),
                F.floor(F.col("e") / IVL_BIN_DAYS),
            )
        ),
    )
    pts = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderdate").alias("d"))
        .distinct()
        .select("d", day("d").alias("dd"))
        .withColumn("bin", F.floor(F.col("dd") / IVL_BIN_DAYS))
    )
    return (
        pts.join(ivl_binned, "bin")
        .filter((F.col("s") <= F.col("dd")) & (F.col("dd") <= F.col("e")))
        .groupBy(F.col("d").alias("order_date"))
        .agg(
            F.count("*").cast("long").alias("n_inflight"),
            dsum("l_quantity").alias("qty_inflight"),
        )
    )


# --- late-arriving dimension: inferred members (round 7) ------------------------
IDM_DROP_MOD = 97  # dim rows with c_custkey % 97 == 0 "haven't arrived yet"


@register(
    "inferred_dimension_members",
    oracle=f"""
    WITH dim AS (
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE c_custkey % {IDM_DROP_MOD} <> 0
    ),
    enriched AS (
        SELECT o.o_orderkey, o.o_totalprice,
               COALESCE(d.c_mktsegment, 'UNKNOWN') AS segment,
               d.c_custkey IS NULL AS inferred
        FROM orders o LEFT JOIN dim d ON o.o_custkey = d.c_custkey
    )
    SELECT segment, inferred,
           COUNT(*) AS n_orders,
           {dsum_sql('o_totalprice')} AS total_price
    FROM enriched GROUP BY segment, inferred
    """,
    tags=("joins", "late_arriving_dimension", "data_warehouse",
          "inferred_member"),
)
def inferred_dimension_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATE-ARRIVING DIMENSION handling (Kimball's 'inferred member'):
    facts referencing dimension keys that haven't landed yet must not
    be dropped (revenue vanishes) or fail the load — they join to a
    placeholder member (segment='UNKNOWN', inferred=true) that a later
    dim load overwrites in place (the SCD machinery in scd2_history /
    merge_upsert_orders does the backfill). Simulated here by holding
    out every {IDM_DROP_MOD}th customer: the report pivots revenue by
    (segment, inferred) so the UNKNOWN bucket is auditable — the
    number a warehouse owner watches to know how stale the dim feed
    is.

    Scale notes (100 TB): one broadcast-able dim leg, LEFT join keeps
    the fact scan streaming, COALESCE is the entire inferred-member
    mechanism — no second pass, no driver state."""
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % IDM_DROP_MOD != 0)
        .select("c_custkey", "c_mktsegment")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    enriched = o.join(
        dim, o["o_custkey"] == dim["c_custkey"], "left"
    ).select(
        F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")).alias("segment"),
        F.col("c_custkey").isNull().alias("inferred"),
        "o_totalprice",
    )
    return enriched.groupBy("segment", "inferred").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )


# --- DBSCAN point classification (round 7) ----------------------------------------
DBSCAN_MINPTS = 3


@register(
    "dbscan_core_points",
    oracle="""
    WITH pairs AS ({GRJ_ORACLE}),
    ends AS (
        SELECT cust_a AS id, cust_b AS nbr FROM pairs
        UNION ALL SELECT cust_b, cust_a FROM pairs
    ),
    ncnt AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_neighbors
             FROM ends GROUP BY id),
    base AS (
        SELECT c.c_custkey AS id, COALESCE(ncnt.n_neighbors, 0) AS n_neighbors
        FROM customer c LEFT JOIN ncnt ON ncnt.id = c.c_custkey
    ),
    core AS (SELECT id FROM base WHERE n_neighbors >= 3),
    has_core_nbr AS (
        SELECT DISTINCT e.id FROM ends e JOIN core ON core.id = e.nbr
    )
    SELECT b.id AS cust_id, b.n_neighbors,
           CASE WHEN b.n_neighbors >= 3 THEN 'core'
                WHEN h.id IS NOT NULL THEN 'border'
                ELSE 'noise' END AS cls
    FROM base b LEFT JOIN has_core_nbr h ON h.id = b.id
    """,
    tags=("join", "spatial", "dbscan", "density", "clustering"),
)
def dbscan_core_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN point classification (Ester et al. KDD'96) on the
    grid-bucketed radius join: core points (≥{DBSCAN_MINPTS} neighbors
    within the radius), border points (non-core with a core neighbor),
    noise (everything else). COMPOSES the registered grid_radius_join
    verbatim — the audit/consumer cannot drift from the join it
    builds on (the binary_recall_at_k discipline). Cluster extraction
    is then connected components over core-core edges (the
    dedup_components machinery); the classification here is the
    density pass that makes DBSCAN linear-ish at scale: neighbor
    counts come from the locally-bounded grid join, never an
    all-pairs distance matrix. Integer counts and string classes —
    value-hash trivial.

    Scale notes (100 TB): one grid equi-join (fan-in bounded by local
    density²), two small aggregates, two broadcast-able flag joins."""
    from beam_pyspark_runner_spark.queries.registry import REGISTRY as _R

    pairs = _R["grid_radius_join"].fn(spark, sf_dir)
    ends = pairs.select(
        F.col("cust_a").alias("id"), F.col("cust_b").alias("nbr")
    ).unionAll(pairs.select(F.col("cust_b"), F.col("cust_a")))
    ncnt = ends.groupBy("id").agg(
        F.count("*").cast("long").alias("n_neighbors")
    )
    base = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("id"))
        .join(ncnt, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_neighbors"), F.lit(0))
            .cast("long")
            .alias("n_neighbors"),
        )
    )
    core = base.filter(F.col("n_neighbors") >= DBSCAN_MINPTS).select(
        F.col("id").alias("core_id")
    )
    has_core = (
        ends.join(
            core, ends["nbr"] == core["core_id"]
        )
        .select("id")
        .distinct()
        .withColumn("hc", F.lit(1))
    )
    return base.join(has_core, "id", "left").select(
        F.col("id").alias("cust_id"),
        "n_neighbors",
        F.when(F.col("n_neighbors") >= DBSCAN_MINPTS, "core")
        .when(F.col("hc").isNotNull(), "border")
        .otherwise("noise")
        .alias("cls"),
    )


from beam_pyspark_runner_spark.queries.registry import REGISTRY as _REG_J

_REG_J["dbscan_core_points"].oracle = _REG_J["dbscan_core_points"].oracle.replace(
    "{GRJ_ORACLE}", _REG_J["grid_radius_join"].oracle
)


# --- Weiszfeld geometric median (round 7) ------------------------------------------
WEISZFELD_ITERS = 3
_W_SCALE = 1_000_000  # w' = 1e6/dist: keeps dsum's 2-dp rounding negligible


def _wf_pts_sql() -> str:
    return f"""
        SELECT n.n_name,
               (('0x' || substr(md5('gx-' || c.c_custkey), 1, 8))::BIGINT)
                   % {_COORD_MOD} AS x,
               (('0x' || substr(md5('gy-' || c.c_custkey), 1, 8))::BIGINT)
                   % {_COORD_MOD} AS y
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    """


def _wf_iter_sql(prev: str, out: str) -> str:
    w = (
        f"({_W_SCALE}.0 / GREATEST(sqrt((p.x - {prev}.cx) * (p.x - {prev}.cx)"
        f" + (p.y - {prev}.cy) * (p.y - {prev}.cy)), 1e-9))"
    )
    return f"""
    {out} AS (
        SELECT p.n_name,
               {dsum_sql(f"{w} * p.x")} / {dsum_sql(w)} AS cx,
               {dsum_sql(f"{w} * p.y")} / {dsum_sql(w)} AS cy
        FROM pts p JOIN {prev} ON p.n_name = {prev}.n_name
        GROUP BY p.n_name
    )"""


@register(
    "weiszfeld_geometric_median",
    oracle=f"""
    WITH pts AS ({_wf_pts_sql()}),
    it0 AS (
        SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS DOUBLE) / COUNT(*) AS cx,
               CAST(SUM(y) AS DOUBLE) / COUNT(*) AS cy
        FROM pts GROUP BY n_name
    ),
    {",".join(_wf_iter_sql(f"it{i}", f"it{i + 1}") for i in range(3))}
    SELECT it0.n_name, it0.n AS n_points,
           it0.cx AS mean_x, it0.cy AS mean_y,
           it3.cx AS gm_x, it3.cy AS gm_y
    FROM it0 JOIN it3 ON it0.n_name = it3.n_name
    """,
    tags=("statistics", "spatial", "geometric_median", "robust",
          "iterative"),
)
def weiszfeld_geometric_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOMETRIC MEDIAN per nation via {WEISZFELD_ITERS} unrolled
    Weiszfeld iterations (1937; the L1 multivariate location estimator
    — a 2-D centroid with a 50% breakdown point, where the mean is
    dragged by any single far-out depot): c ← Σ(p/‖p−c‖) / Σ(1/‖p−c‖),
    seeded at the centroid. The same deterministic integer-meter
    coordinates as grid_radius_join. Each iteration's weighted sums
    ride the dsum decimal discipline (weights scaled ×1e6 so the 2-dp
    decimal rounding is a ~1e-11 relative quantization — identical in
    both engines by construction), and the per-row weight is one
    sqrt+division of deterministic doubles — so three full rounds of
    an ITERATIVE algorithm still value-hash exactly.

    Scale notes (100 TB): each iteration = one corpus pass + a
    25-row broadcast join of the centers back in — the kmeans_lloyd
    shape; iteration count is fixed (fixed-point quantization makes
    convergence checks a driver-free boolean column if needed)."""
    from beam_pyspark_runner_spark.functions.hashing import h32
    from beam_pyspark_runner_spark.functions.numeric import dsum

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pts = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]).select(
        "n_name",
        F.pmod(
            h32(F.concat_ws("-", F.lit("gx"), F.col("c_custkey"))),
            F.lit(_COORD_MOD),
        ).alias("x"),
        F.pmod(
            h32(F.concat_ws("-", F.lit("gy"), F.col("c_custkey"))),
            F.lit(_COORD_MOD),
        ).alias("y"),
    )
    it = pts.groupBy("n_name").agg(
        F.count("*").cast("long").alias("n"),
        (F.sum("x").cast("double") / F.count("*")).alias("cx"),
        (F.sum("y").cast("double") / F.count("*")).alias("cy"),
    )
    it0 = it
    for _ in range(WEISZFELD_ITERS):
        j = pts.join(
            F.broadcast(it.select("n_name", "cx", "cy")), "n_name"
        )
        d = F.greatest(
            F.sqrt(
                (F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))
                + (F.col("y") - F.col("cy")) * (F.col("y") - F.col("cy"))
            ),
            F.lit(1e-9),
        )
        w = F.lit(float(_W_SCALE)) / d
        it = j.groupBy("n_name").agg(
            (dsum(w * F.col("x")) / dsum(w)).alias("cx"),
            (dsum(w * F.col("y")) / dsum(w)).alias("cy"),
        )
    return (
        it0.select(
            "n_name",
            F.col("n").alias("n_points"),
            F.col("cx").alias("mean_x"),
            F.col("cy").alias("mean_y"),
        )
        .join(
            it.select(
                "n_name",
                F.col("cx").alias("gm_x"),
                F.col("cy").alias("gm_y"),
            ),
            "n_name",
        )
    )


# --- market-basket association rules (round 7) ---------------------------------------
MBR_MIN_SUPPORT = 20  # minimum co-occurrence count
MBR_TOP = 20


@register(
    "market_basket_rules",
    oracle=f"""
    WITH basket AS (
        SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    nb AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_baskets
           FROM basket),
    item AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cnt FROM basket
             GROUP BY b),
    pair AS (
        SELECT a.b AS ante, c.b AS cons, CAST(COUNT(*) AS BIGINT) AS nboth
        FROM basket a JOIN basket c
          ON a.o = c.o AND a.b <> c.b
        GROUP BY a.b, c.b
    ),
    rules AS (
        SELECT p.ante, p.cons, p.nboth AS nboth,
               ia.cnt AS n_ante, ic.cnt AS n_cons, nb.n_baskets,
               CAST(p.nboth AS DOUBLE) / nb.n_baskets AS support,
               CAST(p.nboth AS DOUBLE) / ia.cnt AS confidence,
               CAST(p.nboth AS DOUBLE) * nb.n_baskets
                   / (CAST(ia.cnt AS DOUBLE) * ic.cnt) AS lift
        FROM pair p
        JOIN item ia ON ia.b = p.ante
        JOIN item ic ON ic.b = p.cons
        CROSS JOIN nb
        WHERE p.nboth >= {MBR_MIN_SUPPORT}
    )
    SELECT ante, cons, nboth AS n_both, n_ante, n_cons,
           support, confidence, lift
    FROM rules
    ORDER BY lift DESC, ante, cons
    LIMIT {MBR_TOP}
    """,
    tags=("join", "association_rules", "market_basket", "recommendation"),
)
def market_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASSOCIATION RULES (Agrawal & Srikant VLDB'94) over order baskets
    of part brands: support, confidence, and lift for every brand pair
    co-purchased at least {MBR_MIN_SUPPORT} times — the rule-based
    companion to item_cf_recommend's cosine CF (rules are
    interpretable and thresholdable; CF ranks). The in-order pair
    expansion is the apriori candidate step with the basket bounded by
    |brands| (~25), so fan-out per order is constant; every metric is
    an exact count ratio and the top-{MBR_TOP} by lift is
    TakeOrderedAndProject with a total tie order.

    Scale notes (100 TB): one distinct projection, one bounded
    self-join per order, broadcast item counts. |brands|² caps the
    rule space regardless of order count."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    basket = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b"))
        .distinct()
    )
    nb = basket.agg(F.countDistinct("o").cast("long").alias("n_baskets"))
    item = basket.groupBy("b").agg(F.count("*").cast("long").alias("cnt"))
    a = basket.select(F.col("o"), F.col("b").alias("ante"))
    c2 = basket.select(F.col("o"), F.col("b").alias("cons"))
    pair = (
        a.join(c2, "o")
        .filter(F.col("ante") != F.col("cons"))
        .groupBy("ante", "cons")
        .agg(F.count("*").cast("long").alias("both"))
        .filter(F.col("both") >= MBR_MIN_SUPPORT)
    )
    ia = item.select(F.col("b").alias("ante"), F.col("cnt").alias("n_ante"))
    ic = item.select(F.col("b").alias("cons"), F.col("cnt").alias("n_cons"))
    rules = (
        pair.join(F.broadcast(ia), "ante")
        .join(F.broadcast(ic), "cons")
        .crossJoin(F.broadcast(nb))
        .select(
            "ante",
            "cons",
            F.col("both").alias("n_both"),
            "n_ante",
            "n_cons",
            (F.col("both").cast("double") / F.col("n_baskets")).alias(
                "support"
            ),
            (F.col("both").cast("double") / F.col("n_ante")).alias(
                "confidence"
            ),
            (
                F.col("both").cast("double")
                * F.col("n_baskets")
                / (F.col("n_ante").cast("double") * F.col("n_cons"))
            ).alias("lift"),
        )
    )
    return rules.orderBy(F.col("lift").desc(), "ante", "cons").limit(MBR_TOP)


# --- incremental view maintenance for a join view (round 7, session 4) ------
_IVM_SPLIT = "2001-01-01"  # orders on/after this date are the delta batch


@register(
    "incremental_join_maintenance",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY 1
    """,
    tags=("joins", "incremental_view_maintenance", "delta_algebra",
          "materialized_view"),
)
def incremental_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view under inserts on BOTH
    sides — the delta-algebra identity behind every materialized-view
    refresh engine: for V = A ⋈ B and insert batches ΔA, ΔB,

        ΔV = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB

    (the cross term is what naive ΔA⋈B + A⋈ΔB double-misses), so the
    view updates by touching only delta-sized joins — never rescanning
    A⋈B. Here A = orders (deltas: orderdate ≥ {_IVM_SPLIT}),
    B = customers (deltas: custkey ≡ 0 mod 20, their pre-split orders
    deliberately ARRIVE with the customer — late-arriving dimension),
    and V is per-nation order count/revenue. The Spark side computes
    base(A₀⋈B₀) + the three delta legs and merges the partial
    aggregates; the ORACLE IS the full recompute over A∪ΔA ⋈ B∪ΔB —
    so the value-hash MATCH is precisely the theorem 'maintenance ≡
    recompute' checked end-to-end, including the cross term (drop any
    leg and the hash breaks). All four joins share one shape (orders
    shuffled on custkey, nation broadcast); at 100 TB the three delta
    legs are delta-sized and the base aggregate is the stored view —
    this query materializes nothing only because the gate needs one
    self-contained plan."""
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("od"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    a0 = o.filter(F.col("od") < F.lit(_IVM_SPLIT).cast("date"))
    da = o.filter(F.col("od") >= F.lit(_IVM_SPLIT).cast("date"))
    b0 = c.filter(F.col("c_custkey") % 20 != 0)
    db = c.filter(F.col("c_custkey") % 20 == 0)

    def leg(orders_df: DataFrame, cust_df: DataFrame) -> DataFrame:
        return (
            orders_df.join(
                cust_df, orders_df.o_custkey == cust_df.c_custkey
            )
            .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_name").alias("nation"))
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum("cents").cast("long").alias("cents"),
            )
        )

    base = leg(a0, b0)
    d1 = leg(da, b0)   # new orders of existing customers
    d2 = leg(a0, db)   # late-arriving customers claim their old orders
    d3 = leg(da, db)   # the cross term: new orders of new customers
    return (
        base.unionByName(d1)
        .unionByName(d2)
        .unionByName(d3)
        .groupBy("nation")
        .agg(
            F.sum("n").cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )


# --- Fellegi-Sunter EM parameter estimation, one step (round 7, s4) ---------
# With the symmetric init (m=0.9, u=0.1 for all 3 fields) the E-step
# posterior depends only on the agreement COUNT, so there are exactly 4
# posterior values — precomputed here as literals. All EM sums then
# reduce to INTEGER counts per agreement level dotted with those 4
# literals in a fixed order, which is bit-identical in both engines
# (no per-row fractional accumulation anywhere).
_FS_LAMBDA, _FS_M0, _FS_U0 = 0.1, 0.9, 0.1


def _fs_posteriors() -> list[float]:
    out = []
    for a in range(4):
        pm = _FS_LAMBDA * _FS_M0**a * (1 - _FS_M0) ** (3 - a)
        pu = (1 - _FS_LAMBDA) * _FS_U0**a * (1 - _FS_U0) ** (3 - a)
        out.append(pm / (pm + pu))
    return out


_FS_G = _fs_posteriors()


def _fs_term(count: str, weight: float) -> str:
    """One product term, materialized as its own projected column before
    any addition touches it: DuckDB contracts ``a*b + c`` into an FMA
    (single rounding — measured 1-ulp drift vs Spark/python), so
    products and sums must live in separate projection levels. The
    weight is emitted as a QUOTED string cast — DuckDB parses a bare
    numeric literal as DECIMAL first and its decimal→double conversion
    is not correctly rounded (measured: 0.9878048780487805 parsed 1
    ulp low); the string path is strtod, correctly rounded in both
    engines."""
    return f"CAST('{weight!r}' AS DOUBLE) * {count}"


def _fs_sum(cols: list[str]) -> str:
    """Fixed-order left-to-right sum of already-materialized columns."""
    e = cols[0]
    for c in cols[1:]:
        e = f"({e} + {c})"
    return e


_FS_NA = [f"na{a}" for a in range(4)]
_FS_NK = [f"nk{a}" for a in range(4)]
_FS_ONE_MINUS_G = [1.0 - g for g in _FS_G]


@register(
    "fellegi_sunter_em_step",
    oracle=f"""
    WITH b AS (
        SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
               CASE WHEN c_custkey % 13 = 0 THEN 'MACHINERY'
                    ELSE c_mktsegment END AS seg2,
               CASE WHEN c_custkey % 17 = 0
                    THEN CAST(c_acctbal + 500 AS DECIMAL(12,2))
                    ELSE c_acctbal END AS bal2
        FROM customer
    ),
    pairs AS (
        SELECT g1, g2, g3, g1 + g2 + g3 AS a FROM (
            SELECT CASE WHEN a.c_name = r.c_name THEN 1 ELSE 0 END AS g1,
                   CASE WHEN a.c_mktsegment = r.seg2 THEN 1 ELSE 0 END AS g2,
                   CASE WHEN abs(CAST(a.c_acctbal - r.bal2 AS DOUBLE)) < 0.01
                        THEN 1 ELSE 0 END AS g3
            FROM customer a JOIN b r
              ON a.c_nationkey = r.c_nationkey
             AND a.c_custkey % 100 = r.c_custkey % 100
        )
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
               {", ".join(
                   f"CAST(SUM(CASE WHEN a = {a} THEN 1 ELSE 0 END) AS BIGINT)"
                   f" AS na{a}"
                   for a in range(4)
               )}
        FROM pairs
    ),
    fields AS (
        SELECT 'name' AS field, g1 AS gk, a FROM pairs
        UNION ALL SELECT 'segment', g2, a FROM pairs
        UNION ALL SELECT 'balance', g3, a FROM pairs
    ),
    per_f AS (
        SELECT field,
               {", ".join(
                   f"CAST(SUM(CASE WHEN a = {a} AND gk = 1 THEN 1 ELSE 0 END)"
                   f" AS BIGINT) AS nk{a}"
                   for a in range(4)
               )}
        FROM fields GROUP BY field
    ),
    terms AS (
        SELECT p.field, t.n_pairs,
               {", ".join(
                   f"{_fs_term(f'p.nk{a}', _FS_G[a])} AS mg{a},"
                   f" {_fs_term(f'p.nk{a}', _FS_ONE_MINUS_G[a])} AS ug{a},"
                   f" {_fs_term(f't.na{a}', _FS_G[a])} AS ag{a},"
                   f" {_fs_term(f't.na{a}', _FS_ONE_MINUS_G[a])} AS au{a}"
                   for a in range(4)
               )}
        FROM per_f p, tot t
    )
    SELECT field, n_pairs,
           ({_fs_sum([f'mg{a}' for a in range(4)])})
               / ({_fs_sum([f'ag{a}' for a in range(4)])}) AS m_new,
           ({_fs_sum([f'ug{a}' for a in range(4)])})
               / ({_fs_sum([f'au{a}' for a in range(4)])}) AS u_new,
           ({_fs_sum([f'ag{a}' for a in range(4)])}) / n_pairs AS lambda_new
    FROM terms
    """,
    tags=("joins", "record_linkage", "fellegi_sunter", "em",
          "parameter_estimation"),
)
def fellegi_sunter_em_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One EM step of Fellegi-Sunter record-linkage parameter
    estimation (Winkler 1988 — the unsupervised way to LEARN the
    match/unmatch agreement probabilities that record_linkage_score
    consumes as fixed weights): over the blocked candidate pairs,
    E-step computes each pair's match posterior under the current
    (λ, m_k, u_k), M-step re-estimates λ and per-field m_k/u_k from
    posterior-weighted agreement counts. With the symmetric init the
    posterior is a function of the agreement COUNT alone, so every EM
    sum collapses to INTEGER counts per agreement level (4 conditional
    sums — pure codegen) dotted with 4 Python-precomputed posterior
    literals in fixed order — no per-row fractional accumulation at
    all, which is what makes a floating-point EM value-hash across
    engines (per-term decimal rounding of the posteriors was measured
    drifting at the 10th decimal and engineered out). Output:
    per-field m/u after one step plus updated λ — the perturbed-copy
    fixture pulls m toward the true agreement rates among matches
    while u stays near the chance rate, the separation the method
    exists to find. Scale: one blocked join (the record_linkage_score
    shape), two count aggregates, constant-size final arithmetic."""
    c = load_table(spark, sf_dir, "customer")
    b = c.select(
        F.col("c_custkey").alias("b_key"),
        F.col("c_name").alias("b_name"),
        F.col("c_nationkey").alias("b_nat"),
        F.when(F.col("c_custkey") % 13 == 0, F.lit("MACHINERY"))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg2"),
        F.when(
            F.col("c_custkey") % 17 == 0,
            (F.col("c_acctbal") + 500).cast("decimal(12,2)"),
        )
        .otherwise(F.col("c_acctbal").cast("decimal(12,2)"))
        .alias("bal2"),
    )
    pairs = (
        c.join(
            b,
            (F.col("c_nationkey") == F.col("b_nat"))
            & (F.col("c_custkey") % 100 == F.col("b_key") % 100),
        )
        .select(
            (F.col("c_name") == F.col("b_name")).cast("int").alias("g1"),
            (F.col("c_mktsegment") == F.col("seg2")).cast("int").alias("g2"),
            (
                F.abs(
                    (F.col("c_acctbal") - F.col("bal2")).cast("double")
                )
                < 0.01
            )
            .cast("int")
            .alias("g3"),
        )
        .withColumn("a", F.col("g1") + F.col("g2") + F.col("g3"))
    )
    tot = pairs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        *[
            F.sum(F.when(F.col("a") == a, 1).otherwise(0))
            .cast("long")
            .alias(f"na{a}")
            for a in range(4)
        ],
    )
    fields = (
        pairs.select(F.lit("name").alias("field"), F.col("g1").alias("gk"), "a")
        .unionAll(pairs.select(F.lit("segment"), F.col("g2"), F.col("a")))
        .unionAll(pairs.select(F.lit("balance"), F.col("g3"), F.col("a")))
    )
    per_f = fields.groupBy("field").agg(
        *[
            F.sum(F.when((F.col("a") == a) & (F.col("gk") == 1), 1).otherwise(0))
            .cast("long")
            .alias(f"nk{a}")
            for a in range(4)
        ]
    )
    j = per_f.crossJoin(F.broadcast(tot))
    terms = j.select(
        "field",
        "n_pairs",
        *[
            F.expr(_fs_term(f"nk{a}", _FS_G[a])).alias(f"mg{a}")
            for a in range(4)
        ],
        *[
            F.expr(_fs_term(f"nk{a}", _FS_ONE_MINUS_G[a])).alias(f"ug{a}")
            for a in range(4)
        ],
        *[
            F.expr(_fs_term(f"na{a}", _FS_G[a])).alias(f"ag{a}")
            for a in range(4)
        ],
        *[
            F.expr(_fs_term(f"na{a}", _FS_ONE_MINUS_G[a])).alias(f"au{a}")
            for a in range(4)
        ],
    )
    return terms.select(
        "field",
        "n_pairs",
        (
            F.expr(_fs_sum([f"mg{a}" for a in range(4)]))
            / F.expr(_fs_sum([f"ag{a}" for a in range(4)]))
        ).alias("m_new"),
        (
            F.expr(_fs_sum([f"ug{a}" for a in range(4)]))
            / F.expr(_fs_sum([f"au{a}" for a in range(4)]))
        ).alias("u_new"),
        (
            F.expr(_fs_sum([f"ag{a}" for a in range(4)]))
            / F.col("n_pairs")
        ).alias("lambda_new"),
    )


# --- Referential-integrity (FK orphan) audit (round 8) ------------------------
# Edge list: (edge name, child table, child key, parent table, parent key).
_FK_EDGES = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders",
     "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier",
     "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer",
     "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation",
     "n_nationkey"),
)


@register(
    "fk_orphan_audit",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{name}' AS fk_edge,
               (SELECT COUNT(*) FROM {child}) AS child_rows,
               (SELECT COUNT(*) FROM {child} c
                WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                                  WHERE p.{pkey} = c.{ckey})) AS orphan_rows,
               (SELECT COUNT(DISTINCT {ckey}) FROM {child} c
                WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                                  WHERE p.{pkey} = c.{ckey}))
                   AS orphan_keys
        """
        for name, child, ckey, parent, pkey in _FK_EDGES
    ),
    tags=("data_quality", "referential_integrity", "anti_join", "audit"),
)
def fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over every FK edge of the star
    schema: per edge, child row count, orphaned child rows (no matching
    parent — LEFT ANTI join), and distinct orphaned key values. This is
    the pre-join data-quality gate a warehouse load runs before trusting
    inner joins (an inner join silently DROPS orphans —
    join_fanout_audit predicts fan-out, this predicts loss). Each edge
    is an anti-join against the parent's key projection: Catalyst
    broadcasts the small parents (nation/customer) and shuffle-joins
    the big ones on the key — at 100 TB each edge is one key-partitioned
    anti-join, no row ever carried beyond its keys, and the 5-row result
    unions at the driver. Orphan keys are counted distinct AFTER the
    anti-join (tiny in healthy data, bounded by child cardinality in
    the worst case)."""
    out = None
    for name, child, ckey, parent, pkey in _FK_EDGES:
        c = load_table(spark, sf_dir, child).select(F.col(ckey).alias("k"))
        p = load_table(spark, sf_dir, parent).select(F.col(pkey).alias("k"))
        orphans = c.join(p, "k", "left_anti")
        row = c.agg(F.count("*").cast("long").alias("child_rows")).crossJoin(
            orphans.agg(
                F.count("*").cast("long").alias("orphan_rows"),
                F.countDistinct("k").cast("long").alias("orphan_keys"),
            )
        ).select(
            F.lit(name).alias("fk_edge"), "child_rows", "orphan_rows",
            "orphan_keys",
        )
        out = row if out is None else out.unionByName(row)
    return out

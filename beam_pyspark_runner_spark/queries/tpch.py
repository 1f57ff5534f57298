"""TPC-H-shaped analytical queries adapted to the fixture schema.

The reference has no relational query surface at all — its analytics
ceiling is GroupByKey/CombinePerKey over tuples
(``/root/reference/beam_pyspark_runner/transform_evaluators.py:84-100``).
These queries document the full Catalyst surface the new engine gets:
multi-join pipelines, EXISTS/NOT-EXISTS semi/anti joins, scalar
subqueries, disjunctive predicate pushdown, and having-on-aggregate
join-backs. Shapes follow TPC-H q4/q7/q10/q14/q15/q17/q18/q19/q22,
adapted where the fixture lacks a column (no l_shipmode/l_commitdate/
partsupp tables); nation/region names use the fixture's synthetic values.

Scale notes (100 TB): every dimension side is broadcast; fact-fact
joins shuffle on their join key only after scan-level filters; the
HAVING join-backs aggregate first (shrinking the fact table) and join
the survivors, never the reverse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beam_pyspark_runner_spark.functions.numeric import davg, davg_sql, dsum, dsum_sql
from beam_pyspark_runner_spark.queries.registry import register
from beam_pyspark_runner_spark.sources.readers import load_table

_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(10,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
)


def _rev_col() -> F.Column:
    one = F.lit(1).cast("decimal(3,2)")
    return F.col("l_extendedprice").cast("decimal(10,2)") * (
        one - F.col("l_discount").cast("decimal(3,2)")
    )


# --- q4 shape: EXISTS correlated semi-join + priority counts -----------------
@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
    tags=("tpch", "semi_join", "exists", "aggregate"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (late-shipping orders; shipdate>orderdate+30d stands in
    for the missing commit/receipt dates). EXISTS lowers to a left-semi
    join: lineitem is deduplicated by the semi side, never multiplied."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --- q10 shape: returned-item revenue, top customers -------------------------
@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           {dsum_sql(_REV_SQL)} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem ON l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    tags=("tpch", "join", "top_k", "aggregate"),
    bench=True,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns, worst 20 customers.
    Aggregate-first: revenue rolls up to o_custkey right after the one
    fact-fact join (single narrow-key shuffle of decimal partials), and
    the customer/nation attributes attach to the ~|customers| aggregated
    rows afterwards — the wide groupBy keys (name strings) never ride the
    big shuffle. Top-20 is TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    per_cust = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(dsum(_rev_col()).alias("revenue"))
    )
    return (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "c_name", F.col("n_name").alias("nation"), "revenue")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --- q14 shape: conditional revenue ratio (promo share) ----------------------
@register(
    "q14_promo_share",
    oracle=f"""
    SELECT {dsum_sql(f"CASE WHEN p_type LIKE 'PROMO%' THEN {_REV_SQL} ELSE CAST(0 AS DECIMAL(10,2)) END")}
           / NULLIF({dsum_sql(_REV_SQL)}, 0) * 100.0 AS promo_pct,
           COUNT(*) AS n_rows
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
    """,
    tags=("tpch", "join", "conditional_agg"),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share. Part broadcasts into the
    date-pruned lineitem scan; one global agg, no row shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = _rev_col()
    promo_rev = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(10,2)")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            (dsum(promo_rev) / F.nullif(dsum(rev), F.lit(0)) * 100.0).alias(
                "promo_pct"
            ),
            F.count("*").alias("n_rows"),
        )
    )


# --- q18 shape: large-volume orders (HAVING join-back) -----------------------
@register(
    "q18_large_orders",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey, {dsum_sql('l_quantity')} AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING {dsum_sql('l_quantity')} > 220
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           big.total_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    tags=("tpch", "join", "having", "top_k"),
    bench=True,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers with very large orders. Aggregate-first
    (lineitem → per-order qty, HAVING prunes to a tiny survivor set) and
    only then join orders/customer — the join input shrinks by ~1000×
    before any wide operation."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 220)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# --- q19 shape: disjunctive multi-attribute predicates -----------------------
@register(
    "q19_disjunctive_filter",
    oracle=f"""
    SELECT {dsum_sql(_REV_SQL)} AS revenue, COUNT(*) AS n_rows
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    tags=("tpch", "join", "filter", "disjunction"),
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjunctions across both join sides. Catalyst
    pushes the per-side residuals (brand/size disjunction to the part
    scan, quantity range to lineitem) and evaluates the cross-side
    residual post-join — the classic partial-pushdown-of-DNF case."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(p, p.p_partkey == li.l_partkey)
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & q.between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & q.between(20, 40))
    )
    return j.filter(cond).agg(
        dsum(_rev_col()).alias("revenue"), F.count("*").alias("n_rows")
    )


# --- q22 shape: scalar subquery + NOT EXISTS anti-join -----------------------
@register(
    "q22_idle_customers",
    oracle=f"""
    WITH avg_bal AS (SELECT {davg_sql('c_acctbal')} AS a FROM customer WHERE c_acctbal > 0),
    rich AS (
        SELECT c_custkey, c_nationkey, c_acctbal FROM customer, avg_bal
        WHERE c_acctbal > avg_bal.a
          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c_custkey
                          AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    )
    SELECT c_nationkey, COUNT(*) AS n_customers, {dsum_sql('c_acctbal')} AS total_bal
    FROM rich GROUP BY c_nationkey
    """,
    tags=("tpch", "anti_join", "scalar_subquery", "aggregate"),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders (the fixture has no order-less customers, so "idle" = nothing
    since 2000-01-01). The scalar AVG is a one-row broadcast (cross-join
    literal); NOT EXISTS lowers to left-anti against the date-filtered
    orders key projection — the date filter pushes to the orders scan."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(38,10)"))
                .cast("decimal(38,2)")
                .cast("double")
                / F.count("c_acctbal").cast("double")
            ).alias("a")
        )
    )
    rich = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
    )
    return rich.groupBy("c_nationkey").agg(
        F.count("*").alias("n_customers"), dsum("c_acctbal").alias("total_bal")
    )


# --- q7 shape: bi-nation trade volume by year --------------------------------
@register(
    "q7_nation_trade",
    oracle=f"""
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
           {dsum_sql(_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount'))} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
    JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY n1.n_name, n2.n_name, ship_year
    """,
    tags=("tpch", "join", "self_join_dim", "aggregate"),
)
def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between two nations by ship year.
    The nation dimension joins twice under different roles (customer side
    and supplier side) — both broadcast; the disjunctive nation-pair
    filter applies after both attach. One fact-fact shuffle
    (orders⋈lineitem), everything else broadcast."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("cust_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    pair = (
        ((F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2"))
        | ((F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(dsum(_rev_col()).alias("revenue"))
    )


# --- q15 shape: top supplier via scalar MAX subquery -------------------------
@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey, {dsum_sql(_REV_SQL)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, rev.total_revenue
    FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
    WHERE rev.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    tags=("tpch", "scalar_subquery", "aggregate", "join"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with maximum quarterly revenue. The
    scalar MAX over the aggregated view is a one-row broadcast cross
    join; the revenue view is computed once (Catalyst reuses the subplan
    via ReusedExchange where possible). Exact-decimal revenue makes the
    equality comparison safe — with raw double sums, ties at MAX would be
    partition-order-dependent."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(dsum(_rev_col()).alias("total_revenue"))
    max_rev = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --- q17 shape: small-quantity orders vs per-part average --------------------
@register(
    "q17_small_quantity",
    oracle=f"""
    WITH avg_qty AS (
        SELECT l_partkey, {davg_sql('l_quantity')} AS aq
        FROM lineitem GROUP BY l_partkey
    )
    SELECT {dsum_sql('l.l_extendedprice')} / 7.0 AS avg_yearly, COUNT(*) AS n_rows
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN avg_qty a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < 0.5 * a.aq
    """,
    tags=("tpch", "correlated", "scalar_subquery", "aggregate"),
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders below half the part's average
    quantity. The correlated per-part AVG decorrelates into an aggregate
    + join-back on partkey (the per-part rows are tiny after aggregation);
    brand filter broadcasts via the part dimension."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_qty = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        davg("l_quantity").alias("aq")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("aq"))
        .agg(
            (dsum("l_extendedprice") / 7.0).alias("avg_yearly"),
            F.count("*").alias("n_rows"),
        )
    )


# --- q8 shape: national market share -----------------------------------------
@register(
    "q8_market_share",
    oracle=f"""
    WITH flat AS (
        SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS order_year,
               {_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')} AS rev,
               n2.n_name AS supp_nation
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n1.n_regionkey
        JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type LIKE 'PROMO%'
    )
    SELECT order_year,
           {dsum_sql("CASE WHEN supp_nation = 'NATION_5' THEN rev ELSE CAST(0 AS DECIMAL(10,2)) END")}
               / NULLIF({dsum_sql('rev')}, 0) AS mkt_share,
           COUNT(*) AS n_rows
    FROM flat GROUP BY order_year
    """,
    tags=("tpch", "join", "conditional_agg", "market_share"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_5's share of PROMO-part revenue sold into
    ASIA, by year — the widest join pipeline in the suite (lineitem +
    part + supplier + orders + customer + nation×2 + region). Every
    dimension broadcasts; orders⋈lineitem is the only row shuffle; the
    share ratio is two exact-decimal sums and one double divide."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type").like("PROMO%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    rev = _rev_col()
    flat = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("order_year"),
            rev.alias("rev"),
            "supp_nation",
        )
    )
    nation_rev = F.when(
        F.col("supp_nation") == "NATION_5", F.col("rev")
    ).otherwise(F.lit(0).cast("decimal(10,2)"))
    return flat.groupBy("order_year").agg(
        (dsum(nation_rev) / F.nullif(dsum("rev"), F.lit(0))).alias("mkt_share"),
        F.count("*").alias("n_rows"),
    )


# --- q13 shape: customer order-count distribution ----------------------------
@register(
    "q13_order_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                           AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS n_customers
    FROM per_cust GROUP BY c_count
    """,
    tags=("tpch", "left_outer", "histogram", "aggregate"),
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed k (non-urgent) orders,
    including k=0 — the left join keeps order-less customers and
    COUNT(col) turns their NULLs into zero. Two aggregations: per-customer
    count (fact-side shuffle), then the tiny histogram of counts."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("n_customers"))


# --- q16 shape: NOT IN (null-aware anti join) + distinct count ---------------
@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (5, 15, 25, 35, 45)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_size
    """,
    tags=("tpch", "not_in", "anti_join", "distinct", "aggregate"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (brand, size), excluding
    complaint-ish suppliers via NOT IN. NOT IN over a nullable-free
    subquery lowers to a left-anti join (with NULLs it would need Spark's
    null-aware anti join — the subquery column here is non-null by
    schema, so the cheap form applies). Distinct-count shuffles once on
    the grouping keys."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(5, 15, 25, 35, 45)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --- q20 shape: nested semi-join chain ---------------------------------------
@register(
    "q20_excess_suppliers",
    oracle=f"""
    WITH promo_parts AS (
        SELECT p_partkey FROM part WHERE p_type LIKE 'PROMO%'
    ),
    heavy AS (
        SELECT l_suppkey, {dsum_sql('l_quantity')} AS shipped
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM promo_parts)
        GROUP BY l_suppkey
        HAVING {dsum_sql('l_quantity')} > 2600
    )
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM heavy)
    """,
    tags=("tpch", "semi_join", "nested_subquery", "having"),
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped large volumes of promo
    parts — a two-level IN chain (parts→lineitem agg→suppliers), each IN
    lowering to a semi join. Aggregate-first again: the HAVING shrinks
    the supplier key set before touching the supplier dimension."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type").like("PROMO%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    heavy = (
        li.join(p, li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(dsum("l_quantity").alias("shipped"))
        .filter(F.col("shipped") > 2600)
        .select("l_suppkey")
    )
    # heavy is supplier-grain (grows with the corpus) — no broadcast
    # hint (round-10); the planner's size gate decides.
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )


# --- q21 shape: sole-late-supplier (EXISTS + NOT EXISTS, same fact) ----------
@register(
    "q21_waiting_orders",
    oracle="""
    SELECT l1.l_suppkey, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY l1.l_suppkey
    """,
    tags=("tpch", "exists", "not_exists", "semi_join", "anti_join"),
)
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late supplier on a
    finished multi-supplier order ("late" = shipped >60d after order
    date, standing in for the missing commit/receipt dates). The same
    fact table is correlated twice — EXISTS (another supplier on the
    order) lowers to a semi join, NOT EXISTS (another LATE supplier) to
    an anti join — both on orderkey, so all three legs share one shuffle
    key and AQE can reuse exchanges."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    late1 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            (F.col("o_orderstatus") == "F")
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        )
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    late_others = late1.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    return (
        late1.join(
            others,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
    )


# --- q2 shape: min-per-group join-back over the dimension path ---------------
@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
        SELECT l.l_partkey, l.l_suppkey, MIN(l.l_extendedprice) AS min_price
        FROM lineitem l GROUP BY l.l_partkey, l.l_suppkey
    ),
    best AS (
        SELECT l_partkey, MIN(min_price) AS best_price
        FROM costs GROUP BY l_partkey
    )
    SELECT c.l_partkey AS p_partkey, MIN(c.l_suppkey) AS best_suppkey,
           ANY_VALUE(b.best_price) AS best_price
    FROM costs c JOIN best b
      ON b.l_partkey = c.l_partkey AND c.min_price = b.best_price
    GROUP BY c.l_partkey
    """,
    tags=("tpch", "correlated", "min_per_group", "join"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp in the fixture — lineitem's observed
    prices stand in for supply cost): the cheapest supplier per part via
    aggregate + join-back on the min, ties broken by lowest suppkey.
    MIN is exact on doubles, so the equality join-back is safe — the
    same pattern q15 uses for its scalar MAX."""
    li = load_table(spark, sf_dir, "lineitem")
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("min_price")
    )
    best = costs.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("min_price").alias("best_price")
    )
    return (
        costs.join(
            best,
            (costs.l_partkey == F.col("b_partkey"))
            & (costs.min_price == F.col("best_price")),
        )
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(
            F.min("l_suppkey").alias("best_suppkey"),
            F.first("best_price").alias("best_price"),
        )
    )


# --- q12 shape: shipping-delay priority split --------------------------------
@register(
    "q12_late_shipment_priority",
    oracle="""
    SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                THEN 'very_late' ELSE 'late' END AS delay_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    GROUP BY 1
    """,
    tags=("tpch", "join", "conditional_agg", "case_split"),
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: urgent vs non-urgent line counts split by shipping
    delay class (the fixture has no l_shipmode, so delay buckets stand in
    for ship modes; >30d late qualifies, >90d is 'very_late'). The
    cross-table predicate (shipdate vs orderdate) evaluates post-join;
    one fact-fact shuffle, then a 2-row conditional aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    delay_class = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        "very_late",
    ).otherwise("late")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy(delay_class.alias("delay_class")).agg(
        F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
    )


@register(
    "decayed_trending_score",
    oracle=f"""
    WITH mx AS (SELECT MAX(l_shipdate) AS max_d FROM lineitem),
    terms AS (
        SELECT l_partkey,
               l_extendedprice * (1 - l_discount)
                 * pow(2.0, -CAST(date_diff('day', l_shipdate, mx.max_d) // 30
                              AS DOUBLE)) AS term
        FROM lineitem, mx
    )
    SELECT l_partkey AS partkey,
           CAST(COUNT(*) AS BIGINT) AS n_sales,
           {{dsum}} AS trend_score
    FROM terms GROUP BY l_partkey
    ORDER BY trend_score DESC, partkey
    LIMIT 25
    """.format(dsum=dsum_sql("term")),
    tags=("tpch", "trending", "decay", "recency"),
)
def decayed_trending_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed revenue leaderboard: each sale contributes
    revenue · 2^(−age/30 d) — a one-month half-life — so a part selling
    NOW outranks one with the same lifetime revenue sold years ago: the
    "trending products" ranking, computed in one pass with no window.
    The decay makes the score incrementally maintainable: advancing the
    reference date by one period just multiplies every stored score by
    ½ before absorbing the new period's sales (the mergeable-state
    property exponential decay is chosen FOR in production rankers).

    Determinism: ages quantize to integer months, so every weight is an
    exact power of two (2^-k is exactly representable down to the
    subnormal floor and libm-identical across engines — a FRACTIONAL
    exponent would not be); each term is IEEE-identical per row and the
    sum accumulates in exact decimal. Top-25 via global ORDER BY +
    LIMIT = per-partition heaps, ties broken by partkey."""
    li = load_table(spark, sf_dir, "lineitem")
    mx = li.agg(F.max("l_shipdate").alias("max_d"))
    age_months = F.floor(
        F.datediff(F.col("max_d"), F.col("l_shipdate")) / 30
    )
    terms = li.crossJoin(F.broadcast(mx)).select(
        "l_partkey",
        (
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * F.pow(F.lit(2.0), -age_months.cast("double"))
        ).alias("term"),
    )
    return (
        terms.groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.count("*").cast("long").alias("n_sales"),
            dsum(F.col("term")).alias("trend_score"),
        )
        .orderBy(F.col("trend_score").desc(), "partkey")
        .limit(25)
    )

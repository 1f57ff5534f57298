"""Recursive and lateral queries (Spark 4 `WITH RECURSIVE` + `LATERAL`).

The reference engine has no iterative construct at all — its only loop is
the driver-side stage walk (`/root/reference/beam_pyspark_runner/
pyspark_runner.py:82-98`); anything hierarchical (transitive closure,
org-chart rollups, graph reachability) would have to be hand-unrolled as
N pipeline stages. Spark 4 adds ANSI recursive CTEs, which Catalyst
executes as an iterated union with a per-step shuffle — the declarative
twin of the `dedup_components` / `pagerank` driver-loop templates in
`queries/graph.py`, but with the loop owned by the engine.

Scale notes (100 TB):
- Each recursion step is one self-referencing shuffle over the *frontier*
  only (rows produced by the previous step), not the whole accumulated
  result — cost is O(edges reachable at that depth), and the hierarchy
  walk here touches ceil(log2(max_key)) frontiers.
- The anchor side prunes before recursing (filter pushdown into the
  parquet scan applies to the anchor exactly as to any scan).
- LATERAL correlated subqueries lower to a join (here: broadcast-able
  left side + ranked window on the right), not a per-row re-execution —
  `lateral_recent_orders` compiles to the same WindowGroupLimit plan a
  hand-written top-k-per-key query gets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from beam_pyspark_runner_spark.functions.numeric import dsum_sql
from beam_pyspark_runner_spark.queries.registry import register
from beam_pyspark_runner_spark.sources.readers import register_views

# Binary-tree parent derivation shared by engine and oracle: parent(k) =
# floor(k / 2), root = 1. FLOOR(x / 2.0) (not integer division) because
# Spark's `/` on BIGINT yields DOUBLE while DuckDB's yields DOUBLE too —
# identical semantics in both engines without dialect-specific `DIV`/`//`.
_CHAIN_SQL = """
WITH RECURSIVE chain(node, cur, depth) AS (
    SELECT s_suppkey, s_suppkey, 0 FROM supplier
    UNION ALL
    SELECT node, CAST(FLOOR(cur / 2.0) AS BIGINT), depth + 1
    FROM chain WHERE cur > 1
)
"""


@register(
    "recursive_cte_hierarchy",
    oracle=f"""
    {_CHAIN_SQL},
    d AS (SELECT node, MAX(depth) AS root_depth FROM chain GROUP BY node)
    SELECT root_depth, COUNT(*) AS n_suppliers,
           {dsum_sql('s_acctbal')} AS depth_acctbal
    FROM d JOIN supplier ON node = s_suppkey
    GROUP BY root_depth
    """,
    tags=("recursive_cte", "hierarchy", "transitive_closure"),
)
def recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Org-chart walk via ANSI `WITH RECURSIVE` (new in Spark 4).

    Suppliers form an implicit binary tree (parent = floor(key/2)); the
    recursion walks every supplier's chain to the root and aggregates
    supplier count + balance by chain depth. Each step shuffles only the
    still-walking frontier (`cur > 1`), so total work is O(n·log n) rows
    — the declarative version of the capped driver-side iteration in
    `queries/graph.py:dedup_components`.
    """
    register_views(spark, sf_dir, ("supplier",))
    return spark.sql(
        """
        WITH RECURSIVE chain(node, cur, depth) AS (
            SELECT s_suppkey, s_suppkey, 0 FROM supplier
            UNION ALL
            SELECT node, CAST(FLOOR(cur / 2.0) AS BIGINT), depth + 1
            FROM chain WHERE cur > 1
        ),
        d AS (SELECT node, MAX(depth) AS root_depth FROM chain GROUP BY node)
        SELECT root_depth, COUNT(*) AS n_suppliers,
               CAST(CAST(SUM(CAST(s_acctbal AS DECIMAL(38,10))) AS DECIMAL(38,2))
                    AS DOUBLE) AS depth_acctbal
        FROM d JOIN supplier ON node = s_suppkey
        GROUP BY root_depth
        """
    )


# Spark 4.1 supports only UNION ALL recursion (UNION-distinct raises
# UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so termination needs a depth
# cap. Round 13: the cap is the map's true orbit bound, not |V| — the
# edge map x -> 7x (mod 64) is a PERMUTATION (gcd(7,64)=1) and
# 7^8 = 5764801 = 1 (mod 64), so every orbit closes within 8 steps and
# every reachable node appears in the first 8 frontiers (verified
# exhaustively for all 64 sources, and A/B against the cap-64 walk in
# DuckDB at sf0.001/0.01/0.1: byte-identical results). Each recursion
# step is a full Catalyst plan/execute cycle, so cap 64 -> 8 removes
# 56 engine iterations that only re-walked already-cycled orbits.
# Dedup happens OUTSIDE the recursion (COUNT(DISTINCT ...)), identical
# SQL in both engines.
_REACH_SQL = """
    WITH RECURSIVE
    e AS (SELECT p_partkey AS src, (p_partkey * 7) % 64 AS dst
          FROM part WHERE p_partkey < 64 AND (p_partkey * 7) % 64 <> p_partkey),
    r(src, node, depth) AS (
        SELECT src, src, 0 FROM e
        UNION ALL
        SELECT r.src, e.dst, r.depth + 1
        FROM r JOIN e ON r.node = e.src WHERE r.depth < 8
    )
    SELECT src, COUNT(DISTINCT node) AS n_reachable, MIN(node) AS min_node
    FROM r GROUP BY src
"""


@register(
    "recursive_cte_reachability",
    oracle=_REACH_SQL,
    tags=("recursive_cte", "graph", "reachability"),
)
def recursive_cte_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cyclic-graph reachability via depth-capped `UNION ALL` recursion.

    A deterministic functional graph over the first 64 part keys
    (src -> 7·src mod 64) contains cycles. Spark 4.1's recursive CTEs
    support `UNION ALL` only, so termination comes from the depth cap
    (8 — exact, since x -> 7x mod 64 is a permutation with 7^8 = 1
    mod 64, every orbit closes within 8 steps; see _REACH_SQL note) and
    the distinct-set semantics from `COUNT(DISTINCT node)` outside the
    loop. Each step joins only the frontier against the edge table —
    the same bounded-iteration discipline as `graph.py:dedup_components`,
    but with the loop owned by Catalyst instead of the driver.
    """
    register_views(spark, sf_dir, ("part",))
    return spark.sql(_REACH_SQL)


@register(
    "lateral_recent_orders",
    oracle="""
    SELECT c_custkey, c_name, o.o_orderkey, o.o_totalprice
    FROM customer,
    LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders WHERE o_custkey = c_custkey
        ORDER BY o_orderdate DESC, o_orderkey LIMIT 3
    ) AS o
    WHERE c_custkey <= 20
    """,
    tags=("lateral", "correlated_subquery", "top_k"),
)
def lateral_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated `LATERAL` subquery with ORDER BY + LIMIT per outer row.

    "3 most recent orders for each of these customers" — the lateral
    formulation users write in DuckDB/Postgres. Catalyst decorrelates it
    into a join + ranked-window plan (WindowGroupLimit pushes the per-key
    limit below the sort), so it is NOT a per-row re-execution: the same
    physical shape as `windows.py:top_k_per_group`, reached from SQL.
    """
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_custkey, c_name, o.o_orderkey, o.o_totalprice
        FROM customer,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders WHERE o_custkey = c_custkey
            ORDER BY o_orderdate DESC, o_orderkey LIMIT 3
        ) AS o
        WHERE c_custkey <= 20
        """
    )


_RHO_N = 256  # node count of the Pollard-rho functional graph


_CYCLE_GUARD_BODY = f"""
    WITH RECURSIVE walk(start, cur, depth, path) AS (
        SELECT {{k}}, {{k}}, 0,
               '|' || CAST({{k}} AS STRING) || '|'
        FROM range({_RHO_N})
        UNION ALL
        SELECT start, (cur * cur + 1) % {_RHO_N}, depth + 1,
               path || CAST((cur * cur + 1) % {_RHO_N} AS STRING) || '|'
        FROM walk
        WHERE POSITION(('|' || CAST((cur * cur + 1) % {_RHO_N} AS STRING)
                        || '|') IN path) = 0
    ),
    fin AS (SELECT start, MAX(depth) AS d FROM walk GROUP BY start),
    last AS (
        SELECT w.start, w.cur, w.depth
        FROM walk w JOIN fin ON fin.start = w.start AND fin.d = w.depth
    ),
    entry AS (
        SELECT start, (cur * cur + 1) % {_RHO_N} AS e,
               depth + 1 AS rho FROM last
    ),
    t AS (
        SELECT e.start, e.rho, w.depth AS tail_len
        FROM entry e JOIN walk w ON w.start = e.start AND w.cur = e.e
    )
    SELECT CAST(start AS BIGINT) AS node,
           CAST(rho AS BIGINT) AS rho_len,
           CAST(tail_len AS BIGINT) AS tail_len,
           CAST(rho - tail_len AS BIGINT) AS cycle_len
    FROM t
"""


@register(
    "recursive_cte_cycle_guard",
    oracle=_CYCLE_GUARD_BODY.format(k="CAST(range AS BIGINT)").replace(
        "AS STRING", "AS VARCHAR"
    ),
    tags=("recursive_cte", "cycle_detection", "graph"),
)
def recursive_cte_cycle_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cycle-safe recursive traversal — the path-guard idiom the SQL
    standard's CYCLE clause formalizes, hand-rolled the portable way:
    each recursive step refuses to revisit a node already on its own
    path ('|'-delimited id string + POSITION guard), so the recursion
    TERMINATES on cyclic graphs where recursive_cte_hierarchy /
    recursive_cte_reachability (acyclic by construction) would loop
    until the engine's depth limit. The walked graph is Pollard's rho
    map x -> x^2+1 mod {_RHO_N} — every start's trajectory is a tail
    into a cycle (the rho shape), and the query reports each node's
    rho decomposition: total trajectory length, tail length, and cycle
    length, recovered purely RELATIONALLY from the walk rows (the
    cycle entry is the first revisited successor; its recorded depth
    IS the tail length) — no string arithmetic beyond the guard.

    Scale (100 TB): each recursion step shuffles only the still-
    walking frontier; the path string grows with trajectory length
    (bounded by the guard at the graph's rho length, <= ~10 here, and
    by the engine's recursion cap in the worst case) — on a real
    billion-node graph the same guard bounds per-row state to the
    trajectory, never the graph."""
    register_views(spark, sf_dir, ("supplier",))  # contract parity; graph is synthetic
    return spark.sql(_CYCLE_GUARD_BODY.format(k="id"))

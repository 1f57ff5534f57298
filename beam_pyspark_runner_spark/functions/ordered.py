"""Bucketed global ordering: exact rank / running sums without a
single-partition window.

The naive ``ROW_NUMBER() OVER (ORDER BY v)`` (and any running sum over
the same frame) compiles to a WindowExec with ALL rows in one task — the
classic 100 TB cliff. When the sort key's leading column has a
bounded VALUE RANGE (prices, counts, day offsets — range fixed by
domain semantics, independent of row count), an order-preserving coarse
bucket of that column splits the scan exactly:

1. ``bucket = monotone_coarse(v)`` — every row of bucket b precedes
   every row of bucket b+1 in the total order, so
2. rank/cumsum WITHIN each bucket in parallel
   (``W.partitionBy(bucket)``), then
3. per-bucket counts/sums roll into offsets with a window over the
   BUCKET table (range-bounded rows — trivially single-partition), and
4. a broadcast join adds ``offset + local``.

Identical results to the global window (the bucket is a prefix of the
sort key), one extra tiny aggregate as the price. This is the same
decomposition as ``global_rank_bucketed`` (queries/relational.py),
factored out so entity-grain scans (rfm, ABC, Gini, 80/20) share it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["bucketed_order_scan"]


def bucketed_order_scan(
    df: DataFrame,
    bucket: Column,
    order_cols: list[Column],
    *,
    rank_name: str | None = "global_rank",
    running: dict[str, Column] | None = None,
    descending_bucket: bool = False,
) -> DataFrame:
    """Attach exact global ``rank_name`` and/or running sums to ``df``.

    ``bucket`` must be an order-preserving coarsening of the leading
    ``order_cols`` expression: ascending buckets for an ascending scan,
    or pass ``descending_bucket=True`` when the scan is descending and
    the bucket value DEcreases along the order (e.g. ``floor(v/step)``
    while ordering by ``v DESC``).

    ``running`` maps output column name -> value expression; each gets
    an inclusive running sum in the expression's own type (pass
    decimal-cast columns for exact money).
    """
    running = running or {}
    b = df.withColumn("__bucket", bucket)
    local_w = W.partitionBy("__bucket").orderBy(*order_cols)
    incl = local_w.rowsBetween(W.unboundedPreceding, 0)
    cols = list(b.columns)
    out = b
    if rank_name is not None:
        out = out.withColumn("__lrank", F.row_number().over(local_w))
    for name, expr in running.items():
        out = out.withColumn(f"__lsum_{name}", F.sum(expr).over(incl))

    aggs = [F.count(F.lit(1)).alias("__cnt")]
    aggs += [
        F.sum(expr).alias(f"__bsum_{name}") for name, expr in running.items()
    ]
    per_bucket = b.groupBy("__bucket").agg(*aggs)
    # offsets over the bucket table: range-bounded row count, so the
    # unpartitioned window here is over a small aggregate by design
    border = (
        F.col("__bucket").desc() if descending_bucket else F.col("__bucket")
    )
    off_w = W.orderBy(border).rowsBetween(W.unboundedPreceding, -1)
    sel = [F.col("__bucket")]
    sel.append(
        F.coalesce(F.sum("__cnt").over(off_w), F.lit(0)).alias("__offset")
    )
    for name in running:
        sel.append(
            F.sum(f"__bsum_{name}").over(off_w).alias(f"__boff_{name}")
        )
    offsets = per_bucket.select(*sel)

    # No broadcast hint (round-11): the offsets table is one row per
    # bucket — tiny whenever the caller honors the bucket contract —
    # but the AUDITOR cannot prove a caller's coarsening expression is
    # value-domain-bounded (floor(per_entity_sum/width) is bounded by
    # the data model's fixed fan-out, which plan text cannot show).
    # Spark's size gate / AQE sees the actual post-aggregate size and
    # broadcasts on its own at any scale where that is safe; a hint
    # here would force the broadcast even if a caller ever passed a
    # corpus-grain bucket.
    joined = out.join(offsets, "__bucket")
    final = cols.copy()
    proj = [F.col(c) for c in cols]
    if rank_name is not None:
        proj.append((F.col("__offset") + F.col("__lrank")).alias(rank_name))
        final.append(rank_name)
    for name in running:
        proj.append(
            (
                F.coalesce(
                    F.col(f"__boff_{name}"),
                    F.lit(0).cast(joined.schema[f"__lsum_{name}"].dataType),
                )
                + F.col(f"__lsum_{name}")
            ).alias(name)
        )
        final.append(name)
    return joined.select(*proj)

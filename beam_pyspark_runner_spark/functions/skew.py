"""Skew-mitigation helpers (SURVEY.md §7 M8).

AQE's skew-join splitting handles skewed *joins* automatically, but a
skewed *aggregation* key (e.g. 3 distinct values of l_returnflag across
600 B rows) still funnels each hot key through one reducer. The classic
fix is salting: spread each key over N sub-keys, partially aggregate,
then merge the N partials. Catalyst's partial aggregation already does
map-side combining, so salting only pays off when the number of map
partitions is huge (the partial-per-partition rows themselves skew) or
when the per-key state is wide (collect_list/distinct-style); the
helper exists for those cases and as the documented pattern.

Because the engine's decimal-sum discipline (functions/numeric.py) is
exactly associative, a salted sum is bit-identical to the direct sum —
which is what lets the oracle verify the salted plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DECIMAL = "decimal(38,10)"
_OUT = "decimal(38,2)"


def salted_decimal_sum(
    df: DataFrame,
    key_cols: list[str],
    value: Column | str,
    out_name: str,
    n_salts: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase skew-proof SUM: key → (key, salt) partial → key final.

    The salt is derived deterministically from ``salt_on`` (a high-
    cardinality column, e.g. the fact table's line number) so results are
    reproducible. Phase 1 shuffles (key × n_salts) groups — hot keys
    spread across n_salts reducers; phase 2 merges n_salts tiny rows per
    key. Decimal accumulation keeps both phases exact, so the result is
    bit-identical to a direct sum.
    """
    v = F.col(value) if isinstance(value, str) else value
    salt_src = F.col(salt_on) if salt_on else F.spark_partition_id()
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(salt_src), F.lit(n_salts)))
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.sum(v.cast(_DECIMAL)).alias("_psum"), F.count("*").alias("_pcnt")
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_psum").cast(_OUT).cast("double").alias(out_name),
        F.sum("_pcnt").alias(f"{out_name}_count"),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_on: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-proof equi-join by explicit salting: the fact side gets a
    deterministic salt in [0, n_salts) derived from ``salt_on`` (any
    high-cardinality fact column), the dim side is replicated n_salts
    times, and the join key becomes (key, salt) — a hot fact key now
    spreads over n_salts reducers instead of one.

    Use when the dim side is too big to broadcast AND AQE's skew split
    can't help (e.g. the skew is in a grouping that follows the join, or
    the runtime stats miss it). Cost: dim shuffles n_salts× its size —
    choose n_salts as the smallest value that levels the hot partitions.
    Result multiset is identical to the direct join (each fact row meets
    exactly one replica of its dim row)."""
    fact_s = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n_salts)).cast("int")
    )
    dim_s = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = fact_s.join(
        dim_s,
        (fact_s[fact_key] == dim_s[dim_key]) & (fact_s["_salt"] == dim_s["_salt"]),
    )
    return joined.drop("_salt")

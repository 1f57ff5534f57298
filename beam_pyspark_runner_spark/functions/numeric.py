"""Order-stable numeric aggregation helpers.

Floating-point SUM is not associative: with 32 shuffle partitions Spark
sums doubles in a nondeterministic order, and a DuckDB oracle sums them
in another. Instead of comparing with a tolerance (the driver's check is
an exact value hash), aggregate through exact decimal arithmetic:

    double expr  --cast-->  DECIMAL(38,10)  --SUM (exact)-->  cast back to double

Both engines perform the identical IEEE-754 double computation for the
row-level expression, the identical decimal rounding at the cast, an
exact (order-independent) decimal sum, and the identical final cast.
Result: bit-identical doubles regardless of partitioning or merge order.

This is also the right thing at 100 TB: decimal sums cost a few percent
over double sums and stay inside Tungsten codegen (no UDF), while making
results reproducible across cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 10 fractional digits comfortably exceeds the 2-decimal money data;
# 28 integral digits > 1e27 head-room for 100 TB-scale sums.
_DECIMAL = "decimal(38,10)"


# Output scale: the sum is re-rounded to 2 fractional digits before the
# final double cast. Why: a DECIMAL(38,10) whose unscaled value exceeds
# 2^53 cannot be converted to double in one exact step — Spark (BigDecimal,
# correctly rounded) and DuckDB ((double)hugeint / 1e10, two roundings)
# then disagree by 1 ulp. At scale 2 the unscaled value stays < 2^53 for
# any realistic sum, so both engines do one exact int conversion + one
# correctly-rounded division → bit-identical doubles.
_OUT = "decimal(38,2)"


def dsum(col: Column | str) -> Column:
    """Deterministic double SUM via exact decimal accumulation."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DECIMAL)).cast(_OUT).cast("double")


def davg(col: Column | str) -> Column:
    """Deterministic double AVG: exact decimal sum, then one double divide."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(_DECIMAL)).cast(_OUT).cast("double")
        / F.count(c).cast("double")
    )


def dsum_sql(expr: str) -> str:
    """ANSI-SQL (DuckDB) equivalent of :func:`dsum` for oracle queries.

    DuckDB's decimal→decimal downscale CAST truncates; ROUND() is
    half-up, matching Spark's cast semantics.
    """
    return f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(38,10))), 2) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    """ANSI-SQL (DuckDB) equivalent of :func:`davg`."""
    return f"{dsum_sql(expr)} / CAST(COUNT({expr}) AS DOUBLE)"

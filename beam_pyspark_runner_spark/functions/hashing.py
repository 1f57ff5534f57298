"""Cross-engine deterministic hashing primitives.

The correctness gate hash-compares Spark results against a DuckDB oracle,
so every hash-dependent operator (MinHash, SimHash, LSH, fingerprints)
must use a hash function computable *identically* in both engines.
Spark's ``xxhash64``/``hash`` and DuckDB's ``hash`` are different
algorithms, so we standardize on md5 (bit-identical everywhere) and
parse a hex prefix into a BIGINT:

    Spark : conv(substr(md5(x), 1, 8), 16, 10)::long        (32-bit)
    DuckDB: ('0x' || substr(md5(x), 1, 8))::BIGINT

md5 is also the right call at 100 TB: it is computed JVM-side inside
whole-stage codegen (no Python), and 32/60-bit prefixes keep all
downstream arithmetic in overflow-free BIGINT range.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Large prime for universal-hash permutations h_i(x) = (a_i*x + b_i) % P.
# a_i < 2^20 and x < 2^32 keep a_i*x < 2^52: exact in BIGINT both engines.
MINHASH_P = 1_000_000_007

# (a, b) seed pairs for the MinHash permutation family — fixed constants
# shared verbatim by the Spark plan and the DuckDB oracle SQL.
MINHASH_SEEDS: list[tuple[int, int]] = [
    (387143, 552271), (261977, 106033), (770651, 936169), (525287, 699569),
    (438883, 318211), (939391, 781151), (641131, 184003), (322193, 893891),
    (148091, 445901), (866113, 510529), (719743, 623171), (285281, 993037),
    (554923, 131303), (992009, 851957), (457271, 742111), (683873, 271027),
]


def h32(col: Column) -> Column:
    """32-bit integer hash of a string column (md5 hex-prefix parse)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def h32_sql(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`h32`."""
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


def h60(col: Column) -> Column:
    """60-bit integer hash (15 hex digits) — lower collision rate."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`h60`."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def unit_hash(col: Column) -> Column:
    """Deterministic pseudo-uniform double in [-0.5, 0.5) from a string —
    used to derive LSH hyperplane components identically in both engines."""
    return h32(col) / F.lit(4294967296.0) - F.lit(0.5)


def unit_hash_sql(expr: str) -> str:
    return f"({h32_sql(expr)} / 4294967296.0 - 0.5)"

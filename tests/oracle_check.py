"""Local replica of the driver's DuckDB-oracle compare.

For a (Spark DataFrame, oracle SQL) pair: run both, sort columns by
name, canonicalize values, sort rows, hash — mismatch in row count,
schema arity, or any value is a failure. Used by tests and by
``python -m tests.oracle_check [names...]`` for fast iteration.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
from decimal import Decimal

import duckdb

from beam_pyspark_runner_spark.sources.readers import TABLES


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0.0:
            return "0x0"  # normalize -0.0
        return float.hex(v)
    if isinstance(v, Decimal):
        return _canon(float(v))
    if isinstance(v, int):
        return str(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


# Canonical scalar kind per engine type: the external driver hashes
# type-aware (DuckDB HUGEINT reaches pandas as float64 and mismatches a
# Spark BIGINT even when values are equal; list cells crash its
# canonicalizer outright), so the local gate enforces kind equality and
# scalar-only outputs up front.
_SPARK_KINDS = {
    "int": "i32", "smallint": "i16", "tinyint": "i8", "bigint": "i64",
    "double": "f64", "float": "f32", "string": "str", "date": "date",
    "timestamp": "ts", "timestamp_ntz": "ts", "boolean": "bool", "binary": "bin",
}
_DUCK_KINDS = {
    "INTEGER": "i32", "SMALLINT": "i16", "TINYINT": "i8", "BIGINT": "i64",
    "HUGEINT": "i128", "DOUBLE": "f64", "FLOAT": "f32", "VARCHAR": "str",
    "DATE": "date", "TIMESTAMP": "ts", "TIMESTAMP_NS": "ts", "BOOLEAN": "bool",
    "BLOB": "bin", "UINTEGER": "u32", "UBIGINT": "u64",
}


def _spark_kinds(sdf) -> dict[str, str]:
    return {
        f.name: _SPARK_KINDS.get(f.dataType.simpleString(), f.dataType.simpleString())
        for f in sdf.schema.fields
    }


def _duck_kinds(ddf) -> dict[str, str]:
    return {
        d[0]: _DUCK_KINDS.get(str(ddf.types[i]).upper(), str(ddf.types[i]).upper())
        for i, d in enumerate(ddf.description)
    }


def _hash_rows(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    return len(rows), h


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def compare(spark, con, name: str, fn, oracle: str | None, sf_dir: str) -> dict:
    sdf = fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    out = {"name": name, "spark_rows": len(srows)}
    if oracle is None:
        out["status"] = "rows_only"
        return out
    ddf = con.sql(oracle)
    drows = ddf.fetchall()
    dcols = [d[0] for d in ddf.description]
    n_s, h_s = _hash_rows(scols, srows)
    n_d, h_d = _hash_rows(dcols, drows)
    sk, dk = _spark_kinds(sdf), _duck_kinds(ddf)
    nonscalar = {c: k for c, k in {**sk, **dk}.items() if not k.replace("u", "i").split("(")[0] in
                 ("i8", "i16", "i32", "i64", "f32", "f64", "str", "date", "ts", "bool", "bin")}
    kind_mism = {c: (sk.get(c), dk.get(c)) for c in set(sk) | set(dk) if sk.get(c) != dk.get(c)}
    if sorted(scols) != sorted(dcols):
        out.update(status="SCHEMA_MISMATCH", spark_cols=sorted(scols), duck_cols=sorted(dcols))
    elif nonscalar:
        out.update(status="NONSCALAR_COLS", cols=nonscalar)
    elif kind_mism:
        out.update(status="TYPE_MISMATCH", cols=kind_mism)
    elif n_s != n_d:
        out.update(status="ROWCOUNT_MISMATCH", duck_rows=n_d)
    elif h_s != h_d:
        out.update(status="VALUE_MISMATCH", duck_rows=n_d)
    else:
        out["status"] = "MATCH"
    return out


def diff_detail(spark, con, name: str, fn, oracle: str, sf_dir: str, limit: int = 6):
    """Print first differing canonical rows for debugging."""
    sdf = fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    ddf = con.sql(oracle)
    drows = ddf.fetchall()
    dcols = [d[0] for d in ddf.description]
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    do = sorted(range(len(dcols)), key=lambda i: dcols[i])
    s_lines = sorted("|".join(_canon(r[i]) for i in so) for r in srows)
    d_lines = sorted("|".join(_canon(r[i]) for i in do) for r in drows)
    s_only = [x for x in s_lines if x not in set(d_lines)][:limit]
    d_only = [x for x in d_lines if x not in set(s_lines)][:limit]
    print(f"--- {name}: cols spark={sorted(scols)} duck={sorted(dcols)}")
    for x in s_only:
        print("  spark-only:", x)
    for x in d_only:
        print("  duck-only :", x)


if __name__ == "__main__":
    import sys

    from beam_pyspark_runner_spark.queries import REGISTRY
    from beam_pyspark_runner_spark.session import get_spark

    import os

    # Default mirrors the external driver's sf0.01 gate; point
    # SPARK_GRAFT_ORACLE_SF_DIR at sf0.1 for a 10× scale-robustness pass
    # (catches overflow/threshold/precision bugs the small gate can't).
    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:] or list(REGISTRY)
    spark = get_spark(app_name="oracle_check")
    con = duckdb_conn(sf_dir)
    failures = []
    for name in names:
        q = REGISTRY[name]
        try:
            r = compare(spark, con, name, q.fn, q.oracle, sf_dir)
        except Exception as e:  # noqa: BLE001
            r = {"name": name, "status": "ERROR", "error": str(e)[:300]}
        # Trivially-green guard (round-6 verdict #4): a 0-row MATCH
        # certifies nothing — any wrong-but-empty plan would also
        # "match". Queries that are LEGITIMATELY empty at the small
        # gate carry the empty_ok_at_small_sf tag (each with a
        # non-empty sf0.1 pin elsewhere); anything else that comes
        # back empty is a gate failure, not a pass.
        if (
            r["status"] in ("MATCH", "rows_only")
            and r.get("spark_rows") == 0
            and "empty_ok_at_small_sf" not in q.tags
        ):
            r["status"] = "EMPTY_UNTAGGED"
        print(r)
        if r["status"] not in ("MATCH", "rows_only"):
            failures.append(name)
            if r["status"] == "VALUE_MISMATCH":
                diff_detail(spark, con, name, q.fn, q.oracle, sf_dir)
    print(f"\n{len(names) - len(failures)}/{len(names)} ok; failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)

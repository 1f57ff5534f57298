"""Sinks.

Reference parity: ``WriteToText`` is the only reference sink (expanded
composite, ``/root/reference/tests/pyspark_runner_test.py:105-133``); we
expose text plus the columnar formats. Writes are distributed
(``df.write``) — results never pass through the driver, matching the
reference's never-collect discipline (pyspark_runner.py:91-95) and the
only discipline that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """One line per row; df must be a single string column (like the reference's sink)."""
    df.write.mode(mode).text(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", header).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)

"""Query registry: every operator capability gets a named query + DuckDB oracle.

The driver contract (``__spark_entry__.py``) needs ``queries()`` and
``oracle_sql()`` maps; this package is their single source of truth.
Each module registers queries for one capability area of SURVEY.md §2.
"""

from __future__ import annotations

from beam_pyspark_runner_spark.queries.registry import REGISTRY, Query, register

# Import for registration side effects — order defines display order.
from beam_pyspark_runner_spark.queries import relational  # noqa: E402,F401
from beam_pyspark_runner_spark.queries import tpch  # noqa: E402,F401
from beam_pyspark_runner_spark.queries import joins  # noqa: E402,F401
from beam_pyspark_runner_spark.queries import windows  # noqa: E402,F401
from beam_pyspark_runner_spark.queries import events  # noqa: E402,F401
from beam_pyspark_runner_spark.queries import dedup  # noqa: E402,F401
from beam_pyspark_runner_spark.queries import similarity  # noqa: E402,F401
from beam_pyspark_runner_spark.queries import text  # noqa: E402,F401
from beam_pyspark_runner_spark.queries import streaming  # noqa: E402,F401
from beam_pyspark_runner_spark.queries import multimodal  # noqa: E402,F401
from beam_pyspark_runner_spark.queries import sketches  # noqa: E402,F401

__all__ = ["REGISTRY", "Query", "register"]

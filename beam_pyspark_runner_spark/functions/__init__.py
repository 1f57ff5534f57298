"""Scalar/aggregate function helpers built on pyspark.sql.functions."""

from beam_pyspark_runner_spark.functions.numeric import davg, davg_sql, dsum, dsum_sql
from beam_pyspark_runner_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = ["dsum", "dsum_sql", "davg", "davg_sql", "cosine_similarity", "dot", "l2_norm"]

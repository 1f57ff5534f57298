"""Dataflow operator surface: the reference's capability set, Spark-first."""

from beam_pyspark_runner_spark.operators.pipeline import PCol, Pipeline
from beam_pyspark_runner_spark.operators.combiners import CombineFn

__all__ = ["PCol", "Pipeline", "CombineFn"]

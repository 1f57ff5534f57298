"""Logical-plan layer: DAG construction, memoized lowering, fan-out persist."""

from beam_pyspark_runner_spark.plans.dag import Node, PlanContext

__all__ = ["Node", "PlanContext"]

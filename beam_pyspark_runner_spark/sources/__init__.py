"""Sources and sinks: parquet/csv/json/orc/text readers + writers."""

from beam_pyspark_runner_spark.sources.readers import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]

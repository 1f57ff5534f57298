"""beam_pyspark_runner_spark — a PySpark-native analytics engine.

A from-scratch, DataFrame/Catalyst-first engine with the query and
data-processing capabilities of the reference Beam-on-PySpark runner
(``moradology/beam-pyspark-runner``, surveyed in ``SURVEY.md``), plus the
relational surface Catalyst provides and LLM-training-data operators
(dedup, similarity search, text analysis, multimodal columns).

Design stance (SURVEY.md §7): declare logical plans with the DataFrame/SQL
API and let Catalyst + Tungsten pick physical strategies; drop to Arrow
pandas UDFs only where built-ins can't express the semantics. Never
collect to the driver in an operator; never row-at-a-time Python UDFs in
the hot path.
"""

from beam_pyspark_runner_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]

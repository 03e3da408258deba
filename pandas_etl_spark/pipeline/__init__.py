"""YAML pipeline language (SURVEY §2.1 F1–F17) — Spark-first engine.

Implemented in stages; ``Pipeline`` is the public entry point.
"""

from pandas_etl_spark.pipeline.core import Pipeline  # noqa: F401

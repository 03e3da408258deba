"""pandas_etl_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference ``righteouslabs/pandas-etl`` (a YAML-driven pandas pipeline
orchestrator), re-expressed Spark-first:

- ``session``      — SparkSession factory (AQE on, UTC, Arrow).
- ``sources``      — scans/sinks (parquet/csv/json/jdbc).
- ``operators``    — the declarative relational operator library
                     (select/filter/join/agg/window/setops/...).
- ``functions``    — scalar-function families + LLM-pipeline ops
                     (dedup, similarity, text analysis, multimodal).
- ``pipeline``     — the YAML pipeline language (variables, connections,
                     imports, steps, checkpoint/resume) on lazy DataFrames.
- ``streaming``    — Structured Streaming surface over the events table.
- ``catalog``      — named query catalog used by the driver correctness
                     harness (queries + DuckDB oracle SQL).

Reference parity citations (file:line into /root/reference/) live in each
module's docstrings.
"""

from pandas_etl_spark.session import get_spark  # noqa: F401
from pandas_etl_spark.pipeline import Pipeline  # noqa: F401

__version__ = "0.1.0"

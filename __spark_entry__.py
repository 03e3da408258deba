"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1-shaped pricing
summary) at sf0.001. ``queries()`` / ``oracle_sql()`` re-export the
pandas_etl_spark catalog registry — one entry per implemented operator
from SURVEY.md §2 (+ §2.9 north-star ops). Queries without an oracle are
genuinely non-ANSI-SQL-expressible (engine-specific 64-bit hashing or
streaming state) and take the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pandas_etl_spark.catalog import QUERIES

    return QUERIES["pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pandas_etl_spark.catalog import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pandas_etl_spark.catalog import ORACLES

    return dict(ORACLES)

"""Named query catalog — the driver correctness/bench surface.

Every implemented operator from SURVEY §2 registers here as a named query
(a ``(spark, sf_dir) -> DataFrame`` callable) plus, where SQL-expressible,
a DuckDB oracle SQL string computing the same result on the same parquet
tables. ``__spark_entry__.queries()`` / ``oracle_sql()`` re-export these.

Import side effects: importing this package loads all catalog modules so
the registry is fully populated.
"""

from pandas_etl_spark.catalog.registry import ORACLES, QUERIES, query  # noqa: F401

# populate the registry
from pandas_etl_spark.catalog import advanced  # noqa: E402,F401
from pandas_etl_spark.catalog import batch  # noqa: E402,F401
from pandas_etl_spark.catalog import text  # noqa: E402,F401
from pandas_etl_spark.catalog import dedup  # noqa: E402,F401
from pandas_etl_spark.catalog import misc  # noqa: E402,F401
from pandas_etl_spark.catalog import similarity  # noqa: E402,F401
from pandas_etl_spark.catalog import streaming  # noqa: E402,F401
from pandas_etl_spark.catalog import curation  # noqa: E402,F401
from pandas_etl_spark.catalog import analytics  # noqa: E402,F401

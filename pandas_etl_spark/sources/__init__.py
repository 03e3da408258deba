"""Sources & sinks.

Reference parity (SURVEY §2.2):
- CSV scan       — pd.read_csv       (/root/reference/tests/test_etl.py:193-194)
- SQL/JDBC scan  — pd.read_sql       (/root/reference/README.md:45-52)
- CSV sink       — DataFrame.to_csv  (/root/reference/README.md:71-74)
- JDBC sink      — DataFrame.to_sql  (/root/reference/tests/test_etl_postgresql.py:63-67)
- parquet/json   — reachable via the generic dispatcher (etl.py:552-557)
"""

from pandas_etl_spark.sources.layout import (  # noqa: F401
    compact_parquet,
    to_parquet_zorder,
    zorder_code,
)
from pandas_etl_spark.sources.io import (  # noqa: F401
    load_table,
    read_csv,
    read_json,
    read_parquet,
    read_sql,
    to_csv,
    to_parquet,
    to_sql,
)

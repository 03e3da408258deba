"""Custom relational operators Spark lacks natively (SURVEY §2.4):
as-of joins (pd.merge_asof parity), range/interval helpers."""

from pandas_etl_spark.operators.asof import asof_join  # noqa: F401

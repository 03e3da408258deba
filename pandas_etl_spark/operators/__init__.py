"""Custom relational operators Spark lacks natively (SURVEY §2.4) and
scale tooling: as-of joins (pd.merge_asof parity), skew salting."""

from pandas_etl_spark.operators.asof import asof_join  # noqa: F401
from pandas_etl_spark.operators.skew import (  # noqa: F401
    salted_aggregate,
    salted_join,
    with_salt,
)

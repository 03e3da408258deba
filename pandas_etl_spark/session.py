"""SparkSession factory.

Defaults are chosen for correctness-vs-oracle and 100 TB design posture:

- AQE on (runtime re-plan: partition coalescing, skew-join splitting,
  dynamic broadcast) — the single biggest "free" scale feature.
- ``spark.sql.session.timeZone=UTC`` — DuckDB timestamps are UTC-naive;
  pinning the session TZ makes timestamp comparison well-defined.
- ``spark.sql.shuffle.partitions`` sized to local cores for tests; on a
  real cluster AQE coalescing makes the initial number less critical.
- Arrow enabled — all Pandas-UDF paths are Arrow-batched.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    # pandas-parity permissive semantics (the reference never raises on
    # overflow/bad cast); also required for wraparound hash arithmetic in
    # the MinHash/SimHash operators.
    "spark.sql.ansi.enabled": "false",
    # driver-generated events.parquet stores TIMESTAMP(NANOS). On Spark
    # 4.0 this conf surfaces it as bigint nanos; on 4.1+ it is ACCEPTED
    # BUT IGNORED (native read as TIMESTAMP_NTZ). Kept for 4.0 compat —
    # sources.normalize_nanos_ts handles all three representations, and
    # a subprocess smoke test asserts the loaded dtype (never trust
    # conf-set success across Spark upgrades; VERDICT r3).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # local mode: one JVM; driver memory is the only knob that matters
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
    "spark.ui.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
}


def get_spark(
    app_name: str = "pandas_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the singleton SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    when no active session exists.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    conf["spark.default.parallelism"] = str(cpus)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

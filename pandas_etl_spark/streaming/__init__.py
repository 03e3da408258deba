"""Structured Streaming surface (SURVEY §2.9, north-star — the reference
is strictly batch: one-shot scheduler at /root/reference/pandas_etl/etl.py:572-617).

Helpers to run file-backed streams of the ``events`` table synchronously
(memory sink + processAllAvailable) so streaming operators are testable
and oracle-comparable against their batch equivalents.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession


def read_table_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Any test table's parquet as a file stream (schema from the batch
    footer — streaming readers require an explicit schema).

    Handles both layouts: ``{name}.parquet`` as a DIRECTORY (normal
    Spark write — streamed directly) or as a single FILE (the driver's
    testdata layout — file-stream sources require a directory, so the
    parent is streamed with a glob filter down to that one file)."""
    import os

    from pandas_etl_spark.sources.io import nanos_columns, normalize_nanos_ts

    path = f"{sf_dir}/{name}.parquet"
    batch = spark.read.parquet(path)
    reader = spark.readStream.schema(batch.schema).format("parquet")
    if os.path.isdir(path):
        stream = reader.load(path)
    else:
        stream = reader.option("pathGlobFilter", f"{name}.parquet").load(sf_dir)
    # nanos columns confirmed from the batch footer (same file)
    return normalize_nanos_ts(stream, nanos_columns(path))


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events parquet as a file stream."""
    return read_table_stream(spark, sf_dir, "events")


def run_stream_to_table(
    result: DataFrame, output_mode: str = "complete", name: str | None = None
) -> str:
    """Drive a streaming frame to completion into an in-memory table;
    returns the table name. Synchronous (processAllAvailable)."""
    table = name or f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        result.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(table)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return table

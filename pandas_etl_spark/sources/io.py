"""Scan/sink implementations on the Spark DataFrame reader/writer.

Design notes for 100 TB:
- Parquet is the primary format: columnar, predicate pushdown, partition
  pruning. CSV is kept for reference parity (its test pipelines are CSV).
- Sinks default to distributed multi-file writes; ``single_file=True``
  reproduces the reference's one-file ``to_csv`` semantics via
  ``coalesce(1)`` and is documented as a driver-side bottleneck to avoid
  at scale.
- JDBC scan supports full query pushdown (the ``query`` option), matching
  ``pd.read_sql``'s behavior of shipping user SQL to the database
  (/root/reference/README.md:45-52). ``partition_column``/bounds enable
  parallel reads — absent in the single-connection reference.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_etl_spark.functions.timeparse import strptime_to_java

TPCH_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated parquet table from an sf directory.

    ``events.parquet`` stores TIMESTAMP(NANOS,false); depending on the
    Spark version it surfaces as bigint nanos (4.0 with
    legacy.parquet.nanosAsLong), TIMESTAMP_NTZ (4.1+, native nanos read,
    truncated to micros), or plain TIMESTAMP. ``normalize_nanos_ts``
    coerces all three to session-TZ TIMESTAMP (session TZ is pinned UTC,
    so values match DuckDB's UTC-naive read)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    return normalize_nanos_ts(spark.read.parquet(path), nanos_columns(path))


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition when the scan would produce fewer partitions than the
    session's parallelism — small local test files arrive as ONE split,
    serializing expensive per-row compute downstream. At real scale
    (many input splits) this is a no-op.

    Split count is ESTIMATED from the scan's input files and
    ``spark.sql.files.maxPartitionBytes`` — never via ``df.rdd``
    (VERDICT r3 #7: the RDD handle forces a physical plan + RDD DAG per
    call). Non-file-backed or remote-storage frames pass through
    untouched: on a real cluster the input has many splits and guessing
    would risk inserting a pointless full shuffle."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files:
        return df
    import os
    from urllib.parse import unquote, urlparse

    total = 0
    for uri in files:
        p = urlparse(uri)
        if p.scheme not in ("file", ""):
            return df
        try:
            total += os.path.getsize(unquote(p.path))
        except OSError:
            return df
    max_bytes = _parse_byte_conf(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    )
    est_splits = max(1, -(-total // max_bytes))
    if est_splits < target:
        return df.repartition(target)
    return df


def _parse_byte_conf(v: str) -> int:
    """'134217728' / '128MB' / '1g' → bytes."""
    v = v.strip().lower().removesuffix("b")
    for suffix, mult in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("t", 1 << 40)):
        if v.endswith(suffix):
            return int(float(v[: -len(suffix)]) * mult)
    return int(v)


def nanos_columns(path: str) -> set[str]:
    """Column names whose parquet logical type is TIMESTAMP(NANOS) —
    read from the file footer (pyarrow), NOT guessed from names. Spark's
    legacy.parquet.nanosAsLong surfaces these as plain longs; only
    footer-confirmed nanos columns may be converted back (ADVICE r1: a
    user bigint named 'ts' holding epoch-seconds must pass through)."""
    try:
        import pyarrow as pa
        import pyarrow.dataset as pads

        schema = pads.dataset(path, format="parquet").schema
        return {
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        }
    except Exception as e:  # pragma: no cover - environment-dependent
        # do NOT silently disable the conversion: a footer-nanos column
        # left as raw bigint corrupts every downstream time computation
        import warnings

        warnings.warn(
            f"nanos_columns: could not read parquet footer for {path!r} "
            f"({e!r}); TIMESTAMP(NANOS) columns, if any, will stay bigint"
        )
        return set()


def normalize_nanos_ts(df: DataFrame, nanos_cols: set[str] | None = None) -> DataFrame:
    """Normalize timestamp representation to session-TZ TIMESTAMP.

    Handles all three ways Spark surfaces parquet TIMESTAMP(NANOS):
    - bigint nanos (Spark 4.0 + ``legacy.parquet.nanosAsLong``): convert
      footer-confirmed nanos columns via ``timestamp_micros`` (truncating
      — matching DuckDB's read);
    - TIMESTAMP_NTZ (Spark 4.1+ reads nanos natively, micros-truncated):
      cast to TIMESTAMP — NTZ rejects numeric casts and ``withWatermark``,
      so it must not leak downstream. The session TZ is pinned UTC, so
      the wall-clock values are preserved as UTC instants, matching the
      UTC-naive DuckDB oracle;
    - TIMESTAMP: pass through."""
    cols = nanos_cols or set()
    out = df
    for f in df.schema.fields:
        if f.dataType.typeName() == "long" and (
            f.metadata.get("__nanos_as_long") or f.name in cols
        ):
            out = out.withColumn(f.name, F.expr(f"timestamp_micros({f.name} div 1000)"))
        elif f.dataType.typeName() == "timestamp_ntz":
            out = out.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return out


def read_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    schema: Any = None,
    parse_dates: dict[str, dict[str, str]] | None = None,
    index_col: str | None = None,  # accepted for parity; indexes are columns (SURVEY §1.1)
    **options: Any,
) -> DataFrame:
    """pd.read_csv parity (reference etl.py:599-601, test_etl.py:193-194)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.csv(path)
    return _apply_parse_dates(df, parse_dates)


def _apply_parse_dates(
    df: DataFrame, parse_dates: dict[str, dict[str, str]] | None
) -> DataFrame:
    """parse_dates={"col": {"format": "%d/%m/%y"}} → to_timestamp
    (reference README.md:52)."""
    if not parse_dates:
        return df
    for col, spec in parse_dates.items():
        fmt = spec.get("format") if isinstance(spec, dict) else None
        expr = (
            F.to_timestamp(F.col(col), strptime_to_java(fmt))
            if fmt
            else F.to_timestamp(F.col(col))
        )
        df = df.withColumn(col, expr)
    return df


def read_parquet(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    **options: Any,
) -> DataFrame:
    """``columns`` mirrors pd.read_parquet(columns=...) — expressed as a
    select so Catalyst prunes the scan to exactly those columns
    (ReadSchema shows the narrow list)."""
    df = spark.read.options(**options).parquet(path)
    return df.select(*columns) if columns else df


def read_orc(spark: SparkSession, path: str, **options: Any) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning class as parquet (Spark
    native, no extra packages)."""
    return spark.read.options(**options).orc(path)


def to_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> str:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
    return path


def read_text(
    spark: SparkSession, path: str, wholetext: bool = False, **options: Any
) -> DataFrame:
    """Line-oriented (or whole-file) text scan — the raw-corpus
    ingestion path for LLM pipelines: one row per line (or per file with
    ``wholetext=True``, column ``value``)."""
    # wholetext must go through the text() kwarg — the method's own
    # default would clobber a reader-level option
    return spark.read.options(**options).text(path, wholetext=wholetext)


def to_text(df: DataFrame, path: str, mode: str = "overwrite") -> str:
    """Single-string-column sink, one line per row."""
    df.write.mode(mode).text(path)
    return path


def read_xml(
    spark: SparkSession, path: str, row_tag: str = "row", schema: Any = None, **options: Any
) -> DataFrame:
    """XML scan (Spark 4 native data source)."""
    reader = spark.read.format("xml").option("rowTag", row_tag).options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def to_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> str:
    df.write.format("xml").option("rowTag", row_tag).option("rootTag", root_tag).mode(
        mode
    ).save(path)
    return path


def read_avro(spark: SparkSession, path: str, **options: Any) -> DataFrame:
    """Avro scan — REQUIRES the external spark-avro module (not bundled
    in this environment; gated per the no-install constraint)."""
    try:
        return spark.read.format("avro").options(**options).load(path)
    except Exception as e:
        raise NotImplementedError(
            "Avro needs the external spark-avro jar on the classpath "
            "(org.apache.spark:spark-avro); it is not available here"
        ) from e


def read_json(spark: SparkSession, path: str, schema: Any = None, **options: Any) -> DataFrame:
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_sql(
    spark: SparkSession,
    sql: str | None = None,
    con: dict[str, str] | None = None,
    table: str | None = None,
    parse_dates: dict[str, dict[str, str]] | None = None,
    index_col: str | None = None,  # parity no-op (SURVEY §1.1)
    partition_column: str | None = None,
    lower_bound: Any = None,
    upper_bound: Any = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """pd.read_sql parity via JDBC with query pushdown.

    ``con`` is a JDBC options bundle from the connection registry
    (pipeline/connections.py). The user's SQL ships to the DB verbatim —
    the same pushdown-by-delegation as the reference (README.md:45-52).
    """
    if con is None:
        raise ValueError("read_sql requires a connection (JDBC options dict)")
    reader = spark.read.format("jdbc").options(**con)
    if sql is not None:
        reader = reader.option("query", sql)
    elif table is not None:
        reader = reader.option("dbtable", table)
    else:
        raise ValueError("read_sql requires sql= or table=")
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return _apply_parse_dates(reader.load(), parse_dates)


def to_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    mode: str = "overwrite",
    single_file: bool = True,
    order_by: list[str] | None = None,
) -> str:
    """DataFrame.to_csv parity (reference README.md:71-74, etl.py:562-563).

    ``single_file`` reproduces pandas' one-file output (coalesce(1) —
    driver-adjacent bottleneck; at scale pass single_file=False).
    ``order_by`` gives deterministic row order (pandas preserves input
    order; Spark does not — SURVEY §7 hard part 3).
    """
    out = df
    if order_by:
        out = out.orderBy(*order_by)
    if single_file:
        out = out.coalesce(1)
    out.write.mode(mode).option("header", str(header).lower()).csv(path)
    return path


def to_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> str:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return path


def to_parquet_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    mode: str = "overwrite",
) -> str:
    """Layout-optimized parquet write (z-order-lite): global range
    partitioning on ``sort_cols`` + sort within each partition, so every
    output file (and row group) covers a NARROW, nearly-disjoint value
    range. Parquet min/max stats then let readers skip whole row groups
    on ``sort_cols`` predicates — at 100 TB the difference between a
    range query touching a handful of files vs the entire table.
    ``repartitionByRange`` samples the sort key to build balanced range
    bounds (one extra pass, worth it for a write-once/read-many table)."""
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )
    return path


_IF_EXISTS_TO_MODE = {"fail": "errorifexists", "replace": "overwrite", "append": "append"}


def to_sql(
    df: DataFrame,
    name: str,
    con: dict[str, str],
    if_exists: str = "fail",
    index: bool = False,  # parity no-op: there is no index (SURVEY §1.1)
) -> None:
    """DataFrame.to_sql parity (reference tests/test_etl_postgresql.py:63-67)."""
    mode = _IF_EXISTS_TO_MODE.get(if_exists)
    if mode is None:
        raise ValueError(f"if_exists must be one of {sorted(_IF_EXISTS_TO_MODE)}")
    df.write.format("jdbc").options(**con).option("dbtable", name).mode(mode).save()

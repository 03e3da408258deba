"""pandas-flavored operator adapters over Spark DataFrames.

The reference's steps call pandas methods on step outputs
(``${steps['x'].output.groupby}``, ``.max``, ``.to_csv`` — e.g.
/root/reference/tests/test_etl.py:188-202,
/root/reference/tests/etl_definition_folder/pipelines/pandas_pipeline_recovery_1.yaml:18-51).
``Table`` gives those names pandas *semantics* with Spark *execution*:
lazy DataFrames, group keys stay columns (no index — SURVEY §1.1),
aggregations run distributed.

Unknown attributes delegate to the wrapped Spark DataFrame, so pipelines
can also use Spark-native fluent calls (``select``, ``filter``, ...) —
anything returning a DataFrame is re-wrapped.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pandas_etl_spark.sources import io as _io

# --explain dry-run support (pipeline CLI): when set, Table sinks skip
# their write action and print a plan lint + summary instead — the only
# actions in a lazy pipeline live at the sinks, so gating them here
# turns a full pipeline run into a plan audit.
import contextvars as _contextvars

EXPLAIN_ONLY: _contextvars.ContextVar[bool] = _contextvars.ContextVar(
    "pandas_etl_spark_explain_only", default=False
)


def _explain_sink(df: DataFrame, kind: str, target: str) -> bool:
    """When EXPLAIN_ONLY is set: print the sink's plan audit and return
    True (caller skips the write)."""
    if not EXPLAIN_ONLY.get():
        return False
    from pandas_etl_spark.plans import lint, plan_summary

    s = plan_summary(df)
    print(f"EXPLAIN sink {kind} -> {target}")
    print(
        f"  scans={s['scans']} exchanges={s['exchanges']} "
        f"broadcast_joins={s['broadcast_joins']} "
        f"sortmerge_joins={s['sortmerge_joins']} "
        f"arrow_python={s['arrow_python_evals']} "
        f"row_python={s['row_python_evals']}"
    )
    for p in s["pushed_filters"]:
        print(f"  pushed: {p}")
    for violation in lint(df):
        print(f"  LINT: {violation}")
    return True

_NUMERIC = {"int", "bigint", "smallint", "tinyint", "double", "float", "decimal", "long"}


def _is_numeric(dtype: str) -> bool:
    return dtype.split("(")[0] in _NUMERIC


class TimeGrouper:
    """pd.Grouper(key=..., freq=...) analogue (reference README.md:54-58,
    110-112): a declarative time-bucketing group key. ``Table.groupby``
    replaces the key column with its bucket start (functions/timeparse.py
    freq-alias translation)."""

    def __init__(self, key: str, freq: str, **_ignored: Any):
        self.key = key
        self.freq = freq

    def __repr__(self) -> str:
        return f"TimeGrouper(key={self.key!r}, freq={self.freq!r})"


class Table:
    """A Spark DataFrame with pandas-flavored method names."""

    def __init__(self, df: DataFrame):
        self._df = df

    # -- plumbing --------------------------------------------------------------

    @property
    def df(self) -> DataFrame:
        return self._df

    @property
    def columns(self) -> list[str]:
        return self._df.columns

    def __getitem__(self, name: str) -> "SeriesCol":
        """``t["col"]`` → a Series-like column handle carrying the
        pandas ``.str`` / ``.dt`` accessor namespaces (reference reach:
        generic dispatch touches the whole Series surface,
        /root/reference/pandas_etl/etl.py:552-557). The handle wraps a
        Spark Column; use it in ``assign``/``filter``."""
        return SeriesCol(F.col(name))

    def __getattr__(self, name: str) -> Any:
        attr = getattr(self._df, name)
        if callable(attr):
            def _wrapped(*args, **kwargs):
                out = attr(*args, **kwargs)
                return Table(out) if isinstance(out, DataFrame) else out

            return _wrapped
        return attr

    def __repr__(self) -> str:
        return f"Table({self._df.schema.simpleString()})"

    # -- pandas surface (§2.3–§2.7) -------------------------------------------

    def groupby(
        self,
        by: "str | list[str] | dict[str, str] | TimeGrouper",
        axis: Any = 0,
        dropna: bool = False,
    ) -> "Grouped | ColumnGrouped":
        """``axis="columns"`` (reference README.md:65) groups COLUMNS by
        a mapping dict — in Spark that's a pure per-row projection
        (greatest/least/+/avg over each group's columns), no shuffle at
        all. ``dropna=False`` matches Spark's default (null groups
        kept)."""
        if axis in ("columns", 1):
            if not isinstance(by, dict):
                raise ValueError(
                    "groupby(axis='columns') needs a {column: group} mapping "
                    "dict (pandas mapper functions don't serialize to a plan)"
                )
            return ColumnGrouped(self._df, by)
        if isinstance(by, TimeGrouper):
            from pandas_etl_spark.functions.timeparse import grouper_bucket

            bucketed = self._df.withColumn(
                by.key, grouper_bucket(by.key, by.freq)
            )
            return Grouped(bucketed, [by.key])
        keys = [by] if isinstance(by, str) else list(by)
        return Grouped(self._df, keys)

    def _reduce_all(self, fn, numeric_only: bool = False) -> "Table":
        cols = [
            c for c, t in self._df.dtypes if not numeric_only or _is_numeric(t)
        ]
        return Table(self._df.agg(*[fn(c).alias(c) for c in cols]))

    def max(self, numeric_only: bool = False) -> "Table":
        """Per-column maxima as a 1-row frame (pandas Series analogue)."""
        return self._reduce_all(F.max, numeric_only)

    def min(self, numeric_only: bool = False) -> "Table":
        return self._reduce_all(F.min, numeric_only)

    def sum(self, numeric_only: bool = True) -> "Table":
        return self._reduce_all(F.sum, numeric_only)

    def mean(self, numeric_only: bool = True) -> "Table":
        return self._reduce_all(F.avg, numeric_only)

    def query(self, expr: str) -> "Table":
        """pandas.query grammar is near-SQL; Spark accepts and/or/not."""
        return Table(self._df.filter(expr))

    def assign(self, **kwargs: Any) -> "Table":
        out = self._df
        for name, value in kwargs.items():
            if isinstance(value, SeriesCol):
                value = value.col
            out = out.withColumn(
                name, value if isinstance(value, Column) else F.lit(value)
            )
        return Table(out)

    def rename(self, columns: dict[str, str] | None = None) -> "Table":
        return Table(self._df.withColumnsRenamed(columns or {}))

    def astype(self, dtype: dict[str, str]) -> "Table":
        out = self._df
        for c, t in dtype.items():
            out = out.withColumn(c, F.col(c).cast(_pandas_dtype_to_spark(t)))
        return Table(out)

    def fillna(self, value: Any) -> "Table":
        return Table(self._df.na.fill(value))

    def ffill(
        self,
        cols: list[str],
        order_by: str,
        partition_by: list[str] | None = None,
    ) -> "Table":
        """pandas ffill (forward fill): each null takes the most recent
        non-null value by ``order_by`` (within ``partition_by`` groups).
        pandas fills by row order; a distributed table has none, so the
        ordering is explicit — same contract as groupby().first().
        One window over the partition keys; no extra shuffle when
        already partitioned."""
        from pyspark.sql import Window as W

        w = (
            W.partitionBy(*(partition_by or []))
            .orderBy(F.col(order_by).asc())
            .rowsBetween(W.unboundedPreceding, 0)
        )
        out = self._df
        for c in cols:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
        return Table(out)

    def bfill(
        self,
        cols: list[str],
        order_by: str,
        partition_by: list[str] | None = None,
    ) -> "Table":
        """pandas bfill: each null takes the NEXT non-null value by
        ``order_by`` (within ``partition_by``)."""
        from pyspark.sql import Window as W

        w = (
            W.partitionBy(*(partition_by or []))
            .orderBy(F.col(order_by).asc())
            .rowsBetween(0, W.unboundedFollowing)
        )
        out = self._df
        for c in cols:
            out = out.withColumn(c, F.first(c, ignorenulls=True).over(w))
        return Table(out)

    def compare(
        self, other: "Table | DataFrame", keys: list[str]
    ) -> "Table":
        """pandas df.compare, distributed: long-form report of differing
        cells between two key-joined frames — ``(keys..., column,
        self_value, other_value)``, values cast to string for a uniform
        report schema ``(keys..., col_name, self_value, other_value)``.
        Keys present in only one frame are excluded (pandas compare
        requires aligned frames; use merge(indicator=True) for presence
        diffs). One key-partitioned join + a projection/explode — no
        per-column scans."""
        odf = _unwrap(other)
        shared = [c for c in self._df.columns if c in set(odf.columns) and c not in keys]
        if not shared:
            raise ValueError("compare: no shared non-key columns")
        l = self._df.select(
            *keys, *[F.col(c).alias(f"__l_{c}") for c in shared]
        )
        r = odf.select(*keys, *[F.col(c).alias(f"__r_{c}") for c in shared])
        joined = l.join(r, keys)
        entries = F.array(
            *[
                F.struct(
                    F.lit(c).alias("col_name"),
                    F.col(f"__l_{c}").cast("string").alias("self_value"),
                    F.col(f"__r_{c}").cast("string").alias("other_value"),
                    F.col(f"__l_{c}").eqNullSafe(F.col(f"__r_{c}")).alias("__same"),
                )
                for c in shared
            ]
        )
        diffs = F.filter(entries, lambda e: ~e.getField("__same"))
        return Table(
            joined.select(*keys, F.explode(diffs).alias("d")).select(
                *keys, "d.col_name", "d.self_value", "d.other_value"
            )
        )

    def clip(
        self,
        lower: float | None = None,
        upper: float | None = None,
        subset: list[str] | None = None,
    ) -> "Table":
        """pandas DataFrame.clip with scalar bounds: numeric columns (or
        ``subset``) clamped into [lower, upper]; nulls stay null
        (greatest/least propagate non-null bounds but a null value stays
        null). Narrow projection — no shuffle."""
        if lower is None and upper is None:
            return self
        cols = subset or [c for c, t in self._df.dtypes if _is_numeric(t)]
        out = self._df
        for c in cols:
            e = F.col(c)
            if lower is not None:
                e = F.when(F.col(c).isNull(), None).otherwise(
                    F.greatest(e, F.lit(lower))
                )
            if upper is not None:
                e = F.when(F.col(c).isNull(), None).otherwise(
                    F.least(e, F.lit(upper))
                )
            out = out.withColumn(c, e.cast(dict(self._df.dtypes)[c]))
        return Table(out)

    def dropna(self, how: str = "any", subset: list[str] | None = None) -> "Table":
        return Table(self._df.na.drop(how=how, subset=subset))

    def replace(self, to_replace: Any, value: Any) -> "Table":
        return Table(self._df.na.replace(to_replace, value))

    def drop_duplicates(self, subset: list[str] | None = None) -> "Table":
        return Table(self._df.dropDuplicates(subset))

    def duplicated(
        self,
        subset: list[str],
        order_by: str,
        keep: str = "first",
        out_col: str = "duplicated",
    ) -> "Table":
        """pandas df.duplicated as a boolean COLUMN (no silent row drop):
        True for every row after (``keep='first'``) / before
        (``keep='last'``) its key group's representative. pandas defines
        first/last by row order, which a distributed table lacks —
        ``order_by`` makes the representative explicit and deterministic
        (ties broken by the full subset ordering)."""
        from pyspark.sql import Window as W

        if keep not in ("first", "last"):
            raise ValueError("duplicated: keep must be 'first' or 'last'")
        o = F.col(order_by).asc() if keep == "first" else F.col(order_by).desc()
        w = W.partitionBy(*subset).orderBy(o)
        return Table(
            self._df.withColumn(out_col, F.row_number().over(w) > 1)
        )

    def sort_values(self, by: str | list[str], ascending: bool | list[bool] = True) -> "Table":
        keys = [by] if isinstance(by, str) else list(by)
        asc = [ascending] * len(keys) if isinstance(ascending, bool) else list(ascending)
        cols = [F.col(k).asc() if a else F.col(k).desc() for k, a in zip(keys, asc)]
        return Table(self._df.orderBy(*cols))

    def head(self, n: int = 5) -> "Table":
        return Table(self._df.limit(n))

    def nlargest(self, n: int, columns: str | list[str]) -> "Table":
        keys = [columns] if isinstance(columns, str) else list(columns)
        return Table(self._df.orderBy(*[F.col(k).desc() for k in keys]).limit(n))

    def nsmallest(self, n: int, columns: str | list[str]) -> "Table":
        keys = [columns] if isinstance(columns, str) else list(columns)
        return Table(self._df.orderBy(*[F.col(k).asc() for k in keys]).limit(n))

    def merge(
        self,
        right: "Table | DataFrame",
        on: str | list[str] | None = None,
        how: str = "inner",
        left_on: str | list[str] | None = None,
        right_on: str | list[str] | None = None,
        indicator: bool = False,
        suffixes: tuple[str, str] = ("_x", "_y"),
    ) -> "Table":
        return merge(
            self,
            right,
            on=on,
            how=how,
            left_on=left_on,
            right_on=right_on,
            indicator=indicator,
            suffixes=suffixes,
        )

    def describe(self, cols: list[str] | None = None) -> "Table":
        """pandas df.describe() over numeric columns, one row per column
        (long shape — stable schema however many columns are profiled).
        ONE aggregation pass computes every statistic; mean/std rounded
        to 6 decimals (engine summation-order noise), percentiles exact
        (Spark percentile ≡ DuckDB quantile_cont interpolation)."""
        num_cols = (
            cols
            if cols is not None
            else [c for c, t in self._df.dtypes if _is_numeric(t)]
        )
        if not num_cols:
            raise ValueError("describe: no numeric columns to profile")
        aggs = []
        for c in num_cols:
            aggs += [
                F.count(c).alias(f"__n_{c}"),
                F.round(F.avg(c), 6).alias(f"__mean_{c}"),
                F.round(F.stddev_samp(c), 6).alias(f"__sd_{c}"),
                F.min(c).cast("double").alias(f"__min_{c}"),
                F.percentile(c, 0.25).alias(f"__p25_{c}"),
                F.percentile(c, 0.5).alias(f"__p50_{c}"),
                F.percentile(c, 0.75).alias(f"__p75_{c}"),
                F.max(c).cast("double").alias(f"__max_{c}"),
            ]
        one = self._df.agg(*aggs)
        entries = F.array(
            *[
                F.struct(
                    F.lit(c).alias("col"),
                    F.col(f"__n_{c}").alias("n"),
                    F.col(f"__mean_{c}").alias("mean"),
                    F.col(f"__sd_{c}").alias("sd"),
                    F.col(f"__min_{c}").alias("min_v"),
                    F.col(f"__p25_{c}").alias("p25"),
                    F.col(f"__p50_{c}").alias("p50"),
                    F.col(f"__p75_{c}").alias("p75"),
                    F.col(f"__max_{c}").alias("max_v"),
                )
                for c in num_cols
            ]
        )
        return Table(
            one.select(F.explode(entries).alias("d")).select("d.*")
        )

    def melt(
        self,
        id_vars: list[str],
        value_vars: list[str] | None = None,
        var_name: str = "variable",
        value_name: str = "value",
    ) -> "Table":
        """pd.melt → Spark's native unpivot (wide→long, no shuffle)."""
        vv = value_vars or [c for c in self._df.columns if c not in id_vars]
        return Table(self._df.unpivot(id_vars, vv, var_name, value_name))

    def value_counts(self, column: str, ascending: bool = False) -> "Table":
        """Series.value_counts: (value, count) ordered by count."""
        out = (
            self._df.groupBy(column)
            .agg(F.count(F.lit(1)).alias("count"))
            .orderBy(
                F.col("count").asc() if ascending else F.col("count").desc(),
                F.col(column).asc(),  # deterministic tie-break
            )
        )
        return Table(out)

    def nunique(self, cols: list[str] | None = None) -> "Table":
        """Per-column exact distinct counts (1-row frame). Multiple
        countDistinct in one agg pays the Expand — acceptable for the
        profiling shape; use approx_count_distinct at 100 TB widths."""
        cs = cols or self._df.columns
        return Table(self._df.agg(*[F.countDistinct(c).alias(c) for c in cs]))

    def sample(self, frac: float, key: str | None = None, seed: int = 42) -> "Table":
        """df.sample: with ``key``, deterministic md5-bucket membership
        (partition/engine-invariant — operators/sampling.py); without, a
        plain seeded Bernoulli sample (fast, partitioning-dependent)."""
        if key is not None:
            from pandas_etl_spark.operators.sampling import hash_sample

            return Table(hash_sample(self._df, key, frac))
        return Table(self._df.sample(fraction=frac, seed=seed))

    def pivot_table(
        self,
        index: str | list[str],
        columns: str,
        values: str,
        aggfunc: str = "mean",
        fill_value: Any = None,
        margins: bool = False,
        margins_name: str = "All",
    ) -> "Table":
        """pd.pivot_table → groupBy(index).pivot(columns).agg. Distinct
        pivot values are discovered by Spark (two-pass); pass explicit
        values via .df API when the category set is known.

        ``margins=True`` (single index column only) adds the pandas
        ``All`` row and column via ONE rollup + conditional aggregation
        — no second scan, no union: rollup emits the (index) and ()
        grouping sets, and each pivot cell is ``agg(CASE WHEN col = v
        THEN values END)`` so the margin column is just the
        unconditional aggregate."""
        fn, _ = Grouped._AGG_FNS[aggfunc]
        idx = [index] if isinstance(index, str) else list(index)
        if not margins:
            out = self._df.groupBy(*idx).pivot(columns).agg(fn(values))
            if fill_value is not None:
                out = out.na.fill(fill_value)
            return Table(out)
        if len(idx) != 1:
            raise ValueError(
                "pivot_table(margins=True) supports a single index column "
                "(pandas' grand-total semantics; use grouping sets directly "
                "for partial margins)"
            )
        vals = sorted(
            r[0]
            for r in _probe_categories(self._df, columns, "pivot_table")
            if r[0] is not None
        )
        cells = [
            fn(F.when(F.col(columns) == v, F.col(values))).alias(str(v)) for v in vals
        ] + [fn(F.col(values)).alias(margins_name)]
        rolled = self._df.rollup(idx[0]).agg(
            F.grouping(idx[0]).alias("__g"), *cells
        )
        out = rolled.select(
            F.when(F.col("__g") == 1, F.lit(margins_name))
            .otherwise(F.col(idx[0]).cast("string"))
            .alias(idx[0]),
            *[F.col(str(v)) for v in vals],
            F.col(margins_name),
        )
        if fill_value is not None:
            out = out.na.fill(fill_value)
        return Table(out)

    def explode(self, column: str) -> "Table":
        others = [c for c in self._df.columns if c != column]
        return Table(
            self._df.select(*others, F.explode_outer(column).alias(column))
        )

    # -- sinks (§2.2) ----------------------------------------------------------

    def to_csv(self, path_or_buf: str, index: bool = False, header: bool = True) -> str:
        """``index`` accepted for parity; there is no index (SURVEY §1.1)."""
        if _explain_sink(self._df, "csv", path_or_buf):
            return path_or_buf
        return _io.to_csv(self._df, path_or_buf, header=header)

    def to_parquet(self, path: str, partition_by: list[str] | None = None) -> str:
        if _explain_sink(self._df, "parquet", path):
            return path
        return _io.to_parquet(self._df, path, partition_by=partition_by)

    def to_parquet_with_manifest(
        self,
        path: str,
        cols: list[str] | None = None,
        key_col: str | None = None,
    ) -> str:
        """Parquet write + embedded integrity manifest
        (operators/checksum.to_parquet_with_manifest)."""
        from pandas_etl_spark.operators.checksum import (
            to_parquet_with_manifest as _tpm,
        )

        if _explain_sink(self._df, "parquet_with_manifest", path):
            return path
        _tpm(self._df, path, cols=cols, key_col=key_col)
        return path

    def to_orc(self, path: str, partition_by: list[str] | None = None) -> str:
        if _explain_sink(self._df, "orc", path):
            return path
        return _io.to_orc(self._df, path, partition_by=partition_by)

    def to_parquet_sorted(
        self, path: str, sort_cols: list[str], n_files: int | None = None
    ) -> str:
        """Range-clustered write (sources.io.to_parquet_sorted) — exposed
        here so YAML pipeline steps can emit skip-friendly layouts."""
        if _explain_sink(self._df, "parquet_sorted", path):
            return path
        return _io.to_parquet_sorted(self._df, path, sort_cols, n_files=n_files)

    def to_parquet_zorder(
        self, path: str, cols: list[str], bits: int = 8, n_files: int | None = None
    ) -> str:
        """Z-order clustered write (sources.layout.to_parquet_zorder)."""
        from pandas_etl_spark.sources.layout import to_parquet_zorder

        if _explain_sink(self._df, "parquet_zorder", path):
            return path
        return to_parquet_zorder(self._df, path, cols, bits=bits, n_files=n_files)

    def to_table_bucketed(
        self,
        table: str,
        bucket_cols: list[str],
        num_buckets: int = 32,
        sort_cols: list[str] | None = None,
        path: str | None = None,
    ) -> str:
        """Hive-bucketed catalog-table write
        (sources.layout.to_table_bucketed) — co-located joins/aggs on
        the bucket key need no Exchange."""
        from pandas_etl_spark.sources.layout import to_table_bucketed

        if _explain_sink(self._df, "bucketed_table", table):
            return table
        return to_table_bucketed(
            self._df,
            table,
            bucket_cols,
            num_buckets=num_buckets,
            sort_cols=sort_cols,
            path=path,
        )

    def to_sql(self, name: str, con: Any, if_exists: str = "fail", index: bool = False) -> None:
        if _explain_sink(self._df, "jdbc", name):
            return
        options = con.jdbc_options() if hasattr(con, "jdbc_options") else con
        _io.to_sql(self._df, name, options, if_exists=if_exists)

    def to_excel(
        self,
        path: str,
        sheet_name: str = "Sheet1",
        index: bool = False,
        max_rows: int = 100_000,
    ) -> str:
        """pd.DataFrame.to_excel parity (reference reach: generic
        dispatch, /root/reference/pandas_etl/etl.py:552-557). A workbook
        is a driver-side artifact, so this is an explicitly-bounded
        collect: more than ``max_rows`` rows raises rather than silently
        truncating or OOMing the driver. Gated on openpyxl like
        read_excel."""
        if _explain_sink(self._df, "excel", path):
            return path
        pdf = self._df.limit(max_rows + 1).toPandas()
        if len(pdf) > max_rows:
            raise ValueError(
                f"to_excel: result exceeds max_rows={max_rows}; a spreadsheet "
                "is a driver-side artifact — aggregate/limit first, or raise "
                "max_rows explicitly"
            )
        try:
            pdf.to_excel(path, sheet_name=sheet_name, index=index)
        except (ImportError, ModuleNotFoundError) as e:  # openpyxl absent
            raise NotImplementedError(
                "to_excel needs openpyxl on the driver; not available in "
                "this environment"
            ) from e
        return path

    # ------------------------------------------------------------------
    # Spark-native extensions on the pandas-flavored surface: the r5
    # warehouse/curation operators, exposed so YAML pipelines call them
    # as bound methods (F14 generic dispatch) without preFlight imports.

    def cdc_apply(
        self,
        ops: "Table | DataFrame",
        keys: list[str],
        seq_cols: list[str],
        op_col: str = "op",
        delete_op: str = "D",
    ) -> "Table":
        """Apply a CDC ops log onto this snapshot
        (operators/upsert.cdc_apply)."""
        from pandas_etl_spark.operators.upsert import cdc_apply as _cdc

        return Table(
            _cdc(self._df, _unwrap(ops), keys, seq_cols, op_col, delete_op)
        )

    def snapshot_diff(
        self,
        new: "Table | DataFrame",
        keys: list[str],
        compare_cols: list[str] | None = None,
    ) -> "Table":
        """Key-level added/removed/changed diff against ``new``
        (operators/upsert.snapshot_diff)."""
        from pandas_etl_spark.operators.upsert import snapshot_diff as _diff

        return Table(_diff(self._df, _unwrap(new), keys, compare_cols))

    def segment_dedup(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        words_per_segment: int = 10,
    ) -> "Table":
        """C4-style corpus-wide segment dedup
        (functions/text.segment_dedup)."""
        from pandas_etl_spark.functions.text import segment_dedup as _sd

        return Table(_sd(self._df, text_col, id_col, words_per_segment))

    def segment_neardup_dedup(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        words_per_segment: int = 20,
        threshold: float = 0.5,
    ) -> "Table":
        """Segment-level NEAR-dup removal via MinHash-LSH
        (functions/text.segment_neardup_dedup)."""
        from pandas_etl_spark.functions.text import (
            segment_neardup_dedup as _snd,
        )

        return Table(
            _snd(self._df, text_col, id_col, words_per_segment, threshold)
        )

    def exact_span_dedup(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        k: int = 8,
    ) -> "Table":
        """Rolling-window exact duplicated-span removal
        (functions/text.exact_span_dedup)."""
        from pandas_etl_spark.functions.text import exact_span_dedup as _esd

        return Table(_esd(self._df, text_col, id_col, k))

    def normalize_text(
        self, text_col: str = "text", id_col: str = "doc_id"
    ) -> "Table":
        """NFC + control-strip + whitespace-collapse normalization
        (functions/text.normalize_text)."""
        from pandas_etl_spark.functions.text import normalize_text as _nt

        return Table(_nt(self._df, text_col, id_col))

    def gopher_gate(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        min_words: int = 30,
        max_words: int = 100_000,
    ) -> "Table":
        """Gopher-rule document quality gate
        (functions/text.gopher_stats)."""
        from pandas_etl_spark.functions.text import gopher_stats as _gs

        return Table(_gs(self._df, text_col, id_col, min_words, max_words))

    def kcenter_sample(
        self,
        k: int = 8,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "Table":
        """Greedy farthest-point k-center diversity sample
        (functions/similarity.kcenter_sample)."""
        from pandas_etl_spark.functions.similarity import (
            kcenter_sample as _kc,
        )

        return Table(_kc(self._df, k, id_col, vec_col))

    def mv_refresh(
        self,
        ops,
        keys: list[str],
        seq_cols: list[str],
        bucket_expr: str,
        value_col: str = "cents",
    ) -> "Table":
        """Refresh a per-bucket (count, sum) MV over this base table
        from a CDC ops log WITHOUT re-aggregating the applied table
        (operators/upsert.mv_agg_delta + mv_merge). ``bucket_expr`` is
        a SQL expression over the key columns."""
        from pandas_etl_spark.operators.upsert import (
            cdc_collapse,
            mv_agg_delta,
            mv_merge,
        )

        ops_df = _unwrap(ops)
        latest = cdc_collapse(ops_df, keys, seq_cols)
        delta = mv_agg_delta(
            latest,
            self._df.select(*keys, F.col(value_col).alias("__old")),
            keys=keys,
            bucket=F.expr(bucket_expr),
            value_col=value_col,
        )
        mv = self._df.groupBy(F.expr(bucket_expr).alias("bucket")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(value_col).cast("bigint").alias("bal_cents"),
        )
        return Table(mv_merge(mv, delta))

    def bigram_logprob(
        self,
        text_col: str = "text",
        id_col: str = "doc_id",
        vocab_size: int = 1000,
    ) -> "Table":
        """Bigram-LM fluency score (functions/text.bigram_logprob)."""
        from pandas_etl_spark.functions.text import bigram_logprob as _blp

        return Table(_blp(self._df, text_col, id_col, vocab_size))

    def dsir_importance(
        self,
        target_expr: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        n_buckets: int = 1024,
    ) -> "Table":
        """DSIR importance log-weights vs the rows matching
        ``target_expr`` (functions/text.dsir_importance)."""
        from pandas_etl_spark.functions.text import dsir_importance as _dsir

        return Table(
            _dsir(self._df, F.expr(target_expr), text_col, id_col, n_buckets)
        )

    def shuffle_shards(
        self,
        key: str,
        n_shards: int = 8,
        seed: int = 42,
        by: list[str] | None = None,
    ) -> "Table":
        """Deterministic sharded training-order shuffle
        (operators/sampling.shuffle_shards)."""
        from pandas_etl_spark.operators.sampling import shuffle_shards as _sh

        return Table(
            _sh(self._df, key, n_shards, seed, tuple(by or ()))
        )

    def bootstrap_ci(
        self,
        value_col: str,
        group_cols: list[str],
        key_expr: str,
        n_replicates: int = 48,
        alpha: float = 0.05,
    ) -> "Table":
        """Poisson-bootstrap CI for grouped means
        (operators/bootstrap.poisson_bootstrap_ci)."""
        from pandas_etl_spark.operators.bootstrap import poisson_bootstrap_ci

        return Table(
            poisson_bootstrap_ci(
                self._df,
                value_col,
                group_cols,
                F.expr(key_expr),
                n_replicates,
                alpha,
            )
        )

    def pagerank(
        self,
        src: str = "src",
        dst: str = "dst",
        weight: str | None = None,
        iters: int = 3,
        damping: float = 0.85,
    ) -> "Table":
        """Treat this frame as an edge table and rank nodes
        (operators/graph.pagerank)."""
        from pandas_etl_spark.operators.graph import pagerank as _pr

        return Table(_pr(self._df, src, dst, weight, iters, damping))

    def temperature_sample(
        self, key: str, strata_col: str, alpha: float = 0.5
    ) -> "Table":
        """mT5/XLM-R temperature mixture resampling
        (operators/sampling.temperature_sample)."""
        from pandas_etl_spark.operators.sampling import (
            temperature_sample as _ts,
        )

        return Table(_ts(self._df, key, strata_col, alpha))

    def key_skew_profile(self, key: str) -> "Table":
        """Key-distribution skew report with exact distributed Gini
        (operators/profile.key_skew_profile)."""
        from pandas_etl_spark.operators.profile import (
            key_skew_profile as _ksp,
        )

        return Table(_ksp(self._df, key))

    def hll_rollup(
        self, key: str, by: list[str] | str, lg_k: int = 12
    ) -> "Table":
        """Reduce to a mergeable per-group HLL sketch rollup
        (operators/sketches.hll_rollup) — the write-once pass that
        makes later distinct-counts over any group union a KB-sized
        merge instead of a raw re-scan."""
        from pandas_etl_spark.operators.sketches import hll_rollup as _hr

        by = [by] if isinstance(by, str) else list(by)
        return Table(_hr(self._df, key, by, lg_k))

    def hll_estimate(self, by: list[str] | str | None = None) -> "Table":
        """Union-merge a sketch rollup to coarser groups and estimate
        distinct keys (operators/sketches.hll_estimate)."""
        from pandas_etl_spark.operators.sketches import hll_estimate as _he

        by = [] if by is None else ([by] if isinstance(by, str) else list(by))
        return Table(_he(self._df, by))

    def triangle_stats(self, src: str = "u", dst: str = "v") -> "Table":
        """Treat this frame as an undirected edge table and census its
        triangles (operators/graph.triangle_stats)."""
        from pandas_etl_spark.operators.graph import triangle_stats as _ts

        return Table(_ts(self._df, src, dst))

    def label_propagation(
        self, src: str = "u", dst: str = "v", iters: int = 3
    ) -> "Table":
        """Deterministic LPA communities over this edge table
        (operators/graph.label_propagation)."""
        from pandas_etl_spark.operators.graph import (
            label_propagation as _lp,
        )

        return Table(_lp(self._df, src, dst, iters))

    def k_core(self, k: int, src: str = "u", dst: str = "v") -> "Table":
        """Maximal k-core of this edge table
        (operators/graph.k_core)."""
        from pandas_etl_spark.operators.graph import k_core as _kc

        return Table(_kc(self._df, k, src, dst))

    def adamic_adar(
        self,
        src: str = "u",
        dst: str = "v",
        max_degree: int | None = None,
    ) -> "Table":
        """Adamic-Adar link prediction over this edge table
        (operators/graph.adamic_adar)."""
        from pandas_etl_spark.operators.graph import adamic_adar as _aa

        return Table(_aa(self._df, src, dst, max_degree))

    def assortativity(self, src: str = "u", dst: str = "v") -> "Table":
        """Degree assortativity of this edge table
        (operators/graph.assortativity)."""
        from pandas_etl_spark.operators.graph import assortativity as _as

        return Table(_as(self._df, src, dst))

    def bfs_hops(
        self,
        seeds: "Table",
        src: str = "u",
        dst: str = "v",
        node_col: str = "node",
        max_hops: int | None = None,
    ) -> "Table":
        """Min hop distance from ``seeds`` over this edge table
        (operators/graph.bfs_hops)."""
        from pandas_etl_spark.operators.graph import bfs_hops as _bfs

        seed_df = seeds._df if isinstance(seeds, Table) else seeds
        return Table(
            _bfs(self._df, seed_df, src, dst, node_col, max_hops)
        )


class ColumnGrouped:
    """pandas ``groupby(axis='columns')``: columns grouped by a mapping,
    reduced ACROSS columns per row. Distributed cost: zero — each output
    group is one projection expression over its member columns (null-
    skipping, like pandas: sum treats null as 0 when any member is
    non-null, max/min ignore nulls via greatest/least semantics)."""

    def __init__(self, df: DataFrame, mapping: dict[str, str]):
        missing = [c for c in mapping if c not in df.columns]
        if missing:
            raise ValueError(f"groupby(axis='columns'): unknown columns {missing}")
        self._df = df
        self._groups: dict[str, list[str]] = {}
        for col, grp in mapping.items():
            self._groups.setdefault(str(grp), []).append(col)

    def _project(self, combine) -> Table:
        cols = [
            combine([F.col(c) for c in members]).alias(grp)
            for grp, members in sorted(self._groups.items())
        ]
        return Table(self._df.select(*cols))

    def sum(self) -> Table:
        # null-skipping row-wise sum: coalesce each member to 0, but keep
        # an all-null group null (pandas min_count=0 gives 0.0; we match
        # the default: all-null sums to 0)
        return self._project(
            lambda cs: sum((F.coalesce(c, F.lit(0)) for c in cs), F.lit(0))
        )

    def max(self) -> Table:
        return self._project(lambda cs: cs[0] if len(cs) == 1 else F.greatest(*cs))

    def min(self) -> Table:
        return self._project(lambda cs: cs[0] if len(cs) == 1 else F.least(*cs))

    def mean(self) -> Table:
        def avg(cs):
            present = sum(
                (F.when(c.isNotNull(), 1).otherwise(0) for c in cs), F.lit(0)
            )
            total = sum((F.coalesce(c.cast("double"), F.lit(0.0)) for c in cs), F.lit(0.0))
            return F.when(present > 0, total / present)

        return self._project(avg)


class SeriesCol:
    """pandas-Series-shaped handle over a Spark Column: carries the
    ``.str`` / ``.dt`` accessor namespaces (SURVEY §2.8; reference
    generic dispatch reaches the full Series surface,
    /root/reference/pandas_etl/etl.py:552-557) and delegates operators
    to the wrapped Column so it composes in ``assign``/``filter``.
    Accessor methods return SeriesCol again, so pandas-style chains
    (``t['s'].str.strip().str.upper()``) work."""

    def __init__(self, col: Column):
        self.col = col

    @property
    def str(self) -> "StrMethods":
        return StrMethods(self.col)

    @property
    def dt(self) -> "DtMethods":
        return DtMethods(self.col)

    def alias(self, name: str) -> Column:
        return self.col.alias(name)

    def __getattr__(self, name: str) -> Any:
        return getattr(self.col, name)

    # comparison/arithmetic dunders aren't routed through __getattr__ —
    # delegate the useful ones explicitly (plain Columns come back; mixed
    # SeriesCol operands unwrap)
    def _other(self, o: Any) -> Any:
        return o.col if isinstance(o, SeriesCol) else o

    def __eq__(self, o: Any) -> Column:  # type: ignore[override]
        return self.col == self._other(o)

    def __ne__(self, o: Any) -> Column:  # type: ignore[override]
        return self.col != self._other(o)

    def __lt__(self, o: Any) -> Column:
        return self.col < self._other(o)

    def __le__(self, o: Any) -> Column:
        return self.col <= self._other(o)

    def __gt__(self, o: Any) -> Column:
        return self.col > self._other(o)

    def __ge__(self, o: Any) -> Column:
        return self.col >= self._other(o)

    def __add__(self, o: Any) -> Column:
        return self.col + self._other(o)

    def __sub__(self, o: Any) -> Column:
        return self.col - self._other(o)

    def __mul__(self, o: Any) -> Column:
        return self.col * self._other(o)

    def __truediv__(self, o: Any) -> Column:
        return self.col / self._other(o)

    def __and__(self, o: Any) -> Column:
        return self.col & self._other(o)

    def __or__(self, o: Any) -> Column:
        return self.col | self._other(o)

    def __invert__(self) -> Column:
        return ~self.col


class StrMethods:
    """``Series.str`` parity over Spark built-ins (JVM-side, codegen —
    no Python in the row path). 0-based slicing like pandas; regex
    flavors are Java regex (document divergences where they bite)."""

    def __init__(self, col: Column):
        self._c = col

    def _w(self, col: Column) -> SeriesCol:
        return SeriesCol(col)

    def upper(self) -> SeriesCol:
        return self._w(F.upper(self._c))

    def lower(self) -> SeriesCol:
        return self._w(F.lower(self._c))

    def title(self) -> SeriesCol:
        return self._w(F.initcap(self._c))

    def len(self) -> SeriesCol:
        return self._w(F.length(self._c))

    def strip(self) -> SeriesCol:
        return self._w(F.trim(self._c))

    def lstrip(self) -> SeriesCol:
        return self._w(F.ltrim(self._c))

    def rstrip(self) -> SeriesCol:
        return self._w(F.rtrim(self._c))

    def contains(self, pat: str, regex: bool = True) -> SeriesCol:
        return self._w(self._c.rlike(pat) if regex else self._c.contains(pat))

    def match(self, pat: str) -> SeriesCol:
        """pandas str.match: anchored at the start."""
        anchored = pat if pat.startswith("^") else "^" + pat
        return self._w(self._c.rlike(anchored))

    def startswith(self, prefix: str) -> SeriesCol:
        return self._w(self._c.startswith(prefix))

    def endswith(self, suffix: str) -> SeriesCol:
        return self._w(self._c.endswith(suffix))

    def replace(self, pat: str, repl: str, regex: bool = True) -> SeriesCol:
        if regex:
            return self._w(F.regexp_replace(self._c, pat, repl))
        return self._w(F.replace(self._c, F.lit(pat), F.lit(repl)))

    def extract(self, pat: str, group: int = 1) -> SeriesCol:
        """First capture group by default (pandas extract returns the
        group columns; one group → one column)."""
        return self._w(F.regexp_extract(self._c, pat, group))

    def extractall(self, pat: str, group: int = 1) -> SeriesCol:
        """All matches of the capture group, as an array column (pandas
        extractall's long frame = ``Table.explode`` over this)."""
        return self._w(F.regexp_extract_all(self._c, F.lit(pat), group))

    def slice(self, start: int = 0, stop: int | None = None) -> SeriesCol:
        """0-based [start, stop) like Python slicing (negative indexes
        unsupported — Spark substring is position-based)."""
        if start < 0 or (stop is not None and stop < 0):
            raise ValueError("str.slice: negative indexes unsupported")
        length = (1 << 30) if stop is None else max(stop - start, 0)
        return self._w(F.substring(self._c, start + 1, length))

    def split(self, pat: str = r"\s+") -> SeriesCol:
        return self._w(F.split(self._c, pat))

    def get(self, i: int) -> SeriesCol:
        return self._w(F.element_at(self._c, i + 1))

    def zfill(self, width: int) -> SeriesCol:
        return self._w(F.lpad(self._c, width, "0"))

    def pad(self, width: int, side: str = "left", fillchar: str = " ") -> SeriesCol:
        fn = F.lpad if side == "left" else F.rpad
        return self._w(fn(self._c, width, fillchar))

    def cat(self, other: Any, sep: str = "") -> SeriesCol:
        o = other.col if isinstance(other, SeriesCol) else other
        return self._w(F.concat_ws(sep, self._c, o))


class DtMethods:
    """``Series.dt`` parity over Spark datetime built-ins. Properties for
    the component fields (pandas exposes them as attributes), methods
    for floor/strftime."""

    _FLOOR_FREQ = {
        "D": "day", "H": "hour", "h": "hour", "T": "minute", "min": "minute",
        "S": "second", "s": "second", "M": "month", "MS": "month",
        "Y": "year", "YS": "year", "W": "week", "Q": "quarter",
    }

    def __init__(self, col: Column):
        self._c = col

    @property
    def year(self) -> SeriesCol:
        return SeriesCol(F.year(self._c))

    @property
    def month(self) -> SeriesCol:
        return SeriesCol(F.month(self._c))

    @property
    def day(self) -> SeriesCol:
        return SeriesCol(F.dayofmonth(self._c))

    @property
    def hour(self) -> SeriesCol:
        return SeriesCol(F.hour(self._c))

    @property
    def minute(self) -> SeriesCol:
        return SeriesCol(F.minute(self._c))

    @property
    def second(self) -> SeriesCol:
        return SeriesCol(F.second(self._c))

    @property
    def quarter(self) -> SeriesCol:
        return SeriesCol(F.quarter(self._c))

    @property
    def dayofyear(self) -> SeriesCol:
        return SeriesCol(F.dayofyear(self._c))

    @property
    def dayofweek(self) -> SeriesCol:
        """pandas convention: Monday=0 … Sunday=6 (Spark's dayofweek is
        Sunday=1 — translated)."""
        return SeriesCol((F.dayofweek(self._c) + 5) % 7)

    @property
    def date(self) -> SeriesCol:
        return SeriesCol(F.to_date(self._c))

    def floor(self, freq: str) -> SeriesCol:
        """Series.dt.floor with pandas offset aliases (D/H/T/S/W/M/Q/Y)
        → date_trunc."""
        unit = self._FLOOR_FREQ.get(freq)
        if unit is None:
            raise ValueError(
                f"dt.floor: unsupported freq {freq!r} (supported: "
                f"{sorted(self._FLOOR_FREQ)})"
            )
        return SeriesCol(F.date_trunc(unit, self._c))

    def strftime(self, fmt: str) -> SeriesCol:
        from pandas_etl_spark.functions.timeparse import strptime_to_java

        return SeriesCol(F.date_format(self._c, strptime_to_java(fmt)))


class Grouped:
    """pandas GroupBy analogue: keys stay columns; aggs cover all non-key
    columns (pandas applies max/min to strings too — replicated)."""

    _AGG_FNS = {
        "max": (F.max, False),
        "min": (F.min, False),
        "sum": (F.sum, True),
        "mean": (F.avg, True),
        "avg": (F.avg, True),
        "count": (F.count, False),
        "std": (F.stddev_samp, True),
        "var": (F.var_samp, True),
        "nunique": (F.countDistinct, False),
        "median": (lambda c: F.percentile_approx(c, 0.5), True),
    }

    def __init__(self, df: DataFrame, keys: list[str]):
        self._df = df
        self.keys = keys

    def _agg_all(self, fn_name: str) -> Table:
        fn, numeric_only = self._AGG_FNS[fn_name]
        cols = [
            c
            for c, t in self._df.dtypes
            if c not in self.keys and (not numeric_only or _is_numeric(t))
        ]
        return Table(
            self._df.groupBy(*self.keys).agg(*[fn(c).alias(c) for c in cols])
        )

    def __getattr__(self, name: str):
        if name in self._AGG_FNS:
            return lambda: self._agg_all(name)
        raise AttributeError(name)

    def first(self, order_by: str | None = None) -> Table:
        return self._first_last("first", order_by)

    def last(self, order_by: str | None = None) -> Table:
        return self._first_last("last", order_by)

    def _first_last(self, which: str, order_by: str | None) -> Table:
        """pandas groupby().first()/last() are defined by ROW ORDER, which a
        distributed table does not have — F.first/F.last give run-to-run
        unstable answers across partitions (ADVICE r1, medium). We require
        an explicit ordering column and take, per column, the first/last
        NON-NULL value by that order (pandas skips NaN the same way),
        deterministically via struct min/max (order ties broken by value).
        Rows whose ORDER key is null are ignored (documented divergence:
        pandas sorts NaN keys last, which would make last() prefer them;
        a null position is not a position)."""
        if order_by is None:
            raise ValueError(
                f"groupby().{which}() needs order_by=<column>: a distributed "
                "table has no row order, so pandas' order-defined "
                f"{which} is nondeterministic here"
            )
        agg = F.min if which == "first" else F.max
        cols = [c for c in self._df.columns if c not in self.keys]
        aggs = [
            agg(
                F.when(
                    F.col(c).isNotNull() & F.col(order_by).isNotNull(),
                    F.struct(F.col(order_by).alias("o"), F.col(c).alias("v")),
                )
            )["v"].alias(c)
            for c in cols
        ]
        return Table(self._df.groupBy(*self.keys).agg(*aggs))

    def agg(self, spec: dict[str, str | list[str]]) -> Table:
        """pandas agg-dict: {"col": "mean"} or {"col": ["min", "max"]}."""
        aggs = []
        for col, fns in spec.items():
            for fn_name in [fns] if isinstance(fns, str) else fns:
                if fn_name in ("first", "last"):
                    raise ValueError(
                        f"agg '{fn_name}' is order-defined; use "
                        f"groupby(...).{fn_name}(order_by=...) instead"
                    )
                fn, _ = self._AGG_FNS[fn_name]
                alias = col if isinstance(fns, str) else f"{col}_{fn_name}"
                aggs.append(fn(col).alias(alias))
        return Table(self._df.groupBy(*self.keys).agg(*aggs))

    def size(self) -> Table:
        return Table(self._df.groupBy(*self.keys).agg(F.count(F.lit(1)).alias("size")))

    def transform(self, fn_name: str, column: str, out_col: str | None = None) -> Table:
        """pandas groupby().transform(): the group aggregate broadcast
        back onto every row (row count preserved). Implemented as an
        unordered window over the group keys — ONE shuffle, no sort
        (whole-partition frame), no join, no driver state; the same
        shape at any group cardinality."""
        from pyspark.sql import Window as W

        if fn_name in ("first", "last"):
            raise ValueError(
                f"transform '{fn_name}' is order-defined; use "
                f"groupby(...).{fn_name}(order_by=...) instead"
            )
        fn, _ = self._AGG_FNS[fn_name]
        r = fn(F.col(column)).over(W.partitionBy(*self.keys))
        return Table(self._df.withColumn(out_col or f"{column}_{fn_name}", r))

    def idxmax(self, column: str, id_col: str, out_col: str | None = None) -> Table:
        """pandas groupby().idxmax() analogue: there is no index, so the
        caller names the identifier column; ties on the value pick the
        SMALLEST id (pandas keeps the first occurrence — arrival order,
        which a distributed table replaces with the id order).
        One shuffle + per-group sort, row_number()=1 filter."""
        return self._idx_extreme(column, id_col, out_col, largest=True)

    def idxmin(self, column: str, id_col: str, out_col: str | None = None) -> Table:
        return self._idx_extreme(column, id_col, out_col, largest=False)

    def _idx_extreme(
        self, column: str, id_col: str, out_col: str | None, largest: bool
    ) -> Table:
        from pyspark.sql import Window as W

        v = F.col(column).desc() if largest else F.col(column).asc()
        w = W.partitionBy(*self.keys).orderBy(v, F.col(id_col).asc())
        name = out_col or f"{column}_idx{'max' if largest else 'min'}"
        return Table(
            self._df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(*self.keys, F.col(id_col).alias(name))
        )

    def rank(
        self,
        column: str,
        method: str = "average",
        ascending: bool = True,
        tie_break: str | None = None,
        out_col: str | None = None,
    ) -> Table:
        """pandas groupby().rank() — per-group ranks of ``column`` with
        the full pandas method family:

        - ``average``: mean rank of ties (rank + (n_ties−1)/2, double)
        - ``min``: SQL rank()          - ``max``: rank() + n_ties − 1
        - ``dense``: dense_rank()      - ``first``: row-number. pandas
          'first' breaks ties by arrival order, which a distributed
          table does not have — a ``tie_break`` column is REQUIRED so
          the result is deterministic.

        Grouped (not whole-frame) ranking is the scale shape: one
        shuffle on the group keys, sort within groups."""
        from pyspark.sql import Window as W

        c = F.col(column).asc() if ascending else F.col(column).desc()
        ties = W.partitionBy(*self.keys, column)
        if method == "min":
            r: Column = F.rank().over(W.partitionBy(*self.keys).orderBy(c)).cast("bigint")
        elif method == "dense":
            r = F.dense_rank().over(W.partitionBy(*self.keys).orderBy(c)).cast("bigint")
        elif method == "first":
            if tie_break is None:
                raise ValueError(
                    "rank(method='first') needs tie_break=<column>: pandas "
                    "breaks ties by row order, which a distributed table "
                    "does not have"
                )
            w = W.partitionBy(*self.keys).orderBy(c, F.col(tie_break).asc())
            r = F.row_number().over(w).cast("bigint")
        elif method == "max":
            w = W.partitionBy(*self.keys).orderBy(c)
            r = (F.rank().over(w) + F.count(F.lit(1)).over(ties) - 1).cast("bigint")
        elif method == "average":
            w = W.partitionBy(*self.keys).orderBy(c)
            r = F.rank().over(w) + (F.count(F.lit(1)).over(ties) - 1) / 2.0
        else:
            raise ValueError(f"rank: unknown method {method!r}")
        return Table(self._df.withColumn(out_col or f"{column}_rank", r))


# -- module-level combinators (pd.concat / pd.merge analogues) ----------------


def _unwrap(obj: Any) -> DataFrame:
    return obj.df if isinstance(obj, Table) else obj


def concat(objs: list[Any], ignore_index: bool = False, axis: int = 0) -> Table:
    """pd.concat parity: aligns by column NAME, outer-fills missing with
    null (unionByName allowMissingColumns). ``ignore_index`` is moot —
    there is no index (SURVEY §2.7).
    Reference use: pandas_pipeline_recovery_1.yaml:42-46."""
    if axis != 0:
        raise NotImplementedError(
            "horizontal concat (axis=1) requires an explicit join key in a "
            "distributed engine; use merge instead"
        )
    dfs = [_unwrap(o) for o in objs]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return Table(out)


_HOW_MAP = {
    "inner": "inner", "left": "left", "right": "right",
    "outer": "outer", "cross": "cross",
}


def merge(
    left: Any,
    right: Any,
    on: str | list[str] | None = None,
    how: str = "inner",
    left_on: str | list[str] | None = None,
    right_on: str | list[str] | None = None,
    indicator: bool = False,
    suffixes: tuple[str, str] = ("_x", "_y"),
) -> Table:
    """pd.merge parity (§2.4). Semi/anti are native Spark joins exposed via
    how='leftsemi'/'leftanti' (extension beyond pandas).

    Overlapping non-key columns are disambiguated with pandas' _x/_y
    ``suffixes`` BEFORE joining (ADVICE r1: Spark keeps duplicate names,
    making any later reference to them ambiguous)."""
    ldf, rdf = _unwrap(left), _unwrap(right)
    spark_how = _HOW_MAP.get(how, how)  # pass through leftsemi/leftanti
    if (left_on is None) != (right_on is None):
        # pandas raises MergeError here; falling through would silently
        # produce a cartesian product
        raise ValueError("merge: left_on and right_on must be given together")
    if on is not None and left_on is not None:
        # pandas MergeError: 'Can only pass argument "on" OR "left_on" and
        # "right_on", not a combination of both' (ADVICE r2: `on` silently
        # won before)
        raise ValueError(
            'merge: pass "on" OR "left_on"/"right_on", not a combination of both'
        )
    if (
        on is None
        and left_on is None
        and spark_how != "cross"
        and not indicator
    ):
        on = [c for c in ldf.columns if c in set(rdf.columns)]  # natural join
        if not on:
            raise ValueError("merge: no common columns and no join keys given")
    if indicator and on is None and left_on is None:
        raise ValueError("merge(indicator=True) requires join keys (on= or left_on=/right_on=)")
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))

    # pandas suffix semantics: every column name present on BOTH sides and
    # not a shared join key gets suffixed (semi/anti output only left cols)
    overlap = [
        c for c in ldf.columns if c in set(rdf.columns) and c not in keys
    ]
    if overlap and spark_how not in ("leftsemi", "leftanti", "semi", "anti"):
        sx, sy = suffixes
        clash = {c + sx for c in overlap} & (set(ldf.columns) - set(overlap)) | {
            c + sy for c in overlap
        } & (set(rdf.columns) - set(overlap))
        if clash:
            # pandas raises MergeError when a suffixed name collides
            raise ValueError(
                f"merge: suffixed column name(s) {sorted(clash)} already exist"
            )
        ldf = ldf.select(
            *[F.col(c).alias(c + sx) if c in overlap else F.col(c) for c in ldf.columns]
        )
        rdf = rdf.select(
            *[F.col(c).alias(c + sy) if c in overlap else F.col(c) for c in rdf.columns]
        )
    else:
        sx, sy = "", ""

    if indicator:
        # pandas indicator semantics: a _merge column with
        # left_only/right_only/both, driven by key presence on each side
        lflag = ldf.withColumn("__in_left", F.lit(1))
        rflag = rdf.withColumn("__in_right", F.lit(1))
        if keys:
            out = lflag.join(rflag, on=keys, how=spark_how)
        else:  # left_on/right_on (ADVICE r2: previously rejected)
            lkeys = [left_on] if isinstance(left_on, str) else list(left_on)
            rkeys = [right_on] if isinstance(right_on, str) else list(right_on)
            cond = None
            for lk, rk in zip(lkeys, rkeys):
                c = (
                    lflag[lk + sx if lk in overlap else lk]
                    == rflag[rk + sy if rk in overlap else rk]
                )
                cond = c if cond is None else (cond & c)
            out = lflag.join(rflag, on=cond, how=spark_how)
        merge_col = (
            F.when(F.col("__in_left").isNotNull() & F.col("__in_right").isNotNull(), "both")
            .when(F.col("__in_left").isNotNull(), "left_only")
            .otherwise("right_only")
        )
        return Table(out.withColumn("_merge", merge_col).drop("__in_left", "__in_right"))
    if keys:
        return Table(ldf.join(rdf, on=keys, how=spark_how))
    if left_on is not None and right_on is not None:
        lkeys = [left_on] if isinstance(left_on, str) else list(left_on)
        rkeys = [right_on] if isinstance(right_on, str) else list(right_on)
        cond = None
        for lk, rk in zip(lkeys, rkeys):
            c = ldf[lk + sx if lk in overlap else lk] == rdf[rk + sy if rk in overlap else rk]
            cond = c if cond is None else (cond & c)
        return Table(ldf.join(rdf, on=cond, how=spark_how))
    return Table(ldf.crossJoin(rdf))


def merge_asof(
    left: Any,
    right: Any,
    on: str,
    by: str | list[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    suffixes: tuple[str, str] = ("", "_right"),
) -> Table:
    """pd.merge_asof parity (§2.4) — thin Table wrapper over
    ``operators.asof.asof_join`` (hypothesis-proven ≡ pd.merge_asof);
    exposed here (and in the YAML function registry as
    ``pd.merge_asof``) so pipelines get the pandas name. pandas'
    left-suffix slot must stay '' — left columns are never renamed."""
    from pandas_etl_spark.operators.asof import asof_join

    if suffixes[0] != "":
        raise ValueError("merge_asof: left suffix must be '' (left columns keep their names)")
    return Table(
        asof_join(
            _unwrap(left),
            _unwrap(right),
            on=on,
            by=by,
            direction=direction,
            suffix=suffixes[1],
            tolerance=tolerance,
        )
    )


def merge_ordered(
    left: Any,
    right: Any,
    on: str | list[str],
    left_by: str | list[str] | None = None,
    fill_method: str | None = None,
    suffixes: tuple[str, str] = ("_x", "_y"),
) -> Table:
    """pd.merge_ordered parity (§2.4): outer-merge two frames on an
    ordered key (time series alignment), optionally per ``left_by``
    group — each left group is aligned against ALL right rows, pandas'
    replicate-then-merge semantics — with ``fill_method='ffill'``
    forward-filling the gaps the outer join opens.

    pandas' ``fill_method='ffill'`` has INDEXER semantics, not
    value-ffill semantics: each merge-introduced gap row copies the
    previous row that ORIGINATED from that side — even if its value is
    null — and nulls already present in the source are preserved. That
    is reproduced by packing each side's value columns into a struct
    that is non-null exactly on rows the side contributed, running
    ``last(ignorenulls)`` over the PACK, and unpacking (a null field
    inside the carried pack stays null, matching pandas).

    With ``left_by`` the fill is a per-group window — one shuffle on the
    group keys, partition-parallel. Without it pandas fills over the
    single global order; reproducing that with an empty-partitionBy
    window would serialize the whole frame through one task, so the
    fill runs distributed instead (VERDICT r4 #4): repartitionByRange
    on the key, a per-range running pack-fill, then each range's
    carry-out pack collapses to a |partitions|-row frame whose own
    shifted running fill is the carry-in each range coalesces with.
    Only the |partitions|-row boundary frame is ever single-task. The
    trailing sort is presentational, matching pandas' ordered output
    (one range exchange)."""
    if fill_method not in (None, "ffill"):
        raise ValueError("merge_ordered: fill_method must be None or 'ffill'")
    keys = [on] if isinstance(on, str) else list(on)
    by = (
        [] if left_by is None
        else [left_by] if isinstance(left_by, str) else list(left_by)
    )
    ldf, rdf = _unwrap(left), _unwrap(right)
    if by:
        groups = ldf.select(*by).distinct()
        rdf = groups.crossJoin(rdf)  # replicate right per left group
    if fill_method == "ffill":
        # pre-apply pandas' overlap suffixes so side origin stays known,
        # then tag each side (the tag survives the outer join as
        # null-for-gap-rows)
        overlap = (set(ldf.columns) & set(rdf.columns)) - set(by + keys)
        for c in overlap:
            ldf = ldf.withColumnRenamed(c, c + suffixes[0])
            rdf = rdf.withColumnRenamed(c, c + suffixes[1])
        lvals = [c for c in ldf.columns if c not in set(by + keys)]
        rvals = [c for c in rdf.columns if c not in set(by + keys)]
        ldf = ldf.withColumn("__from_l", F.lit(True))
        rdf = rdf.withColumn("__from_r", F.lit(True))
        merged = merge(ldf, rdf, on=by + keys, how="outer", suffixes=suffixes)._df
        merged = _ordered_pack_ffill(merged, keys, by, lvals, rvals)
    else:
        merged = merge(ldf, rdf, on=by + keys, how="outer", suffixes=suffixes)._df
    return Table(merged.orderBy(*by, *keys))


def _ordered_pack_ffill(
    df: DataFrame,
    keys: list[str],
    by: list[str],
    lvals: list[str],
    rvals: list[str],
) -> DataFrame:
    """merge_ordered's indexer-ffill over the merged frame. ``df`` holds
    ``__from_l``/``__from_r`` origin tags (null on gap rows). Side packs
    (structs of the side's value columns, non-null iff the side
    contributed the row) are forward-filled — per ``by`` group when
    grouped, else distributed over range partitions with a
    |partitions|-row carry pass so no global single-partition window
    exists (VERDICT r4 #4; boundary-correct because RangePartitioner
    keeps equal keys in one range)."""
    out_cols = [c for c in df.columns if c not in ("__from_l", "__from_r")]
    packs: list[tuple[str, list[str], str]] = []
    if lvals:
        packs.append(("__pack_l", lvals, "__from_l"))
    if rvals:
        packs.append(("__pack_r", rvals, "__from_r"))
    if not packs:
        return df.select(*out_cols)
    m = df.select(
        *[F.col(c) for c in df.columns],
        *[
            F.when(F.col(flag), F.struct(*[F.col(c) for c in cols])).alias(p)
            for p, cols, flag in packs
        ],
    )

    def unpack(frame: DataFrame, filled: dict[str, Column]) -> DataFrame:
        col_of = {}
        for p, cols, _flag in packs:
            for c in cols:
                col_of[c] = filled[p].getField(c).alias(c)
        return frame.select(
            *[col_of.get(c, F.col(c)) for c in out_cols]
        )

    if by:
        w = (
            Window.partitionBy(*by)
            .orderBy(*keys)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return unpack(
            m, {p: F.last(p, ignorenulls=True).over(w) for p, _c, _f in packs}
        )

    npart = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = m.repartitionByRange(npart, *keys).withColumn(
        "__range_id", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("__range_id")
        .orderBy(*keys)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    running = ranged.select(
        "__range_id",
        *[F.col(c) for c in out_cols if c not in {c2 for _p, cs, _f in packs for c2 in cs}],
        *[F.last(p, ignorenulls=True).over(w_local).alias(p) for p, _c, _f in packs],
    )
    key_struct = F.struct(*[F.col(k) for k in keys])
    carry_out = ranged.groupBy("__range_id").agg(
        *[
            F.max_by(F.col(p), F.when(F.col(p).isNotNull(), key_struct)).alias(p)
            for p, _c, _f in packs
        ]
    )
    w_carry = Window.orderBy("__range_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry_in = carry_out.select(
        "__range_id",
        *[
            F.last(p, ignorenulls=True).over(w_carry).alias(f"__carry_{p}")
            for p, _c, _f in packs
        ],
    )
    filled = running.join(F.broadcast(carry_in), "__range_id", "left")
    return unpack(
        filled,
        {p: F.coalesce(F.col(p), F.col(f"__carry_{p}")) for p, _c, _f in packs},
    )


def cut(
    data: Any,
    column: str,
    bins: list[float],
    labels: list[str] | None = None,
    out_col: str | None = None,
) -> Table:
    """pd.cut with explicit edges → when-chain (codegen'd, null-safe).
    Intervals are (lo, hi] like pandas; values outside the outer edges
    get null. ``labels`` defaults to pandas-style '(lo, hi]' strings."""
    df = _unwrap(data)
    if labels is not None and len(labels) != len(bins) - 1:
        raise ValueError("labels must have len(bins) - 1 entries")
    names = labels or [f"({bins[i]}, {bins[i + 1]}]" for i in range(len(bins) - 1)]
    c = F.col(column)
    expr = None
    for i, name in enumerate(names):
        cond = (c > bins[i]) & (c <= bins[i + 1])
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return Table(df.withColumn(out_col or f"{column}_bin", expr))


def qcut(
    data: Any, column: str, q: int, out_col: str | None = None
) -> Table:
    """pd.qcut: quantile binning via exact percentile CUTPOINTS broadcast
    into a CASE — no global sort / single-reducer ntile, so the plan
    holds at any scale. Bin ids are 0-based like pd.qcut(labels=False)."""
    df = _unwrap(data)
    if q < 1:
        raise ValueError("q must be >= 1")
    c = F.col(column)
    if q == 1:  # single bin — no cutpoints to compute; null in → null bin
        return Table(
            df.withColumn(out_col or f"{column}_qbin", F.when(c.isNotNull(), 0))
        )
    probs = [i / q for i in range(1, q)]
    cuts = df.agg(
        *[F.percentile(column, p).alias(f"__q{i}") for i, p in enumerate(probs)]
    )
    # null input → null bin (pandas qcut gives NaN for NaN; without this
    # guard every `c <= cutpoint` is null and the when-chain falls through
    # to the TOP bin — ADVICE r2, medium)
    expr = F.when(c.isNull(), F.lit(None))
    for i in range(len(probs)):
        expr = expr.when(c <= F.col(f"__q{i}"), i)
    expr = expr.otherwise(len(probs))
    out = df.crossJoin(F.broadcast(cuts)).withColumn(out_col or f"{column}_qbin", expr)
    return Table(out.drop(*[f"__q{i}" for i in range(len(probs))]))


def get_dummies(
    data: Any,
    column: str,
    values: list[str] | None = None,
    prefix: str | None = None,
) -> Table:
    """pd.get_dummies over one categorical column → 0/1 indicator
    columns.

    ``values`` fixes the category set statically (the scale-correct form:
    schema is known at plan time, single narrow projection). When omitted
    the distinct values are collected FIRST — a driver-side action over
    only the distinct set, LIMIT-guarded so a mistyped high-cardinality
    column raises instead of OOMing the driver (VERDICT r2 #6)."""
    df = _unwrap(data)
    if values is None:
        values = sorted(
            r[0]
            for r in _probe_categories(df, column, "get_dummies")
            if r[0] is not None
        )
    p = prefix if prefix is not None else column
    cols = [
        F.when(F.col(column) == v, 1).otherwise(0).alias(f"{p}_{v}") for v in values
    ]
    return Table(df.select("*", *cols))


def crosstab(index: Any, columns: Any, index_col: str, columns_col: str) -> Table:
    """pd.crosstab parity over a single frame: counts of (index, column)
    combinations as a pivot. ``index``/``columns`` is the frame; column
    names passed explicitly (no positional Series in a distributed
    engine). The pivot's dynamic column set is LIMIT-probed first so a
    high-cardinality ``columns_col`` raises a clear error instead of a
    10k-wide schema explosion (VERDICT r2 #6)."""
    df = _unwrap(index)
    vals = sorted(
        r[0] for r in _probe_categories(df, columns_col, "crosstab") if r[0] is not None
    )
    return Table(df.groupBy(index_col).pivot(columns_col, vals).count().na.fill(0))


_MAX_DYNAMIC_CATEGORIES = 10_000


def _probe_categories(df: DataFrame, column: str, op: str) -> list:
    """Distinct values of ``column``, bounded: scans stop after
    ``_MAX_DYNAMIC_CATEGORIES + 1`` distinct values and raise past the
    threshold — dynamic pandas-style schemas are for genuine
    categoricals, not arbitrary keys."""
    rows = df.select(column).distinct().limit(_MAX_DYNAMIC_CATEGORIES + 1).collect()
    if len(rows) > _MAX_DYNAMIC_CATEGORIES:
        raise ValueError(
            f"{op}: column {column!r} has more than {_MAX_DYNAMIC_CATEGORIES} "
            "distinct values; pass values= with an explicit category list "
            "(a dynamic schema this wide would OOM the driver and produce "
            "an unusable table)"
        )
    return rows


def read_excel(spark, path: str, sheet_name: Any = 0, **kwargs: Any) -> Table:
    """pd.read_excel parity — driver-side pandas (openpyxl) then
    createDataFrame; suitable for small config-style workbooks only.
    Gated behind an import-try: the engine works without excel deps."""
    try:
        import pandas as _pd

        pdf = _pd.read_excel(path, sheet_name=sheet_name, **kwargs)
    except ImportError as e:  # openpyxl/xlrd not installed
        raise NotImplementedError(
            "read_excel needs openpyxl/xlrd on the driver; not available in "
            "this environment"
        ) from e
    return Table(spark.createDataFrame(pdf))


_DTYPE_MAP = {
    "int": "int", "int32": "int", "int64": "bigint", "float": "double",
    "float32": "float", "float64": "double", "str": "string", "string": "string",
    "object": "string", "bool": "boolean", "datetime64[ns]": "timestamp",
    "category": "string",
}


def _pandas_dtype_to_spark(dtype: str) -> str:
    return _DTYPE_MAP.get(str(dtype), str(dtype))

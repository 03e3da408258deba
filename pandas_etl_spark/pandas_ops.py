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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pandas_etl_spark.sources import io as _io

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
        by: "str | list[str] | TimeGrouper",
        axis: Any = 0,
        dropna: bool = False,
    ) -> "Grouped":
        """``axis="columns"`` (reference README.md:65) has no distributed
        analogue and is a doc artifact (SURVEY §2.5) — accepted and
        ignored with a warning. ``dropna=False`` matches Spark's default
        (null groups kept)."""
        if axis in ("columns", 1):
            import warnings

            warnings.warn(
                "groupby(axis='columns') has no distributed analogue; grouping rows",
                stacklevel=2,
            )
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

    def dropna(self, how: str = "any", subset: list[str] | None = None) -> "Table":
        return Table(self._df.na.drop(how=how, subset=subset))

    def replace(self, to_replace: Any, value: Any) -> "Table":
        return Table(self._df.na.replace(to_replace, value))

    def drop_duplicates(self, subset: list[str] | None = None) -> "Table":
        return Table(self._df.dropDuplicates(subset))

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
    ) -> "Table":
        """pd.pivot_table → groupBy(index).pivot(columns).agg. Distinct
        pivot values are discovered by Spark (two-pass); pass explicit
        values via .df API when the category set is known."""
        fn, _ = Grouped._AGG_FNS[aggfunc]
        idx = [index] if isinstance(index, str) else list(index)
        out = self._df.groupBy(*idx).pivot(columns).agg(fn(values))
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
        return _io.to_csv(self._df, path_or_buf, header=header)

    def to_parquet(self, path: str, partition_by: list[str] | None = None) -> str:
        return _io.to_parquet(self._df, path, partition_by=partition_by)

    def to_orc(self, path: str, partition_by: list[str] | None = None) -> str:
        return _io.to_orc(self._df, path, partition_by=partition_by)

    def to_sql(self, name: str, con: Any, if_exists: str = "fail", index: bool = False) -> None:
        options = con.jdbc_options() if hasattr(con, "jdbc_options") else con
        _io.to_sql(self._df, name, options, if_exists=if_exists)


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
    if (
        on is None
        and left_on is None
        and spark_how != "cross"
        and not indicator
    ):
        on = [c for c in ldf.columns if c in set(rdf.columns)]  # natural join
        if not on:
            raise ValueError("merge: no common columns and no join keys given")
    if indicator and on is None:
        raise ValueError("merge(indicator=True) requires on=")
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
        out = lflag.join(rflag, on=keys, how=spark_how)
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
    if q == 1:  # single bin — no cutpoints to compute
        return Table(df.withColumn(out_col or f"{column}_qbin", F.lit(0)))
    probs = [i / q for i in range(1, q)]
    cuts = df.agg(
        *[F.percentile(column, p).alias(f"__q{i}") for i, p in enumerate(probs)]
    )
    c = F.col(column)
    expr = None
    for i in range(len(probs)):
        cond = c <= F.col(f"__q{i}")
        expr = F.when(cond, i) if expr is None else expr.when(cond, i)
    expr = expr.otherwise(len(probs)) if expr is not None else F.lit(0)
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
    only the distinct set; fine for genuine categoricals, documented as
    the price of pandas' dynamic schema."""
    df = _unwrap(data)
    if values is None:
        values = sorted(
            r[0] for r in df.select(column).distinct().collect() if r[0] is not None
        )
    p = prefix if prefix is not None else column
    cols = [
        F.when(F.col(column) == v, 1).otherwise(0).alias(f"{p}_{v}") for v in values
    ]
    return Table(df.select("*", *cols))


def crosstab(index: Any, columns: Any, index_col: str, columns_col: str) -> Table:
    """pd.crosstab parity over a single frame: counts of (index, column)
    combinations as a pivot. ``index``/``columns`` is the frame; column
    names passed explicitly (no positional Series in a distributed engine)."""
    df = _unwrap(index)
    return Table(
        df.groupBy(index_col).pivot(columns_col).count().na.fill(0)
    )


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

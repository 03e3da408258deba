"""As-of join (``pd.merge_asof`` parity — SURVEY §2.4).

Spark has no native as-of join. The classic scalable plan (used here):
**union-tag + running last**:

1. tag right rows side=0, left rows side=1;
2. union by name, window over ``partitionBy(by).orderBy(on, side)``;
3. each left row reads ``last(right_value, ignorenulls=True)`` over the
   running frame — the most recent right row at-or-before its key
   (``direction='backward'``, pandas default; ties: right row sorts
   first, so an equal timestamp matches, like merge_asof);
4. filter side=1.

Cost: ONE shuffle on the ``by`` key + one in-partition sort — no range
explosion, no per-group Python. This beats pandas-on-Spark's
``merge_asof`` (which repartition-broadcasts) and stays correct under
skew (AQE splits hot ``by`` keys).

``direction='forward'`` mirrors with a reversed ordering.
``direction='nearest'`` unions the right side TWICE (side 0 feeding a
backward scan, side 2 feeding a forward scan — equal keys stay inclusive
on both sides), still one shuffle+sort, then picks the closer match per
row (ties → backward, as pandas). ``tolerance`` nulls out matches
farther than the given distance (seconds for timestamps, plain units
for numerics) — applied per direction BEFORE the nearest choice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _dist(a: Column, b: Column) -> Column:
    return a.cast("double") - b.cast("double")


def _keyless_scan(
    unioned: DataFrame,
    order_cols: list[Column],
    b_cols: list[str],
    f_cols: list[str],
) -> DataFrame:
    """Running ``last``/``first`` (ignorenulls) over a TOTAL order with
    NO ``by`` key — without the single-partition window a bare
    ``Window.orderBy`` would force (one task holding every row; fatal
    at 100 TB). Same three-step stitch as ``operators.prefix``:

    1. range-repartition on the order (partition i entirely before
       i+1), pinned by localCheckpoint so every downstream job sees
       identical boundaries;
    2. per-partition scan (windows PARTITIONED by partition id —
       parallel): ``b_cols`` get the running last-non-null, ``f_cols``
       the running first-non-null;
    3. stitch across boundaries with a |partitions|-row carry frame:
       each partition's closing (for backward) / opening (for forward)
       scan value, cumulated by a window over that tiny frame — the
       ONLY unpartitioned window left, bounded at #partitions rows —
       broadcast-joined back and coalesced under the local scan.
    """
    spark = unioned.sparkSession
    n = spark.sparkContext.defaultParallelism
    ranged = (
        unioned.repartitionByRange(n, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    wloc = W.partitionBy("__pid").orderBy(*order_cols)
    wb = wloc.rowsBetween(W.unboundedPreceding, 0)
    wf = wloc.rowsBetween(0, W.unboundedFollowing)
    out = ranged
    for c in b_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(wb))
    for c in f_cols:
        out = out.withColumn(c, F.first(c, ignorenulls=True).over(wf))
    out = out.withColumn("__rn", F.row_number().over(wloc))
    # one row per partition: its closing backward / opening forward value
    carry = out.groupBy("__pid").agg(
        *[F.max_by(F.col(c), F.col("__rn")).alias(c) for c in b_cols],
        *[F.min_by(F.col(c), F.col("__rn")).alias(c) for c in f_cols],
    )
    wprev = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    wnext = W.orderBy("__pid").rowsBetween(1, W.unboundedFollowing)
    fix = carry.select(
        "__pid",
        *[
            F.last(c, ignorenulls=True).over(wprev).alias(f"__fix_{c}")
            for c in b_cols
        ],
        *[
            F.first(c, ignorenulls=True).over(wnext).alias(f"__fix_{c}")
            for c in f_cols
        ],
    )
    res = out.join(F.broadcast(fix), "__pid", "left")
    for c in b_cols + f_cols:
        res = res.withColumn(
            c, F.coalesce(F.col(c), F.col(f"__fix_{c}"))
        ).drop(f"__fix_{c}")
    return res.drop("__pid", "__rn")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_right",
    tolerance: float | None = None,
) -> DataFrame:
    """Left as-of join: every left row + the nearest right row at-or-before
    (backward) / at-or-after (forward) / closest either way (nearest) its
    ``on`` value, per ``by`` group.

    Right value columns are suffixed; the matched right ``on`` value is
    exposed as ``{on}{suffix}``.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward' or 'nearest'")
    if direction == "nearest":
        return _asof_nearest(left, right, on, by, suffix, tolerance)
    by_keys = [by] if isinstance(by, str) else list(by or [])

    rvalue_cols = [c for c in right.columns if c != on and c not in by_keys]
    # suffix only names that collide with the left; right's `on` is always
    # exposed suffixed (the matched key)
    out_name = {c: (f"{c}{suffix}" if c in left.columns else c) for c in rvalue_cols}
    out_name[on] = f"{on}{suffix}"

    l = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(out_name[c])
            for c in rvalue_cols + [on]
        ],
    )
    r = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in by_keys and c != on
        ],
        *[F.col(k) for k in by_keys],
        F.col(on),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(out_name[c]) for c in rvalue_cols],
        F.col(on).alias(out_name[on]),
    )
    unioned = l.unionByName(r)

    order = [F.col(on).asc(), F.col("__side").asc()]
    if direction == "forward":
        # nearest at-or-after: reverse the scan; side still sorts right-first
        order = [F.col(on).desc(), F.col("__side").asc()]
    targets = [out_name[c] for c in rvalue_cols + [on]]
    if by_keys:
        w = (
            W.partitionBy(*by_keys)
            .orderBy(*order)
            .rowsBetween(W.unboundedPreceding, 0)
        )
        matched = unioned.select(
            *[c for c in left.columns],
            "__side",
            *[
                F.last(t, ignorenulls=True).over(w).alias(t)
                for t in targets
            ],
        )
    else:
        # no by key: the scan order is global — range-partitioned
        # stitch instead of a single-partition window
        matched = _keyless_scan(unioned, order, targets, [])
    out = matched.filter(F.col("__side") == 1).drop("__side")
    if tolerance is not None:
        far = F.abs(_dist(F.col(on), F.col(out_name[on]))) > F.lit(float(tolerance))
        out = out.select(
            *[c for c in left.columns],
            *[
                F.when(far, F.lit(None)).otherwise(F.col(out_name[c])).alias(out_name[c])
                for c in rvalue_cols + [on]
            ],
        )
    return out


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str] | None,
    suffix: str,
    tolerance: float | None,
) -> DataFrame:
    by_keys = [by] if isinstance(by, str) else list(by or [])
    rvalue_cols = [c for c in right.columns if c != on and c not in by_keys]
    out_name = {c: (f"{c}{suffix}" if c in left.columns else c) for c in rvalue_cols}
    out_name[on] = f"{on}{suffix}"
    scan_cols = rvalue_cols + [on]

    def nulls(prefix: str) -> list[Column]:
        return [
            F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{out_name[c]}")
            for c in scan_cols
        ]

    def vals(prefix: str) -> list[Column]:
        return [F.col(c).alias(f"{prefix}{out_name[c]}") for c in scan_cols]

    l = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__side"),
        *nulls("__b_"),
        *nulls("__f_"),
    )

    def right_side(side: int, live: str, dead: str):
        return right.select(
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in left.columns
                if c not in by_keys and c != on
            ],
            *[F.col(k) for k in by_keys],
            F.col(on),
            F.lit(side).alias("__side"),
            *(vals(live) if side == 0 else nulls(live)),
            *(nulls(dead) if side == 0 else vals(dead)),
        )

    # side 0 carries backward-scan values, side 2 forward-scan values;
    # ordering (on, side) keeps equal keys inclusive for BOTH scans
    unioned = l.unionByName(right_side(0, "__b_", "__f_")).unionByName(
        right_side(2, "__b_", "__f_")
    )
    nearest_order = [F.col(on).asc(), F.col("__side").asc()]
    if by_keys:
        base = W.partitionBy(*by_keys).orderBy(*nearest_order)
        wb = base.rowsBetween(W.unboundedPreceding, 0)
        wf = base.rowsBetween(0, W.unboundedFollowing)
        scanned = unioned.select(
            *[c for c in left.columns],
            "__side",
            *[
                F.last(f"__b_{out_name[c]}", ignorenulls=True).over(wb).alias(f"__b_{out_name[c]}")
                for c in scan_cols
            ],
            *[
                F.first(f"__f_{out_name[c]}", ignorenulls=True).over(wf).alias(f"__f_{out_name[c]}")
                for c in scan_cols
            ],
        ).filter(F.col("__side") == 1)
    else:
        scanned = _keyless_scan(
            unioned,
            nearest_order,
            [f"__b_{out_name[c]}" for c in scan_cols],
            [f"__f_{out_name[c]}" for c in scan_cols],
        ).filter(F.col("__side") == 1)

    b_on, f_on = F.col(f"__b_{out_name[on]}"), F.col(f"__f_{out_name[on]}")
    b_dist = _dist(F.col(on), b_on)
    f_dist = _dist(f_on, F.col(on))
    if tolerance is not None:
        tol = F.lit(float(tolerance))
        b_ok = b_on.isNotNull() & (b_dist <= tol)
        f_ok = f_on.isNotNull() & (f_dist <= tol)
    else:
        b_ok, f_ok = b_on.isNotNull(), f_on.isNotNull()
    # pick backward on ties (pandas nearest semantics)
    use_back = b_ok & (~f_ok | (b_dist <= f_dist))
    return scanned.select(
        *[c for c in left.columns],
        *[
            F.when(use_back, F.col(f"__b_{out_name[c]}"))
            .when(f_ok, F.col(f"__f_{out_name[c]}"))
            .alias(out_name[c])
            for c in scan_cols
        ],
    )

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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every left row + the nearest right row at-or-before
    (backward) / at-or-after (forward) its ``on`` value, per ``by`` group.

    Right value columns are suffixed; the matched right ``on`` value is
    exposed as ``{on}{suffix}``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
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
    w = W.partitionBy(*by_keys).orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    matched = unioned.select(
        *[c for c in left.columns],
        "__side",
        *[
            F.last(out_name[c], ignorenulls=True).over(w).alias(out_name[c])
            for c in rvalue_cols + [on]
        ],
    )
    return matched.filter(F.col("__side") == 1).drop("__side")

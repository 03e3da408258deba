"""Gap-based sessionization — the shared lag/cumsum core.

Review r5 #7: the 30-minute-gap boundary logic was hand-copied in three
catalog queries and the copies had already drifted (one cumsum window
lost its event_id tie-break, making session assignment nondeterministic
for a user with duplicate timestamps). One implementation, every
consumer; the matching oracle SQL keeps the SAME (ts, tiebreak) order
in BOTH windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from pandas_etl_spark.functions.timeparse import ts_seconds


def with_session_ids(
    df: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Attach a per-user ``session_id`` (bigint, 1-based) via the classic
    lag-gap flag + running sum. BOTH windows order by
    (``ts_col``, *tiebreak) — a deterministic total order per user is
    what makes session assignment reproducible when timestamps tie.
    One shuffle on ``user_col`` shared by both windows and any
    downstream per-session aggregate. NTZ-robust epoch math
    (:func:`ts_seconds`)."""
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak]]
    w = W.partitionBy(user_col).orderBy(*order)
    ts_s = ts_seconds(ts_col)
    gap = ts_s - F.lag(ts_s).over(w)
    flagged = df.withColumn(
        "__new_sess", F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    )
    ws = W.partitionBy(user_col).orderBy(*order).rowsBetween(
        W.unboundedPreceding, 0
    )
    return flagged.withColumn(
        "session_id", F.sum("__new_sess").over(ws).cast("bigint")
    ).drop("__new_sess")

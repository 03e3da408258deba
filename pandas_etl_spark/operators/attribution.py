"""Markov-chain (removal-effect) multi-touch attribution.

The data-driven complement of the positional rules in
catalog/analytics.py (last-touch, linear): model each user journey as a
first-order Markov chain over channel states with absorbing CONV /
NULL states; a channel's credit is its REMOVAL EFFECT — the relative
drop in overall conversion probability when every transition into the
channel is redirected to NULL (Anderl et al. 2014's standard
formulation).

Scale split: the heavy part — sessionizing journeys and counting
transitions — is fully distributed (one user_id shuffle; lead windows
over it). The transition matrix itself is |channels|² (single digits
squared), so the absorption solve ``(I - Q) t = b`` happens driver-side
on that bounded matrix — the same bounded-driver-state pattern as the
PQ/IVF codebooks. There is no SQL oracle: a linear solve has no
reasonable ANSI-SQL spelling, so the catalog entry is rows-only and the
math is pinned by hand-computed unit tests instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

START, CONV, NULL = "__start__", "__conv__", "__null__"


def journey_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_cols: tuple[str, ...] = ("ts", "event_id"),
    channel_col: str = "event_type",
    conversion: str = "purchase",
) -> DataFrame:
    """(src, dst, n) transition counts over per-user journeys.

    A journey is the event sequence up to and including the user's
    FIRST ``conversion`` event (later touches belong to a converted
    user's next cycle and are dropped — the conventional single-
    conversion chain). Channel touches are the non-conversion events;
    START precedes the first touch, the touch before the conversion
    transitions to CONV, and a journey with no conversion ends in NULL.
    One user_id shuffle; both windows and the pre-aggregation reuse it.
    """
    w = Window.partitionBy(user_col).orderBy(*[F.col(c) for c in ts_cols])
    is_conv = (F.col(channel_col) == conversion).cast("int")
    seq = df.withColumn(
        "__prior_convs",
        F.sum(is_conv).over(w.rowsBetween(Window.unboundedPreceding, -1)),
    ).filter(F.coalesce(F.col("__prior_convs"), F.lit(0)) == 0)
    # state per event: channel name, or CONV for the conversion itself
    state = F.when(F.col(channel_col) == conversion, F.lit(CONV)).otherwise(
        F.col(channel_col)
    )
    labeled = seq.withColumn("__state", state)
    w2 = Window.partitionBy(user_col).orderBy(*[F.col(c) for c in ts_cols])
    hops = labeled.select(
        F.coalesce(F.lag("__state").over(w2), F.lit(START)).alias("src"),
        F.col("__state").alias("dst"),
        F.lead("__state").over(w2).alias("next_state"),
    )
    # terminal NULL hop for journeys that never convert
    tail = hops.filter(
        F.col("next_state").isNull() & (F.col("dst") != CONV)
    ).select(F.col("dst").alias("src"), F.lit(NULL).alias("dst"))
    edges = hops.select("src", "dst").unionByName(tail)
    return edges.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


def markov_attribution(
    df: DataFrame,
    user_col: str = "user_id",
    ts_cols: tuple[str, ...] = ("ts", "event_id"),
    channel_col: str = "event_type",
    conversion: str = "purchase",
) -> DataFrame:
    """(channel, removal_effect, attribution) — removal effect of each
    channel on the chain's absorption probability into CONV, normalized
    to attribution shares. Transition counts are distributed; the
    bounded |channels|² solve is driver-side numpy."""
    import numpy as np

    counts = journey_transitions(
        df, user_col, ts_cols, channel_col, conversion
    ).collect()
    channels = sorted(
        {r.src for r in counts if r.src not in (START,)}
        | {r.dst for r in counts if r.dst not in (CONV, NULL)}
    )
    states = [START, *channels]
    idx = {s: i for i, s in enumerate(states)}
    n = len(states)
    q = np.zeros((n, n))  # state -> state
    b = np.zeros(n)  # state -> CONV
    tot = np.zeros(n)
    for r in counts:
        if r.src not in idx:
            continue
        tot[idx[r.src]] += r.n
        if r.dst == CONV:
            b[idx[r.src]] += r.n
        elif r.dst in idx:
            q[idx[r.src], idx[r.dst]] += r.n
    with np.errstate(invalid="ignore", divide="ignore"):
        q = np.where(tot[:, None] > 0, q / np.where(tot == 0, 1, tot)[:, None], 0.0)
        b = np.where(tot > 0, b / np.where(tot == 0, 1, tot), 0.0)

    def absorb(drop: int | None) -> float:
        qq, bb = q.copy(), b.copy()
        if drop is not None:
            # removal: transitions INTO the channel go to NULL instead
            qq[:, drop] = 0.0
            qq[drop, :] = 0.0
            bb[drop] = 0.0
        t = np.linalg.solve(np.eye(n) - qq, bb)
        return float(t[idx[START]])

    p_full = absorb(None)
    rows = []
    for c in channels:
        p_wo = absorb(idx[c]) if p_full > 0 else 0.0
        re = 0.0 if p_full <= 0 else max(0.0, 1.0 - p_wo / p_full)
        rows.append((c, re))
    total_re = sum(re for _, re in rows)
    out = [
        (
            c,
            round(re, 6),
            round(re / total_re, 6) if total_re > 0 else 0.0,
        )
        for c, re in rows
    ]
    return df.sparkSession.createDataFrame(
        out, "channel string, removal_effect double, attribution double"
    )

"""Skew-mitigation operators (SURVEY "Partitioning & shuffle").

AQE's skew-join splitting handles most cases automatically
(``spark.sql.adaptive.skewJoin.enabled`` is on in our session), and
measurably better: the r5 crossover study (SCALE.md "skew crossover",
scripts/skew_stress_eval.py) found an engaged AQE split 1.3-2.6x faster
than the best salted variant at 44-75% hot-key share, because salting
replicates the whole build side n* while AQE splits only the skewed
partitions. Check ``skewedPartitionThresholdInBytes`` against actual
partition sizes before reaching for these. The explicit tools cover the
shapes AQE can't fix (skewed aggregations, full-outer joins, stateful
streaming joins where AQE is off):

- **salted_aggregate**: a groupBy whose hot key overwhelms one reducer.
  Two-phase: group on (key, salt) with partial aggregates, then merge
  partials per key. Correct only for algebraic aggregates — the helper
  takes (partial, merge) expression pairs.
- **salted_join**: a large⋈large equi-join with a hot key on the LEFT:
  left rows get a random-ish deterministic salt in [0, n); the right side
  is replicated n× so every (key, salt) bucket finds its match. Use when
  the right side is too big to broadcast but the hot-key fan-out is the
  bottleneck.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n: int, cols: list[str] | None = None) -> DataFrame:
    """Deterministic salt in [0, n): hash of the row's columns (default:
    all) — reproducible, unlike rand()."""
    basis = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn("__salt", F.pmod(F.hash(*basis), F.lit(n)))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partials: dict[str, tuple[Column, Column]],
    n: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partials[name] = (partial_expr, merge_expr)`` where ``partial_expr``
    aggregates raw rows (phase 1, keyed by keys+salt) and ``merge_expr``
    combines the partial column ``name`` (phase 2, keyed by keys).

    Example — count + sum + max:
        salted_aggregate(df, ["k"], {
            "n":   (F.count(F.lit(1)), F.sum("n")),
            "tot": (F.sum("v"),        F.sum("tot")),
            "mx":  (F.max("v"),        F.max("mx")),
        })
    """
    salted = with_salt(df, n)
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, (expr, _) in partials.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in partials.items()]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (hot) left, replicate the right n×.

    The shuffle key becomes (on..., salt) — a hot key's rows spread over
    n reducers instead of one. Right-side replication costs n× its
    shuffle volume: keep n minimal and prefer AQE/broadcast first.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lsalted = with_salt(left, n, keys + [c for c in left.columns if c not in keys][:2])
    rrep = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    )
    out = lsalted.join(rrep, keys + ["__salt"], how)
    return out.drop("__salt")


def zipf_fact_dim(spark, n_fact: int, n_dim: int, exponent: float = 0.8,
                  pad_bytes: int = 120):
    """Deterministic zipf-keyed synthetic (fact, dim) pair for skew
    studies — the ONE builder behind the skew_zipf_join_* catalog pair
    and scripts/skew_stress_eval.py (review r5 #8: two hand-copies of
    these expressions would silently invalidate the SCALE.md
    comparison).

    The uniform driver is ``((i % 2^31) * 2654435761) % 2^31`` — the
    mod-BEFORE-multiply form is residue-identical to ``(i * c) % 2^31``
    (modular arithmetic) but keeps the intermediate ≤ (2^31-1)·c <
    2^63 for ANY row count, where the naive product overflows int64
    once n_fact exceeds ~3.5e9 (review r5 #6: DuckDB would raise,
    non-ANSI Spark would silently wrap). P[k=1] = 1 - 2^(-1/exponent).
    The ``pad_bytes`` filler pushes the dim past the broadcast
    threshold at bench scale so the join genuinely shuffles."""
    u = (
        (F.col("id") % F.lit(2147483648)) * F.lit(2654435761)
    ) % F.lit(2147483648) / F.lit(2147483648.0)
    fact = spark.range(1, n_fact + 1).select(
        F.least(
            F.lit(n_dim),
            F.floor(F.pow(F.lit(1.0) - u, F.lit(-exponent))).cast("bigint"),
        ).alias("k"),
        (F.col("id") % 1000).alias("v"),
    )
    dim = spark.range(1, n_dim + 1).select(
        F.col("id").alias("k"),
        (F.col("id") % 50).alias("attr"),
        F.rpad(F.lit("x"), pad_bytes, "x").alias("pad"),
    )
    return fact, dim

"""Deterministic content-hash sampling (SURVEY §2.3 extension).

``TABLESAMPLE`` / ``df.sample(seed)`` choose rows by partition-dependent
RNG streams — the sample CHANGES when the input repartitions, and no
other engine reproduces it. Hashing a stable key instead gives a sample
that is identical across engines, runs, partitionings, and appends
(a row's membership never changes), which is what pipeline debugging,
A/B slices, and corpus rebalancing actually need.

Both operators are narrow filters: no shuffle, full predicate/column
pushdown around them, linear scan cost at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


_MODULUS = 1 << 32  # 8 md5 hex chars: keep-rate granularity 2^-32, bias ≤ 2.4e-8


def _threshold(fraction: float) -> int:
    return int(round(fraction * _MODULUS))


def _bucket(key: str, modulus: int) -> Column:
    """md5-derived bucket in [0, modulus) — portable: DuckDB's
    ``CAST('0x'||substring(md5(k),1,8) AS BIGINT)`` computes the same.
    8 hex chars (32 bits) before the modulus keep the residual bucket
    bias below 2.4e-8 relative (ADVICE r2: 4 chars % 100 skewed buckets
    0-35 by ~0.15%)."""
    return F.expr(
        f"cast(conv(substring(md5(cast({key} as string)), 1, 8), 16, 10) as bigint) % {modulus}"
    )


def hash_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by md5 bucket of ``key``
    (granularity 2^-32)."""
    return df.filter(_bucket(key, _MODULUS) < _threshold(fraction))


def hash_sample_by(
    df: DataFrame,
    key: str,
    strata_col: str,
    rates: dict[str, float],
    default: float = 0.0,
) -> DataFrame:
    """``df.sampleBy`` with deterministic membership: per-stratum keep
    rates (granularity 2^-32), ``default`` for unlisted strata."""
    rate = F.lit(_threshold(default))
    for stratum, frac in sorted(rates.items()):
        rate = (
            F.when(F.col(strata_col) == stratum, _threshold(frac))
            .otherwise(rate)
        )
    return df.filter(_bucket(key, _MODULUS) < rate)


def dataset_split(
    df: DataFrame,
    key: str,
    fractions: tuple[float, float] = (0.8, 0.1),
    names: tuple[str, str, str] = ("train", "val", "test"),
) -> DataFrame:
    """Deterministic train/val/test assignment by content hash of
    ``key``: the md5 bucket space is cut at ``fractions[0]`` and
    ``fractions[0] + fractions[1]``; the remainder is the third split.
    A row's split NEVER changes under repartitioning, appends, or
    re-runs (unlike randomSplit), so the eval set is stable across
    pipeline versions — the property decontamination and honest evals
    depend on. Narrow projection: no shuffle, pushdown-transparent."""
    t1 = _threshold(fractions[0])
    t2 = _threshold(fractions[0] + fractions[1])
    b = _bucket(key, _MODULUS)
    return df.withColumn(
        "split",
        F.when(b < t1, names[0]).when(b < t2, names[1]).otherwise(names[2]),
    )


def mixture_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    target_weights: dict[str, float],
) -> DataFrame:
    """Rebalance a corpus toward target mixture weights by deterministic
    down-sampling (the domain/language-mixture step of training-data
    curation, cf. Pile/ROOTS mixture tables). For stratum ``s``::

        keep_frac(s) = min(1.0, w_s * N_total / N_s)

    i.e. the largest sample preserving the target PROPORTIONS without
    up-sampling. Strata absent from ``target_weights`` are dropped.

    Plan: one tiny groupBy(strata) count (broadcast back), then a narrow
    md5-bucket filter — membership is stable across runs/partitionings.
    The counts frame is |strata| rows; the broadcast join adds no wide
    shuffle at any corpus size."""
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n_stratum"))
    # total via tree-aggregated 1-row frame + cross join — an empty
    # partitionBy() window would move EVERY stratum row to one partition,
    # a bottleneck when strata cardinality is data-driven
    total = counts.agg(F.sum("__n_stratum").alias("__n_total"))
    counts = counts.crossJoin(F.broadcast(total))
    # default weight 0.0, NOT null: least() skips nulls in both engines,
    # so a null weight would KEEP unlisted strata instead of dropping them
    w = F.lit(0.0)
    for stratum, weight in sorted(target_weights.items()):
        w = F.when(F.col(strata_col) == stratum, F.lit(float(weight))).otherwise(w)
    # keep expression order identical to the documented formula so a SQL
    # oracle computing `least(1.0, w * n_total / n_stratum)` is bit-equal
    keep_frac = F.least(
        F.lit(1.0), w * F.col("__n_total") / F.col("__n_stratum")
    )
    thresh = F.floor(keep_frac * F.lit(float(_MODULUS))).cast("bigint")
    # per-stratum threshold frame: cardinality = distinct strata in the
    # DATA (not the target dict) — unbounded in general, so no broadcast
    # hint; AQE broadcasts when actually small
    enriched = df.join(
        counts.withColumn("__thresh", thresh).select(strata_col, "__thresh"),
        strata_col,
    )
    return (
        enriched.filter(_bucket(key, _MODULUS) < F.col("__thresh"))
        .drop("__thresh")
    )


def temperature_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-based mixture resampling — the multilingual-corpus
    balancing rule of mT5/XLM-R (Xue et al. 2021 §3.2; Conneau et al.
    2020 §3): target weights are DERIVED from the data instead of
    supplied, ``w_s ∝ p_s^alpha`` with ``p_s = n_s/N``, so ``alpha<1``
    flattens the head and upweights tail strata. The keep rule is then
    :func:`mixture_sample`'s: ``keep_frac(s) = min(1, w_s·N/n_s)`` via
    the stable md5-bucket filter.

    Plan: two tiny aggregates over the |strata|-row counts frame (the
    p^alpha normalizer needs a second 1-row sum), both broadcast back;
    the corpus itself sees one narrow filter — no wide shuffle at any
    size. Expression order matches the SQL oracle for bit-parity.
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n_stratum"))
    total = counts.agg(F.sum("__n_stratum").alias("__n_total"))
    counts = counts.crossJoin(F.broadcast(total))
    counts = counts.withColumn(
        "__pa",
        F.pow(
            F.col("__n_stratum") / F.col("__n_total"), F.lit(float(alpha))
        ),
    )
    z = counts.agg(F.sum("__pa").alias("__z"))
    counts = counts.crossJoin(F.broadcast(z))
    keep_frac = F.least(
        F.lit(1.0),
        (F.col("__pa") / F.col("__z"))
        * F.col("__n_total")
        / F.col("__n_stratum"),
    )
    thresh = F.floor(keep_frac * F.lit(float(_MODULUS))).cast("bigint")
    enriched = df.join(
        counts.withColumn("__thresh", thresh).select(strata_col, "__thresh"),
        strata_col,
    )
    return (
        enriched.filter(_bucket(key, _MODULUS) < F.col("__thresh"))
        .drop("__thresh")
    )


def shuffle_shards(
    df: DataFrame,
    key: str,
    n_shards: int = 8,
    seed: int = 42,
    by: tuple[str, ...] = (),
) -> DataFrame:
    """Deterministic sharded corpus shuffle — the reproducible
    training-order primitive: every row gets a ``shard`` in
    [0, n_shards) and a 1-based ``shard_pos`` within its shard, both
    functions ONLY of (seed, key). Reading shards in order yields the
    same globally-shuffled training order on every run, engine, and
    partitioning of the input (unlike ``df.orderBy(rand(seed))``,
    whose RNG stream is partition-dependent), and a seed change is a
    fresh epoch permutation.

    Order is by the md5 hex of ``"{seed}:{key}"`` (ties — impossible
    for distinct keys — break on the key). Scale shape: the shard id
    is the shuffle/write-partition key, so ordering is ``n_shards``
    independent per-shard window sorts (one hash shuffle), never a
    single-partition global sort; at 100 TB, size n_shards so a shard
    fits an executor's sort spill budget (e.g. 10k shards × 10 GB).
    Portable: DuckDB computes the identical order via
    ``md5(concat(seed, ':', CAST(key AS VARCHAR)))``. ``by`` adds
    extra partition columns so the permutation is independent per
    group (e.g. per curriculum stage)."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(key).cast("string")))
    out = df.withColumn("__shuffle_h", h).withColumn(
        "shard",
        F.expr("cast(conv(substring(__shuffle_h, 1, 8), 16, 10) as bigint)")
        % F.lit(n_shards),
    )
    w = Window.partitionBy(*by, "shard").orderBy(F.asc("__shuffle_h"), F.asc(key))
    return (
        out.withColumn("shard_pos", F.row_number().over(w).cast("bigint"))
        .drop("__shuffle_h")
    )


def weighted_sample_ares(
    df: DataFrame, key: str, weight: Column, k: int
) -> DataFrame:
    """Efraimidis–Spirakis A-Res weighted sampling WITHOUT replacement:
    draw exactly ``k`` rows where inclusion probability scales with
    ``weight`` — each row scores ``u^(1/w)`` with u uniform in (0,1)
    and the k highest scores win. Distributed cost is one
    TakeOrderedAndProject (per-partition top-k, merge k*partitions on
    the driver) — no global sort, no shuffle of the losers.

    Deterministic and engine-portable: u derives from the repo's
    md5-bucket hash as ``(2*h + 1) / 2^33`` (strictly inside (0,1),
    exact double in any engine); the only cross-engine float risk is
    libm pow's last ulp, which would need two scores within ~1e-15 to
    flip the k-boundary. Rows with non-positive weight are excluded
    (their inclusion probability is 0 by definition)."""
    u = (
        _bucket(key, _MODULUS) * F.lit(2) + F.lit(1)
    ).cast("double") / F.lit(8589934592.0).cast("double")
    score = F.pow(u, F.lit(1.0) / weight.cast("double"))
    return (
        df.filter(weight > 0)
        .withColumn("ares_score", score)
        .orderBy(F.col("ares_score").desc(), F.col(key).asc())
        .limit(k)
    )

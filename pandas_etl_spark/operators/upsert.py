"""MERGE/upsert emulation over plain parquet tables.

Delta/Iceberg ``MERGE INTO`` is (transactionally) this exact plan: a
single key-partitioned full-outer join where matched keys take the
update row, unmatched-base rows pass through, and insert-only rows come
from the update side. Without a table format the transactional file
replace is the caller's concern (write to a new snapshot directory and
swap); the relational semantics live here, deterministic and
single-shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def upsert(base: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """Apply ``updates`` onto ``base`` by ``keys``: matched keys take the
    UPDATE row wholesale (SQL MERGE ``WHEN MATCHED THEN UPDATE SET *`` —
    including its nulls, unlike a per-column coalesce), unmatched base
    rows survive, unmatched update rows insert. Schemas must match.

    One shuffle on the keys (both sides hash-partition); no broadcast
    assumption — updates may be any size. Key columns must be non-null
    (enforced: a null key would silently demote an update to an
    insert). Like SQL MERGE, ``updates`` must be key-unique — duplicate
    update keys fan the join out to one output row per duplicate
    (Delta raises 'multiple source rows matched' here; dedup updates
    first with ``exact_dedup``/``drop_duplicates`` when in doubt)."""
    if set(base.columns) != set(updates.columns):
        raise ValueError(
            "upsert: base and updates schemas differ: "
            f"{sorted(set(base.columns) ^ set(updates.columns))}"
        )
    for k in keys:
        if k not in base.columns:
            raise ValueError(f"upsert: key column {k!r} not in schema")
    b = base.select(*[F.col(c).alias(f"__b_{c}") for c in base.columns])
    u = updates.select(*[F.col(c).alias(f"__u_{c}") for c in updates.columns])
    u = u.withColumn("__matched", F.lit(True))
    cond = None
    for k in keys:
        c = b[f"__b_{k}"].eqNullSafe(u[f"__u_{k}"])
        cond = c if cond is None else (cond & c)
    joined = b.join(u, cond, "full_outer")
    take_update = F.col("__matched").isNotNull()

    def out(c: str) -> F.Column:
        upd = F.col(f"__u_{c}")
        if c in keys:
            # fail fast on a null update key (it can't match anything, so
            # it would otherwise emit a phantom null-keyed insert); the
            # check lives INSIDE the output expression — a side column
            # would be pruned unevaluated by Catalyst
            upd = F.when(upd.isNotNull(), upd).otherwise(
                F.raise_error(F.lit(f"upsert: update row has null key {c!r}"))
            )
        return F.when(take_update, upd).otherwise(F.col(f"__b_{c}")).alias(c)

    return joined.select(*[out(c) for c in base.columns])


def cdc_collapse(
    ops: DataFrame,
    keys: list[str],
    seq_cols: list[str],
) -> DataFrame:
    """Collapse a CDC ops log to the LATEST op per key: ``max_by`` on the
    sequence struct — one shuffle on the keys, no window/sort. The log
    must be (keys, seq) unique (every real CDC source — an LSN, a
    binlog position, a kafka (partition, offset) — guarantees this);
    ties would otherwise pick an unspecified row. Emits one row per key
    with the winning row's full payload (op column included — it rides
    in the payload struct, so no op-column parameter is needed here)."""
    payload = [c for c in ops.columns if c not in set(keys)]
    latest = ops.groupBy(*keys).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload]),
            F.struct(*[F.col(c) for c in seq_cols]),
        ).alias("__last")
    )
    return latest.select(
        *keys, *[F.col("__last").getField(c).alias(c) for c in payload]
    )


def cdc_apply(
    base: DataFrame,
    ops: DataFrame,
    keys: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a CDC ops log onto a snapshot: collapse the log to the
    latest op per key (:func:`cdc_collapse`), then upserts (any op but
    ``delete_op``) replace/insert their rows wholesale while keys whose
    LATEST op is a delete drop out — exactly Debezium-style snapshot
    maintenance, the batch/foreachBatch half of a lakehouse CDC sink.

    ``ops`` schema = ``base`` schema + ``op_col`` + ``seq_cols``. Scale
    shape: one key shuffle for the collapse, one key-partitioned
    full-outer join for the merge (via :func:`upsert`), one broadcast-
    friendly anti join for the deletes — deletes are key-only on the
    wire. A delete for an absent key is a no-op, an update for an
    absent key inserts (standard CDC idempotency rules, so replaying a
    compacted log converges)."""
    latest = cdc_collapse(ops, keys, seq_cols)
    upserts = latest.filter(F.col(op_col) != delete_op).select(*base.columns)
    deletes = latest.filter(F.col(op_col) == delete_op).select(*keys)
    return upsert(base, upserts, keys).join(deletes, keys, "left_anti")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Key-level diff of two snapshots: one row per key present in
    either side with ``change_type`` in {added, removed, changed} and
    ``changed_cols`` naming the differing columns (null-safe
    comparison; unchanged keys are dropped). The audit/regression tool
    every ETL rewrite wants: 'what did the new pipeline version change'.

    One key-partitioned full-outer join; the per-column comparison is a
    codegen'd boolean per column, so cost is one pass over the joined
    rows regardless of column count."""
    cols = compare_cols or [c for c in old.columns if c not in set(keys)]
    o = old.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in cols],
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, keys, "full_outer")
    diffs = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
                )
                for c in cols
            ]
        )
    )
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.size(diffs) > 0, F.lit("changed"))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *keys,
            "change_type",
            F.when(F.col("change_type") == "changed", diffs)
            .otherwise(F.array().cast("array<string>"))
            .alias("changed_cols"),
        )
    )


def mv_agg_delta(
    latest_ops: DataFrame,
    old_vals: DataFrame,
    keys: list[str],
    bucket: Column,
    value_col: str = "cents",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Per-bucket (Δcount, Δsum) deltas of a (count, sum(value)) MV from
    a collapsed CDC ops batch: insert → (+1, +new), update →
    (0, new−old), delete of an existing key → (−1, −old); deletes and
    updates of absent keys follow the same idempotency rules as
    :func:`cdc_apply`. ``old_vals`` carries ``keys + __old`` (the
    previous snapshot's value for each key — a keyed lookup, never a
    base rescan). Exact-integer values keep every delta
    order-independent."""
    joined = latest_ops.join(old_vals, keys, "left")
    existed = F.col("__old").isNotNull()
    is_del = F.col(op_col) == delete_op
    return (
        joined.select(
            bucket.alias("bucket"),
            F.when(is_del & existed, -1)
            .when(is_del, 0)
            .when(existed, 0)
            .otherwise(1)
            .cast("bigint")
            .alias("dn"),
            F.when(is_del & existed, -F.col("__old"))
            .when(is_del, 0)
            .otherwise(
                F.col(value_col) - F.coalesce(F.col("__old"), F.lit(0))
            )
            .cast("bigint")
            .alias("dc"),
        )
        .groupBy("bucket")
        .agg(F.sum("dn").alias("dn"), F.sum("dc").alias("dc"))
    )


def mv_merge(mv: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge per-bucket deltas onto a (bucket, n_rows, bal_cents) MV —
    a |MV|-sized full-outer join; buckets emptied by deletes drop
    out."""
    return (
        mv.join(delta, "bucket", "full_outer")
        .select(
            "bucket",
            (
                F.coalesce(F.col("n_rows"), F.lit(0))
                + F.coalesce(F.col("dn"), F.lit(0))
            )
            .cast("bigint")
            .alias("n_rows"),
            (
                F.coalesce(F.col("bal_cents"), F.lit(0))
                + F.coalesce(F.col("dc"), F.lit(0))
            )
            .cast("bigint")
            .alias("bal_cents"),
        )
        .filter(F.col("n_rows") > 0)
    )

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

from pyspark.sql import DataFrame
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

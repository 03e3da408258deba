"""Per-key sequential folds that plain window functions cannot express.

A running sum with a floor (inventory that cannot go negative, credit
balances, token-bucket rate limits) is NOT a prefix sum: the clamp at
each step feeds the next, so ``sum() over (rows unbounded preceding)``
is wrong and pandas users fall back to a Python loop per group. The
scalable Spark shape is ``applyInPandas`` per key — each key's fold is
inherently sequential, but keys are independent, so the job
parallelizes across the key domain (the 100 TB assumption: many keys,
bounded rows per key; a single giant key would serialize that one
group, same as any per-entity state machine).

The fold itself is a vectorized-setup numpy loop (one pass per group,
no per-row Python object churn beyond the scalar accumulator), and the
accumulation order is total (``order_cols`` must be a total order per
key), so results are bit-reproducible — an ANSI-SQL engine replays the
identical sequence with a recursive CTE.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def capped_running_fold(
    df: DataFrame,
    key: str,
    order_cols: list[str],
    delta_col: str,
    floor: float = 0.0,
    out_col: str = "bal",
) -> DataFrame:
    """``bal[i] = max(floor, bal[i-1] + delta[i])`` per ``key`` in
    ``order_cols`` order (bal[-1] = floor). Returns the input columns
    ``key`` + ``order_cols`` + ``delta_col`` plus ``out_col``."""
    out_fields = [key, *order_cols, delta_col, out_col]
    in_df = df.select(key, *order_cols, delta_col)
    schema_parts = []
    for f in in_df.schema.fields:
        schema_parts.append(f"{f.name} {f.dataType.simpleString()}")
    schema_parts.append(f"{out_col} double")
    schema = ", ".join(schema_parts)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        deltas = pdf[delta_col].to_numpy(dtype="float64")
        out = deltas.copy()
        bal = floor
        for i in range(out.shape[0]):
            bal = bal + deltas[i]
            if bal < floor:
                bal = floor
            out[i] = bal
        pdf[out_col] = out
        return pdf[out_fields]

    return in_df.groupBy(key).applyInPandas(fold, schema)

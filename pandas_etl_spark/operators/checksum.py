"""Order-insensitive table fingerprints — the data-release integrity
primitive: a producer publishes (n_rows, xor_hash, min/max key) beside
an exported dataset and any consumer on any engine re-derives the same
fingerprint to verify the copy (the role checksums/manifests play in
DVC/LakeFS-style data versioning — public patterns).

Design constraints that pick the aggregate:
- ORDER-INSENSITIVE: partitioning and scan order must not matter, so
  the combiner must be commutative+associative (XOR here).
- OVERFLOW-FREE at any row count: XOR never carries, unlike a sum that
  wraps differently across engines.
- ENGINE-PORTABLE: row hash is the md5 of a canonical field encoding
  (unit-separator-joined strings), the same convention as the
  operators/sampling bucket — DuckDB reproduces it bit-for-bit.

Caveat (documented, inherent to XOR): a row appearing an EVEN number
of times cancels out of xor_hash; n_rows still changes, so the pair
(n_rows, xor_hash) detects any single-row corruption and all
practical drift, which is the manifest's job. Columns with
engine-specific string forms (floats, timestamps) must be cast/
rounded by the caller first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_hash(cols: list[str]) -> Column:
    """60-bit md5-prefix hash of the canonical row encoding
    (unit-separator-joined string casts; nulls encode as empty —
    callers needing null/empty distinction coalesce first)."""
    joined = ", ".join(f"cast({c} as string)" for c in cols)
    return F.expr(
        "cast(conv(substring(md5(concat_ws('\\u001F', "
        + joined
        + ")), 1, 15), 16, 10) as bigint)"
    )


def table_checksum(
    df: DataFrame, cols: list[str], key_col: str | None = None
) -> DataFrame:
    """1-row fingerprint of ``cols``: (n_rows, xor_hash, and — when
    ``key_col`` is given — key_min/key_max). Pure map-side combine:
    one pass, the shuffle carries one partial row per task."""
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(_rh)").alias("xor_hash"),
    ]
    if key_col is not None:
        aggs += [F.min(key_col).alias("key_min"), F.max(key_col).alias("key_max")]
    return df.withColumn("_rh", row_hash(cols)).agg(*aggs)

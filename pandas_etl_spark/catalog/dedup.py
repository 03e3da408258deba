"""Deduplication catalog queries over ``documents`` (SURVEY §2.9).

exact + n-gram Jaccard carry full DuckDB oracles; MinHash-LSH and SimHash
use engine-specific 64-bit hashing (xxhash64) with no DuckDB equivalent,
so they register as rows-only checks (the driver records the weaker
check; parity for them is covered by unit tests against hand-computed
signatures instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_etl_spark.catalog.registry import query
from pandas_etl_spark.functions import dedup as dd
from pandas_etl_spark.sources import load_table

_DD_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"


@query(
    "dedup_exact",
    oracle=f"""
    WITH fp AS (
        SELECT doc_id, md5({_DD_NORM}) AS fp FROM documents
    ),
    keep AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fp)
    SELECT d.doc_id, d.lang, d.source
    FROM documents d JOIN keep USING (doc_id)
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dd.exact_dedup(d, "text", "doc_id").select("doc_id", "lang", "source")


@query(
    "dedup_groups",
    oracle=f"""
    SELECT md5({_DD_NORM}) AS fp,
           CAST(count(*) AS BIGINT) AS n_dups,
           min(doc_id) AS keeper_id
    FROM documents
    GROUP BY fp
    HAVING count(*) > 1
    """,
)
def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dd.dup_groups(load_table(spark, sf_dir, "documents"), "text", "doc_id")


# n-gram Jaccard: drop "stop-shingles" (shingles present in > max_df docs)
# before the inverted-index self-join — the skew/size control that makes
# the exact algorithm viable at scale. The oracle replicates the filter.
_K = 5
_MAX_DF = 50
_DD_SHINGLES = (
    f"list_distinct(list_transform(generate_series(1, greatest(length({_DD_NORM}) - {_K - 1}, 1)), "
    f"i -> substring({_DD_NORM}, i, {_K})))"
)


@query(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH sh0 AS (
        SELECT doc_id AS id, unnest({_DD_SHINGLES}) AS shingle FROM documents
    ),
    df AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= {_MAX_DF}),
    sh AS (SELECT sh0.id, sh0.shingle FROM sh0 JOIN df USING (shingle)),
    sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
    pairs AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
        FROM sh a JOIN sh b USING (shingle)
        WHERE a.id < b.id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, CAST(shared AS BIGINT) AS shared,
           CAST(sa.n_sh AS BIGINT) AS n_a, CAST(sb.n_sh AS BIGINT) AS n_b,
           CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.id = pairs.id_a
    JOIN sizes sb ON sb.id = pairs.id_b
    WHERE CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) >= 0.5
    """,
)
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dd.ngram_jaccard_pairs(
        d, "text", "doc_id", k=_K, threshold=0.5, max_df=_MAX_DF
    )


@query("minhash_lsh_pairs")
def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64 perms) + LSH(16 bands) near-dup candidates with
    estimated Jaccard ≥ 0.4. Rows-only driver check (xxhash64-based);
    exactness covered by tests/test_dedup.py against brute-force."""
    d = load_table(spark, sf_dir, "documents")
    return dd.minhash_lsh_pairs(
        d, "text", "doc_id", num_perm=64, bands=16, k=5, threshold=0.4
    )


@query("simhash_pairs")
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup pairs (Hamming ≤ 12, 16-bit chunk blocking).
    Rows-only driver check (xxhash64-based)."""
    d = load_table(spark, sf_dir, "documents")
    return dd.simhash_pairs(d, "text", "doc_id", max_hamming=12)

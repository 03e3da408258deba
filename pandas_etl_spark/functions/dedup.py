"""Deduplication operators for large-scale corpora.

Families (all designed shuffle-minimal for 100 TB):

- **exact**: content-hash groupBy. One shuffle on a 16-byte hash — the
  canonical web-scale exact-dedup plan.
- **n-gram Jaccard**: shingle → inverted index self-join → pair Jaccard.
  Exact near-dup; quadratic only within shingle buckets.
- **MinHash + LSH banding**: k hash permutations over shingle hashes,
  banded into buckets; candidate pairs only within equal band buckets —
  the scale path (linear-ish vs quadratic).
- **SimHash**: 64-bit weighted bit-vote signature; near-dup = small
  Hamming distance.

Everything is built-in expressions (codegen'd); the only parameters are
deterministic literals so results are reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from pandas_etl_spark.functions.text import fingerprint

# deterministic MinHash permutation parameters: (a*h + b) mod PRIME
_PRIME = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic LCG-derived (a, b) pairs — no RNG dependency."""
    params = []
    state = seed
    for _ in range(num_perm):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state % (_PRIME - 1)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _PRIME
        params.append((a, b))
    return params


def normalized(col: str = "text") -> F.Column:
    return F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per normalized-content hash.
    Single shuffle on the md5 hash; carries only (hash, id) through the
    shuffle, then semi-joins back for the surviving rows."""
    hashed = df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
    keep = hashed.groupBy("fp").agg(F.min(id_col).alias(id_col)).select(id_col)
    return df.join(keep, id_col, "left_semi")


def dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Duplicate-group report: one row per content hash with >1 member."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keeper_id"))
        .filter(F.col("n_dups") > 1)
    )


def char_shingles(col: str = "text", k: int = 5) -> F.Column:
    """Distinct k-character shingles of the normalized text
    (array<string>). Built via substring over a sequence — codegen'd."""
    norm = rf"regexp_replace(lower(trim({col})), '\\s+', ' ')"
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(length({norm}) - {k - 1}, 1)), "
        f"i -> substring({norm}, i, {k})))"
    )


def word_shingles(col: str = "text", k: int = 3) -> F.Column:
    """Distinct k-word shingles (array<string>)."""
    toks = rf"filter(split(lower(trim({col})), '\\s+'), t -> t <> '')"
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(size({toks}) - {k - 1}, 1)), "
        f"i -> array_join(slice({toks}, i, {k}), ' ')))"
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs (id_a < id_b, jaccard ≥
    threshold).

    Plan: explode distinct shingles → self-equi-join on shingle (the
    inverted index; Catalyst shuffles both sides on the shingle hash) →
    count shared shingles per pair → Jaccard from per-doc shingle counts.
    At scale: hot shingles are the skew risk — drop top-frequency shingles
    (stop-shingles) before the join, like stop-words.
    """
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(char_shingles(text_col, k)).alias("shingle")
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        pairs.join(sizes.withColumnsRenamed({"id": "id_a", "n_sh": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_sh": "n_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("shared").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "shared", "n_a", "n_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """(id, sig array<bigint>) MinHash signatures."""
    params = _perm_params(num_perm, seed)
    base = df.select(
        F.col(id_col).alias("id"),
        F.expr(
            f"transform({_shingle_sql(text_col, k)}, s -> abs(xxhash64(s)))"
        ).alias("h"),
    )
    mins = [
        F.expr(f"array_min(transform(h, x -> pmod(x * {a}L + {b}L, {_PRIME}L)))").alias(
            f"m{i}"
        )
        for i, (a, b) in enumerate(params)
    ]
    sig = base.select("id", *mins)
    return sig.select(
        "id", F.array(*[F.col(f"m{i}") for i in range(num_perm)]).alias("sig")
    )


def _shingle_sql(col: str, k: int) -> str:
    norm = rf"regexp_replace(lower(trim({col})), '\\s+', ' ')"
    return (
        f"array_distinct(transform(sequence(1, greatest(length({norm}) - {k - 1}, 1)), "
        f"i -> substring({norm}, i, {k})))"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs, verified by estimated Jaccard
    (signature agreement rate ≥ threshold).

    Scale path: candidates come only from equal (band, band-hash) buckets
    — the shuffle key is the band hash, so cost is proportional to bucket
    collisions, not N². ``bands`` tunes the S-curve: more bands → recall
    at lower similarity.
    """
    assert num_perm % bands == 0
    rows = num_perm // bands
    sig = minhash_signatures(df, text_col, id_col, num_perm, k, seed)
    banded = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.hash(
                            *[F.col("sig").getItem(b * rows + r) for r in range(rows)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.expr(
        "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))"
    ).cast("double") / F.lit(float(num_perm))
    return (
        cand.withColumn("est_jaccard", agree)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash64(col: str = "text") -> F.Column:
    """64-bit SimHash over whitespace tokens: per token take xxhash64,
    vote +1/−1 per bit weighted by occurrence, sign → bit. Built-in
    expressions only (aggregate over bit positions)."""
    toks = rf"filter(split(lower(trim({col})), '\\s+'), t -> t <> '')"
    th = f"transform({toks}, t -> xxhash64(t))"
    # bit b of the signature = 1 iff sum over tokens of (bit set ? 1 : -1) > 0
    return F.expr(
        "aggregate(sequence(0, 63), 0L, (acc, b) -> "
        f"acc + CASE WHEN aggregate({th}, 0L, "
        "(s, h) -> s + CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) > 0 "
        "THEN shiftleft(1L, b) ELSE 0L END)"
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Blocking: split the 64-bit signature into 4 × 16-bit chunks; any pair
    within Hamming ≤ 3 shares at least one exact chunk (pigeonhole) —
    join per chunk, then verify the full distance. For larger budgets the
    chunk count grows; this implementation uses 4 chunks (exact for
    max_hamming ≤ 3, high-recall heuristic above).
    """
    sig = df.select(F.col(id_col).alias("id"), simhash64(text_col).alias("sim"))
    chunks = sig.select(
        "id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftright(F.col("sim"), 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("id", "sim", F.col("c.chunk").alias("chunk"), F.col("c.val").alias("val"))
    cand = (
        chunks.alias("a")
        .join(chunks.alias("b"), ["chunk", "val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sim").alias("sim_a"),
            F.col("b.sim").alias("sim_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.expr("bit_count(sim_a ^ sim_b)")
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )

"""Text-analysis catalog queries over the ``documents`` table (SURVEY §2.9).

Oracles mirror the exact arithmetic (IEEE doubles, same operation order)
so value-hashes match without tolerance games.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_etl_spark.catalog.registry import ORACLES, query
from pandas_etl_spark.functions import text as tx
from pandas_etl_spark.sources import load_table
from pandas_etl_spark.sources.io import ensure_parallelism

# DuckDB fragments mirroring functions/text.py expressions
_DD_TOKENS = (
    "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> t <> '')"
)
_DD_NTOK = f"len({_DD_TOKENS})"
_DD_PUNCT = (
    "CAST(length(text) - length(regexp_replace(text, '[.,;:!?''\"()\\[\\]{}-]', '', 'g')) AS DOUBLE)"
    " / greatest(length(text), 1)"
)


def _dd_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in tx.LANG_STOPWORDS[lang])
    return f"len(list_filter({_DD_TOKENS}, t -> list_contains([{words}], t)))"


@query(
    "doc_stats",
    oracle=f"""
    SELECT doc_id,
           CAST({_DD_NTOK} AS BIGINT)          AS n_tokens,
           CAST(length(text) AS BIGINT)        AS n_chars_computed,
           {_DD_PUNCT}                         AS punct_ratio,
           CAST({_dd_hits('en')} AS DOUBLE) / greatest({_DD_NTOK}, 1)
                                               AS stopword_ratio_en
    FROM documents
    """,
)
def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        tx.token_count("text").alias("n_tokens"),
        tx.char_count("text").alias("n_chars_computed"),
        tx.punct_ratio("text").alias("punct_ratio"),
        tx.stopword_ratio("text", "en").alias("stopword_ratio_en"),
    )


@query(
    "lang_id",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, lang,
               {_dd_hits('de')} AS h_de, {_dd_hits('en')} AS h_en,
               {_dd_hits('es')} AS h_es, {_dd_hits('fr')} AS h_fr,
               {_dd_hits('zh')} AS h_zh
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN greatest(h_de, h_en, h_es, h_fr, h_zh) = 0 THEN 'und'
                WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr AND h_de >= h_zh THEN 'de'
                WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_zh THEN 'en'
                WHEN h_es >= h_fr AND h_es >= h_zh THEN 'es'
                WHEN h_fr >= h_zh THEN 'fr'
                ELSE 'zh' END AS lang_pred
    FROM h
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID; deterministic alphabetical tie-break."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return d.select("doc_id", "lang", tx.lang_id("text").alias("lang_pred"))


@query(
    "lang_confusion",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, lang,
               {_dd_hits('de')} AS h_de, {_dd_hits('en')} AS h_en,
               {_dd_hits('es')} AS h_es, {_dd_hits('fr')} AS h_fr,
               {_dd_hits('zh')} AS h_zh
        FROM documents
    ),
    pred AS (
        SELECT lang,
               CASE WHEN greatest(h_de, h_en, h_es, h_fr, h_zh) = 0 THEN 'und'
                    WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr AND h_de >= h_zh THEN 'de'
                    WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_zh THEN 'en'
                    WHEN h_es >= h_fr AND h_es >= h_zh THEN 'es'
                    WHEN h_fr >= h_zh THEN 'fr'
                    ELSE 'zh' END AS lang_pred
        FROM h
    )
    SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n,
           round(CAST(count(*) AS DOUBLE) / sum(count(*)) OVER (PARTITION BY lang), 6)
               AS share
    FROM pred GROUP BY lang, lang_pred
    """,
)
def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-metadata audit: confusion matrix of the declared ``lang``
    column vs the content-derived language ID, with each cell's share of
    its declared language — the governance view that catches mislabeled
    corpora before a mixture is sampled by the (untrustworthy) metadata.
    One shuffle on the tiny (lang, lang_pred) grid; the share window runs
    over |langs|² rows."""
    from pyspark.sql import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    counts = (
        d.select("lang", tx.lang_id("text").alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    share = F.col("n") / F.sum("n").over(W.partitionBy("lang"))
    return counts.withColumn("share", F.round(share, 6))


@query(
    "word_freq_topk",
    oracle=f"""
    SELECT word, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest({_DD_TOKENS}) AS word FROM documents)
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 50
    """,
)
def q_word_freq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode (UDTF-class, §2.8) + count + distributed top-k."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return (
        d.select(F.explode(tx.tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(50)
    )


@query(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
    FROM documents
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return d.select("doc_id", tx.fingerprint("text").alias("fp"))


@query(
    "doc_rolling_fingerprint",
    oracle=r"""
    WITH norm AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        FROM documents
    ),
    h AS (
        SELECT doc_id,
               list_transform(generate_series(1, greatest(length(t) - 7, 0)),
                   i -> list_reduce(
                        list_transform(generate_series(0, 7),
                            j -> CAST(unicode(substring(t, i + j, 1)) AS BIGINT)),
                        (a, b) -> (a * 257 + b) % 2147483647)) AS hs
        FROM norm
    )
    SELECT doc_id, array_to_string(list_sort(hs)[1:4], ',') AS min_hashes FROM h
    """,
)
def q_doc_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash fingerprint set (min-sampled winnowing style): the 4
    smallest Rabin–Karp window hashes per doc, emitted as one
    comma-joined string column (scalar output — array columns break the
    driver's row canonicalizer). Oracle since r3: the polynomial fold IS
    portable — DuckDB list_reduce over BIGINT codepoints reproduces
    Spark's aggregate() fold exactly (list_reduce's first-element seed ≡
    an acc=0 fold because h₁ < mod)."""
    from pandas_etl_spark.functions.dedup import normalized

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return d.select("doc_id", normalized("text").alias("_n")).select(
        "doc_id",
        F.array_join(
            F.transform(
                F.slice(F.array_sort(tx.rolling_hashes("_n", window=8)), 1, 4),
                lambda h: h.cast("string"),
            ),
            ",",
        ).alias("min_hashes"),
    )


# derived from the one Spark-side pattern so the engines can never drift
_DD_BPE = tx.BPE_SPLIT_PATTERN.replace("'", "''")


@query(
    "token_count_bpe",
    oracle=f"""
    SELECT doc_id,
           CAST({_DD_NTOK} AS BIGINT) AS n_tokens_ws,
           CAST(len(regexp_extract_all(text, '{_DD_BPE}')) AS BIGINT) AS n_tokens_bpe
    FROM documents
    """,
)
def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-ish-regex token counting (the LLM budget
    signal). The pattern sticks to the RE2 ∩ java.util.regex common
    subset, so Spark and the oracle tokenize identically."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        tx.token_count("text").alias("n_tokens_ws"),
        tx.bpe_token_count("text").alias("n_tokens_bpe"),
    )


@query(
    "quality_score",
    oracle=f"""
    SELECT doc_id,
           0.4 * least(CAST({_DD_NTOK} AS DOUBLE) / 20.0, 1.0)
         + 0.3 * (1.0 - least(({_DD_PUNCT}) * 5, 1.0))
         + 0.3 * least((CAST({_dd_hits('en')} AS DOUBLE) / greatest({_DD_NTOK}, 1)) * 10, 1.0)
           AS quality
    FROM documents
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return d.select("doc_id", tx.quality_score("text").alias("quality"))


@query(
    "chunk_documents",
    oracle="""
    SELECT doc_id,
           CAST(i - 1 AS INTEGER) AS chunk_id,
           substring(text, 1 + (i - 1) * 150, 200) AS chunk_text
    FROM documents,
         unnest(generate_series(1,
             CAST(ceil(CAST(greatest(length(text) - 50, 1) AS DOUBLE) / 150) AS BIGINT)))
         AS t(i)
    """,
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping character chunking (200 chars, 50 overlap)
    — context-window prep for training/RAG. explode(sequence)+substring,
    no Python; rows ∝ corpus chars / stride."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return tx.chunk_documents(d, chunk_size=200, overlap=50)


@query(
    "heavy_hitters",
    oracle=f"""
    WITH toks AS (SELECT unnest({_DD_TOKENS}) AS word FROM documents),
    t AS (SELECT count(*) AS n_total FROM toks)
    SELECT word, CAST(count(*) AS BIGINT) AS n
    FROM toks, t
    GROUP BY word, t.n_total
    HAVING count(*) >= ceil(0.005 * t.n_total)
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (tokens at ≥0.5% corpus frequency) with a
    CANDIDATE-ONLY wide shuffle (operators/frequent.py): local
    Misra–Gries-style pass emits per-partition survivors, pigeonhole
    guarantees completeness, then an exact recount over candidates.
    Same answer as the full groupBy+HAVING (the oracle), without
    shuffling the whole vocabulary."""
    from pandas_etl_spark.operators.frequent import frequent_tokens

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = d.select(F.explode(tx.tokens("text")).alias("word"))
    return frequent_tokens(toks, "word", theta=0.005)


@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id AS id, unnest({_DD_TOKENS}) AS term FROM documents
    ),
    tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
        SELECT id, term, tf,
               round(tf * (ln((n.n + 1.0) / (dfreq.df + 1.0)) + 1.0), 6) AS score
        FROM tf JOIN dfreq USING (term), n
    ),
    ranked AS (
        SELECT id, term, tf, score,
               row_number() OVER (PARTITION BY id ORDER BY score DESC, term) AS rnk
        FROM scored
    )
    SELECT id AS doc_id, term, CAST(tf AS BIGINT) AS tf, score,
           CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-5 TF-IDF terms (smoothed sklearn idf) — document
    keyword extraction, the text-analysis step between token counting
    and embedding. Scores round to 6 decimals BEFORE the rank so
    ordering is engine-stable (driver float rule); tie-break on term."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return tx.tfidf_top_terms(d, "text", "doc_id", k=5)


@query(
    "tfidf_search_topk",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id AS id, unnest({_DD_TOKENS}) AS term FROM documents
    ),
    tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n FROM documents),
    w AS (
        SELECT id, term, tf * (ln((n.n + 1.0) / (dfreq.df + 1.0)) + 1.0) AS w
        FROM tf JOIN dfreq USING (term), n
    ),
    norms AS (SELECT id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY id),
    dots AS (
        SELECT q.id AS query_id, d.id AS neighbor_id, sum(d.w * q.w) AS dot
        FROM w d JOIN w q USING (term)
        WHERE q.id < 3 AND d.id <> q.id
        GROUP BY 1, 2
    ),
    sim AS (
        SELECT query_id, neighbor_id,
               round(dot / (dn.nrm * qn.nrm), 6) AS cos_sim
        FROM dots
        JOIN norms dn ON dn.id = dots.neighbor_id
        JOIN norms qn ON qn.id = dots.query_id
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rn AS BIGINT) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, neighbor_id) AS rn
          FROM sim)
    WHERE rn <= 5
    """,
)
def q_tfidf_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse lexical retrieval (functions/text.tfidf_cosine_topk):
    TF-IDF cosine top-5 per query doc through an inverted-index-shaped
    term join — the classical-search twin of ann_cosine_topk's dense
    path. Cosines round before ranking (engine-stable order)."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return tx.tfidf_cosine_topk(d, "text", "doc_id", n_queries=3, k=5)


@query(
    "bm25_search_topk",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id AS id, unnest({_DD_TOKENS}) AS term FROM documents
    ),
    tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dlen AS (SELECT id, sum(tf) AS dl FROM tf GROUP BY id),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dlen),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    idf AS (
        SELECT term, ln(1.0 + (stats.n - df + 0.5) / (df + 0.5)) AS idf,
               stats.avgdl AS avgdl
        FROM dfreq, stats
    ),
    scored AS (
        SELECT tf.id, tf.term,
               idf.idf * (tf.tf * 2.2)
                   / (tf.tf + 1.2 * (0.25 + 0.75 * dlen.dl / idf.avgdl)) AS s
        FROM tf JOIN dlen USING (id) JOIN idf USING (term)
    ),
    agg AS (
        SELECT q.query_id, scored.id AS neighbor_id, round(sum(s), 6) AS bm25
        FROM scored
        JOIN (SELECT DISTINCT id AS query_id, term FROM tf WHERE id < 3) q
             USING (term)
        WHERE scored.id <> q.query_id
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, bm25, CAST(rn AS BIGINT) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY bm25 DESC, neighbor_id) AS rn
          FROM agg)
    WHERE rn <= 5
    """,
)
def q_bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval (functions/text.bm25_topk, k1=1.2 b=0.75):
    the production lexical ranker alongside the TF-IDF cosine baseline;
    same inverted-index term-join shuffle shape. The oracle inlines
    k1(1-b+b·dl/avgdl) = 1.2(0.25+0.75·dl/avgdl) and (k1+1)=2.2."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return tx.bm25_topk(d, "text", "doc_id", n_queries=3, k=5)


@query(
    "hybrid_search_rrf",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id AS id, unnest({_DD_TOKENS}) AS term FROM documents
    ),
    tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n FROM documents),
    w AS (
        SELECT id, term, tf * (ln((n.n + 1.0) / (dfreq.df + 1.0)) + 1.0) AS w
        FROM tf JOIN dfreq USING (term), n
    ),
    norms AS (SELECT id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY id),
    dots AS (
        SELECT q.id AS query_id, d.id AS neighbor_id, sum(d.w * q.w) AS dot
        FROM w d JOIN w q USING (term)
        WHERE q.id < 3 AND d.id <> q.id
        GROUP BY 1, 2
    ),
    t AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY round(dot / (dn.nrm * qn.nrm), 6) DESC,
                            neighbor_id) AS rn
        FROM dots
        JOIN norms dn ON dn.id = dots.neighbor_id
        JOIN norms qn ON qn.id = dots.query_id
        QUALIFY rn <= 20
    ),
    dlen AS (SELECT id, sum(tf) AS dl FROM tf GROUP BY id),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dlen),
    idf AS (
        SELECT term, ln(1.0 + (stats.n - df + 0.5) / (df + 0.5)) AS idf,
               stats.avgdl AS avgdl
        FROM dfreq, stats
    ),
    bscored AS (
        SELECT tf.id, tf.term,
               idf.idf * (tf.tf * 2.2)
                   / (tf.tf + 1.2 * (0.25 + 0.75 * dlen.dl / idf.avgdl)) AS s
        FROM tf JOIN dlen USING (id) JOIN idf USING (term)
    ),
    b AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY round(sum(s), 6) DESC, neighbor_id) AS rn
        FROM (
            SELECT q.query_id, bscored.id AS neighbor_id, s
            FROM bscored
            JOIN (SELECT DISTINCT id AS query_id, term FROM tf
                  WHERE id < 3) q USING (term)
            WHERE bscored.id <> q.query_id
        )
        GROUP BY query_id, neighbor_id
        QUALIFY rn <= 20
    ),
    fused AS (
        SELECT coalesce(t.query_id, b.query_id) AS query_id,
               coalesce(t.neighbor_id, b.neighbor_id) AS neighbor_id,
               CAST(t.rn AS BIGINT) AS r_tfidf,
               CAST(b.rn AS BIGINT) AS r_bm25,
               round(coalesce(1e0 / (60 + t.rn), 0)
                     + coalesce(1e0 / (60 + b.rn), 0), 6) AS rrf
        FROM t FULL OUTER JOIN b
          ON t.query_id = b.query_id AND t.neighbor_id = b.neighbor_id
    )
    SELECT query_id, neighbor_id, r_tfidf, r_bm25, rrf,
           CAST(rn AS BIGINT) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY rrf DESC, neighbor_id) AS rn
          FROM fused)
    WHERE rn <= 5
    """,
)
def q_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion
    (functions/text.hybrid_rrf_topk): TF-IDF cosine and Okapi BM25
    each retrieve to depth 20 per query, candidates fuse by
    Σ 1/(60+rank), fused top-5 returned — the zero-tuning way to
    combine rankers with incomparable score scales, completing the
    retrieval family (dense ANN / TF-IDF / BM25 / fused). The two legs
    keep their inverted-index term-join plans; fusion itself touches
    only query-bounded rank lists (full-outer join + per-query window
    over ≤ 40 candidates). Ranks are integers so the RRF arithmetic is
    bit-identical across engines. Full oracle replays both legs and
    the fusion."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return tx.hybrid_rrf_topk(d, "text", "doc_id", n_queries=3, k=5)


@query(
    "group_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.25) AS p25,
           quantile_cont(l_extendedprice, 0.5)  AS p50,
           quantile_cont(l_extendedprice, 0.75) AS p75,
           quantile_cont(l_extendedprice, 0.99) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP exact percentiles (Spark F.percentile ≡ DuckDB
    quantile_cont interpolation, proven bit-equal by the global
    percentiles_exact row — this adds the grouped form: one shuffle on
    the group key, sort-based percentile within groups)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.25).alias("p25"),
        F.percentile("l_extendedprice", 0.5).alias("p50"),
        F.percentile("l_extendedprice", 0.75).alias("p75"),
        F.percentile("l_extendedprice", 0.99).alias("p99"),
    )


@query(
    "sequence_packing",
    oracle=f"""
    WITH toks AS (
        SELECT lang, doc_id, CAST({_DD_NTOK} AS BIGINT) AS n_tokens
        FROM documents
    ),
    cum AS (
        SELECT lang, doc_id, n_tokens,
               coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        FROM toks
    )
    SELECT lang, doc_id, n_tokens,
           CAST(floor(cb / 2048) AS BIGINT) AS bin_id,
           CAST(cb % 2048 AS BIGINT) AS bin_offset
    FROM cum
    """,
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-chunk sequence packing (GPT training layout):
    docs laid end-to-end per language, cut into 2048-token bins —
    running-sum window per partition, no global sort
    (functions/text.pack_sequences)."""
    d = load_table(spark, sf_dir, "documents")
    return tx.pack_sequences(d, "text", "doc_id", capacity=2048, partition_by="lang")


@query(
    "vocab_topk",
    oracle=f"""
    WITH counts AS (
        SELECT word AS token, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT unnest({_DD_TOKENS}) AS word FROM documents)
        GROUP BY word
    ),
    topk AS (SELECT * FROM counts ORDER BY n DESC, token LIMIT 200)
    SELECT token, n,
           CAST(row_number() OVER (ORDER BY n DESC, token) - 1 AS BIGINT)
               AS token_id
    FROM topk
    """,
)
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary build (functions/text.build_vocab): top-200
    tokens with deterministic contiguous ids — distributed count +
    TakeOrdered top-k; the row_number runs over only the k survivors."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return tx.build_vocab(d, "text", "doc_id", size=200)


@query(
    "udtf_ngram_topk",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    g AS (
        SELECT doc_id, i AS pos,
               array_to_string(words[i:i+2], ' ') AS ngram
        FROM w, LATERAL unnest(generate_series(1, greatest(len(words) - 2, 0))) AS t(i)
    )
    SELECT ngram, CAST(count(*) AS BIGINT) AS n
    FROM g
    GROUP BY ngram
    ORDER BY n DESC, ngram
    LIMIT 30
    """,
)
def q_udtf_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (§2.8: the reference's 'UDF returns a table'
    shape): word 3-grams exploded per document by a LATERAL
    ``word_ngrams`` UDTF (Arrow-batched), counted, top-30 with a
    deterministic (n DESC, ngram) tie-break. API-parity entry — the
    Catalyst-native n-gram path (functions/text.py) is the hot path;
    the UDTF is the escape hatch for genuinely imperative per-row
    expansion."""
    from pandas_etl_spark.functions.udtf import register_udtfs

    import uuid

    register_udtfs(spark)
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    view = f"docs_udtf_ngrams_{uuid.uuid4().hex[:8]}"
    d.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT g.ngram, CAST(count(*) AS BIGINT) AS n
        FROM {view}, LATERAL word_ngrams(text, 3) g
        GROUP BY g.ngram
        ORDER BY n DESC, g.ngram
        LIMIT 30
        """
    )


@query(
    "unigram_logprob_score",
    oracle="""
    WITH toks AS (
        SELECT doc_id AS id,
               unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                  t -> t <> '')) AS tok
        FROM documents
    ),
    counts AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
    vocab AS (SELECT tok, n FROM counts ORDER BY n DESC, tok LIMIT 1000),
    totals AS (SELECT sum(n) AS N_total FROM counts)
    SELECT id AS doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(ln(CAST(coalesce(v.n, 0) + 1 AS DOUBLE)
                        / CAST(N_total + 1000 + 1 AS DOUBLE))), 6) AS avg_logprob
    FROM toks LEFT JOIN vocab v USING (tok), totals
    GROUP BY id
    """,
)
def q_unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style curation signal: per-doc average log-probability
    under an add-one-smoothed corpus unigram LM (top-1000 vocab,
    OOV floor). Low scorers are boilerplate/noise candidates — the
    distributional complement to the heuristic quality_score. One token
    shuffle + distributed top-V + broadcast joins (functions/text.py
    unigram_logprob)."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return tx.unigram_logprob(d, "text", "doc_id", vocab_size=1000).select(
        F.col("id").alias("doc_id"), "n_tokens", "avg_logprob"
    )


@query(
    "bigram_logprob_score",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id AS id, {_DD_TOKENS} AS l FROM documents
    ),
    toks AS (
        SELECT id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos FROM docs
    ),
    counts AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
    vocab AS (SELECT tok FROM counts ORDER BY n DESC, tok LIMIT 1000),
    mapped AS (
        SELECT id, pos,
               CASE WHEN v.tok IS NOT NULL THEN t.tok
                    ELSE chr(0) || 'unk' END AS m
        FROM toks t LEFT JOIN vocab v USING (tok)
    ),
    big AS (
        SELECT a.id, a.m AS w1, b.m AS w2
        FROM mapped a JOIN mapped b ON a.id = b.id AND b.pos = a.pos + 1
    ),
    c1h AS (SELECT w1, count(*) AS ch FROM big GROUP BY w1),
    c12 AS (SELECT w1, w2, count(*) AS cb FROM big GROUP BY w1, w2)
    SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln((CAST(cb AS DOUBLE) + 1)
                        / (CAST(ch AS DOUBLE) + 1001))), 6) AS avg_logprob
    FROM big JOIN c12 USING (w1, w2) JOIN c1h USING (w1)
    GROUP BY id
    """,
)
def q_bigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality score (functions/text.bigram_logprob): the
    CCNet-style fluency signal one order above unigram_logprob_score —
    token soup with a normal unigram profile still scores low. Bounded
    broadcast count tables (≤(V+1)² bigrams), one (id,pos)-keyed
    self-join shuffle."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return tx.bigram_logprob(d, "text", "doc_id", vocab_size=1000).select(
        F.col("id").alias("doc_id"), "n_bigrams", "avg_logprob"
    )


@query(
    "pmi_cooccur",
    oracle=f"""
    WITH toks AS (
        SELECT DISTINCT doc_id, unnest({_DD_TOKENS}) AS word FROM documents
    ),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    dfreq AS (
        SELECT word, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY word
    ),
    vocab AS (SELECT word, df FROM dfreq ORDER BY df DESC, word LIMIT 100),
    tv AS (SELECT t.doc_id, t.word FROM toks t JOIN vocab USING (word)),
    co AS (
        SELECT a.word AS word_a, b.word AS word_b,
               CAST(count(*) AS BIGINT) AS co_df
        FROM tv a JOIN tv b ON a.doc_id = b.doc_id AND a.word < b.word
        GROUP BY 1, 2
    )
    SELECT word_a, word_b, co_df, va.df AS df_a, vb.df AS df_b,
           round(ln(CAST(co_df AS DOUBLE) * n_docs
                    / (CAST(va.df AS DOUBLE) * CAST(vb.df AS DOUBLE))), 6) AS pmi
    FROM co
    JOIN vocab va ON va.word = co.word_a
    JOIN vocab vb ON vb.word = co.word_b
    CROSS JOIN n
    WHERE co_df >= 5
    ORDER BY pmi DESC, word_a, word_b
    LIMIT 50
    """,
)
def q_pmi_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top PMI term pairs — collocation/phrase mining over document-level
    co-occurrence (the classic corpus-analysis signal for multi-word
    expressions and topical coupling). The pair join is BOUNDED by
    construction: only the top-100-df vocabulary (deterministic
    df-then-word order) enters the per-doc self-join, capping fan-out at
    C(100,2) pairs per document regardless of corpus size; vocab and the
    per-word df table broadcast. One doc_id-keyed shuffle for the pair
    count + a distributed top-k — no unbounded vocabulary square."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", F.explode(tx.tokens("text")).alias("word")
    ).distinct()
    n_docs = d.agg(F.countDistinct("doc_id").alias("n_docs"))
    dfreq = toks.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    vocab = dfreq.orderBy(F.desc("df"), F.asc("word")).limit(100)
    tv = toks.join(F.broadcast(vocab.select("word")), "word")
    co = (
        tv.alias("a")
        .join(tv.alias("b"), "doc_id")
        .filter(F.col("a.word") < F.col("b.word"))
        .groupBy(
            F.col("a.word").alias("word_a"), F.col("b.word").alias("word_b")
        )
        .agg(F.count(F.lit(1)).alias("co_df"))
        .filter(F.col("co_df") >= 5)
    )
    va = vocab.select(F.col("word").alias("word_a"), F.col("df").alias("df_a"))
    vb = vocab.select(F.col("word").alias("word_b"), F.col("df").alias("df_b"))
    pmi = F.round(
        F.log(
            F.col("co_df").cast("double")
            * F.col("n_docs")
            / (F.col("df_a").cast("double") * F.col("df_b").cast("double"))
        ),
        6,
    )
    return (
        co.join(F.broadcast(va), "word_a")
        .join(F.broadcast(vb), "word_b")
        .crossJoin(F.broadcast(n_docs))
        .select("word_a", "word_b", "co_df", "df_a", "df_b", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("word_a"), F.asc("word_b"))
        .limit(50)
    )


@query("bpe_learn_merges")
def q_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 10 learned BPE merges over the documents corpus (rows-only:
    the iterative merge loop is not ANSI-SQL-expressible; a pure-Python
    reference implementation asserts the exact merge sequence in
    tests/test_curation_ops.py). Corpus touched once (word-freq table);
    each merge iterates on the ≤5k-row table."""
    d = load_table(spark, sf_dir, "documents")
    merges = tx.learn_bpe_merges(d, "text", num_merges=10, max_words=5000)
    return spark.createDataFrame(
        [(i, l, r, pf) for i, (l, r, pf) in enumerate(merges)],
        "rank int, left string, right string, pair_freq long",
    )


@query(
    "doc_winnow",
    oracle=r"""
    WITH norm AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        FROM documents
    ),
    h AS (
        SELECT doc_id,
               list_transform(generate_series(1, greatest(length(t) - 7, 0)),
                   i -> list_reduce(
                        list_transform(generate_series(0, 7),
                            j -> CAST(unicode(substring(t, i + j, 1)) AS BIGINT)),
                        (a, b) -> (a * 257 + b) % 2147483647)) AS hs
        FROM norm
    ),
    w AS (
        SELECT doc_id,
               list_sort(list_distinct(
                   list_transform(generate_series(1, greatest(len(hs) - 3, 0)),
                       i -> list_aggregate(hs[i:i+3], 'min')))) AS fps
        FROM h
    )
    SELECT doc_id, array_to_string(fps, ',') AS winnow_fps FROM w
    """,
)
def q_doc_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer et al. 2003, MOSS —
    public literature): min of each sliding window of 4 consecutive
    8-char Rabin–Karp hashes, deduplicated — the guarantee-bearing
    fingerprint sampler (any match ≥ window+k-1 chars shares a selected
    fingerprint). Pure in-row higher-order functions over the
    materialized hash array; zero shuffles."""
    from pandas_etl_spark.functions.dedup import normalized
    from pandas_etl_spark.functions.text import rolling_hashes

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    wins = (
        "CASE WHEN size(hs) >= 4 THEN "
        "transform(sequence(1, size(hs) - 3), i -> array_min(slice(hs, i, 4))) "
        "ELSE array() END"
    )
    return (
        d.select("doc_id", normalized("text").alias("_norm"))
        .select("doc_id", rolling_hashes("_norm", 8).alias("hs"))
        .select(
            "doc_id",
            F.array_join(
                F.array_sort(F.array_distinct(F.expr(wins))), ","
            ).alias("winnow_fps"),
        )
    )


@query(
    "winnow_pairs",
    oracle=r"""
    WITH norm AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        FROM documents
    ),
    h AS (
        SELECT doc_id,
               list_transform(generate_series(1, greatest(length(t) - 7, 0)),
                   i -> list_reduce(
                        list_transform(generate_series(0, 7),
                            j -> CAST(unicode(substring(t, i + j, 1)) AS BIGINT)),
                        (a, b) -> (a * 257 + b) % 2147483647)) AS hs
        FROM norm
    ),
    fp AS (
        SELECT doc_id AS id,
               unnest(list_distinct(
                   list_transform(generate_series(1, greatest(len(hs) - 3, 0)),
                       i -> list_aggregate(hs[i:i+3], 'min')))) AS fp
        FROM h
    ),
    rare AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) <= 50),
    f AS (SELECT fp.id, fp.fp FROM fp JOIN rare USING (fp))
    SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS shared_fps
    FROM f a JOIN f b ON a.fp = b.fp AND a.id < b.id
    GROUP BY 1, 2
    HAVING count(*) >= 2
    """,
)
def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style near-dup candidates: doc pairs sharing ≥ 2 winnowed
    fingerprints — the substring-overlap detector that complements
    set-similarity (Jaccard) dedup: winnowing guarantees any shared run
    ≥ 11 chars (window 4 + hash width 8 − 1) leaves a common
    fingerprint. Same bounded plan as the n-gram path: df-capped
    inverted index (≤ 50), in-bucket i<j pair generation, one shuffle
    on the fingerprint."""
    from pandas_etl_spark.functions.dedup import normalized
    from pandas_etl_spark.functions.text import rolling_hashes

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    wins = (
        "CASE WHEN size(hs) >= 4 THEN "
        "transform(sequence(1, size(hs) - 3), i -> array_min(slice(hs, i, 4))) "
        "ELSE array() END"
    )
    fps = (
        d.select("doc_id", normalized("text").alias("_norm"))
        .select("doc_id", rolling_hashes("_norm", 8).alias("hs"))
        .select(
            F.col("doc_id").alias("id"),
            F.explode(F.array_distinct(F.expr(wins))).alias("fp"),
        )
    )
    # df-cap via the skew-safe salted two-level count (r11, VERDICT r10
    # #1): one scan, no df-agg + probe join (the probe side recomputed
    # the scan→hash→explode pipeline), and no hot-fingerprint
    # single-task window group; the bucket exchange carries only
    # surviving (df ≤ 50) rows — bounded per fp by construction.
    from pandas_etl_spark.functions.dedup import df_capped_buckets

    buckets = df_capped_buckets(fps, ["fp"], "id", 50).filter(
        F.size("ids") >= 2
    )
    pair_expr = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids)), y -> struct(x AS id_a, y AS id_b))))"
    )
    return (
        buckets.select(F.explode(pair_expr).alias("p"))
        .groupBy("p.id_a", "p.id_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= 2)
    )


@query(
    "source_composition",
    oracle=f"""
    WITH s AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum({_DD_NTOK}) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    t AS (SELECT sum(n_tokens) AS total FROM s)
    SELECT source, n_docs, n_tokens,
           round(CAST(n_tokens AS DOUBLE) / total, 6) AS token_share,
           round(sum(CAST(n_tokens AS DOUBLE) / total)
                 OVER (ORDER BY n_tokens DESC, source), 6) AS cum_share
    FROM s CROSS JOIN t
    """,
)
def q_source_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report: per-source doc/token counts, token
    share, and cumulative share in size order — the mixture-governance
    view behind sampling-weight decisions. Per-source aggregate is one
    shuffle; the share window runs over the tiny source-level frame
    (cardinality = number of sources), where a single-partition window
    is the right plan, not a smell."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tx.token_count("text")).alias("n_tokens"),
    )
    total = s.agg(F.sum("n_tokens").alias("total"))
    from pyspark.sql import Window as W

    w = W.orderBy(F.desc("n_tokens"), F.asc("source"))
    share = F.col("n_tokens").cast("double") / F.col("total")
    return (
        s.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(share, 6).alias("token_share"),
            F.round(F.sum(share).over(w), 6).alias("cum_share"),
        )
    )


@query(
    "length_buckets",
    oracle=f"""
    WITH d AS (
        SELECT CAST({_DD_NTOK} AS BIGINT) AS n_tok FROM documents
    ),
    b AS (
        SELECT CAST(ceil(log2(greatest(n_tok, 1))) AS BIGINT) AS bucket, n_tok
        FROM d WHERE n_tok > 0
    )
    SELECT bucket,
           CAST(power(2, bucket) AS BIGINT) AS bucket_max,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           round(CAST(1.0 AS DOUBLE)
                 - CAST(sum(n_tok) AS DOUBLE)
                   / (count(*) * power(2, bucket)), 6) AS pad_waste
    FROM b GROUP BY bucket
    """,
)
def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-2 length bucketing for training-batch efficiency: docs
    grouped by ⌈log2(tokens)⌉ with the padding fraction wasted if each
    bucket batches at its ceiling — the report behind length-bucketed
    batching (vs padding everything to the global max). One narrow
    projection + one aggregate; no shuffle beyond the bucket key."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    ntok = tx.token_count("text")
    b = d.select(ntok.alias("n_tok")).filter(F.col("n_tok") > 0).select(
        F.ceil(F.log2(F.greatest(F.col("n_tok"), F.lit(1)))).cast("bigint").alias("bucket"),
        "n_tok",
    )
    cap = F.pow(F.lit(2.0), F.col("bucket"))
    return b.groupBy("bucket").agg(
        F.pow(F.lit(2.0), F.col("bucket")).cast("bigint").alias("bucket_max"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.round(
            F.lit(1.0)
            - F.sum("n_tok").cast("double") / (F.count(F.lit(1)) * cap),
            6,
        ).alias("pad_waste"),
    )


@query(
    "vocab_zipf_fit",
    oracle=f"""
    WITH w AS (
        SELECT word, CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT unnest({_DD_TOKENS}) AS word FROM documents)
        GROUP BY word
    ),
    r AS (
        SELECT freq,
               row_number() OVER (ORDER BY freq DESC, word) AS rank
        FROM w ORDER BY freq DESC, word LIMIT 1000
    )
    SELECT round(regr_slope(ln(CAST(freq AS DOUBLE)),
                            ln(CAST(rank AS DOUBLE))), 4)     AS zipf_slope,
           round(regr_r2(ln(CAST(freq AS DOUBLE)),
                         ln(CAST(rank AS DOUBLE))), 4)        AS r2,
           CAST(count(*) AS BIGINT)                           AS n_ranks
    FROM r
    """,
)
def q_vocab_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the vocabulary: least-squares slope of
    log-frequency vs log-rank over the top-1000 words — the standard
    natural-language sanity check on a corpus (slope ≈ −1 for organic
    text; far off flags synthetic/templated data). One token shuffle for
    the frequency table; rank window + regression run on the tiny
    top-1000 frame (single-partition by design)."""
    from pyspark.sql import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    w = (
        d.select(F.explode(tx.tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(1000)
    )
    r = w.withColumn(
        "rank", F.row_number().over(W.orderBy(F.desc("freq"), F.asc("word")))
    )
    lf = F.log(F.col("freq").cast("double"))
    lr = F.log(F.col("rank").cast("double"))
    return r.agg(
        F.round(F.regr_slope(lf, lr), 4).alias("zipf_slope"),
        F.round(F.regr_r2(lf, lr), 4).alias("r2"),
        F.count(F.lit(1)).alias("n_ranks"),
    )


@query(
    "retrieval_ndcg_tfidf",
    oracle=(
        "WITH topk AS (" + ORACLES["tfidf_search_topk"] + """),
    rel AS (
        SELECT t.query_id, t.rnk,
               CASE WHEN dq.source = dn.source THEN 1 ELSE 0 END AS rel
        FROM topk t
        JOIN documents dq ON dq.doc_id = t.query_id
        JOIN documents dn ON dn.doc_id = t.neighbor_id
    ),
    dcg AS (
        SELECT query_id, sum(rel / log2(rnk + 1)) AS dcg
        FROM rel GROUP BY query_id
    ),
    rcount AS (
        SELECT q.doc_id AS query_id, count(*) AS r
        FROM documents q
        JOIN documents d ON d.source = q.source AND d.doc_id <> q.doc_id
        WHERE q.doc_id < 3
        GROUP BY 1
    ),
    idcg AS (
        SELECT query_id, sum(1.0 / log2(i + 1)) AS idcg
        FROM rcount, unnest(generate_series(1, least(r, 5))) AS t(i)
        GROUP BY query_id
    )
    SELECT d.query_id, round(d.dcg / i.idcg, 6) AS ndcg
    FROM dcg d JOIN idcg i USING (query_id)
    """
    ),
)
def q_retrieval_ndcg_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation: NDCG@5 of the TF-IDF search per
    query, with binary relevance = neighbor shares the query document's
    ``source`` label (the standard weak-label protocol when no human
    judgments exist). Both the ranking AND the metric are one plan —
    the eval loop a retrieval stack runs after every index change.
    Scale shape: metric math is a per-query aggregate over k rows plus
    a broadcast source-count frame; the ranking dominates, unchanged
    from tfidf_search_topk."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    topk = tx.tfidf_cosine_topk(d, "text", "doc_id", n_queries=3, k=5)
    src = d.select("doc_id", "source")
    rel = (
        topk.join(
            F.broadcast(src.withColumnsRenamed({"doc_id": "query_id", "source": "q_src"})),
            "query_id",
        )
        .join(
            src.withColumnsRenamed({"doc_id": "neighbor_id", "source": "n_src"}),
            "neighbor_id",
        )
        .select(
            "query_id",
            "rnk",
            F.when(F.col("q_src") == F.col("n_src"), 1).otherwise(0).alias("rel"),
        )
    )
    dcg = rel.groupBy("query_id").agg(
        F.sum(F.col("rel") / F.log2(F.col("rnk") + 1)).alias("dcg")
    )
    src_counts = src.groupBy("source").agg(F.count(F.lit(1)).alias("n_src_docs"))
    rcount = (
        src.filter(F.col("doc_id") < 3)
        .join(F.broadcast(src_counts), "source")
        .select(
            F.col("doc_id").alias("query_id"),
            (F.col("n_src_docs") - 1).alias("r"),
        )
        .filter(F.col("r") >= 1)
    )
    idcg = rcount.select(
        "query_id",
        F.expr(
            "aggregate(sequence(1, int(least(r, 5))), cast(0 as double), "
            "(acc, i) -> acc + 1.0 / log2(i + 1))"
        ).alias("idcg"),
    )
    return dcg.join(idcg, "query_id").select(
        "query_id", F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg")
    )


@query(
    "exact_span_dedup",
    oracle="""
    WITH tok AS (SELECT doc_id AS id, string_split(text, ' ') AS t
                 FROM documents),
    p AS (SELECT id, unnest(generate_series(0, len(t) - 8)) AS pos, t
          FROM tok),
    w AS (SELECT id, pos,
            CAST('0x' || substring(
                md5(array_to_string(t[pos+1:pos+8], ' ')), 1, 15) AS BIGINT)
                AS gh
          FROM p),
    o AS (SELECT gh, min(id) AS owner FROM w GROUP BY gh),
    dup AS (SELECT w.id, w.pos FROM w JOIN o USING (gh)
            WHERE w.id > o.owner),
    cov AS (SELECT DISTINCT id, idx FROM
            (SELECT id, pos + unnest(generate_series(0, 7)) AS idx
             FROM dup)),
    tp AS (SELECT id, unnest(generate_series(0, len(t) - 1)) AS idx, t
           FROM tok),
    tpv AS (SELECT id, idx, t[idx+1] AS tokv FROM tp),
    kept AS (SELECT tpv.id, tpv.idx, tpv.tokv FROM tpv LEFT JOIN cov
             ON tpv.id = cov.id AND tpv.idx = cov.idx
             WHERE cov.idx IS NULL),
    kagg AS (SELECT id, string_agg(tokv, ' ' ORDER BY idx) AS text_dedup,
                    count(*) AS n_kept FROM kept GROUP BY id)
    SELECT tok.id, CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(len(t) - coalesce(kagg.n_kept, 0) AS BIGINT) AS n_removed,
           coalesce(kagg.text_dedup, '') AS text_dedup
    FROM tok LEFT JOIN kagg USING (id)
    """,
)
def q_exact_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lee-et-al-2022 exact duplicated-substring removal
    (functions/text.exact_span_dedup, 8-token rolling windows):
    a window occurring in an earlier doc is cut from the later one,
    overlapping windows merging into maximal spans via coverage union
    — the rolling windows catch duplicated runs at ANY offset, which
    aligned segment_dedup cannot. One (gram-hash, id, pos) shuffle
    with map-side min(id) ownership; token filtering is per-row JVM
    higher-order functions, no token-level shuffle."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return tx.exact_span_dedup(d, "text", "doc_id", k=8)


@query(
    "segment_dedup",
    oracle="""
    WITH arr AS (SELECT doc_id AS id, string_split(text, ' ') AS w FROM documents),
    segs AS (
        SELECT id, CAST(i AS INTEGER) AS seg_idx,
               array_to_string(w[(i * 10 + 1):((i + 1) * 10)], ' ') AS seg
        FROM arr,
             unnest(generate_series(0,
                 CAST(ceil(len(w) / 10.0) AS BIGINT) - 1)) AS t(i)
    ),
    kept AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY seg
                                         ORDER BY id, seg_idx) AS rn
            FROM segs
        ) WHERE rn = 1
    ),
    tot AS (SELECT id, count(*) AS n_segments FROM segs GROUP BY id)
    SELECT k.id, string_agg(k.seg, ' ' ORDER BY k.seg_idx) AS text_dedup,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(any_value(t.n_segments) AS BIGINT) AS n_segments
    FROM kept k JOIN tot t ON t.id = k.id
    GROUP BY k.id
    """,
)
def q_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-wide segment dedup (functions/text.segment_dedup,
    10-word segments): exactly one copy of every distinct segment
    survives (first occurrence by (id, idx) via a rank-1 window — ONE
    shuffle keyed on segment text), survivors reassemble in document
    order, fully-duplicated documents vanish. The sub-document
    granularity that doc-level dedup cannot reach."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return tx.segment_dedup(d, "text", "doc_id", words_per_segment=10)


@query("segment_neardup")
def q_segment_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dolma-style segment-level NEAR-dup removal
    (functions/text.segment_neardup_dedup): MinHash-LSH over 20-word
    segments drops lightly-edited boilerplate paragraphs exact
    segment_dedup misses (exact copies subsumed — identical
    signatures always collide). Rows-only driver check (xxhash64
    signatures are engine-specific); keep/drop semantics pinned in
    tests/test_operators.py."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return tx.segment_neardup_dedup(
        d, "text", "doc_id", words_per_segment=20, threshold=0.5
    )


@query("heavy_hitters_cms")
def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch estimates beside the exact heavy hitters
    (operators/frequent.cms_heavy_hitters): the whole token stream
    collapses into one few-KB mergeable sketch; estimates carry the
    one-sided CMS guarantee n <= n_est <= n + eps*N (tested).
    Rows-only driver check (sketch hashing is engine-specific)."""
    from pandas_etl_spark.operators.frequent import cms_heavy_hitters

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = d.select(F.explode(tx.tokens("text")).alias("word"))
    return cms_heavy_hitters(toks, "word", theta=0.002)


@query(
    "dsir_importance_weights",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id AS id, lang = 'en' AS t,
               CAST('0x' || substring(md5(term), 1, 8) AS BIGINT) % 1024 AS b
        FROM (SELECT doc_id, lang, unnest({_DD_TOKENS}) AS term FROM documents)
    ),
    counts AS (
        SELECT b, sum(CASE WHEN t THEN 1 ELSE 0 END) AS ct,
               sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS cr
        FROM toks GROUP BY b
    ),
    totals AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM counts)
    SELECT id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(sum(ln((CAST(ct + 1 AS DOUBLE) / CAST(nt + 1024 AS DOUBLE))
                        / (CAST(cr + 1 AS DOUBLE) / CAST(nr + 1024 AS DOUBLE)))),
                 6) AS log_ratio
    FROM toks JOIN counts USING (b) CROSS JOIN totals
    WHERE NOT t
    GROUP BY id
    """,
)
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance log-weights (functions/text.dsir_importance):
    hashed-unigram log-likelihood ratio of every non-English doc
    against the English target distribution — the importance-
    resampling data-selection score. Two bounded broadcast frames
    (1024-bucket counts + 1-row totals), one token shuffle."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return tx.dsir_importance(
        d, F.col("lang") == "en", "text", "doc_id", n_buckets=1024
    ).select(F.col("id").alias("id"), "n_tokens", "log_ratio")


@query(
    "feature_hash_counts",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id AS id, unnest({_DD_TOKENS}) AS term FROM documents
    )
    SELECT id,
           CAST(CAST('0x' || substring(md5(term), 1, 8) AS BIGINT) % 64
                AS INTEGER) AS bucket,
           CAST(count(*) AS BIGINT) AS tf
    FROM toks
    GROUP BY 1, 2
    """,
)
def q_feature_hash_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009): tokens hash into a
    fixed 64-bucket feature space — the unbounded-vocabulary-to-
    fixed-width featurizer (sklearn HashingVectorizer / Spark ML
    HashingTF shape) with a PORTABLE md5 bucket function so the whole
    transform is oracle-checkable. Long output (id, bucket, tf): one
    token-explode aggregate, no vocabulary state, no second pass —
    the property that makes feature hashing the streaming/100 TB
    featurizer (a CountVectorizer needs a fitted vocab broadcast)."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        F.col("doc_id").alias("id"), F.explode(tx.tokens("text")).alias("term")
    )
    bucket = F.expr(
        "cast(cast(conv(substring(md5(term), 1, 8), 16, 10) as bigint) % 64 as int)"
    )
    return toks.groupBy("id", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("tf")
    )


@query(
    "span_dedup_incremental",
    oracle="""
    WITH corp AS (
        SELECT string_split(text, ' ') AS t FROM documents WHERE doc_id < 250
    ),
    cp AS (SELECT unnest(generate_series(0, len(t) - 8)) AS pos, t FROM corp),
    cidx AS (
        SELECT DISTINCT CAST('0x' || substring(
            md5(array_to_string(t[pos+1:pos+8], ' ')), 1, 15) AS BIGINT) AS gh
        FROM cp
    ),
    tok AS (SELECT doc_id AS id, string_split(text, ' ') AS t
            FROM documents WHERE doc_id >= 250),
    p AS (SELECT id, unnest(generate_series(0, len(t) - 8)) AS pos, t
          FROM tok),
    w AS (SELECT id, pos,
            CAST('0x' || substring(
                md5(array_to_string(t[pos+1:pos+8], ' ')), 1, 15) AS BIGINT)
                AS gh
          FROM p),
    hit AS (SELECT id, pos FROM w WHERE gh IN (SELECT gh FROM cidx)),
    fresh AS (SELECT * FROM w WHERE gh NOT IN (SELECT gh FROM cidx)),
    o AS (SELECT gh, min(id) AS owner FROM fresh GROUP BY gh),
    bdup AS (SELECT fresh.id, fresh.pos FROM fresh JOIN o USING (gh)
             WHERE fresh.id > o.owner),
    dup AS (SELECT id, pos FROM hit UNION ALL SELECT id, pos FROM bdup),
    cov AS (SELECT DISTINCT id, idx FROM
            (SELECT id, pos + unnest(generate_series(0, 7)) AS idx
             FROM dup)),
    tp AS (SELECT id, unnest(generate_series(0, len(t) - 1)) AS idx, t
           FROM tok),
    tpv AS (SELECT id, idx, t[idx+1] AS tokv FROM tp),
    kept AS (SELECT tpv.id, tpv.idx, tpv.tokv FROM tpv LEFT JOIN cov
             ON tpv.id = cov.id AND tpv.idx = cov.idx
             WHERE cov.idx IS NULL),
    kagg AS (SELECT id, string_agg(tokv, ' ' ORDER BY idx) AS text_dedup,
                    count(*) AS n_kept FROM kept GROUP BY id)
    SELECT tok.id, CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(len(t) - coalesce(kagg.n_kept, 0) AS BIGINT) AS n_removed,
           coalesce(kagg.text_dedup, '') AS text_dedup
    FROM tok LEFT JOIN kagg USING (id)
    """,
)
def q_span_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact-span dedup (functions/text.span_dedup_against):
    the lower half of the corpus plays the write-once accepted corpus
    (its distinct gram hashes are the whole index — 8 bytes each), the
    upper half is the daily batch: windows already in the index are
    cut, unseen grams fall to in-batch first-holder ownership. The
    corpus side contributes ONE (gh)-only distinct joined left onto
    the batch grams (r10: the former semi/anti pair consumed the batch
    window explode three times); batch cost ∝ batch size — the
    amortized shape a daily 100 TB substring-dedup service runs."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    corpus = d.filter(F.col("doc_id") < 250)
    batch = d.filter(F.col("doc_id") >= 250)
    return tx.span_dedup_against(
        batch, tx.corpus_span_grams(corpus, "text", 8), "text", "doc_id", 8
    )


_RAKE_STOP = ", ".join(f"'{w}'" for w in tx.LANG_STOPWORDS["en"])


@query(
    "rake_keyphrases_topk",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               string_split_regex(lower(trim(text)), '\\s+') AS ts
        FROM documents
    ),
    toks0 AS (
        SELECT doc_id, unnest(ts) AS tok, unnest(range(len(ts))) AS pos
        FROM base
    ),
    toks AS (SELECT * FROM toks0 WHERE tok <> ''),
    nonstop AS (
        SELECT doc_id, pos, tok,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS anchor
        FROM toks WHERE tok NOT IN ({_RAKE_STOP})
    ),
    ph AS (
        SELECT doc_id, anchor,
               string_agg(tok, ' ' ORDER BY pos) AS phrase,
               count(*) AS len
        FROM nonstop GROUP BY doc_id, anchor
        HAVING count(*) <= 4
    ),
    mem AS (
        SELECT n.doc_id, n.anchor, n.tok, p.len
        FROM nonstop n JOIN ph p USING (doc_id, anchor)
    ),
    ws AS (
        SELECT tok, CAST(sum(len) AS DOUBLE) / count(*) AS s
        FROM mem GROUP BY tok
    ),
    psc AS (
        SELECT m.doc_id, m.anchor, sum(ws.s) AS score
        FROM mem m JOIN ws USING (tok) GROUP BY 1, 2
    ),
    agg AS (
        SELECT p.phrase, CAST(count(*) AS BIGINT) AS n,
               round(max(psc.score), 6) AS score
        FROM ph p JOIN psc USING (doc_id, anchor) GROUP BY 1
    )
    SELECT phrase, n, score FROM agg
    ORDER BY score DESC, phrase LIMIT 15
    """,
)
def q_rake_keyphrases_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (functions/text.rake_keyphrases): top
    15 corpus keyphrases — stopword-delimited token runs scored by the
    deg/freq word statistic. Islands window + (doc, anchor)-keyed
    phrase/member frames + a vocabulary-sized word-score join; the
    oracle replays the identical pipeline in SQL over the same raw
    split positions."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return tx.rake_keyphrases(d, "text", "doc_id")


@query(
    "bpe_fertility_by_lang",
    oracle=f"""
    WITH per_doc AS (
        SELECT lang,
               CAST({_DD_NTOK} AS BIGINT) AS ws,
               CAST(len(regexp_extract_all(text, '{_DD_BPE}')) AS BIGINT)
                   AS bpe,
               CAST(len(text) AS BIGINT) AS chars
        FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT)  AS n_docs,
           CAST(sum(ws) AS BIGINT)   AS n_words,
           CAST(sum(bpe) AS BIGINT)  AS n_bpe_tokens,
           round(sum(bpe) * 1.0 / greatest(sum(ws), 1), 6)    AS fertility,
           round(sum(chars) * 1.0 / greatest(sum(bpe), 1), 6) AS chars_per_token
    FROM per_doc GROUP BY lang
    """,
)
def q_bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit per language: BPE tokens per
    whitespace word and characters per BPE token — the standard
    multilingual-tokenizer cost report (high-fertility languages burn
    budget faster; the signal behind vocabulary rebalancing). Both
    token counts evaluate in the scan projection (regex counting, no
    Python); ONE tiny per-lang aggregate with exact-integer sums and
    single closing divisions — bit-identical across engines."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    per_doc = d.select(
        "lang",
        tx.token_count("text").alias("ws"),
        tx.bpe_token_count("text").alias("bpe"),
        F.length("text").cast("bigint").alias("chars"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("ws").cast("bigint").alias("n_words"),
        F.sum("bpe").cast("bigint").alias("n_bpe_tokens"),
        F.round(
            F.sum("bpe") / F.greatest(F.sum("ws"), F.lit(1)), 6
        ).alias("fertility"),
        F.round(
            F.sum("chars") / F.greatest(F.sum("bpe"), F.lit(1)), 6
        ).alias("chars_per_token"),
    )


@query(
    "lang_id_kappa",
    oracle=f"""
    WITH h AS (
        SELECT lang,
               {_dd_hits('de')} AS h_de, {_dd_hits('en')} AS h_en,
               {_dd_hits('es')} AS h_es, {_dd_hits('fr')} AS h_fr,
               {_dd_hits('zh')} AS h_zh
        FROM documents
    ),
    pred AS (
        SELECT lang,
               CASE WHEN greatest(h_de, h_en, h_es, h_fr, h_zh) = 0 THEN 'und'
                    WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr AND h_de >= h_zh THEN 'de'
                    WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_zh THEN 'en'
                    WHEN h_es >= h_fr AND h_es >= h_zh THEN 'es'
                    WHEN h_fr >= h_zh THEN 'fr'
                    ELSE 'zh' END AS lang_pred
        FROM h
    ),
    cm AS (
        SELECT lang, lang_pred, count(*) AS n FROM pred GROUP BY 1, 2
    ),
    tot AS (
        SELECT sum(n) AS nn,
               sum(CASE WHEN lang = lang_pred THEN n ELSE 0 END) AS diag
        FROM cm
    ),
    rows_ AS (SELECT lang AS l, sum(n) AS r FROM cm GROUP BY 1),
    cols_ AS (SELECT lang_pred AS l, sum(n) AS c FROM cm GROUP BY 1),
    s AS (SELECT sum(r * c) AS s FROM rows_ JOIN cols_ USING (l))
    SELECT CAST(nn AS BIGINT)   AS n_docs,
           CAST(diag AS BIGINT) AS n_agree,
           round(diag * 1.0 / nn, 6)      AS p_observed,
           round(s * 1.0 / (nn * nn), 6)  AS p_expected,
           round(CASE WHEN nn * nn > s
                      THEN (diag * nn - s) * 1.0 / (nn * nn - s)
                      ELSE 0.0 END, 6)    AS kappa
    FROM tot, s
    """,
)
def q_lang_id_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the declared ``lang`` metadata and the
    content-derived language ID — chance-corrected agreement, the
    honest companion to lang_confusion's raw accuracy (a skewed corpus
    can show high accuracy from the majority class alone).

    Determinism: kappa reduces to the single integer-ratio division
    ``(diag*N - S) / (N² - S)`` where S = Σ row_l·col_l — no
    intermediate float accumulation anywhere, so engines agree
    bit-for-bit. One data-sized pass (lang_id in the scan projection);
    everything after is |langs|²-bounded."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    cm = (
        d.select("lang", tx.lang_id("text").alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cm.agg(
        F.sum("n").alias("nn"),
        F.sum(F.when(F.col("lang") == F.col("lang_pred"), F.col("n")).otherwise(0)).alias(
            "diag"
        ),
    )
    rows_ = cm.groupBy(F.col("lang").alias("l")).agg(F.sum("n").alias("r"))
    cols_ = cm.groupBy(F.col("lang_pred").alias("l")).agg(F.sum("n").alias("c"))
    s = rows_.join(cols_, "l").agg(F.sum(F.col("r") * F.col("c")).alias("s"))
    return tot.crossJoin(F.broadcast(s)).select(
        F.col("nn").cast("bigint").alias("n_docs"),
        F.col("diag").cast("bigint").alias("n_agree"),
        F.round(F.col("diag") / F.col("nn"), 6).alias("p_observed"),
        F.round(F.col("s") / (F.col("nn") * F.col("nn")), 6).alias("p_expected"),
        F.round(
            F.when(
                F.col("nn") * F.col("nn") > F.col("s"),
                (F.col("diag") * F.col("nn") - F.col("s"))
                / (F.col("nn") * F.col("nn") - F.col("s")),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("kappa"),
    )


@query(
    "vocab_drift_jsd",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id % 2 = 0 AS side_a, unnest({_DD_TOKENS}) AS t
        FROM documents
    ),
    counts AS (
        SELECT t,
               sum(CASE WHEN side_a THEN 1 ELSE 0 END) AS ca,
               sum(CASE WHEN NOT side_a THEN 1 ELSE 0 END) AS cb
        FROM tok GROUP BY t
    ),
    tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM counts),
    per AS (
        SELECT
            CASE WHEN ca > 0 THEN (ca * 1.0 / tot.na)
                 * log2((ca * 1.0 / tot.na)
                        / (((ca * 1.0 / tot.na) + (cb * 1.0 / tot.nb)) / 2))
                 ELSE 0 END AS qa,
            CASE WHEN cb > 0 THEN (cb * 1.0 / tot.nb)
                 * log2((cb * 1.0 / tot.nb)
                        / (((ca * 1.0 / tot.na) + (cb * 1.0 / tot.nb)) / 2))
                 ELSE 0 END AS qb
        FROM counts, tot
    )
    SELECT CAST((SELECT count(*) FROM counts) AS BIGINT) AS n_terms,
           CAST((SELECT na FROM tot) AS BIGINT)          AS n_tokens_a,
           CAST((SELECT nb FROM tot) AS BIGINT)          AS n_tokens_b,
           round(0.5 * sum(qa) + 0.5 * sum(qb), 6)       AS jsd
    FROM per
    """,
)
def q_vocab_drift_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary drift between two corpus halves (deterministic doc-id
    parity split, standing in for two crawl snapshots): Jensen-Shannon
    divergence of the unigram distributions — symmetric, bounded
    [0, 1] in bits, defined even for terms one side lacks, the
    distribution-shift gate run before mixing a new snapshot into
    training data (the vocabulary twin of psi_value_drift's numeric
    PSI). One (term)-keyed count shuffle; the divergence folds over
    the |vocab|-bounded count table with 1-row totals broadcast."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        (F.col("doc_id") % 2 == 0).alias("side_a"),
        F.explode(tx.tokens("text")).alias("t"),
    )
    counts = toks.groupBy("t").agg(
        F.sum(F.when(F.col("side_a"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(~F.col("side_a"), 1).otherwise(0)).alias("cb"),
    )
    tot = counts.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    pa = F.col("ca") / F.col("na")
    pb = F.col("cb") / F.col("nb")
    m = (pa + pb) / 2
    per = counts.crossJoin(F.broadcast(tot)).select(
        F.when(F.col("ca") > 0, pa * F.log2(pa / m)).otherwise(F.lit(0.0)).alias("qa"),
        F.when(F.col("cb") > 0, pb * F.log2(pb / m)).otherwise(F.lit(0.0)).alias("qb"),
        "na",
        "nb",
    )
    return per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.first("na").cast("bigint").alias("n_tokens_a"),
        F.first("nb").cast("bigint").alias("n_tokens_b"),
        F.round(0.5 * F.sum("qa") + 0.5 * F.sum("qb"), 6).alias("jsd"),
    )


_CMS_D = 4  # hash rows
_CMS_W = 2048  # counters per row
_HH_DEN = 500  # theta = 1/500: the support test n*500 >= N stays integer


def _cms_checked_oracle() -> str:
    rows = ", ".join(str(r) for r in range(_CMS_D))
    return f"""
    WITH toks AS (
        SELECT unnest({_DD_TOKENS}) AS word FROM documents
    ),
    wc AS MATERIALIZED (SELECT word, count(*) AS n FROM toks GROUP BY word),
    tot AS (SELECT sum(n) AS nn FROM wc),
    hh AS (SELECT word, n FROM wc, tot WHERE n * {_HH_DEN} >= tot.nn),
    grid AS MATERIALIZED (
        SELECT r,
               CAST('0x' || substring(md5(word || '#' || CAST(r AS VARCHAR)),
                                      1, 8) AS BIGINT) % {_CMS_W} AS b,
               sum(n) AS c
        FROM wc CROSS JOIN (SELECT unnest([{rows}]) AS r)
        GROUP BY 1, 2
    ),
    est AS (
        SELECT hh.word, hh.n, min(g.c) AS n_est
        FROM hh
        CROSS JOIN (SELECT unnest([{rows}]) AS r) rr
        JOIN grid g
          ON g.r = rr.r
         AND g.b = CAST('0x' || substring(md5(hh.word || '#'
                          || CAST(rr.r AS VARCHAR)), 1, 8) AS BIGINT) % {_CMS_W}
        GROUP BY hh.word, hh.n
    )
    SELECT word, CAST(n AS BIGINT) AS n, CAST(n_est AS BIGINT) AS n_est
    FROM est
    """


@query("heavy_hitters_cms_checked", oracle=_cms_checked_oracle())
def q_heavy_hitters_cms_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-CHECKED count-min sketch (the portable twin of
    heavy_hitters_cms, whose JVM sketch hashing is engine-specific —
    the same relationship the portable MinHash has to xxhash): a d=4 ×
    w=2048 counter grid keyed by md5 buckets, all counters EXACT
    integer sums, estimate = min over the d rows — so the one-sided CMS
    guarantee n ≤ n_est is hash-verified cross-engine, not just
    property-tested. The grid is built from the word-count table (one
    token shuffle shared with the exact counts); candidates are the
    exact θ=1/500 heavy hitters (integer support test n·500 ≥ N)."""
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    wc = (
        d.select(F.explode(tx.tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()  # feeds totals, candidates, and the grid
    )
    tot = wc.agg(F.sum("n").alias("nn"))
    hh = wc.crossJoin(F.broadcast(tot)).filter(
        F.col("n") * _HH_DEN >= F.col("nn")
    ).select("word", "n")

    def bucket(word_col, r):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(word_col, F.lit(f"#{r}"))), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
            % _CMS_W
        )

    grid = (
        wc.select(
            "n",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            bucket(F.col("word"), r).alias("b"),
                        )
                        for r in range(_CMS_D)
                    ]
                )
            ).alias("rb"),
        )
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .agg(F.sum("n").alias("c"))
    )
    probes = hh.select(
        "word",
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        bucket(F.col("word"), r).alias("b"),
                    )
                    for r in range(_CMS_D)
                ]
            )
        ).alias("rb"),
    ).select("word", "n", "rb.r", "rb.b")
    return (
        probes.join(F.broadcast(grid), ["r", "b"])
        .groupBy("word", "n")
        .agg(F.min("c").cast("bigint").alias("n_est"))
        .select("word", F.col("n").cast("bigint").alias("n"), "n_est")
    )


_BPE_CHK_WORDS = 200
_BPE_CHK_MERGES = 8
_BPE_CHK_MIN_PF = 2


def _bpe_checked_oracle() -> str:
    """DuckDB twin of the BPE merge loop with a FIXED round count (the
    pca_power/markov trick: pin the iterations and the loop unrolls
    into SQL). Every quantity is an exact integer or string — no floats
    anywhere — so cross-engine hash parity is deterministic: pair
    frequencies are weighted integer sums, the best pair per round is
    (pf DESC, lhs, rhs) — the production heap's exact ordering — and
    the greedy leftmost non-overlapping rewrite keeps the even offsets
    of each run of consecutive match positions (gaps-and-islands)."""
    rounds = []
    out_rows = []
    prev = "toks0"
    for t in range(1, _BPE_CHK_MERGES + 1):
        rounds.append(f""",
    pairs{t} AS MATERIALIZED (
        SELECT w, freq, pos, tok AS a,
               lead(tok) OVER (PARTITION BY w ORDER BY pos) AS b
        FROM {prev}
    ),
    best{t} AS MATERIALIZED (
        SELECT a, b, pf FROM (
            SELECT a, b, sum(freq) AS pf
            FROM pairs{t} WHERE b IS NOT NULL GROUP BY a, b
        ) WHERE pf >= {_BPE_CHK_MIN_PF}
        ORDER BY pf DESC, a, b LIMIT 1
    ),
    keep{t} AS MATERIALIZED (
        SELECT w, pos FROM (
            SELECT w, pos,
                   pos - min(pos) OVER (PARTITION BY w, isl) AS off
            FROM (
                SELECT m.w, m.pos,
                       m.pos - row_number()
                           OVER (PARTITION BY m.w ORDER BY m.pos) AS isl
                FROM pairs{t} m JOIN best{t} s
                  ON m.a = s.a AND m.b = s.b
            )
        ) WHERE off % 2 = 0
    ),
    toks{t} AS MATERIALIZED (
        SELECT w, freq,
               row_number() OVER (PARTITION BY w ORDER BY pos) - 1 AS pos,
               tok
        FROM (
            SELECT t.w, t.freq, t.pos,
                   CASE WHEN k.pos IS NOT NULL
                        THEN t.tok || (SELECT b FROM best{t})
                        ELSE t.tok END AS tok
            FROM {prev} t
            LEFT JOIN keep{t} k ON k.w = t.w AND k.pos = t.pos
            LEFT JOIN keep{t} kp ON kp.w = t.w AND kp.pos = t.pos - 1
            WHERE kp.pos IS NULL
        )
    )""")
        out_rows.append(
            f"SELECT {t - 1} AS rank, a AS lhs, b AS rhs,"
            f" CAST(pf AS BIGINT) AS pair_freq FROM best{t}"
        )
        prev = f"toks{t}"
    union = "\n        UNION ALL ".join(out_rows)
    return f"""
    WITH wf AS MATERIALIZED (
        SELECT w, freq FROM (
            SELECT word AS w, CAST(count(*) AS BIGINT) AS freq
            FROM (SELECT unnest({_DD_TOKENS}) AS word FROM documents)
            GROUP BY word
        ) ORDER BY freq DESC, w LIMIT {_BPE_CHK_WORDS}
    ),
    toks0 AS MATERIALIZED (
        SELECT w, freq, generate_subscripts(cs, 1) - 1 AS pos,
               unnest(cs) AS tok
        FROM (SELECT w, freq, regexp_extract_all(w, '.') AS cs FROM wf)
    ){''.join(rounds)}
    SELECT CAST(rank AS INT) AS rank, lhs, rhs, pair_freq FROM (
        {union}
    ) ORDER BY rank
    """


@query("bpe_merges_checked", oracle=_bpe_checked_oracle())
def q_bpe_merges_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-CHECKED BPE merge learning — the cross-engine twin of the
    rows-only bpe_learn_merges (whose driver loop is heap-based and
    unbounded; reference algorithm Sennrich et al. 2016). The twin pins
    the round count at 8 and runs the SAME algorithm relationally on
    the top-200 word-frequency table: per round, weighted pair counts
    via one lead() window (overlapping occurrences counted, the
    production rule), best pair by (pf DESC, lhs, rhs) — exactly the
    production heap's (-pf, pair) ordering — greedy leftmost
    non-overlapping rewrite (runs of consecutive match positions keep
    even offsets), stop below pair_freq 2. Every value is an exact
    integer or string: no floats, no rounding, so the hash match is
    deterministic rather than drift-tolerant.

    Scale shape: identical to production — BPE trains on the WORD
    FREQUENCY table, never the corpus (the corpus is touched once by
    the word count); all 8 rounds run on the ≤200-word token frame
    (localCheckpointed per round, |words|·|chars| ≤ ~2k rows), with
    the per-round best pair collected as bounded 1-row driver state
    (the same contract as the IVF centroid collect)."""
    from pyspark.sql import Window as W

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    schema = "rank int, lhs string, rhs string, pair_freq long"
    wf = (
        d.select(F.explode(tx.tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("w"))
        .limit(_BPE_CHK_WORDS)
    )
    toks = wf.select(
        "w",
        "freq",
        F.posexplode(F.expr("regexp_extract_all(w, '.', 0)")).alias(
            "pos", "tok"
        ),
    ).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(_BPE_CHK_MERGES):
        pairs = toks.withColumn(
            "b", F.lead("tok").over(W.partitionBy("w").orderBy("pos"))
        ).withColumnRenamed("tok", "a")
        best_rows = (
            pairs.filter(F.col("b").isNotNull())
            .groupBy("a", "b")
            .agg(F.sum("freq").alias("pf"))
            .filter(F.col("pf") >= _BPE_CHK_MIN_PF)
            .orderBy(F.desc("pf"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()  # bounded: exactly one row per round
        )
        if not best_rows:
            break
        lhs, rhs, pf = best_rows[0]["a"], best_rows[0]["b"], int(best_rows[0]["pf"])
        merges.append((rank, lhs, rhs, pf))
        m = pairs.filter((F.col("a") == lhs) & (F.col("b") == rhs)).select(
            "w", "pos"
        )
        isl = m.withColumn(
            "isl",
            F.col("pos") - F.row_number().over(W.partitionBy("w").orderBy("pos")),
        )
        keep = (
            isl.withColumn(
                "off",
                F.col("pos") - F.min("pos").over(W.partitionBy("w", "isl")),
            )
            .filter(F.col("off") % 2 == 0)
            .select(F.col("w").alias("kw"), F.col("pos").alias("kpos"))
        )
        prev_k = keep.select(
            F.col("kw").alias("dw"), (F.col("kpos") + 1).alias("dpos")
        )
        toks = (
            toks.join(
                keep,
                (F.col("w") == F.col("kw")) & (F.col("pos") == F.col("kpos")),
                "left",
            )
            .join(
                prev_k,
                (F.col("w") == F.col("dw")) & (F.col("pos") == F.col("dpos")),
                "left",
            )
            .filter(F.col("dpos").isNull())
            .select(
                "w",
                "freq",
                "pos",
                F.when(
                    F.col("kpos").isNotNull(), F.concat(F.col("tok"), F.lit(rhs))
                )
                .otherwise(F.col("tok"))
                .alias("tok"),
            )
            .withColumn(
                "pos",
                F.row_number().over(W.partitionBy("w").orderBy("pos")) - 1,
            )
            .localCheckpoint()  # word-table-sized; truncates round lineage
        )
    return spark.createDataFrame(merges, schema)

"""Training-data audits (round 7): the checks an ML-data team runs on a
labeled/embedded corpus before training — class balance and loss
weights, deterministic k-fold assignment, kNN label-noise detection,
per-source duplication pressure, and centroid-margin mislabel flags.

Scale notes:
- class weights / fold balance are one map-side-combinable count
  aggregate each; fold assignment is a pure narrow md5 expression
  (operators/sampling._bucket — identical rows on every engine, unlike
  rand(seed)).
- the kNN noise audit reuses functions/similarity.cosine_topk: the
  audited subset is bounded and BROADCAST, the corpus never shuffles.
- centroid margins are |labels| centroids (a 64-float frame) broadcast
  back over one corpus scan; per-row math is JVM higher-order array
  expressions (zip_with dot products), no Python.
- dup-rate-by-source is the dedup_exact md5 collapse re-aggregated per
  source: one hash shuffle, (hash, source)-only wire traffic.

Cross-engine determinism: counts/hashes exact; cosine and margins are
double math rounded to 6 before any ranking or flag, with id
tie-breaks everywhere an order matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_etl_spark.catalog.registry import query
from pandas_etl_spark.sources import load_table
from pandas_etl_spark.sources.io import ensure_parallelism

_FOLDS = 5
_NOISE_CAP = 500  # bounded audited subset: broadcast side fixed per SF
_NOISE_K = 5

# DuckDB twin of operators/sampling._bucket(key, m)
_DD_BUCKET = (
    "CAST('0x' || substring(md5(CAST({key} AS VARCHAR)), 1, 8) AS BIGINT)"
    " % {m}"
)


@query(
    "class_weights_inverse_freq",
    oracle="""
    WITH c AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label),
    t AS (SELECT sum(n) AS total, count(*) AS k FROM c)
    SELECT label,
           CAST(n AS BIGINT) AS n,
           round(n * 1.0 / total, 6) AS share,
           round(total * 1.0 / (k * n), 6) AS weight
    FROM c CROSS JOIN t
    """,
)
def q_class_weights_inverse_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class weights (sklearn's 'balanced'
    convention: N / (k·n_label)) plus the raw class shares — the loss
    re-weighting table for an imbalanced label set. One count
    aggregate; the weight math runs on the |labels| grid against a
    broadcast 1-row total."""
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    c = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"), F.count(F.lit(1)).alias("k"))
    return c.crossJoin(F.broadcast(t)).select(
        "label",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") * 1.0 / F.col("total"), 6).alias("share"),
        F.round(
            F.col("total") * 1.0 / (F.col("k") * F.col("n")), 6
        ).alias("weight"),
    )


@query(
    "stratified_kfold_assign",
    oracle=f"""
    WITH a AS (
        SELECT doc_id, lang,
               {_DD_BUCKET.format(key="doc_id", m=_FOLDS)} AS fold
        FROM documents
    )
    SELECT lang, CAST(fold AS BIGINT) AS fold,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id,
           CAST(max(doc_id) AS BIGINT) AS max_doc_id
    FROM a GROUP BY lang, fold
    """,
)
def q_stratified_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold cross-validation assignment by content hash
    (md5 bucket of doc_id — reproducible across engines, runs, and
    repartitionings, unlike rand(seed)), reported as the per-(stratum,
    fold) balance table used to verify the folds are stratified-even
    before training. Assignment is a narrow expression (no shuffle);
    the balance report is one aggregate."""
    from pandas_etl_spark.operators.sampling import _bucket

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    a = docs.select("doc_id", "lang", _bucket("doc_id", _FOLDS).alias("fold"))
    return a.groupBy("lang", F.col("fold").cast("bigint").alias("fold")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
        F.max("doc_id").cast("bigint").alias("max_doc_id"),
    )


@query(
    "knn_label_noise",
    oracle=f"""
    WITH q AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS qv, label
        FROM embeddings WHERE vec_id < {_NOISE_CAP}
    ),
    s AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev, label
        FROM embeddings
    ),
    sims AS (
        SELECT q.vec_id, s.vec_id AS nbr, s.label AS nbr_label, q.label,
               round(list_dot_product(s.ev, q.qv) /
                     (sqrt(list_dot_product(s.ev, s.ev)) *
                      sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos
        FROM s, q WHERE s.vec_id <> q.vec_id
    ),
    top AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                          ORDER BY cos DESC, nbr) AS rn
            FROM sims
        ) WHERE rn <= {_NOISE_K}
    )
    SELECT vec_id, label,
           CAST(sum(CASE WHEN nbr_label <> label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_disagree,
           sum(CASE WHEN nbr_label <> label THEN 1 ELSE 0 END) * 2
               > {_NOISE_K} AS noise_flag
    FROM top GROUP BY vec_id, label
    """,
)
def q_knn_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label-noise detection (the Wilson/edited-nearest-neighbor
    audit): a vector whose k=5 cosine neighbors mostly carry a
    DIFFERENT label is a mislabel candidate to re-queue for annotation.
    The audited subset is bounded (vec_id < cap) and broadcast through
    cosine_topk — the corpus never shuffles; the vote is a tiny
    (id, label) aggregate. Cosine rounded to 6 before ranking with
    neighbor-id tie-break, so the neighbor set is engine-exact."""
    from pandas_etl_spark.functions import similarity as sim

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _NOISE_CAP).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        "label",
    )
    nbrs = sim.cosine_topk(
        emb, q.select("query_id", "query_vec"), k=_NOISE_K, dim=64
    )  # cosine_topk always excludes the self-match (same vec_id)
    labeled = nbrs.join(
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("nbr_label"),
        ),
        "neighbor_id",
    ).join(F.broadcast(q.select("query_id", "label")), "query_id")
    dis = F.sum(
        F.when(F.col("nbr_label") != F.col("label"), 1).otherwise(0)
    )
    return labeled.groupBy(
        F.col("query_id").alias("vec_id"), "label"
    ).agg(
        dis.cast("bigint").alias("n_disagree"),
        (dis * 2 > _NOISE_K).alias("noise_flag"),
    )


@query(
    "dedup_rate_by_source",
    oracle="""
    WITH h AS (
        SELECT source,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct,
           CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS dup_rows,
           round((count(*) - count(DISTINCT fp)) * 1.0 / count(*), 6)
               AS dup_ratio
    FROM h GROUP BY source
    """,
)
def q_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplication pressure: how much of each source
    survives dedup_exact's md5 collapse — the mixture-planning signal
    (a source that is 40% duplicates contributes far fewer effective
    tokens than its raw size claims). Same whitespace-normalized md5
    fingerprint as dedup_exact; one (source)-keyed aggregate with
    distinct-hash counting, (hash, source)-only wire traffic."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    fp = F.md5(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    )
    h = docs.select("source", fp.alias("fp"))
    return h.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("fp").cast("bigint").alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct("fp"))
        .cast("bigint")
        .alias("dup_rows"),
        F.round(
            (F.count(F.lit(1)) - F.countDistinct("fp"))
            * 1.0
            / F.count(F.lit(1)),
            6,
        ).alias("dup_ratio"),
    )


@query(
    "centroid_margin_audit",
    oracle="""
    WITH v AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ev
        FROM embeddings
    ),
    flat AS (
        SELECT label, unnest(ev) AS x, generate_subscripts(ev, 1) AS pos
        FROM v
    ),
    cent AS (
        SELECT label, list(avg_x ORDER BY pos) AS cv
        FROM (
            SELECT label, pos, avg(x) AS avg_x
            FROM flat GROUP BY label, pos
        ) GROUP BY label
    ),
    scored AS (
        SELECT v.vec_id, v.label, c.label AS c_label,
               round(list_dot_product(v.ev, c.cv) /
                     (sqrt(list_dot_product(v.ev, v.ev)) *
                      sqrt(list_dot_product(c.cv, c.cv))), 6) AS cos
        FROM v, cent c
    ),
    own AS (
        SELECT vec_id, label, cos AS own_cos FROM scored
        WHERE label = c_label
    ),
    best_other AS (
        SELECT vec_id, max(cos) AS other_cos FROM scored
        WHERE label <> c_label GROUP BY vec_id
    )
    SELECT o.vec_id, o.label, o.own_cos,
           b.other_cos,
           round(o.own_cos - b.other_cos, 6) AS margin,
           o.own_cos < b.other_cos AS mislabel_flag
    FROM own o JOIN best_other b USING (vec_id)
    """,
)
def q_centroid_margin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-margin mislabel audit: each vector's cosine to its OWN
    label centroid minus its best cosine to any OTHER centroid — a
    negative margin means the vector sits closer to a different
    class's center (the cheap complement of the kNN noise audit:
    O(|V|·|labels|) instead of O(|V|·|corpus|)). Centroids are one
    posexplode aggregate to a |labels|×64 frame, broadcast back over a
    single corpus scan; per-row scoring is zip_with dot products —
    JVM expressions, no Python, and the corpus never shuffles."""
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    v = emb.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("ev")
    )
    cent = (
        v.select("label", F.posexplode("ev").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("avg_x"))
        .groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "avg_x"))
            ).alias("pc")
        )
        .select(
            F.col("label").alias("c_label"),
            F.transform("pc", lambda s: s.avg_x).alias("cv"),
        )
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = v.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "label",
        "c_label",
        F.round(
            dot(F.col("ev"), F.col("cv"))
            / (
                F.sqrt(dot(F.col("ev"), F.col("ev")))
                * F.sqrt(dot(F.col("cv"), F.col("cv")))
            ),
            6,
        ).alias("cos"),
    )
    own = scored.filter(F.col("label") == F.col("c_label")).select(
        "vec_id", "label", F.col("cos").alias("own_cos")
    )
    other = (
        scored.filter(F.col("label") != F.col("c_label"))
        .groupBy("vec_id")
        .agg(F.max("cos").alias("other_cos"))
    )
    return own.join(other, "vec_id").select(
        "vec_id",
        "label",
        "own_cos",
        "other_cos",
        F.round(F.col("own_cos") - F.col("other_cos"), 6).alias("margin"),
        (F.col("own_cos") < F.col("other_cos")).alias("mislabel_flag"),
    )

"""Advanced operator catalog: as-of join, per-group pandas UDFs (ewm),
pct_change, first/last-by, binning, horizontal concat, anchored weekly
Grouper, multimodal columns (SURVEY §2.4-§2.9).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pandas_etl_spark.catalog.registry import query
from pandas_etl_spark.functions import multimodal as mm
from pandas_etl_spark.functions.timeparse import grouper_bucket
from pandas_etl_spark.functions.udf import apply_by_group
from pandas_etl_spark.operators import asof_join
from pandas_etl_spark.sources import load_table
from pandas_etl_spark.sources.io import ensure_parallelism


@query(
    "asof_join_events",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, arg_max(value, event_id) AS click_value
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ),
    purchases AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           c.click_value, c.ts AS ts_click
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pd.merge_asof parity: for each purchase, the most recent click by
    the same user at-or-before it. Union-tag + running-last plan — one
    shuffle on user_id (operators/asof.py; DuckDB has native ASOF JOIN
    as the oracle)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("click_value"))
    )
    return asof_join(purchases, clicks, on="ts", by="user_id", suffix="_click")


_EWM_ALPHA = 0.2


@query(
    "ewm_mean",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_id, ts, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events WHERE event_type = 'purchase'
    ),
    lists AS (
        SELECT user_id, list(value ORDER BY ts, event_id) AS vs
        FROM ordered GROUP BY user_id
    )
    SELECT o.user_id, o.event_id, o.value,
           round(CAST(list_reduce(l.vs[1:o.rn],
                 (acc, x) -> {1 - _EWM_ALPHA} * acc + {_EWM_ALPHA} * x) AS DOUBLE), 6)
               AS ewm_value
    FROM ordered o JOIN lists l USING (user_id)
    """,
)
def q_ewm_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas ``ewm(alpha, adjust=False).mean()`` per group — the
    Pandas-UDF (M5) showcase: no closed-form SQL window exists. Plan:
    repartition by user, sort within partitions, ONE mapInPandas per
    partition running Cythonized ``groupby().ewm`` over all its groups —
    per-group ``applyInPandas`` measured ~3× slower here (1500 tiny
    groups × per-group Arrow/pandas overhead). Oracle replicates the
    recursion with DuckDB list_reduce."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "event_id", "ts", "value")
    )
    n = spark.sparkContext.defaultParallelism
    part = ev.repartition(n, "user_id").sortWithinPartitions("user_id", "ts", "event_id")

    def ewm_partition(batches):
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        ewm = (
            pdf.groupby("user_id")["value"]
            .ewm(alpha=_EWM_ALPHA, adjust=False)
            .mean()
            .reset_index(level=0, drop=True)
        )
        pdf["ewm_value"] = ewm.round(6)
        yield pdf[["user_id", "event_id", "value", "ewm_value"]]

    return part.mapInPandas(
        ewm_partition, "user_id long, event_id long, value double, ewm_value double"
    )


@query(
    "pct_change",
    oracle="""
    SELECT l_partkey, l_orderkey, l_linenumber, l_extendedprice,
           (l_extendedprice - lag(l_extendedprice) OVER w)
               / lag(l_extendedprice) OVER w AS pct_change
    FROM lineitem
    WINDOW w AS (PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
    """,
)
def q_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("l_partkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    prev = F.lag("l_extendedprice").over(w)
    return load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        ((F.col("l_extendedprice") - prev) / prev).alias("pct_change"),
    )


@query(
    "first_last_by",
    oracle="""
    WITH m AS (
        SELECT o_custkey, min(o_orderdate) AS first_date, max(o_orderdate) AS last_date
        FROM orders GROUP BY o_custkey
    )
    SELECT o.o_custkey,
           min(CASE WHEN o.o_orderdate = m.first_date THEN o.o_orderkey END) AS first_order,
           max(CASE WHEN o.o_orderdate = m.last_date  THEN o.o_orderkey END) AS last_order,
           m.first_date, m.last_date
    FROM orders o JOIN m USING (o_custkey)
    GROUP BY o.o_custkey, m.first_date, m.last_date
    """,
)
def q_first_last_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas groupby().first()/last() (ordered): single-pass struct
    min/max — lexicographic (date, key) gives a deterministic tie-break
    (min_by/max_by alone are nondeterministic on date ties)."""
    ds = F.struct(F.col("o_orderdate").alias("d"), F.col("o_orderkey").alias("k"))
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.min(ds).getField("k").alias("first_order"),
            F.max(ds).getField("k").alias("last_order"),
            F.min("o_orderdate").alias("first_date"),
            F.max("o_orderdate").alias("last_date"),
        )
    )


@query(
    "cut_bins",
    oracle="""
    SELECT c_custkey, c_acctbal,
           CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 2500 THEN 'low'
                WHEN c_acctbal < 7500 THEN 'mid'
                ELSE 'high' END AS bal_bin
    FROM customer
    """,
)
def q_cut_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pd.cut with explicit edges → when-chain (Bucketizer-equivalent,
    but codegen'd and null-safe)."""
    b = F.col("c_acctbal")
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_acctbal",
        F.when(b < 0, "negative")
        .when(b < 2500, "low")
        .when(b < 7500, "mid")
        .otherwise("high")
        .alias("bal_bin"),
    )


@query(
    "hconcat_ranked",
    oracle="""
    WITH a AS (
        SELECT * FROM (
            SELECT row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn,
                   o_orderkey, o_totalprice
            FROM orders
        ) WHERE rn <= 5
    ),
    b AS (
        SELECT * FROM (
            SELECT row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rn,
                   c_custkey, c_acctbal
            FROM customer
        ) WHERE rn <= 5
    )
    SELECT CAST(a.rn AS BIGINT) AS rn, a.o_orderkey, a.o_totalprice,
           b.c_custkey, b.c_acctbal
    FROM a JOIN b USING (rn)
    """,
)
def q_hconcat_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horizontal concat (pandas axis=1) — only well-defined with an
    explicit ordering in a distributed engine: rank each side, join on
    rank (SURVEY §2.7 ordering caveat)."""
    o = (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(5)
        .withColumn(
            "rn",
            F.row_number().over(W.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))).cast("bigint"),
        )
        .select("rn", "o_orderkey", "o_totalprice")
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .limit(5)
        .withColumn(
            "rn",
            F.row_number().over(W.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))).cast("bigint"),
        )
        .select("rn", "c_custkey", "c_acctbal")
    )
    return o.join(c, "rn")


@query(
    "grouper_week_anchored",
    oracle="""
    SELECT date_trunc('week', o_orderdate - INTERVAL 1 DAY) + INTERVAL 1 DAY AS bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           sum(o_totalprice) AS total
    FROM orders
    GROUP BY bucket
    """,
)
def q_grouper_week_anchored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pd.Grouper(freq='W-MON') (reference README.md:54-58): weeks ending
    Monday, labeled by their Tuesday start (our documented start-label
    convention) via the freq-alias translation layer."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(grouper_bucket("o_orderdate", "W-MON"))
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("o_totalprice").alias("total"))
    )


@query(
    "resample_interpolate",
    oracle="""
    WITH bucketed AS (
        SELECT user_id,
               CAST(floor(extract(epoch FROM ts)) AS BIGINT)
                 - CAST(floor(extract(epoch FROM ts)) AS BIGINT) % 3600 AS bucket_s,
               avg(value) AS v
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(min(bucket_s), max(bucket_s), 3600)) AS bucket_s
        FROM bucketed GROUP BY user_id
    ),
    filled AS (
        SELECT g.user_id, g.bucket_s, b.v
        FROM grid g LEFT JOIN bucketed b USING (user_id, bucket_s)
    ),
    w AS (
        SELECT user_id, bucket_s, v,
               last_value(v IGNORE NULLS) OVER wb AS prev_v,
               last_value(CASE WHEN v IS NOT NULL THEN bucket_s END IGNORE NULLS) OVER wb AS prev_t,
               first_value(v IGNORE NULLS) OVER wf AS next_v,
               first_value(CASE WHEN v IS NOT NULL THEN bucket_s END IGNORE NULLS) OVER wf AS next_t
        FROM filled
        WINDOW wb AS (PARTITION BY user_id ORDER BY bucket_s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY user_id ORDER BY bucket_s
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id,
           CAST(to_timestamp(bucket_s) AS TIMESTAMP) AS bucket,
           CASE WHEN v IS NOT NULL THEN v
                WHEN prev_t IS NULL THEN next_v
                WHEN next_t IS NULL THEN prev_v
                ELSE prev_v + (next_v - prev_v)
                     * (CAST(bucket_s - prev_t AS DOUBLE) / CAST(next_t - prev_t AS DOUBLE))
           END AS value,
           v IS NULL AS interpolated
    FROM w
    """,
)
def q_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas resample('1h').mean().interpolate() parity: complete per-key
    hourly grid (sequence explode) + linear gap interpolation via
    backward/forward ignorenulls windows (operators/resample.py)."""
    from pandas_etl_spark.operators.resample import resample_interpolate

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return resample_interpolate(ev, key="user_id", ts_col="ts", value_col="value")


@query(
    "map_dict_lookup",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CASE c_mktsegment
                WHEN 'AUTOMOBILE' THEN 'auto' WHEN 'BUILDING' THEN 'bld'
                WHEN 'FURNITURE' THEN 'furn' WHEN 'HOUSEHOLD' THEN 'house'
                WHEN 'MACHINERY' THEN 'mach' ELSE NULL END AS seg_code
    FROM customer
    """,
)
def q_map_dict_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series.map(dict) parity (§2.8): literal create_map + getItem —
    unmatched keys → null, like pandas."""
    mapping = {
        "AUTOMOBILE": "auto",
        "BUILDING": "bld",
        "FURNITURE": "furn",
        "HOUSEHOLD": "house",
        "MACHINERY": "mach",
    }
    m = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        m.getItem(F.col("c_mktsegment")).alias("seg_code"),
    )


@query(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS payload_bytes,
           md5(text) AS payload_md5,
           'application/octet-stream' AS sniffed_mime
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary-column convention: text bytes stand in for media
    payloads (no media libs in-container); metadata extraction is pure
    JVM (octet_length / md5 / magic-byte sniff)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return mm.attach_binary_meta(d, "payload").select(
        "doc_id", "payload_bytes", "payload_md5", "sniffed_mime"
    )


@query(
    "multimodal_decode_stub",
    oracle="""
    WITH h AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(text), 1, 8) AS BIGINT) % 2147483648 AS hv
        FROM documents
    )
    SELECT doc_id,
           CAST(16 + hv % 1024 AS INTEGER) AS width,
           CAST(16 + (hv // 1024) % 1024 AS INTEGER) AS height,
           TRUE AS ok
    FROM h
    """,
)
def q_multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode plumbing over binary payloads. The stub decoder
    derives fake dims from md5(payload) — deterministic AND closed-form,
    so the whole Arrow-batched Python path is oracle-checked end-to-end
    (DuckDB md5 over the same UTF-8 bytes reproduces width/height
    exactly)."""
    d = ensure_parallelism(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.encode("text", "UTF-8").alias("payload")
        )
    )
    return mm.decode_images(d, "payload", "doc_id")


@query(
    "multimodal_audio_stub",
    oracle="""
    SELECT doc_id,
           CAST(greatest(length(text) - 4, 0) AS BIGINT) AS n_samples,
           CAST(greatest(length(text) - 4, 0) * 1000 // 8000 AS BIGINT)
               AS duration_ms,
           CASE WHEN length(text) > 4 THEN
               round(list_avg(list_transform(generate_series(5, length(text)),
                                             i -> ord(substr(text, i, 1)))), 6)
           END AS mean_amplitude,
           length(text) > 4 AS ok
    FROM documents
    """,
)
def q_multimodal_audio_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality twin of multimodal_decode_stub: mapInPandas decode
    of fake 8 kHz PCM8 payloads (4-byte header) — sample count,
    duration, mean amplitude. Byte values equal code points for the
    ASCII stand-in payloads, so the Arrow-batched Python path is
    oracle-checked end-to-end; integer sums are exact in fp64, so the
    mean matches DuckDB bit-for-bit before rounding."""
    d = ensure_parallelism(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.encode("text", "UTF-8").alias("payload")
        )
    )
    out = mm.decode_audio(d, "payload", "doc_id")
    return out.withColumn("mean_amplitude", F.round("mean_amplitude", 6))


@query(
    "qcut_quartiles",
    oracle="""
    WITH cuts AS (
        SELECT quantile_cont(o_totalprice, 0.25) AS p25,
               quantile_cont(o_totalprice, 0.5)  AS p50,
               quantile_cont(o_totalprice, 0.75) AS p75
        FROM orders
    )
    SELECT o_orderkey, o_totalprice,
           CASE WHEN o_totalprice <= p25 THEN 0
                WHEN o_totalprice <= p50 THEN 1
                WHEN o_totalprice <= p75 THEN 2
                ELSE 3 END AS quartile
    FROM orders, cuts
    """,
)
def q_qcut_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pd.qcut(4) via exact percentile CUTPOINTS + broadcast, not a
    global-sort ntile: the one-row cutpoint aggregate broadcasts to a
    narrow CASE per row, so there is no full-table sort/single-reducer
    stage — the qcut plan that survives 100 TB. (Spark F.percentile and
    DuckDB quantile_cont interpolate identically.)"""
    o = load_table(spark, sf_dir, "orders")
    cuts = o.agg(
        F.percentile("o_totalprice", 0.25).alias("p25"),
        F.percentile("o_totalprice", 0.5).alias("p50"),
        F.percentile("o_totalprice", 0.75).alias("p75"),
    )
    p = F.col("o_totalprice")
    return (
        o.crossJoin(F.broadcast(cuts))
        .select(
            "o_orderkey",
            "o_totalprice",
            F.when(p <= F.col("p25"), 0)
            .when(p <= F.col("p50"), 1)
            .when(p <= F.col("p75"), 2)
            .otherwise(3)
            .alias("quartile"),
        )
    )


_NIBBLE_COUNTS = ", ".join(
    f"CAST(nb - length(replace(hi, '{d}', '')) AS VARCHAR)" for d in "0123456789ABCDEF"
)


@query(
    "multimodal_features",
    oracle=f"""
    WITH n AS (
        SELECT doc_id,
               regexp_replace(hex(encode(text)), '(.).', '\\1', 'g') AS hi,
               octet_length(encode(text)) AS nb
        FROM documents
    )
    SELECT doc_id, concat_ws(',', {_NIBBLE_COUNTS}) AS features_csv
    FROM n
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (16-bin
    high-nibble byte histogram — real numpy computation, the same
    mapInPandas shape a CLIP/CNN embedder plugs into;
    functions/multimodal.py). Emitted as exact integer counts so the
    Python/Arrow path is oracle-checked bit-for-bit: the histogram of
    high nibbles equals per-digit counts over the odd positions of
    ``hex(payload)``, which ANSI SQL expresses with regexp_replace +
    length arithmetic. Comma-joined scalars (driver canonicalizer can't
    hash arrays)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    feats = mm.extract_byte_features(d, normalize=False)
    return feats.select(
        "doc_id",
        F.array_join(F.transform("features", lambda v: v.cast("string")), ",").alias(
            "features_csv"
        ),
    )


@query(
    "image_ahash_neardup",
    oracle="""
    WITH d AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS n
        FROM documents
        WHERE octet_length(encode(text)) >= 60
    ),
    byt AS (
        SELECT doc_id, n, i,
               CAST('0x' || substr(hx, CAST(2 * i + 1 AS INTEGER), 2)
                    AS INTEGER) AS v,
               CAST((i * 60) // n AS INTEGER) AS blk
        FROM (SELECT doc_id, hx, n, unnest(range(n)) AS i FROM d)
    ),
    blocks AS (
        SELECT doc_id, n, blk, sum(v) AS s, count(*) AS l
        FROM byt GROUP BY 1, 2, 3
    ),
    tot AS (SELECT doc_id, sum(v) AS tv FROM byt GROUP BY 1),
    h AS (
        SELECT b.doc_id,
               CAST(sum(CASE WHEN b.s * b.n > t.tv * b.l
                             THEN CAST(1 AS BIGINT) << CAST(b.blk AS INTEGER)
                             ELSE 0 END) AS BIGINT) AS sim
        FROM blocks b JOIN tot t USING (doc_id)
        GROUP BY 1
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
    FROM h a, h b
    WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sim, b.sim)) <= 12
    """,
)
def q_image_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate binary blobs by block-mean perceptual fingerprint
    (aHash shape, codec stubbed — functions/multimodal.ahash_signatures):
    Arrow-batched numpy hashing of each payload to a 60-bit integer,
    then the EXACT pigeonhole Hamming blocking shared with SimHash
    (functions/dedup.simhash_neighbors) — fingerprints shuffle as one
    bigint per blob, payloads never re-cross the wire, and no all-pairs
    product exists outside the DuckDB oracle (which rebuilds the same
    integer hashes from hex(payload) byte pairs and brute-forces
    bit_count(xor)). Radius 12 (wider than SimHash's default 8) because
    byte-stream hashing is alignment-sensitive — small edits shift every
    later block — so 13 pigeonhole chunks of ~4-5 bits each; blocking
    stays EXACT but prunes less than at pixel-hash radii (~4), the
    honest trade until a real codec supplies alignment-stable pixels."""
    from pandas_etl_spark.functions import dedup as dd
    from pandas_etl_spark.functions import multimodal as mm

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    sig = mm.ahash_signatures(
        ensure_parallelism(d), "payload", "doc_id", bits=60
    )
    pairs = dd.simhash_neighbors(sig, max_hamming=12)
    return pairs.select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        F.col("hamming").cast("int").alias("hamming"),
    )


@query(
    "asof_nearest_click",
    oracle="""
    WITH p AS (
        SELECT user_id, event_id AS purchase_id,
               extract(epoch FROM ts) AS tss
        FROM events WHERE event_type = 'purchase'
    ),
    c0 AS (
        SELECT user_id, extract(epoch FROM ts) AS tss,
               max(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY 1, 2
    )
    SELECT p.user_id, p.purchase_id,
           round(p.tss, 6) AS purchase_s,
           l.click_id,
           round(l.tss, 6) AS click_s,
           round(p.tss - l.tss, 6) AS gap_s
    FROM p LEFT JOIN LATERAL (
        SELECT click_id, tss FROM c0
        WHERE c0.user_id = p.user_id AND abs(c0.tss - p.tss) <= 1800
        ORDER BY abs(c0.tss - p.tss),
                 CASE WHEN c0.tss <= p.tss THEN 0 ELSE 1 END
        LIMIT 1
    ) l ON TRUE
    """,
)
def q_asof_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join under a tolerance: every purchase
    matches its closest click (either direction, backward wins exact
    ties — pandas merge_asof semantics) by the same user within 1800 s,
    unmatched purchases kept with NULLs. Completes the oracle-checked
    as-of family (asof_join_events covers backward). The right side is
    deduplicated to one click per (user, second) so the match is a
    well-defined total order.

    Scale shape: one (user | tss) window pass over the union — the
    backward and forward scans share a single Exchange + sort, no
    self-join, no global sort. The oracle is a per-row LATERAL argmin —
    fine at gate scale, exactly what the window plan avoids at 100 TB."""
    from pandas_etl_spark.functions.timeparse import ts_seconds

    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        ts_seconds("ts").alias("tss"),
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", ts_seconds("ts").alias("tss"))
        .agg(F.max("event_id").alias("click_id"))
    )
    m = asof_join(
        p, c, on="tss", by="user_id", direction="nearest", tolerance=1800
    )
    return m.select(
        "user_id",
        "purchase_id",
        F.round(F.col("tss"), 6).alias("purchase_s"),
        "click_id",
        F.round(F.col("tss_right"), 6).alias("click_s"),
        F.round(F.col("tss") - F.col("tss_right"), 6).alias("gap_s"),
    )


_RCORR_W = 8


@query(
    "rolling_corr",
    oracle=f"""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(corr(l_extendedprice, l_quantity) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN {_RCORR_W - 1} PRECEDING AND CURRENT ROW), 6)
               AS roll_corr
    FROM lineitem
    QUALIFY row_number() OVER (
        PARTITION BY l_suppkey
        ORDER BY l_shipdate, l_orderkey, l_linenumber) >= {_RCORR_W}
    """,
)
def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas ``groupby().rolling(8).corr()`` parity: per-supplier
    rolling Pearson correlation of price vs quantity over an 8-row
    frame (full windows only — pandas' min_periods=window default).
    ONE shuffle on l_suppkey shared by the corr frame and the
    row-number gate; the correlation is Catalyst's native windowed
    co-moment aggregate (no Python), rounded above the tiny-frame
    summation ulp."""
    from pandas_etl_spark.sources.io import ensure_parallelism

    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    w = W.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    return (
        li.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.round(
                F.corr("l_extendedprice", "l_quantity").over(
                    w.rowsBetween(-(_RCORR_W - 1), 0)
                ),
                6,
            ).alias("roll_corr"),
            F.row_number().over(w).alias("__rn"),
        )
        .filter(F.col("__rn") >= _RCORR_W)
        .drop("__rn")
    )

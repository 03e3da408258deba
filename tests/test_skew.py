"""Salted aggregate/join correctness vs their unsalted equivalents."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_etl_spark.operators.skew import salted_aggregate, salted_join


def test_salted_aggregate_matches_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = {
        r.l_returnflag: (r.n, round(r.tot, 6), r.mx)
        for r in salted_aggregate(
            li,
            ["l_returnflag"],
            {
                "n": (F.count(F.lit(1)), F.sum("n")),
                "tot": (F.sum("l_quantity"), F.sum("tot")),
                "mx": (F.max("l_extendedprice"), F.max("mx")),
            },
        ).collect()
    }
    exp = {
        r.l_returnflag: (r.n, round(r.tot, 6), r.mx)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("tot"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    }
    assert got == exp


def test_salted_join_matches_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    got = salted_join(li, o, on="l_orderkey", n=4).groupBy("o_orderpriority").count()
    exp = li.join(o, "l_orderkey").groupBy("o_orderpriority").count()
    assert {(r.o_orderpriority, r["count"]) for r in got.collect()} == {
        (r.o_orderpriority, r["count"]) for r in exp.collect()
    }


def test_ngram_jaccard_hot_shingle_skew(spark):
    """Skew stress: every doc shares a hot boilerplate phrase (its
    shingles hit every document). The df-cap must (a) drop those
    stop-shingles so the bucketed plan stays bounded, and (b) still
    find the genuinely near-duplicate pair while never pairing docs
    that only share boilerplate."""
    from pandas_etl_spark.functions.dedup import ngram_jaccard_pairs

    boiler = "subscribe to our newsletter for daily updates and offers"
    rows = [(i, f"{boiler} unique document body number {i} with words {i*7}") for i in range(200)]
    # one true near-dup pair: 200/201 differ by one trailing token
    rows.append((200, f"{boiler} the quick brown fox jumps over the lazy dog alpha"))
    rows.append((201, f"{boiler} the quick brown fox jumps over the lazy dog beta"))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(d, threshold=0.5, max_df=20).collect()
    }
    assert (200, 201) in pairs
    # boilerplate alone must not create pairs among the 200 unique docs
    assert not any(a < 200 and b < 200 for a, b in pairs), sorted(pairs)[:10]


def test_salted_key_stat_count_matches_window(spark):
    """salted_key_stat('count') must be row-for-row identical to the
    plain count-over-key window it replaces (r11 de-skew, VERDICT r10
    #1), including on a hot key owning most rows."""
    from pyspark.sql import Window as W

    from pandas_etl_spark.functions.dedup import salted_key_stat

    rows = [(i, "hot") for i in range(500)]
    rows += [(1000 + i, f"rare{i % 37}") for i in range(200)]
    rows += [(2000 + i, f"solo{i}") for i in range(50)]
    d = spark.createDataFrame(rows, "id long, key string")
    got = sorted(
        (r.key, r.id, r.df)
        for r in salted_key_stat(d, ["key"], "id", "count", "df").collect()
    )
    exp = sorted(
        (r.key, r.id, r.df)
        for r in d.withColumn(
            "df", F.count(F.lit(1)).over(W.partitionBy("key"))
        ).collect()
    )
    assert got == exp


def test_salted_key_stat_min_matches_window(spark):
    """salted_key_stat('min') ownership must equal min-over-key,
    including extra non-key columns (prune-guard path)."""
    from pyspark.sql import Window as W

    from pandas_etl_spark.functions.dedup import salted_key_stat

    rows = [(i, i % 7, f"k{i % 13}") for i in range(800)]
    rows += [(900 + i, i, "hotgram") for i in range(300)]
    d = spark.createDataFrame(rows, "id long, pos int, key string")
    got = sorted(
        (r.key, r.id, r.pos, r.owner)
        for r in salted_key_stat(d, ["key"], "id", "min", "owner").collect()
    )
    exp = sorted(
        (r.key, r.id, r.pos, r.owner)
        for r in d.withColumn(
            "owner", F.min("id").over(W.partitionBy("key"))
        ).collect()
    )
    assert got == exp


def test_salted_key_stat_single_scan_plan(spark):
    """The salted attach must keep ONE source scan: its full-width
    exchange is written once and read by both the partial-stat
    aggregate and the attach join (ReusedExchange); if column pruning
    diverged the two subtrees the source pipeline would run twice —
    the §2a AQE-reuse defect class this helper explicitly guards
    against with its prune-guard aggregates."""
    import tempfile

    from pandas_etl_spark.functions.dedup import salted_key_stat

    with tempfile.TemporaryDirectory() as tmp:
        spark.range(1000).selectExpr(
            "id", "cast(id % 50 as string) as key", "id * 2 as pos"
        ).write.mode("overwrite").parquet(tmp)
        src = spark.read.parquet(tmp)
        for stat, col in (("count", "df"), ("min", "owner")):
            out = salted_key_stat(src, ["key"], "id", stat, col)
            out.collect()  # AQE reuse is a RUNTIME decision: check final plan
            final = out._jdf.queryExecution().executedPlan().toString()
            final = final.split("== Initial Plan ==")[0]
            n_scans = final.count("FileScan parquet")
            assert n_scans == 1, f"{stat}: expected 1 scan, got {n_scans}:\n{final}"
            assert "ReusedExchange" in final, f"{stat}:\n{final}"


def test_df_capped_helpers_match_window(spark):
    """df_capped_buckets / df_capped_rows (the r11 marker-scheme
    skew-safe df cap) must reproduce the plain window-count cap exactly,
    including borderline keys whose per-salt partials are all under the
    cap while their total exceeds it."""
    from pyspark.sql import Window as W

    from pandas_etl_spark.functions.dedup import (
        df_capped_buckets,
        df_capped_rows,
    )

    rows = [(i, "stop") for i in range(400)]  # far over cap in any salt
    rows += [(i * 13 + 1, f"border{i % 3}") for i in range(36)]  # 12 each
    rows += [(i, f"rare{i % 29}") for i in range(60)]
    rows += [(5000 + i, f"solo{i}") for i in range(20)]
    d = spark.createDataFrame(rows, "id long, key string")
    for cap in (5, 10, 50):
        base = d.withColumn(
            "df", F.count(F.lit(1)).over(W.partitionBy("key"))
        ).filter(F.col("df") <= cap)
        exp_rows = sorted((r.key, r.id, r.df) for r in base.collect())
        got_rows = sorted(
            (r.key, r.id, r.df)
            for r in df_capped_rows(d, ["key"], "id", cap, "df").collect()
        )
        assert got_rows == exp_rows, f"cap={cap}"
        exp_buckets = sorted(
            (r.key, tuple(r.ids))
            for r in base.groupBy("key")
            .agg(F.sort_array(F.collect_list("id")).alias("ids"))
            .collect()
        )
        got_buckets = sorted(
            (r.key, tuple(r.ids))
            for r in df_capped_buckets(d, ["key"], "id", cap).collect()
        )
        assert got_buckets == exp_buckets, f"cap={cap}"

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

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

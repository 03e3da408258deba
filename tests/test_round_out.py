"""Round-out coverage: merge indicator, crosstab, Grouper freq aliases,
foreachBatch streaming sink, excel stub."""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from pandas_etl_spark.functions.timeparse import grouper_bucket
from pandas_etl_spark.pandas_ops import Table, crosstab, merge, read_excel


def test_merge_indicator(spark):
    l = Table(spark.createDataFrame([(1, "a"), (2, "b")], "id int, lv string"))
    r = Table(spark.createDataFrame([(2, "B"), (3, "C")], "id int, rv string"))
    out = {
        r_.id: r_._merge
        for r_ in merge(l, r, on="id", how="outer", indicator=True).df.collect()
    }
    assert out == {1: "left_only", 2: "both", 3: "right_only"}


def test_crosstab_counts(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ct = crosstab(Table(o), None, "o_orderpriority", "o_orderstatus")
    pdf = ct.df.toPandas().set_index("o_orderpriority")
    exp = duckdb.sql(
        f"""SELECT o_orderpriority,
                   count(*) FILTER (WHERE o_orderstatus='O') AS "O"
            FROM '{sf_dir}/orders.parquet' GROUP BY 1"""
    ).df().set_index("o_orderpriority")
    for k in exp.index:
        assert pdf.loc[k, "O"] == exp.loc[k, "O"]


@pytest.mark.parametrize(
    "freq,expected",
    [
        ("D", dt.datetime(2024, 3, 7)),
        ("M", dt.datetime(2024, 3, 1)),
        ("Q", dt.datetime(2024, 1, 1)),
        ("Y", dt.datetime(2024, 1, 1)),
        ("H", dt.datetime(2024, 3, 7, 14)),
        ("W", dt.datetime(2024, 3, 4)),  # Monday of that week
        ("W-SUN", dt.datetime(2024, 3, 4)),  # weeks ending Sunday start Monday
        ("W-WED", dt.datetime(2024, 3, 7)),  # Thu-start week: Mar 7 IS Thursday
    ],
)
def test_grouper_freq_aliases(spark, freq, expected):
    df = spark.createDataFrame([(dt.datetime(2024, 3, 7, 14, 30, 5),)], "t timestamp")
    got = df.select(grouper_bucket("t", freq).alias("b")).collect()[0].b
    assert got == expected, freq


def test_stream_foreach_batch_parquet_sink(spark, sf_dir, tmp_path):
    """foreachBatch: the exactly-once-style custom sink pattern — each
    micro-batch lands as parquet; drained result equals the batch read."""
    from pandas_etl_spark.streaming import read_events_stream

    out = str(tmp_path / "sink")
    ev = read_events_stream(spark, sf_dir).filter(F.col("event_type") == "signup")

    def write_batch(df, epoch_id):
        df.write.mode("append").parquet(out)

    q = ev.writeStream.foreachBatch(write_batch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(out).count()
    exp = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "signup")
        .count()
    )
    assert got == exp > 0


def test_read_excel_stub_gated(spark, tmp_path):
    """Without excel deps the source raises the documented stub error (or
    reads fine when openpyxl exists)."""
    p = tmp_path / "x.xlsx"
    p.write_bytes(b"not a real workbook")
    with pytest.raises((NotImplementedError, ValueError, Exception)):
        read_excel(spark, str(p))

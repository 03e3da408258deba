"""Spark 4 Python Data Source (sources/pydatasource.py): registration,
partition-parallel generation, determinism, and composition with the
text-operator family."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandas_etl_spark.sources.pydatasource import register_synthetic_docs


@pytest.fixture()
def docs_source(spark):
    register_synthetic_docs(spark)
    return spark


def _load(spark, **opts):
    r = spark.read.format("synthetic_docs")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_row_count_and_schema(docs_source):
    df = _load(docs_source, n_rows=250, n_partitions=4)
    assert df.count() == 250
    assert df.schema.simpleString() == (
        "struct<doc_id:bigint,text:string,lang:string,source:string,n_chars:int>"
    )
    row = df.filter(F.col("doc_id") == 7).first()
    assert row.n_chars == len(row.text)


def test_partitioning_does_not_change_content(docs_source):
    a = sorted(map(tuple, _load(docs_source, n_rows=300, n_partitions=3).collect()))
    b = sorted(map(tuple, _load(docs_source, n_rows=300, n_partitions=11).collect()))
    assert a == b


def test_seed_changes_content(docs_source):
    base = sorted(r.text for r in _load(docs_source, n_rows=50, seed=1).collect())
    other = sorted(r.text for r in _load(docs_source, n_rows=50, seed=2).collect())
    assert base != other


def test_reads_are_partition_parallel(docs_source):
    df = _load(docs_source, n_rows=1000, n_partitions=8)
    assert df.rdd.getNumPartitions() == 8


def test_composes_with_text_operators(docs_source):
    """The generated corpus flows through the real operator family —
    dry-run pipelines never need real data."""
    from pandas_etl_spark.functions import text as tx

    df = _load(docs_source, n_rows=200)
    out = df.select("doc_id", tx.quality_score("text").alias("q"))
    rows = out.collect()
    assert len(rows) == 200
    assert all(0.0 <= r.q <= 1.0 for r in rows)


def test_stream_reader_drains_to_max_rows(docs_source, tmp_path):
    """The streaming form emits bounded micro-batches until max_rows;
    the drained content equals the batch source's first max_rows ids."""
    stream = (
        docs_source.readStream.format("synthetic_docs")
        .option("rows_per_batch", 80)
        .option("max_rows", 200)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(map(tuple, docs_source.table("synth_stream").collect()))
    exp = sorted(map(tuple, _load(docs_source, n_rows=200).collect()))
    assert got == exp

"""Misc operator semantics: approx-distinct error envelope, parquet
checkpoints (the reference only supported csv)."""

from __future__ import annotations

import logging
import os

from pandas_etl_spark.catalog import QUERIES
from pandas_etl_spark.pipeline import Pipeline


def test_approx_distinct_envelope(spark, sf_dir):
    for r in QUERIES["approx_distinct"](spark, sf_dir).collect():
        assert abs(r.approx_parts - r.exact_parts) <= max(0.05 * r.exact_parts, 2), r


def test_parquet_checkpoint_roundtrip(spark, caplog, tmp_path):
    ckpt = str(tmp_path / "step.parquet")
    yaml_text = f"""
    preFlight:
      script: |
        def marked(df):
            logging.info("parquet step ran")
            return df.groupby(by="AB").max()
    steps:
    - pd.read_csv:
        filepath_or_buffer: ./tests/data/test.csv
    - name: grouped
      function: marked
      args:
        df: ${{ steps['pd.read_csv'].output }}
      saveProgress: {ckpt}
    """
    with caplog.at_level(logging.INFO):
        Pipeline(yamlData=yaml_text, spark=spark).run()
        assert any(r.message == "parquet step ran" for r in caplog.records)
    assert os.path.isdir(ckpt)

    caplog.clear()
    with caplog.at_level(logging.INFO):
        p2 = Pipeline(yamlData=yaml_text, spark=spark)
        p2.run()
        assert not any(r.message == "parquet step ran" for r in caplog.records)
        # resumed output readable and correctly typed
        assert p2.steps["grouped"].output.df.count() > 0


def test_partial_checkpoint_not_resumed(spark, caplog, tmp_path):
    """A checkpoint directory WITHOUT _SUCCESS (crash mid-write) must be
    recomputed, not silently resumed (ADVICE r1, medium)."""
    ckpt = str(tmp_path / "step.parquet")
    yaml_text = f"""
    preFlight:
      script: |
        def marked(df):
            logging.info("step recomputed")
            return df.groupby(by="AB").max()
    steps:
    - pd.read_csv:
        filepath_or_buffer: ./tests/data/test.csv
    - name: grouped
      function: marked
      args:
        df: ${{ steps['pd.read_csv'].output }}
      saveProgress: {ckpt}
    """
    Pipeline(yamlData=yaml_text, spark=spark).run()
    os.remove(os.path.join(ckpt, "_SUCCESS"))  # simulate crash mid-write
    with caplog.at_level(logging.INFO):
        Pipeline(yamlData=yaml_text, spark=spark).run()
        assert any(r.message == "step recomputed" for r in caplog.records)


def test_nanos_conversion_gated_on_footer(spark, tmp_path):
    """A user bigint column literally named 'ts' (epoch seconds here) must
    NOT be rewritten by the nanos normalization — conversion is keyed on
    the parquet footer's TIMESTAMP(NANOS) logical type only (ADVICE r1)."""
    from pandas_etl_spark.sources.io import load_table, nanos_columns

    p = str(tmp_path / "mytable.parquet")
    spark.createDataFrame(
        [(1, 1700000000), (2, 1700003600)], "id int, ts long"
    ).write.parquet(p)
    assert nanos_columns(p) == set()
    df = load_table(spark, str(tmp_path), "mytable")
    assert dict(df.dtypes)["ts"] == "bigint"
    assert {r.ts for r in df.collect()} == {1700000000, 1700003600}
    # the driver-generated events table IS footer-marked nanos → converted
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"


def test_unknown_checkpoint_extension_errors(spark, tmp_path):
    yaml_text = f"""
    steps:
    - name: load
      function: pd.read_csv
      args:
        filepath_or_buffer: ./tests/data/test.csv
      saveProgress: {tmp_path}/out.xlsx
    """
    import pytest

    with pytest.raises(ValueError, match="saveProgress supports"):
        Pipeline(yamlData=yaml_text, spark=spark).run()


class TestApproxQuantiles:
    def test_sketch_within_envelope(self, spark, sf_dir):
        from pandas_etl_spark.catalog import QUERIES

        for r in QUERIES["approx_quantiles"](spark, sf_dir).collect():
            # GK accuracy=1000 → rank error ≤ n/1000; on this data the
            # value error stays well inside 5% relative
            assert abs(r.approx_p50 - r.exact_p50) <= 0.05 * abs(r.exact_p50)
            assert abs(r.approx_p90 - r.exact_p90) <= 0.05 * abs(r.exact_p90)


class TestReadParquetColumns:
    def test_columns_prune_scan(self, spark, sf_dir):
        from pandas_etl_spark.sources import read_parquet

        df = read_parquet(spark, f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
        assert df.columns == ["o_orderkey", "o_totalprice"]
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
        assert "o_custkey" not in read_schema  # pruned at the scan


class TestVocabTriplets:
    def test_vocab_ids_deterministic_and_contiguous(self, spark):
        from pandas_etl_spark.functions.text import build_vocab

        df = spark.createDataFrame(
            [(1, "a b b c c c"), (2, "c d d b")], "doc_id long, text string"
        )
        rows = {r.token: (r.n, r.token_id) for r in build_vocab(df, size=3).collect()}
        # c:4 b:3 d:2 a:1 → top-3 with ids by (n desc, token)
        assert rows == {"c": (4, 0), "b": (3, 1), "d": (2, 2)}

    def test_triplets_negative_is_neither_anchor_nor_positive(self, spark):
        from pandas_etl_spark.functions.dedup import contrastive_triplets

        docs = spark.createDataFrame([(i, f"doc {i}") for i in range(20)], "doc_id long, text string")
        pairs = spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long")
        out = contrastive_triplets(docs, pairs, n_buckets=2).collect()
        assert len(out) == 2
        for r in out:
            assert r.negative_id not in (r.anchor_id, r.positive_id)
        # deterministic: same result on a different partitioning
        again = contrastive_triplets(docs.repartition(7), pairs, n_buckets=2).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))

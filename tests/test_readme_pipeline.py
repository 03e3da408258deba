"""The reference README's long-hand pipeline (README.md:40-72) run
end-to-end on our engine: source with parse_dates → pd.Grouper step →
groupby(by=Grouper, axis=columns, dropna=false) → max → to_csv, with a
DuckDB value check (the reference only ever asserted file existence)."""

from __future__ import annotations

import os

import duckdb
import pytest

from pandas_etl_spark.pipeline import Pipeline


@pytest.fixture()
def dated_csv(tmp_path):
    p = tmp_path / "test_data.csv"
    rows = ["int_column,date_column"]
    for i in range(60):
        day = 1 + (i * 3) % 28
        month = 1 + (i // 20)
        rows.append(f"{i},{day:02d}/{month:02d}/24")
    p.write_text("\n".join(rows) + "\n")
    return str(p)


def test_readme_longhand_pipeline(spark, dated_csv, tmp_path):
    out = str(tmp_path / "my-aggregated-data.csv")
    p = Pipeline(
        yamlData=f"""
        steps:

        - name:           source-df
          description:    Read from CSV (stands in for the README's pd.read_sql)
          function:       pd.read_csv
          args:
            filepath_or_buffer: {dated_csv}
            index_col:    int_column
            parse_dates:  {{ "date_column": {{ "format": "%d/%m/%y" }} }}

        - name:           Grouper for date column
          function:       pd.Grouper
          args:
            key:          date_column
            freq:         W-MON

        - name:           group-data
          description:    Group data by int and date columns every week
          function:       ${{ steps['source-df'].output.groupby }}
          args:
            by:           ${{steps['Grouper for date column'].output}}
            dropna:       false

        - name:           aggregate-data
          function:       ${{ steps['group-data'].output.max }}

        - name:           save-data
          function:       ${{ steps['aggregate-data'].output.to_csv }}
          args:
                          - {out}
        """,
        spark=spark,
    )
    p.run()
    assert os.path.exists(out)

    got = duckdb.sql(
        f"SELECT * FROM '{out}/*.csv' ORDER BY date_column"
    ).df()
    exp = duckdb.sql(
        f"""
        SELECT date_trunc('week', strptime(date_column, '%d/%m/%y') - INTERVAL 1 DAY)
                 + INTERVAL 1 DAY AS date_column,
               max(CAST(int_column AS BIGINT)) AS int_column
        FROM read_csv('{dated_csv}', all_varchar = true)
        GROUP BY 1 ORDER BY 1
        """
    ).df()
    assert list(got.date_column) == list(exp.date_column)
    assert list(got.int_column) == list(exp.int_column)


def test_yaml_pipeline_drives_llm_curation(spark, sf_dir, tmp_path):
    """The YAML engine composes with the LLM-data operators: preFlight
    imports curate_corpus, steps chain read_parquet → curate → parquet
    sink — one lazy Catalyst plan until the sink action."""
    out = tmp_path / "curated.parquet"
    yaml_text = f"""
    variables:
      sfDir: {sf_dir}
    preFlight:
      script: |
        from pandas_etl_spark.functions.curate import curate_corpus
        from pandas_etl_spark.pandas_ops import Table
        def curate(table):
            return Table(curate_corpus(
                table.df, min_tokens=8, min_quality=0.5,
                jaccard_threshold=0.85, shingle_k=5, max_df=50,
            ).select("doc_id", "lang", "source", "n_tokens", "quality"))
    steps:
    - name: load
      function: pd.read_parquet
      args:
        path: ${{ var.sfDir }}/documents.parquet
    - name: curated
      function: curate
      args:
        table: ${{ steps['load'].output }}
    - name: sink
      function: ${{ steps['curated'].output.to_parquet }}
      args:
        path: {out}
    """
    from pandas_etl_spark.pipeline import Pipeline

    Pipeline(yamlData=yaml_text, spark=spark).run()
    back = spark.read.parquet(str(out))
    assert back.count() > 0
    assert set(back.columns) == {"doc_id", "lang", "source", "n_tokens", "quality"}
    # curation result matches the catalog query exactly
    from pandas_etl_spark.catalog import QUERIES

    expect = QUERIES["curate_corpus"](spark, sf_dir)
    assert back.count() == expect.count()
    assert back.exceptAll(expect).count() == 0


def test_yaml_pipeline_full_training_data_flow(spark, sf_dir, tmp_path):
    """End-to-end training-data pipeline through the YAML language:
    read → quality expectations gate (fails fast on violations) →
    curate (gate + exact dedup + near-dup removal) → sequence packing →
    parquet sink. Four waves, one lazy plan per branch; exercises
    preFlight imports, bound-method steps, and the r3 operators
    composing."""
    out = tmp_path / "packed.parquet"
    report_out = tmp_path / "quality_report.parquet"
    yaml_text = f"""
    variables:
      sfDir: {sf_dir}
    preFlight:
      script: |
        from pandas_etl_spark.functions.curate import curate_corpus
        from pandas_etl_spark.functions.text import pack_sequences
        from pandas_etl_spark.operators.quality import check_rules
        from pandas_etl_spark.pandas_ops import Table
        def expectations(table):
            return Table(check_rules(table.df, [
                ("text_present", "text IS NOT NULL"),
                ("id_present", "doc_id IS NOT NULL"),
            ]))
        def curate(table):
            return Table(curate_corpus(table.df, min_tokens=8, min_quality=0.5,
                                       jaccard_threshold=0.85, shingle_k=5, max_df=50))
        def pack(table):
            return Table(pack_sequences(table.df, "text", "doc_id",
                                        capacity=1024, partition_by="lang"))
    steps:
    - name: load
      function: pd.read_parquet
      args:
        path: ${{ var.sfDir }}/documents.parquet
    - name: quality_report
      function: expectations
      args:
        table: ${{ steps['load'].output }}
    - name: report_sink
      function: ${{ steps['quality_report'].output.to_parquet }}
      args:
        path: {report_out}
    - name: curated
      function: curate
      args:
        table: ${{ steps['load'].output }}
    - name: packed
      function: pack
      args:
        table: ${{ steps['curated'].output }}
    - name: sink
      function: ${{ steps['packed'].output.to_parquet }}
      args:
        path: {out}
    """
    from pandas_etl_spark.pipeline import Pipeline

    Pipeline(yamlData=yaml_text, spark=spark).run()
    report = {r.rule: r.passed for r in spark.read.parquet(str(report_out)).collect()}
    assert report == {"text_present": True, "id_present": True}
    packed = spark.read.parquet(str(out))
    assert set(packed.columns) == {"lang", "doc_id", "n_tokens", "bin_id", "bin_offset"}
    # packing invariant: offsets stay inside the bin capacity
    assert packed.filter("bin_offset < 0 OR bin_offset >= 1024").count() == 0
    # packed universe == curated survivors
    from pandas_etl_spark.catalog import QUERIES

    assert packed.count() == QUERIES["curate_corpus"](spark, sf_dir).count()


def test_yaml_pipeline_drives_curation_gates(spark, sf_dir, tmp_path):
    """The round-3 curation gates compose through the YAML language:
    read → repetition gate (Gopher-style) → deterministic split →
    parquet sink, all one lazy plan per branch."""
    out = tmp_path / "gated_split.parquet"
    yaml_text = f"""
    variables:
      sfDir: {sf_dir}
    preFlight:
      script: |
        from pandas_etl_spark.functions.text import repetition_stats
        from pandas_etl_spark.operators.sampling import dataset_split
        from pandas_etl_spark.pandas_ops import Table
        def gate_and_split(table):
            keep = repetition_stats(table.df).filter("NOT repetitive")
            gated = table.df.join(keep.select("doc_id"), "doc_id", "left_semi")
            return Table(dataset_split(gated, "doc_id")
                         .select("doc_id", "lang", "split"))
    steps:
    - name: load
      function: pd.read_parquet
      args:
        path: ${{ var.sfDir }}/documents.parquet
    - name: gated
      function: gate_and_split
      args:
        table: ${{ steps['load'].output }}
    - name: sink
      function: ${{ steps['gated'].output.to_parquet }}
      args:
        path: {out}
    """
    from pandas_etl_spark.pipeline import Pipeline

    Pipeline(yamlData=yaml_text, spark=spark).run()
    back = spark.read.parquet(str(out))
    assert back.count() > 0
    assert set(back.columns) == {"doc_id", "lang", "split"}
    assert {r["split"] for r in back.select("split").distinct().collect()} <= {
        "train", "val", "test"
    }

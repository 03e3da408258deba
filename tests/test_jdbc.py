"""JDBC round-trip integration test mirroring the reference's PostgreSQL
test (/root/reference/tests/test_etl_postgresql.py:52-92) against the
Derby embedded database that ships with Spark — a real JDBC source/sink
without a docker dependency: to_sql → read_sql (query pushdown) → values
match."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandas_etl_spark.pipeline import Pipeline
from pandas_etl_spark.sources import read_sql, to_sql


@pytest.fixture()
def derby_conn(tmp_path):
    return {
        "url": f"jdbc:derby:{tmp_path}/testdb;create=true",
        "driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver",
    }


def test_jdbc_roundtrip_with_pushdown(spark, sf_dir, derby_conn):
    src = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .select("n_nationkey", "n_name", "n_regionkey")
    )
    to_sql(src, "nations", derby_conn, if_exists="replace")

    # Spark's JDBC writer creates case-sensitive quoted columns in Derby —
    # the pushed-down query (shipped verbatim, pd.read_sql-style) quotes them
    back = read_sql(
        spark,
        sql='SELECT "n_nationkey", "n_name" FROM nations WHERE "n_regionkey" = 1',
        con=derby_conn,
    )
    exp = {
        (r.n_nationkey, r.n_name)
        for r in src.filter(F.col("n_regionkey") == 1)
        .select("n_nationkey", "n_name")
        .collect()
    }
    got = {(r.n_nationkey, r.n_name) for r in back.collect()}
    assert got == exp and len(got) > 0


def test_jdbc_if_exists_modes(spark, sf_dir, derby_conn):
    src = spark.read.parquet(f"{sf_dir}/region.parquet")
    to_sql(src, "regions", derby_conn, if_exists="replace")
    to_sql(src, "regions", derby_conn, if_exists="append")
    n = read_sql(spark, sql="SELECT count(*) AS n FROM regions", con=derby_conn).collect()[0].N
    assert n == 2 * src.count()
    with pytest.raises(Exception):
        to_sql(src, "regions", derby_conn, if_exists="fail")


def test_pipeline_yaml_jdbc_connection(spark, sf_dir, tmp_path):
    """The YAML connection registry driving a JDBC sink+source end-to-end."""
    p = Pipeline(
        yamlData={
            "variables": {"db": f"{tmp_path}/pipedb"},
            "connections": {
                "warehouse": {
                    "url": "jdbc:derby:${var.db};create=true",
                    "driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver",
                }
            },
            "steps": [
                {"read_parquet": {"path": f"{sf_dir}/region.parquet"}},
                {
                    "name": "store",
                    "function": "${ steps['read_parquet'].output.to_sql }",
                    "args": {"name": "regions", "con": "${conn.warehouse}", "if_exists": "replace"},
                },
            ],
        },
        spark=spark,
    )
    p.run()
    back = read_sql(
        spark,
        sql="SELECT count(*) AS n FROM regions",
        con=p.connections.warehouse.jdbc_options(),
    )
    assert back.collect()[0].N == 5

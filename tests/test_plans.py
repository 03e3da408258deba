"""Plan-regression tests: the physical-plan properties SCALE.md claims
(pushdown, pruning, broadcast, distributed top-k, exchange reuse) are
asserted so optimizer regressions fail CI, not the bench."""

from __future__ import annotations

import pytest

from pandas_etl_spark.catalog import QUERIES


def plan_of(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    jvm = spark._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q1_pushdown_and_pruning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate reached parquet
    assert "HashAggregate" in plan
    # column pruning: untouched columns never leave the scan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema


def test_selective_filter_fully_pushed(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "filter_project")
    assert "GreaterThanOrEqual(p_size,30)" in plan
    assert "EqualTo(p_brand,Brand#3)" in plan


def test_dim_joins_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "join_dims_broadcast")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_topk_is_distributed(spark, sf_dir):
    for name in ("top_revenue_orders", "sort_limit"):
        plan = plan_of(spark, sf_dir, name)
        assert "TakeOrderedAndProject" in plan, name
        assert "GlobalSort" not in plan, name


def test_semi_anti_native(spark, sf_dir):
    assert "LeftSemi" in plan_of(spark, sf_dir, "semi_join")
    assert "LeftAnti" in plan_of(spark, sf_dir, "anti_join")


def test_ngram_selfjoin_stays_equi(spark, sf_dir):
    """The inverted-index self-join must stay an equi join on the shingle
    — never a cartesian/BNLJ. (Exchange reuse only materializes once the
    exploded side exceeds the broadcast threshold; at test scale Catalyst
    broadcasts it, which is also fine.)"""
    plan = plan_of(spark, sf_dir, "ngram_jaccard_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_single_shuffle(spark, sf_dir):
    """The as-of join must not shuffle more than once per side: one
    Exchange for the union+window (plus AQE reads), no join at all."""
    plan = plan_of(spark, sf_dir, "asof_join_events")
    assert "Join" not in plan or "BroadcastHashJoin" not in plan
    assert plan.count("Exchange") <= 4  # union window + pre-agg of clicks


def test_exact_dedup_semi_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "dedup_exact")
    assert "LeftSemi" in plan

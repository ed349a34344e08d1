"""Physical-plan shape assertions: the scale contract.

Correct rows aren't enough — these tests pin the plan properties that
make the queries survive 100× data: filters reaching the parquet
scan, pruned read schemas, broadcast joins for dims, TakeOrdered for
top-k, partial aggregation, and sketch-accuracy bounds for the
approximate operators.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ibd_pipeline_spark.catalog import load
from ibd_pipeline_spark.queries import all_queries

QUERIES = all_queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = QUERIES["filter_project"](spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "l_quantity" in plan.split("PushedFilters:")[1][:400]
    # Projection pruning: the scan must not read the unused columns.
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_tax" not in read_schema and "l_partkey" not in read_schema


def test_star_join_broadcasts_dims(spark, sf_dir):
    plan = _plan(QUERIES["join_star_broadcast"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, plan[:2000]
    assert "SortMergeJoin" not in plan


def test_topk_plans_as_take_ordered(spark, sf_dir):
    plan = _plan(QUERIES["sort_limit_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_q1_partial_aggregation(spark, sf_dir):
    plan = _plan(QUERIES["q1_pricing_summary"](spark, sf_dir))
    # partial + final hash aggregate around the exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_semi_join_is_semi_in_plan(spark, sf_dir):
    plan = _plan(QUERIES["join_semi"](spark, sf_dir))
    assert "LeftSemi" in plan


def test_whole_stage_codegen_covers_q1(spark, sf_dir):
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    df.collect()  # AQE finalizes (and codegen-annotates) only on execution
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    # '*(n)' prefixes mark WholeStageCodegen spans in the plan string.
    assert "*(" in plan


def test_approx_count_distinct_error_bound(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r.d
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_suppkey").alias("d"))
        .collect()
    }
    approx = {
        r.l_returnflag: r.approx_suppliers
        for r in QUERIES["agg_approx_distinct"](spark, sf_dir).collect()
    }
    for k, v in exact.items():
        assert abs(approx[k] - v) / v <= 0.05, (k, approx[k], v)


def test_approx_percentile_error_bound(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r.m
        for r in li.groupBy("l_returnflag")
        .agg(F.percentile("l_extendedprice", 0.5).alias("m"))
        .collect()
    }
    approx = {
        r.l_returnflag: r.median_price_approx
        for r in QUERIES["stats_approx_percentiles"](spark, sf_dir).collect()
    }
    for k, v in exact.items():
        assert abs(approx[k] - v) / v <= 0.01, (k, approx[k], v)

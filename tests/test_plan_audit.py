"""Whole-registry plan audit: structural red-flag scan over every
registered query's physical plan.

Two invariants across the entire inventory:
  * no row-at-a-time Python (`BatchEvalPython`) — Python only enters
    through Arrow (`ArrowEvalPython`/`MapInPandas`/`FlatMapGroupsIn
    Pandas`), per the UDF policy;
  * no non-broadcast CartesianProduct — intentional small-side
    cross-products (brute-force scoring, bounded pair generation)
    must ride a broadcast (BroadcastNestedLoopJoin), never a
    partitioned cartesian shuffle.
"""

from __future__ import annotations

import pytest

from ibd_pipeline_spark.queries import all_queries

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_plan_red_flags(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in plan — use pandas_udf/mapInPandas"
    )
    assert "CartesianProduct" not in plan, (
        f"{name}: partitioned cartesian product — broadcast the small side"
    )

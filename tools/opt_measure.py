#!/usr/bin/env python
"""Optimization measurement harness (r15/r16).

Times named queries (noop sink, N runs each, min reported) at
$SPARK_GRAFT_SF_DIR and optionally dumps `explain("formatted")` to
plans/<round>/<query>_<tag>.txt.

    python tools/opt_measure.py --tag before --runs 3 q1_pricing_summary ...
    python tools/opt_measure.py --top 40 --tag before    # slowest 40 per BENCH_COMMITTED
    python tools/opt_measure.py --runs 3 <names...>      # time only, no plan dump

Prints one JSON line {name: sec} at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLANS = Path(__file__).resolve().parent.parent / "plans" / os.environ.get(
    "SPARK_GRAFT_PLANS_ROUND", "r16"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default=None, help="dump plans/<round>/<q>_<tag>.txt")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--top", type=int, default=0,
                    help="add the N slowest queries per BENCH_COMMITTED.json")
    args = ap.parse_args()

    names = list(args.names)
    if args.top:
        committed = json.loads(
            (Path(__file__).resolve().parent.parent / "BENCH_COMMITTED.json")
            .read_text()
        )["queries"]
        ranked = sorted(committed, key=lambda n: -committed[n])
        for n in ranked[: args.top]:
            if n not in names:
                names.append(n)

    from ibd_pipeline_spark.queries import all_queries
    from ibd_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="opt-measure",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    registry = all_queries()

    # Warm the JVM the same way bench.py does.
    registry["q1_pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    if args.tag:
        PLANS.mkdir(parents=True, exist_ok=True)

    timings: dict[str, float] = {}
    for name in names:
        fn = registry[name]
        if args.tag:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (PLANS / f"{name}_{args.tag}.txt").write_text(plan)
        rs = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"opt:{name}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            rs.append(round(time.perf_counter() - t0, 3))
        timings[name] = min(rs)
        print(f"  {name}: {min(rs)} {rs}", file=sys.stderr)
    print(json.dumps(timings))
    spark.stop()


if __name__ == "__main__":
    main()

"""Per-query profiler (guide §1): time a declared query's computation
against the noop sink (isolates the computation from the sink) and dump
its ``explain("formatted")`` plan.

Usage:
  python tools/profile_query.py [--plans-dir DIR] [--trials N] key [key ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Prints one line per key: noop-sink best-of-N seconds + Exchange count +
join-node census from the formatted plan. With --plans-dir, writes the
full formatted plan to <dir>/<key>.txt.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from locopy_spark.session import get_spark


def plan_summary(plan: str) -> str:
    n_ex = len(re.findall(r"\bExchange\b", plan))
    joins = re.findall(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)\b",
        plan,
    )
    py = re.findall(r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|"
                    r"FlatMapGroupsInPandas|MapInArrow)\b", plan)
    from collections import Counter

    jc = Counter(joins)
    pc = Counter(py)
    parts = [f"Exchange={n_ex}"]
    parts += [f"{k}={v}" for k, v in sorted(jc.items())]
    parts += [f"{k}={v}" for k, v in sorted(pc.items())]
    return " ".join(parts)


def main() -> int:
    args = sys.argv[1:]
    plans_dir = None
    trials = 2
    if "--plans-dir" in args:
        i = args.index("--plans-dir")
        plans_dir = args[i + 1]
        args = args[:i] + args[i + 2:]
        os.makedirs(plans_dir, exist_ok=True)
    if "--trials" in args:
        i = args.index("--trials")
        trials = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="locopy_profile")
    qs = entrymod.queries()
    for key in args:
        fn = qs[key]
        spark.sparkContext.setJobDescription(f"profile:{key}")
        best = None
        for _ in range(trials):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        spark.catalog.clearCache()
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        spark.catalog.clearCache()
        print(f"{key}: {best:.3f}s  {plan_summary(plan)}")
        if plans_dir:
            with open(os.path.join(plans_dir, f"{key}.txt"), "w") as fh:
                fh.write(plan)
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

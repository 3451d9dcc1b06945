"""r8 optimization-round profiler (guide §1): per benched query, dump
the formatted physical plan to plans/r09/<q>_<tag>.txt, time N
isolated passes with the bench's checksum action (same methodology as
bench.py so numbers compare), and print a plan-shape summary
(Exchange / BatchEvalPython / ArrowEvalPython / join strategy counts).

Usage: python scripts/profile_r09.py <tag> [n_passes] [--only a,b,...]
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import social_media_ai_engineering_etl_spark.queries  # noqa: F401,E402
from social_media_ai_engineering_etl_spark.registry import BENCH, QUERIES  # noqa: E402
from social_media_ai_engineering_etl_spark.session import cache_scope, get_spark  # noqa: E402
from bench import materialize  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLAN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r09")

MARKS = ("Exchange", "BatchEvalPython", "ArrowEvalPython", "MapInArrow",
         "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
         "BroadcastNestedLoopJoin", "CartesianProduct", "Window",
         "WindowGroupLimit", "Generate", "InMemoryTableScan")


def plan_shape(plan: str) -> dict:
    # count operator list entries like "(3) Exchange", not detail lines
    ops = re.findall(r"^\(\d+\) ([A-Za-z]+)", plan, re.M)
    return {m: sum(1 for o in ops if o == m) for m in MARKS
            if any(o == m for o in ops)}


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    n = int(sys.argv[2]) if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else 3
    only = None
    if "--only" in sys.argv:
        only = [s.strip() for s in sys.argv[sys.argv.index("--only") + 1].split(",")]
    os.makedirs(PLAN_DIR, exist_ok=True)
    spark = get_spark("profile-r09")
    names = [q for q in (BENCH or sorted(QUERIES))
             if only is None or any(p in q for p in only)]

    # warmup (untimed, same as bench.py)
    for name in names:
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        with cache_scope(spark):
            materialize(QUERIES[name](spark, SF_DIR))

    out = {}
    samples: dict[str, list[float]] = {name: [] for name in names}
    for p in range(n):
        for name in names:
            spark.sparkContext.setJobDescription(f"{tag}:{name}:pass{p}")
            t0 = time.perf_counter()
            with cache_scope(spark):
                df = QUERIES[name](spark, SF_DIR)
                materialize(df)
                took = round(time.perf_counter() - t0, 4)
            samples[name].append(took)
            print(f"# pass {p+1} {name}: {took:.3f}s", file=sys.stderr)

    for name in names:
        with cache_scope(spark):
            df = QUERIES[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
        with open(os.path.join(PLAN_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        ts = samples[name]
        out[name] = {"mean": round(statistics.mean(ts), 4),
                     "min": round(min(ts), 4),
                     "sd": round(statistics.stdev(ts), 4) if len(ts) > 1 else 0.0,
                     "shape": plan_shape(plan)}
    print(json.dumps({"tag": tag, "sf_dir": SF_DIR, "passes": n,
                      "sum_mean": round(sum(v["mean"] for v in out.values()), 3),
                      "queries": out}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()

"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing = full query wall time to a count-materializing action (the
result sets are small aggregates; the cost is the scan/shuffle work).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import social_media_ai_engineering_etl_spark.queries  # noqa: F401,E402
from social_media_ai_engineering_etl_spark.registry import BENCH, QUERIES  # noqa: E402
from social_media_ai_engineering_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    spark = get_spark("bench")
    names = BENCH or sorted(QUERIES)
    # untimed warmup pass over EVERY headliner: codegen compilation,
    # JIT, Python-worker spinup and parquet footer reads are one-time
    # session costs, not plan costs — timing warm runs measures the
    # plan (the thing that scales to 100 TB), not the JVM's first
    # 200ms of Janino per query.  clearCache after each so the timed
    # passes still pay their own scans.
    for name in names:
        QUERIES[name](spark, SF_DIR).count()
        spark.catalog.clearCache()

    # per-query min of two passes: single-shot wall times on a shared
    # VM swing ~40% run-to-run (GC, page cache, noisy neighbors); the
    # min is the standard least-noise estimate of what the plan costs
    timings: dict[str, float] = {}
    for _ in range(2):
        for name in names:
            t0 = time.perf_counter()
            df = QUERIES[name](spark, SF_DIR)
            n = df.count()
            took = round(time.perf_counter() - t0, 4)
            timings[name] = min(timings.get(name, float("inf")), took)
            print(f"# {name}: {took:.3f}s ({n} rows)", file=sys.stderr)
            # cache ownership is centralized at the run loop: operators
            # persist shared subtrees for their own plan, the harness
            # releases them between queries so a 15-query run holds one
            # query's caches, not fifteen (ADVICE r1)
            spark.catalog.clearCache()

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "total_headline_query_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
    }))
    spark.stop()


if __name__ == "__main__":
    main()

"""Variance-quantified bench (VERDICT r3 #2): n interleaved passes of
every headline query at $SPARK_GRAFT_SF_DIR, reporting per-query
mean +- sd and min — the band table future rounds compare against
instead of single shots.

Interleaved = each pass runs q1..qN in order, then repeats: slow box
phases hit all queries equally instead of biasing whichever query was
running.  Methodology otherwise identical to bench.py (untimed warmup
pass, checksum action, clearCache between queries, build included in
the timing).

Usage: python scripts/bench_ab.py [n_passes] [sf_dir]
Writes /tmp/bench_ab.json and prints a markdown band table.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import social_media_ai_engineering_etl_spark.queries  # noqa: F401,E402
from social_media_ai_engineering_etl_spark.registry import BENCH, QUERIES  # noqa: E402
from social_media_ai_engineering_etl_spark.session import get_spark  # noqa: E402
from bench import materialize  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-ab")
    names = BENCH or sorted(QUERIES)

    for name in names:  # untimed warmup
        materialize(QUERIES[name](spark, sf_dir))
        spark.catalog.clearCache()

    samples: dict[str, list[float]] = {name: [] for name in names}
    for p in range(n):
        for name in names:
            t0 = time.perf_counter()
            materialize(QUERIES[name](spark, sf_dir))
            samples[name].append(round(time.perf_counter() - t0, 4))
            spark.catalog.clearCache()
        print(f"# pass {p + 1}/{n} done", file=sys.stderr)

    stats = {}
    print("| query | mean s | sd | min | max |")
    print("|---|---|---|---|---|")
    for name in names:
        xs = samples[name]
        m = statistics.mean(xs)
        sd = statistics.stdev(xs) if len(xs) > 1 else 0.0
        stats[name] = {"mean": round(m, 3), "sd": round(sd, 3),
                       "min": min(xs), "max": max(xs), "samples": xs}
        print(f"| {name} | {m:.3f} | {sd:.3f} | {min(xs):.3f} "
              f"| {max(xs):.3f} |")
    total_mean = sum(s["mean"] for s in stats.values())
    print(f"| TOTAL (sum of means) | {total_mean:.3f} | | | |")
    out = {"n_passes": n, "sf_dir": sf_dir, "stats": stats,
           "total_mean": round(total_mean, 3)}
    with open("/tmp/bench_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": "bench_ab_total_mean",
                      "value": round(total_mean, 3), "unit": "sec"}))


if __name__ == "__main__":
    main()

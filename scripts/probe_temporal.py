"""Scaling probe for the r3 temporal/rollup/bloom additions: replicate
the events fact (user_id/event_id shifted per replica, so the key
space grows with the corpus — more users, not hotter users) and the
documents corpus at 1x/4x/16x, and time asof_join, the hierarchical
rollup, and bloom decontamination.

Usage: python scripts/probe_temporal.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from social_media_ai_engineering_etl_spark.operators import (  # noqa: E402
    curation,
    scale,
)
from social_media_ai_engineering_etl_spark.operators.temporal import (  # noqa: E402
    asof_join,
)
from social_media_ai_engineering_etl_spark.session import (  # noqa: E402
    get_spark,
    widen_scan,
)
from scripts.scale_probe import multiply_docs  # noqa: E402


def multiply_events(ev, m: int):
    shift = 1_000_000
    parts = [ev.select(
        (F.col("event_id") + i * shift).alias("event_id"),
        (F.col("user_id") + i * shift).alias("user_id"),
        # stagger replica timestamps by i seconds so bucket contents
        # grow instead of duplicating exactly
        (F.col("ts") + F.expr(f"INTERVAL {i} SECONDS")).alias("ts"),
        "event_type", "value") for i in range(m)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(label, fn):
    t0 = time.perf_counter()
    n = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.2f} s ({n} rows)")
    return dt


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("probe-temporal")
    epath = os.path.join(sf, "events.parquet")
    dpath = os.path.join(sf, "documents.parquet")
    ev0 = widen_scan(spark.read.parquet(epath), epath).select(
        "event_id", "user_id", "ts", "event_type", "value")
    docs0 = widen_scan(spark.read.parquet(dpath), dpath).select(
        "doc_id", "text")

    for m in (1, 4, 16):
        ev = multiply_events(ev0, m).persist()
        ne = ev.count()
        print(f"-- events x{m}: {ne} rows")
        p = (ev.filter(F.col("event_type") == "purchase")
             .select(F.col("event_id").alias("purchase_id"),
                     "user_id", "ts"))
        c = (ev.filter(F.col("event_type") == "click")
             .groupBy("user_id", "ts")
             .agg(F.max("event_id").alias("click_id")))
        timed(f"asof_join x{m}",
              lambda: asof_join(p, c, on=["user_id"]).count())
        evr = ev.select("event_type", "ts", F.lit(1).alias("n"),
                        F.round(F.col("value") * 100).cast("long")
                        .alias("cents"))
        timed(f"hierarchical_rollup x{m}",
              lambda: scale.hierarchical_time_rollup(
                  evr, "ts", ["event_type"],
                  {"n": "count", "cents": "sum"},
                  levels=("hour", "day", "week")).count())
        ev.unpersist()
        spark.catalog.clearCache()

        docs = multiply_docs(docs0, m).persist()
        nd = docs.count()
        bench = docs.filter(F.col("doc_id") % 20 == 0)
        corp = docs.filter(F.col("doc_id") % 20 != 0)
        timed(f"decontaminate_bloom x{m} ({nd} docs)",
              lambda: curation.decontaminate_bloom(
                  corp, bench, "doc_id", "text", n=5).count())
        timed(f"decontaminate_exact x{m}",
              lambda: curation.decontaminate(
                  corp, bench, "doc_id", "text", n=5).count())
        docs.unpersist()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()

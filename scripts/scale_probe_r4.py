"""r4 scaling probe: the reward-scoring path (q26_rewards_scalar —
now fully whole-stage-compiled) and the two IVM queries whose
percentile cutoffs moved in-plan (qx_incremental_rollup,
qx_join_ivm_rollup) — 1x/4x/16x fact growth.

Claims under test:
* q26 reward projection: narrow per-row work over the derived pairs
  (two codegen units + a primitives-only cache) -> time linear in
  docs, no codegen fallback at any scale;
* incremental rollup: one shuffle on (event_type, day); the in-plan
  broadcast cutoff adds no extra job -> linear;
* join IVM: the three delta-bounded joins grow with the fact ->
  linear, never quadratic.

Usage: python scripts/scale_probe_r4.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scale_probe import ROTATIONS  # noqa: E402

from social_media_ai_engineering_etl_spark.registry import QUERIES  # noqa: E402
from social_media_ai_engineering_etl_spark.session import get_spark  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def checksum(df) -> int:
    row = df.select(F.xxhash64(*df.columns).alias("h")).agg(
        F.count(F.lit(1)).alias("n"), F.expr("bit_xor(h)")).collect()[0]
    return row["n"]


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale-probe-r4")
    import social_media_ai_engineering_etl_spark.queries  # noqa: F401

    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    events = spark.read.parquet(os.path.join(sf, "events.parquet"))
    orders = spark.read.parquet(os.path.join(sf, "orders.parquet"))

    # untimed warmup (codegen/JIT/python-worker spinup), bench.py-style
    for q in ("q26_rewards_scalar", "qx_incremental_rollup",
              "qx_join_ivm_rollup"):
        checksum(QUERIES[q](spark, sf))
        spark.catalog.clearCache()

    print(f"# r4 probe ({sf})\n")
    print("| scale | docs | q26_rewards_scalar s (rows) | "
          "incremental_rollup s | join_ivm s |")
    print("|---|---|---|---|---|")

    for m in (1, 4, 16):
        tmp = f"/tmp/spark-graft-r4probe-{m}x"
        # documents: ids shifted, text vowel-rotated (deterministic
        # dissimilar replicas), source kept
        parts = [docs.select(
            (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
            F.translate(F.col("text"), ROTATIONS[0], ROTATIONS[i])
             .alias("text"),
            "source", "lang", "n_chars")
            for i in range(m)]
        d = parts[0]
        for p in parts[1:]:
            d = d.unionByName(p)
        d.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        # events / orders: straight m-fold replication (per-group row
        # growth — the shape an m-times-busier day produces)
        ev = events
        od = orders
        for _ in range(m.bit_length() - 1):
            ev = ev.unionByName(ev)
            od = od.unionByName(od)
        ev.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
        od.write.mode("overwrite").parquet(f"{tmp}/orders.parquet")
        for t in TABLES:
            dst = f"{tmp}/{t}.parquet"
            if os.path.islink(dst):
                os.unlink(dst)
            if not os.path.exists(dst):
                os.symlink(os.path.join(sf, f"{t}.parquet"), dst)

        n_docs = m * docs.count()
        t0 = time.perf_counter()
        rows = checksum(QUERIES["q26_rewards_scalar"](spark, tmp))
        t_q26 = time.perf_counter() - t0
        spark.catalog.clearCache()

        t0 = time.perf_counter()
        checksum(QUERIES["qx_incremental_rollup"](spark, tmp))
        t_roll = time.perf_counter() - t0
        spark.catalog.clearCache()

        t0 = time.perf_counter()
        checksum(QUERIES["qx_join_ivm_rollup"](spark, tmp))
        t_ivm = time.perf_counter() - t0
        spark.catalog.clearCache()

        print(f"| {m}x | {n_docs} | {t_q26:.2f} ({rows}) "
              f"| {t_roll:.2f} | {t_ivm:.2f} |")

    spark.stop()


if __name__ == "__main__":
    main()

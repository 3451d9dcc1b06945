"""Join-family scaling probe: replicate the lineitem/orders FACT side
1x/4x/16x (keys shifted per replica, dimensions left at catalog size —
exactly how a real warehouse grows) and time the four classic join
reports.  The claim under test: every plan's cost is linear in the
fact, flat in the dims —

* pricing summary (Q1 shape): one map-side-combined aggregate over the
  pruned scan, no join at all;
* shipping priority (Q3 shape): broadcast dims + TakeOrderedAndProject
  top-10 (per-partition heaps, merge of 10-row heads);
* local-supplier volume (Q5 shape): six-table broadcast chain, fact
  shuffles zero times before its final 5-row rollup;
* large orders (Q18 shape): fact aggregates FIRST (partial combine on
  l_orderkey), only the ~1% survivors join.

Usage: python scripts/scale_probe_joins.py [sf_dir]
(markdown table on stdout — appended to SCALING.md's Reading section)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from social_media_ai_engineering_etl_spark.session import get_spark  # noqa: E402

SHIFT = 1_000_000_000


def multiply_fact(df, m: int, key_cols: tuple[str, ...]):
    """m replicas with order keys shifted per replica (new orders, same
    customers/suppliers/parts — organic fact growth)."""
    parts = []
    for i in range(m):
        r = df
        for k in key_cols:
            r = r.withColumn(k, F.col(k) + i * SHIFT)
        parts.append(r)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale-probe-joins")

    import social_media_ai_engineering_etl_spark.queries  # noqa: F401
    from social_media_ai_engineering_etl_spark.registry import QUERIES

    li = spark.read.parquet(os.path.join(sf, "lineitem.parquet"))
    orders = spark.read.parquet(os.path.join(sf, "orders.parquet"))

    names = ("qg_pricing_summary", "qg_shipping_priority",
             "qg_local_supplier_volume", "qg_large_orders",
             "qg_priority_check", "qg_customer_distribution",
             # r3d additions: scan-only / conditional-agg shapes
             "qg_forecast_revenue", "qg_promo_revenue",
             "qg_disjunctive_revenue", "qg_returned_items",
             "qg_latency_priority_mix",
             # scalar-subquery shapes (view reuse + 1-row broadcast)
             "qg_top_supplier", "qg_important_supply",
             "qg_small_qty_revenue", "qg_min_cost_supplier",
             # semi/anti shapes (incl. the Q21 double self-join)
             "qg_waiting_suppliers", "qg_sales_opportunity",
             "qg_supplier_part_count", "qg_potential_promotion")

    # warm codegen/readers on the registered queries once
    for n in names:
        QUERIES[n](spark, sf).count()
    spark.catalog.clearCache()

    print(f"# Join-family scaling probe ({sf})\n")
    print("| scale | lineitem rows | " + " s | ".join(names) + " s |")
    print("|---|---|" + "---|" * len(names))

    for m in (1, 4, 16):
        tmp = f"/tmp/spark-graft-joinprobe-{m}x"
        (multiply_fact(li, m, ("l_orderkey",))
         .write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet"))
        (multiply_fact(orders, m, ("o_orderkey",))
         .write.mode("overwrite").parquet(f"{tmp}/orders.parquet"))
        for d in ("region", "nation", "customer", "supplier", "part",
                  "events", "documents", "embeddings"):
            src = os.path.join(sf, f"{d}.parquet")
            dst = f"{tmp}/{d}.parquet"
            if not os.path.exists(dst):
                os.symlink(src, dst)
        n_rows = spark.read.parquet(f"{tmp}/lineitem.parquet").count()

        cells = []
        for name in names:
            t0 = time.perf_counter()
            QUERIES[name](spark, tmp).count()
            cells.append(f"{time.perf_counter() - t0:.2f}")
            spark.catalog.clearCache()
        print(f"| {m}x | {n_rows} | " + " | ".join(cells) + " |")

    spark.stop()


if __name__ == "__main__":
    main()

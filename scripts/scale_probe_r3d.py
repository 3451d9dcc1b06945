"""r3d additions scaling probe: perceptual near-dup, weighted-median
GROUPED_AGG UDAF, referential-integrity audit — 1x/4x/16x corpus/fact
growth with the repo's standard deterministic replica schemes
(documents vowel-rotated so replicas are NOT near-dups; lineitem /
orders key-shifted, dims at catalog size).

Claims under test:
* media_phash + pigeonhole pairs: per-row hashing + bounded-group
  equi-join -> linear time, pair count linear in plants (replicas are
  dissimilar so they add no cross-replica pairs);
* weighted median: group COUNT is fixed (20 sources) while group SIZE
  grows 16x -> time linear, Arrow batch per group grows (the
  documented O(group) memory shape);
* RI audit: one scan per child table -> linear.

Usage: python scripts/scale_probe_r3d.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scale_probe import multiply_docs  # noqa: E402
from scale_probe_joins import multiply_fact  # noqa: E402

from social_media_ai_engineering_etl_spark.operators import (  # noqa: E402
    multimodal as mm,
)
from social_media_ai_engineering_etl_spark.operators.udafs import (  # noqa: E402
    weighted_median_udaf,
)
from social_media_ai_engineering_etl_spark.registry import QUERIES  # noqa: E402
from social_media_ai_engineering_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale-probe-r3d")
    import social_media_ai_engineering_etl_spark.queries  # noqa: F401

    docs = spark.read.parquet(
        os.path.join(sf, "documents.parquet")).select(
        "doc_id", "text", "source", "n_chars")
    li = spark.read.parquet(os.path.join(sf, "lineitem.parquet"))
    orders = spark.read.parquet(os.path.join(sf, "orders.parquet"))

    print(f"# r3d additions probe ({sf})\n")
    print("| scale | docs | phash_neardup s (pairs) | "
          "weighted_median s | ri_audit s |")
    print("|---|---|---|---|---|")

    for m in (1, 4, 16):
        d = multiply_docs(docs.select("doc_id", "text"), m)
        # plant one exact twin per 50 base docs, as qmm_media_neardup does;
        # repartition stands in for the parallel scan a cluster gets
        # (the registered query widens its scan via _docs/widen_scan —
        # the local single-row-group parquet would otherwise hash on
        # one core and drown the curve in fixed cost)
        corpus = d.unionByName(
            d.filter(F.col("doc_id") % 50 == 0)
             .select((F.col("doc_id") + 1_000_000_000).alias("doc_id"),
                     "text")).repartition(64)
        n_docs = corpus.count()

        t0 = time.perf_counter()
        hashed = mm.media_phash(
            mm.attach_fake_media(corpus, text_col="text"))
        pairs = mm.phash_neardup_pairs(hashed).count()
        t_phash = time.perf_counter() - t0

        # weighted median: replicate keeping source/n_chars
        parts = []
        for i in range(m):
            parts.append(docs.select(
                (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
                "source", "n_chars"))
        wdocs = parts[0]
        for p in parts[1:]:
            wdocs = wdocs.unionByName(p)
        wm = weighted_median_udaf()
        t0 = time.perf_counter()
        (wdocs.select("source", F.col("n_chars").alias("v"),
                      (F.col("doc_id") % 7 + 1).alias("wt"))
         .groupBy("source").agg(wm("v", "wt").alias("m")).count())
        t_wm = time.perf_counter() - t0

        tmp = f"/tmp/spark-graft-r3dprobe-{m}x"
        (multiply_fact(li, m, ("l_orderkey",))
         .write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet"))
        (multiply_fact(orders, m, ("o_orderkey",))
         .write.mode("overwrite").parquet(f"{tmp}/orders.parquet"))
        for t in ("region", "nation", "customer", "supplier", "part",
                  "events", "documents", "embeddings"):
            dst = f"{tmp}/{t}.parquet"
            # recreate unconditionally: an exists-guard would keep a
            # stale symlink to a previous run's sf_dir and silently
            # mix scale factors in the RI timing (ADVICE r3)
            if os.path.islink(dst) or os.path.exists(dst):
                os.unlink(dst)
            os.symlink(os.path.join(sf, f"{t}.parquet"), dst)
        t0 = time.perf_counter()
        QUERIES["qx_referential_integrity"](spark, tmp).count()
        t_ri = time.perf_counter() - t0

        print(f"| {m}x | {n_docs} | {t_phash:.2f} ({pairs}) "
              f"| {t_wm:.2f} | {t_ri:.2f} |")
        spark.catalog.clearCache()

    spark.stop()


if __name__ == "__main__":
    main()

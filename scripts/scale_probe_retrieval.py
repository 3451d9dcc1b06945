"""Hybrid-retrieval scaling probe: corpus grows 1x/4x/16x (vowel-
rotated text replicas so shingle sets diverge + id-shifted embedding
replicas), the QUERY COUNT is held constant (query_mod scales with the
corpus), and the two-stage funnel is timed end to end.

Claim under test: with Q fixed, stage 1 (gram inverted-index join)
grows with the query docs' posting lists x per-gram df — linear in
corpus for a natural gram-frequency profile — and stage 2 is constant
(C*Q cosines, C=20 shortlist per query) regardless of corpus size.
That flat vector stage is the entire point of the funnel: exact
re-ranking cost is decoupled from N.

Usage: python scripts/scale_probe_retrieval.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scripts.scale_probe import multiply_docs  # noqa: E402
from social_media_ai_engineering_etl_spark.operators import similarity  # noqa: E402
from social_media_ai_engineering_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale-probe-retrieval")
    docs = spark.read.parquet(
        os.path.join(sf, "documents.parquet")).select("doc_id", "text")
    emb = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))

    print(f"# Hybrid-retrieval scaling probe ({sf})\n")
    print("| scale | corpus docs | queries | retrieval s | result rows |")
    print("|---|---|---|---|---|")
    for m in (1, 4, 16):
        d = multiply_docs(docs, m).persist()
        e = emb
        for i in range(1, m):
            e = e.unionByName(emb.withColumn(
                "vec_id", F.col("vec_id") + i * 1_000_000))
        e = e.persist()
        n = d.count()
        e.count()
        out = similarity.hybrid_retrieval_topk(
            d, e, query_mod=50 * m)  # fixed ~n_base/50 queries
        t0 = time.perf_counter()
        rows = out.count()
        took = time.perf_counter() - t0
        n_queries = d.filter(F.col("doc_id") % (50 * m) == 0).count()
        print(f"| {m}x | {n} | {n_queries} | {took:.2f} | {rows} |")
        d.unpersist()
        e.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()

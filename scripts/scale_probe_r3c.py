"""Scaling probe for the round-3 continuation operators: containment
pairs, BPE vocabulary learning, and metadata-filtered GEMM top-k, at
1x/4x/16x corpus multiples.

Same fairness conventions as scale_probe.py: document replicas are
vowel-rotated (cross-replica texts are NOT near-duplicates, so pair
counts grow ~linearly), embedding replicas get circularly shifted
dimensions (cross-replica cosines ~0) and keep their labels so the
filter-group count is constant while group sizes grow.

Usage: python scripts/scale_probe_r3c.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from social_media_ai_engineering_etl_spark.operators import (  # noqa: E402
    dedup,
    similarity,
)
from social_media_ai_engineering_etl_spark.operators.textquality import (  # noqa: E402
    bpe_learn,
)
from social_media_ai_engineering_etl_spark.session import (  # noqa: E402
    get_spark,
    widen_scan,
)
from scripts.scale_probe import multiply_docs  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale-probe-r3c")
    path = os.path.join(sf, "documents.parquet")
    base = widen_scan(spark.read.parquet(path), path).select("doc_id", "text")
    n_base = base.count()

    print(f"# r3c scaling probe ({sf}, base corpus {n_base} docs)\n")
    print("| scale | docs | containment s | pairs | bpe_learn(8) s |")
    print("|---|---|---|---|---|")
    for m in (1, 4, 16):
        docs = multiply_docs(base, m).repartition(
            spark.sparkContext.defaultParallelism).persist()
        n = docs.count()

        t0 = time.perf_counter()
        cp = dedup.ngram_containment_pairs(docs, "doc_id", "text",
                                           threshold=0.4,
                                           max_df=200).count()
        t_cp = time.perf_counter() - t0

        t0 = time.perf_counter()
        bpe_learn(docs, "text", num_merges=8).count()
        t_bpe = time.perf_counter() - t0

        docs.unpersist()
        spark.catalog.clearCache()
        print(f"| {m}x | {n} | {t_cp:.1f} | {cp} | {t_bpe:.1f} |")

    epath = os.path.join(sf, "embeddings.parquet")
    ebase = spark.read.parquet(epath).select("vec_id", "embedding", "label")
    dim = len(ebase.first()["embedding"])
    print("\n| scale | vectors | filtered_gemm s | rows | global_gemm s |")
    print("|---|---|---|---|---|")
    for m in (1, 4, 16):
        parts = []
        for i in range(m):
            shift = (i * 7) % dim
            rolled = F.concat(
                F.slice(F.col("embedding"), shift + 1, dim - shift),
                F.slice(F.col("embedding"), 1, shift)) if shift else \
                F.col("embedding")
            parts.append(ebase.select(
                (F.col("vec_id") + i * 1_000_000).alias("vec_id"),
                rolled.alias("embedding"), "label"))
        emb = parts[0]
        for p in parts[1:]:
            emb = emb.unionByName(p)
        emb = emb.repartition(
            spark.sparkContext.defaultParallelism).persist()
        nv = emb.count()
        queries = emb.filter(F.col("vec_id") % 25 == 0)

        t0 = time.perf_counter()
        fr = similarity.cosine_topk_gemm_filtered(
            emb, queries, "vec_id", "embedding", "label", k=5).count()
        t_f = time.perf_counter() - t0

        t0 = time.perf_counter()
        similarity.cosine_topk_gemm(
            emb, queries, "vec_id", "embedding", k=5).count()
        t_g = time.perf_counter() - t0

        emb.unpersist()
        spark.catalog.clearCache()
        print(f"| {m}x | {nv} | {t_f:.1f} | {fr} | {t_g:.1f} |")

    spark.stop()


if __name__ == "__main__":
    main()

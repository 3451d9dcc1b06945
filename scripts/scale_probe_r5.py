"""r5 scaling probe: the operators new this round — 128-bit multi-word
perceptual near-dup (qmm_media_neardup_wide), the trained-classifier
gate path, and the portable-CMS families — at 1x/4x/16x document
growth.

Claims under test:
* wide phash: hashing is a narrow per-row projection (4 md5 blocks +
  one fold) and blocking is a (word_idx, word_value) equi-join ->
  time ~linear in docs while planted near-dup pairs stay sparse;
* trained classifier gate: explode + broadcast join + groupBy ->
  linear in corpus tokens (same plan as the stand-in row);
* CMS build: one map-side-combinable shuffle into depth*width cells
  -> linear, sketch size constant.

Usage: python scripts/scale_probe_r5.py [base_sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scale_probe import ROTATIONS  # noqa: E402

from social_media_ai_engineering_etl_spark.operators import (  # noqa: E402
    multimodal as mm)
from social_media_ai_engineering_etl_spark.operators import (  # noqa: E402
    textquality)
from social_media_ai_engineering_etl_spark.session import get_spark  # noqa: E402


def checksum(df) -> tuple[int, float]:
    t0 = time.perf_counter()
    n = df.select(F.xxhash64(*df.columns).alias("h")).agg(
        F.count(F.lit(1)).alias("n"), F.expr("bit_xor(h)")
    ).collect()[0]["n"]
    dt = time.perf_counter() - t0
    df.sparkSession.catalog.clearCache()
    return n, dt


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("scale-probe-r5")
    docs0 = spark.read.parquet(os.path.join(sf, "documents.parquet"))

    def neardup_wide(d):
        corpus = d.unionByName(
            d.filter(F.col("doc_id") % 50 == 0)
            .select((F.col("doc_id") + 1_000_000_000).alias("doc_id"),
                    "text", "lang", "source", "n_chars")) \
            .select("doc_id", "text")
        media = mm.attach_fake_media(corpus)
        # the registered query's path: Arrow fast twin (bit-identical
        # to the native fold, parity-pinned)
        hashed = mm.media_phash_wide_arrow(media, content_col="content",
                                           bits=128, word_bits=32)
        return mm.phash_neardup_pairs_wide(
            hashed, id_col="doc_id", phash_col="phash_words",
            max_hamming=3, n_words=4)

    def gate(d):
        return textquality.linear_quality_score(d, "doc_id", "text",
                                                n_buckets=4096)

    def cms(d):
        return textquality.cms_sketch(d, "text", portable=True)

    # warmup
    for fn in (neardup_wide, gate, cms):
        checksum(fn(docs0))

    print(f"# r5 probe ({sf}, local[32])\n")
    print("| scale | docs | neardup_wide s (pairs) | quality gate s "
          "| cms build s (cells) |")
    print("|---|---|---|---|---|")
    for m in (1, 4, 16):
        parts = [docs0.select(
            (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
            F.translate(F.col("text"), ROTATIONS[0], ROTATIONS[i])
            .alias("text"), "lang", "source", "n_chars")
            for i in range(m)]
        d = parts[0]
        for p in parts[1:]:
            d = d.unionByName(p)
        d = d.persist()
        n = d.count()
        p1, t1 = checksum(neardup_wide(d))
        _, t2 = checksum(gate(d))
        c3, t3 = checksum(cms(d))
        print(f"| {m}x | {n} | {t1:.2f} ({p1}) | {t2:.2f} "
              f"| {t3:.2f} ({c3}) |")
        d.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()

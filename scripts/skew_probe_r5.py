"""r5 skew probe (VERDICT r4 #1): every r1-r4 scale claim was measured
on UNIFORM synthetic data; this probe measures the engine's four real
skew exposures on ZIPFIAN / hot-key fixtures, skewed-vs-uniform at
1x/16x, and exercises the wired mitigations:

1. HOT AUTHORS (A6-A8 window top-k): documents.source reassigned
   zipfian(s=1.2) over the 20 authors — the reference caps at 20
   posts/author precisely because authors are zipfian
   (17-writing-style.py:776-802).  Probes q17_author_words as-is and
   the sharded two-phase top-k prune (phrases.author_texts shards=).

2. BOILERPLATE SHINGLES (inverted-index n-gram Jaccard): a 12-word
   boilerplate sentence appended to 10% of docs — each of its ~10
   shingles acquires document frequency 0.1*n, and the shingle
   self-join emits C(m,2) pair rows per hot shingle that the
   threshold then mostly DISCARDS (cost without output — the exact
   skew pathology max_df exists for).  Probes max_df=None vs
   max_df=64.

3. HOT LSH BUCKETS (MinHash): 10% of docs made near-copies of one
   template (jaccard ~0.9 within the cluster) — every band maps the
   cluster to ONE bucket, candidate generation emits C(m,2) pairs
   per band before the cross-band distinct.  Probes the as-is
   pipeline and the max_bucket cap.

4. HOT JOIN KEY (fact-dim equi-join): 25% of events reassigned to
   one user_id; dim = the user table.  Broadcast is disabled for the
   probe (the 100 TB case: dim too big to broadcast -> sort-merge),
   AQE left ON (its skew-join split is part of the system under
   test).  Probes the plain join vs operators/scale.salted_join.

Usage: python scripts/skew_probe_r5.py [base_sf_dir_for_join]
(dedup/author fixtures build from sf0.01 — candidate-pair volume IS
the failure mode, so the skewed 16x variants are sized to finish;
the join fixture builds from sf0.1 for a measurable shuffle.)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scale_probe import ROTATIONS  # noqa: E402

from social_media_ai_engineering_etl_spark.operators import (  # noqa: E402
    dedup, phrases, scale)
from social_media_ai_engineering_etl_spark.session import get_spark  # noqa: E402

SF_DOCS = "/root/testdata/sf0.01"
TMP = "/tmp/spark-graft-skewprobe"

# 16x replication uses scale_probe's 16 DISTINCT letter rotations:
# replicas are DISSIMILAR docs, never duplicates (a shorter cycling
# list would plant exact dups and contaminate the uniform baseline)

BOILER = ("the quick brown fox jumps over the lazy dog "
          "again and again today")
TEMPLATE = " ".join(f"w{i}token" for i in range(60))


def checksum(df) -> tuple[int, float]:
    t0 = time.perf_counter()
    n = df.select(F.xxhash64(*df.columns).alias("h")).agg(
        F.count(F.lit(1)).alias("n"), F.expr("bit_xor(h)")
    ).collect()[0]["n"]
    dt = time.perf_counter() - t0
    df.sparkSession.catalog.clearCache()
    return n, dt


def _u01(col):
    """Deterministic uniform in (0,1] from a column (md5 52-bit)."""
    return (F.conv(F.substring(F.md5(col.cast("string").cast("binary")),
                               1, 13), 16, 10).cast("double") + 1.0) \
        / float(1 << 52)


def zipf_source(docs, n_keys: int = 20, s: float = 1.2):
    """Reassign `source` zipfian(s) over n_keys via inverse-CDF on a
    doc_id-keyed deterministic uniform."""
    weights = [1.0 / (k ** s) for k in range(1, n_keys + 1)]
    total = sum(weights)
    cdf, acc = [], 0.0
    for w in weights:
        acc += w / total
        cdf.append(acc)
    cdf_col = F.array(*[F.lit(c) for c in cdf])
    u = _u01(F.col("doc_id"))
    rank = F.size(F.filter(cdf_col, lambda c: c < u))
    return docs.withColumn("source", F.concat(F.lit("src"),
                                              rank.cast("string")))


def replicate_docs(docs, m: int):
    parts = [docs.select(
        (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
        F.translate(F.col("text"), ROTATIONS[0], ROTATIONS[i])
        .alias("text"), "lang", "source", "n_chars")
        for i in range(m)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    sf_join = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("skew-probe-r5")
    shutil.rmtree(TMP, ignore_errors=True)
    os.makedirs(TMP, exist_ok=True)
    docs0 = spark.read.parquet(os.path.join(SF_DOCS, "documents.parquet"))

    print("# r5 skew probe (docs base sf0.01; join base "
          f"{os.path.basename(sf_join)}; local[32])\n")

    # ---------------- 1. hot authors ----------------
    print("## 1. hot authors — q17_author_words window top-k "
          "(zipf s=1.2 over 20 sources)\n")
    print("| scale | variant | top-author share | as-is s | sharded(32) s |")
    print("|---|---|---|---|---|")
    for m in (1, 16):
        base = replicate_docs(docs0, m)
        for variant, d in (("uniform", base), ("zipf", zipf_source(base))):
            d = d.persist()
            top = (d.groupBy("source").count()
                   .orderBy(F.desc("count")).first())
            share = top["count"] / d.count()
            # untimed warmup on the first row of each table
            if m == 1 and variant == "uniform":
                checksum(phrases.author_uncommon_words(
                    d, "source", "text", "doc_id"))
            _, t_asis = checksum(phrases.author_uncommon_words(
                d, "source", "text", "doc_id"))
            _, t_shard = checksum(phrases.author_uncommon_words(
                d, "source", "text", "doc_id", shards=32))
            print(f"| {m}x | {variant} | {share:.2f} "
                  f"| {t_asis:.2f} | {t_shard:.2f} |")
            d.unpersist()

    # ---------------- 1b. pathological single author ----------------
    # zipf over 20 authors never strains a 32-core box (the window
    # sort is per-author and sf-sized); THIS is the straggler shape —
    # one author holding 10M rows means the plain window sorts 10M
    # rows in ONE task while 31 cores idle.
    print("\n### 1b. pathological single author — 10M synthetic rows, "
          "ONE source (the single-task window sort)\n")
    print("| rows | as-is s | sharded(32) s |")
    print("|---|---|---|")
    big = spark.range(10_000_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("word"), (F.col("id") % 997).cast("string"),
                 F.lit(" the post text body here")).alias("text"),
        F.lit("en").alias("lang"), F.lit("src0").alias("source"),
        F.lit(40).alias("n_chars")).persist()
    big.count()
    _, t_asis = checksum(phrases.author_texts(
        big, "source", "text", "doc_id", max_posts=5).select("doc_id"))
    _, t_shard = checksum(phrases.author_texts(
        big, "source", "text", "doc_id", max_posts=5,
        shards=32).select("doc_id"))
    print(f"| 10M | {t_asis:.2f} | {t_shard:.2f} |")
    big.unpersist()

    # ---------------- 2. boilerplate shingles ----------------
    print("\n## 2. boilerplate shingles — inverted-index n-gram "
          "Jaccard (10% of docs share a 12-word boilerplate)\n")
    print("| scale | variant | pair rows pre-threshold | max_df=None s "
          "| max_df=64 s |")
    print("|---|---|---|---|---|")
    for m in (1, 16):
        base = replicate_docs(docs0, m)
        boiler = base.withColumn(
            "text",
            F.when(F.col("doc_id") % 10 < 1,
                   F.concat(F.col("text"), F.lit(" " + BOILER)))
            .otherwise(F.col("text")))
        for variant, d in (("uniform", base), ("boiler", boiler)):
            d = d.persist()
            d.count()
            _, t_none = checksum(dedup.ngram_jaccard_pairs_inverted(
                d, "doc_id", "text", threshold=0.2))
            _, t_capped = checksum(dedup.ngram_jaccard_pairs_inverted(
                d, "doc_id", "text", threshold=0.2, max_df=64))
            # pre-threshold pair volume (the shuffle the threshold
            # can't protect): sum over shingles of C(df,2)
            sh = d.select(F.explode(F.transform(
                dedup.word_shingles(F.col("text"), 3),
                lambda s: F.xxhash64(s))).alias("s"))
            vol = (sh.groupBy("s").count()
                   .agg(F.sum(F.expr("count * (count - 1) / 2")))
                   .collect()[0][0])
            print(f"| {m}x | {variant} | {int(vol)} "
                  f"| {t_none:.2f} | {t_capped:.2f} |")
            d.unpersist()

    # ---------------- 2b. max_df crossover ----------------
    # at 10% boilerplate a 32-core box absorbs the 3.8M-row pair
    # blowup and the guard's extra df shuffle costs more than it
    # saves; this row raises the share until C(m,2) dominates — the
    # regime max_df exists for (and the web-scale default).
    print("\n### 2b. max_df crossover — boilerplate share raised to "
          "50% at 16x (4,000 hot docs -> ~80M pre-threshold pair "
          "rows)\n")
    print("| share | pair rows pre-threshold | max_df=None s "
          "| max_df=64 s |")
    print("|---|---|---|---|")
    base16 = replicate_docs(docs0, 16)
    heavy = base16.withColumn(
        "text",
        F.when(F.col("doc_id") % 10 < 5,
               F.concat(F.col("text"), F.lit(" " + BOILER)))
        .otherwise(F.col("text"))).persist()
    heavy.count()
    sh = heavy.select(F.explode(F.transform(
        dedup.word_shingles(F.col("text"), 3),
        lambda s: F.xxhash64(s))).alias("s"))
    vol = (sh.groupBy("s").count()
           .agg(F.sum(F.expr("count * (count - 1) / 2")))
           .collect()[0][0])
    _, t_none = checksum(dedup.ngram_jaccard_pairs_inverted(
        heavy, "doc_id", "text", threshold=0.2))
    _, t_capped = checksum(dedup.ngram_jaccard_pairs_inverted(
        heavy, "doc_id", "text", threshold=0.2, max_df=64))
    print(f"| 50% | {int(vol)} | {t_none:.2f} | {t_capped:.2f} |")
    heavy.unpersist()

    # ---------------- 3. hot LSH buckets ----------------
    print("\n## 3. hot LSH buckets — MinHash+banded LSH (10% of docs "
          "near-copies of one template, j~0.9 in-cluster)\n")
    print("| scale | variant | cluster size | as-is s (pairs) "
          "| max_bucket=256 s (pairs) |")
    print("|---|---|---|---|---|")
    for m in (1, 16):
        base = replicate_docs(docs0, m)
        hot = base.withColumn(
            "text",
            F.when(F.col("doc_id") % 10 < 1,
                   F.concat(F.lit(TEMPLATE + " variant "),
                            F.col("doc_id").cast("string")))
            .otherwise(F.col("text")))
        for variant, d in (("uniform", base), ("hot-cluster", hot)):
            d = d.persist()
            n = d.count()
            csize = int(n * 0.1) if variant == "hot-cluster" else 0
            n1, t1 = checksum(dedup.minhash_dedup_pairs(
                d, "doc_id", "text", threshold=0.5))
            n2, t2 = checksum(dedup.minhash_dedup_pairs(
                d, "doc_id", "text", threshold=0.5, max_bucket=256))
            print(f"| {m}x | {variant} | {csize} | {t1:.2f} ({n1}) "
                  f"| {t2:.2f} ({n2}) |")
            d.unpersist()

    # ---------------- 4. hot join key ----------------
    print("\n## 4. hot fact-dim join key — events x users, broadcast "
          "disabled (the can't-broadcast dim case), AQE on\n")
    print("| scale | variant | hot-key share | plain join s "
          "| salted_join s |")
    print("|---|---|---|---|---|")
    ev0 = spark.read.parquet(os.path.join(sf_join, "events.parquet"))
    dim = (ev0.select("user_id").distinct()
           .withColumn("segment", F.pmod(F.col("user_id"), F.lit(7)))
           .persist())
    dim.count()
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for m in (1, 16):
            ev = ev0
            for _ in range(m.bit_length() - 1):
                ev = ev.unionByName(ev)
            hot_ev = ev.withColumn(
                "user_id",
                F.when(_u01(F.col("event_id")) < 0.25,
                       F.lit(0).cast(ev.schema["user_id"].dataType))
                .otherwise(F.col("user_id")))
            hot_dim = dim.unionByName(
                spark.createDataFrame([(0, 0)], dim.schema)).distinct() \
                .persist()
            hot_dim.count()
            for variant, e, dm in (("uniform", ev, dim),
                                   ("hot-25pct", hot_ev, hot_dim)):
                e = e.persist()
                share = (e.groupBy("user_id").count()
                         .orderBy(F.desc("count")).first()["count"]
                         / e.count())
                _, t_plain = checksum(
                    e.join(dm, "user_id")
                    .select("user_id", "event_id", "segment"))
                _, t_salt = checksum(
                    scale.salted_join(e, dm, "user_id")
                    .select("user_id", "event_id", "segment"))
                print(f"| {m}x | {variant} | {share:.2f} "
                      f"| {t_plain:.2f} | {t_salt:.2f} |")
                e.unpersist()
            hot_dim.unpersist()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)

    spark.stop()


if __name__ == "__main__":
    main()

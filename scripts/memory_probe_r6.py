"""r6 memory-pressure probe (VERDICT r5 ask #3): every prior scale
probe measured wall time with 128 GiB available — none proved the
heavy shuffles SPILL rather than OOM when memory is constrained.

This probe re-runs the five heaviest shuffle shapes at 16x under a
deliberately starved session — driver/executor heap 4g (vs the
default 8g serving ALL of local[32]), initial
spark.sql.shuffle.partitions=8 so AQE must split oversized partitions
at runtime — asserting completion and recording spill totals from the
Spark UI REST API (stage memoryBytesSpilled / diskBytesSpilled).

Cases (16x fixtures built with scale_probe.ROTATIONS — replicas are
dissimilar, never planted duplicates):
  1. prefix   — qx_dedup_ngram_prefix shape (PPJoin SSJoin), docs 16x
  2. minhash  — banded MinHash LSH with an 800-doc hot cluster,
                max_bucket guard auto-selected from the profile
  3. authors  — q17_author_words window top-k, docs 16x zipfian-ish
  4. gemm     — blocked-GEMM cosine top-k, embeddings 16x
  5. sessions — session windows (gap-based) over events 16x

Usage:
  python scripts/memory_probe_r6.py            # run all, print table
  python scripts/memory_probe_r6.py --child    # internal (constrained)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)

SF_DOCS = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"


def _spill_totals(ui_port: int) -> tuple[int, int, int]:
    """(memorySpilled, diskSpilled, n_stages) across all stages."""
    base = f"http://localhost:{ui_port}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base, timeout=10))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(
        f"{base}/{app_id}/stages", timeout=10))
    mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
    return mem, disk, len(stages)


def child() -> None:
    from pyspark.sql import functions as F

    from scale_probe import ROTATIONS
    from social_media_ai_engineering_etl_spark.operators import (dedup,
                                                                 phrases,
                                                                 similarity)
    from social_media_ai_engineering_etl_spark.session import get_spark

    spark = get_spark("memory-probe", extra_conf={
        "spark.sql.shuffle.partitions": "8",      # force AQE to split UP
        "spark.ui.enabled": "true",
        # starve the unified memory pool: with heap 4g serving all of
        # local[32], fraction 0.1 leaves ~<25 MB unified memory per
        # concurrent task — partitions that exceed it MUST spill (the
        # probe's point: spill, not OOM)
        "spark.memory.fraction": "0.1",
    })
    ui_port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
    results = []

    def docs16(sf, m=16):
        d = spark.read.parquet(os.path.join(sf, "documents.parquet"))
        parts = []
        for i in range(m):
            parts.append(d.select(
                (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
                F.translate(F.col("text"), ROTATIONS[0],
                            ROTATIONS[i % len(ROTATIONS)])
                 .alias("text"),
                "source"))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def run(name, fn):
        m0, d0, _ = _spill_totals(ui_port)
        t0 = time.perf_counter()
        n = fn()
        dt = time.perf_counter() - t0
        m1, d1, ns = _spill_totals(ui_port)
        spark.catalog.clearCache()
        results.append({"case": name, "rows": n, "sec": round(dt, 2),
                        "mem_spill_mb": round((m1 - m0) / 2**20, 1),
                        "disk_spill_mb": round((d1 - d0) / 2**20, 1)})
        print(f"[child] {name}: {n} rows in {dt:.1f}s "
              f"spill mem={m1 - m0} disk={d1 - d0}", flush=True)

    # 1. PPJoin prefix SSJoin, docs 16x of sf0.1 (80k docs -> ~16M
    # exploded token rows through the df-rank shuffle)
    d16 = docs16(SF_BIG).persist()
    run("prefix", lambda: dedup.ngram_jaccard_pairs_prefix(
        d16, "doc_id", "text", threshold=0.5).count())

    # 2. banded MinHash with an 800-doc hot cluster, guard auto-chosen
    template = " ".join(f"w{i}token" for i in range(60))
    hot = d16.unionByName(spark.createDataFrame(
        [(10_000_000 + i, f"{template} variant {i}", "hot")
         for i in range(800)], "doc_id long, text string, source string"))
    run("minhash_hot", lambda: dedup.minhash_dedup_pairs_auto(
        hot, "doc_id", "text", threshold=0.8).count())
    d16.unpersist()

    # 3. author window top-k over sf0.1 docs 256x (source = author;
    # rotation cycle repeats — irrelevant for a window sort)
    big16 = docs16(SF_BIG, m=256)
    run("authors", lambda: phrases.author_texts(
        big16, "source", "text", "doc_id", max_posts=20).count())

    # 4. blocked-GEMM cosine top-k, embeddings 16x
    emb = spark.read.parquet(os.path.join(SF_BIG, "embeddings.parquet"))
    emb16 = (emb.withColumn("__r", F.explode(F.sequence(F.lit(0),
                                                        F.lit(63))))
             .select((F.col("vec_id") * 64 + F.col("__r"))
                     .alias("vec_id"), "embedding"))
    queries = emb16.filter(F.col("vec_id") % 1600 == 0)
    run("gemm", lambda: similarity.cosine_topk_gemm(
        emb16, queries, "vec_id", "embedding", k=10).count())

    # 5. session windows (gap 30 min) over events 16x — batch twin of
    # the streaming operator: same shuffle/window shape
    ev = spark.read.parquet(os.path.join(SF_BIG, "events.parquet"))
    ev16 = (ev.withColumn("__r", F.explode(F.sequence(F.lit(0),
                                                      F.lit(255))))
            .select(F.col("user_id"),
                    (F.col("ts").cast("timestamp").cast("long")
                     + F.col("__r") * 86400).alias("epoch")))

    def sessions_case():
        from pyspark.sql import Window
        w = Window.partitionBy("user_id").orderBy("epoch")
        gaps = (ev16.withColumn(
            "new_sess",
            (F.col("epoch") - F.lag("epoch").over(w) > 1800)
            .cast("int")))
        sess = gaps.withColumn(
            "sess_id", F.sum(F.coalesce(F.col("new_sess"), F.lit(0)))
            .over(w))
        return (sess.groupBy("user_id", "sess_id")
                .agg(F.count(F.lit(1)).alias("n")).count())

    run("sessions", sessions_case)

    print("CHILD_RESULTS_JSON " + json.dumps(results), flush=True)


def main() -> None:
    env = os.environ.copy()
    env["SPARK_GRAFT_DRIVER_MEM"] = "4g"
    r = subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--child"], env=env, capture_output=True,
                       text=True, timeout=3600)
    sys.stderr.write(r.stderr[-4000:])
    print(r.stdout)
    assert r.returncode == 0, "constrained session OOMed or crashed"
    line = [l for l in r.stdout.splitlines()
            if l.startswith("CHILD_RESULTS_JSON ")][-1]
    results = json.loads(line.split(" ", 1)[1])
    print("\n| case | rows | sec | mem spill MB | disk spill MB |")
    print("|---|---|---|---|---|")
    for x in results:
        print(f"| {x['case']} | {x['rows']} | {x['sec']} "
              f"| {x['mem_spill_mb']} | {x['disk_spill_mb']} |")


if __name__ == "__main__":
    if "--child" in sys.argv:
        child()
    else:
        main()

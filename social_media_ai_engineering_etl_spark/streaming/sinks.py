"""Streaming sinks and stream-static enrichment (SURVEY §2.12
green-field surface).

``foreachBatch`` + a deterministic keyed upsert is the standard
exactly-once-ish sink recipe for stores without transactional MERGE:
the micro-batch id is recorded with the write, so a replayed batch
(checkpoint recovery re-runs the last uncommitted batch) overwrites
itself instead of duplicating. On a parquet directory the merge is a
read-modify-write of the key partition — O(table) per batch, which is
the file-format's limit, documented here because the PATTERN (keyed
idempotent upsert inside foreachBatch) is what carries to Delta/
Iceberg MERGE INTO at 100 TB.

The stream-side curation gate shows the other §2.12 staple: a
streaming DataFrame enriched against a small static reference set
(benchmark n-grams) — stateless, no watermark needed. The membership
set is broadcast to every executor once and probed per Arrow batch
(the same shape a broadcast bloom filter takes at 100 TB benchmark
sizes); a two-streams-joined formulation is NOT used because joining
two derivations of the same stream is a stream-stream join, which
Spark rejects without watermarked keys.
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

from ..operators.curation import gopher_quality
from ..operators.dedup import word_shingles


def contamination_flagger(spark: SparkSession, bench_grams: DataFrame,
                          n: int = 5):
    """Column builder: 1 when any of the text's distinct n-word grams
    is in the (broadcast) benchmark gram set. The eval-set grams are
    small by definition — collected once, broadcast once, probed per
    Arrow batch. Gram construction mirrors dedup.word_shingles (same
    whitespace tokens, space-joined)."""
    grams = frozenset(r["gram"] for r in bench_grams.collect())
    bc = spark.sparkContext.broadcast(grams)

    @pandas_udf("int")
    def contaminated(text: pd.Series) -> pd.Series:
        s = bc.value

        def hit(t: str) -> int:
            ws = t.strip().split()
            return int(any(
                " ".join(ws[i:i + n]) in s
                for i in range(len(ws) - n + 1)))

        return text.map(hit)

    return contaminated


def curated_document_stream(stream_docs: DataFrame,
                            bench_grams: DataFrame,
                            n: int = 5) -> DataFrame:
    """Streaming ingest curation gate: per incoming document, the
    Gopher quality metrics + keep flag (stateless HOF projection —
    identical code path as batch: operators/curation.py) and a
    ``contaminated`` flag probed against the broadcast benchmark gram
    set. One stateless projection per micro-batch; batch-equivalence
    is pinned in tests/test_streaming.py."""
    flag = contamination_flagger(stream_docs.sparkSession, bench_grams, n)
    flagged = stream_docs.withColumn("contaminated", flag(F.col("text")))
    return gopher_quality(flagged, "doc_id", "text",
                          passthrough=["contaminated"])


def upsert_parquet_sink(path: str, keys: list[str]):
    """Build a ``foreachBatch`` function performing a keyed
    latest-wins upsert into a parquet directory, idempotent under
    micro-batch replay: rows carry the writing batch id, and a
    replayed batch's rows REPLACE the rows the failed attempt wrote
    (same keys, same batch id) instead of stacking.

    Returns ``sink(batch_df, batch_id)`` for
    ``writeStream.foreachBatch(...)``."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        new = (batch_df.dropDuplicates(keys)
               .withColumn("__batch_id", F.lit(int(batch_id))))
        if os.path.exists(path):
            old = spark.read.parquet(path)
            # drop old rows superseded by this batch's keys OR written
            # by a previous attempt of this same batch id (replay)
            merged = (old.join(new.select(*keys), keys, "left_anti")
                      .filter(F.col("__batch_id") != int(batch_id))
                      .unionByName(new))
        else:
            merged = new
        _atomic_snapshot_write(merged, path, int(batch_id))

    return sink


def _atomic_snapshot_write(merged: DataFrame, path: str,
                           batch_id: int) -> None:
    """Crash-safe snapshot + atomic repoint (r2 ADVICE — a plain
    stage-then-swap left a truncated live table if the process died
    mid-overwrite).  The snapshot is written to a batch-id-suffixed
    dir and ``path`` is an os.replace()'d symlink: a crash before the
    repoint leaves the previous snapshot live (replay rebuilds the
    partial dir), a crash after it is already durable."""
    snap_root = path + ".__snapshots__"
    snap = os.path.join(snap_root, f"b{batch_id}")
    # duplicate-epoch re-delivery (r5, found by the redelivery test):
    # when batch N already COMMITTED to the table, a replay of N reads
    # the live snapshot bN while writing bN — overwrite deletes the
    # files mid-read (FAILED_READ_FILE).  Replay attempts therefore
    # write to a fresh attempt-suffixed dir; the repoint + prune below
    # retires the superseded one.
    attempt = 0
    while os.path.exists(snap):
        attempt += 1
        snap = os.path.join(snap_root, f"b{batch_id}.r{attempt}")
    merged.write.mode("overwrite").parquet(snap)
    if os.path.exists(path) and not os.path.islink(path):
        # legacy real-directory table: migrate to the symlink scheme
        # (the one remaining non-atomic window, first flip only)
        shutil.rmtree(path)
    tmp_link = path + ".__repoint__"
    if os.path.lexists(tmp_link):
        os.unlink(tmp_link)
    os.symlink(os.path.abspath(snap), tmp_link)
    os.replace(tmp_link, path)
    # prune superseded snapshots (keep the live target only)
    live = os.path.realpath(path)
    for d in os.listdir(snap_root):
        full = os.path.join(snap_root, d)
        if os.path.realpath(full) != live:
            shutil.rmtree(full, ignore_errors=True)
    legacy = path + ".__staging__"
    if os.path.exists(legacy):
        shutil.rmtree(legacy, ignore_errors=True)


def benchmark_gram_table(spark: SparkSession, docs_path: str,
                         n: int = 5) -> DataFrame:
    """Static benchmark gram side for the curation gate: distinct
    n-grams of the held-out slice (doc_id % 20 = 0), small by
    construction — the broadcast side of the stream-static join."""
    docs = spark.read.parquet(docs_path).filter(F.col("doc_id") % 20 == 0)
    return (docs.select(F.explode(word_shingles(F.col("text"), n))
                        .alias("gram")).distinct())


# ---------------------------------------------------------------------------
# streaming continuous aggregate (hierarchical rollup maintenance)
# ---------------------------------------------------------------------------


def rollup_merge_sink(path: str, ts_col: str, keys: list[str],
                      measures: dict[str, str],
                      level: str = "hour"):
    """``foreachBatch`` maintenance of the finest level of a
    continuous aggregate (scale.hierarchical_time_rollup's streaming
    twin): each micro-batch contributes its own PARTIAL rollup rows
    tagged with the batch id; a replayed batch REPLACES its previous
    partials instead of double-summing (replay re-runs only the last
    uncommitted batch), and every batch compacts all strictly-older
    partials into one base row per (keys, bucket) — the stored table
    stays O(groups), not O(batches x groups).

    Serving any coarser granularity is then
    :func:`read_continuous_rollup` — no fact rescan, ever.  Algebraic
    measures only (sum/count/min/max), same table as merge_rollups."""
    from ..operators.scale import _PARTIAL

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        part = (batch_df.groupBy(
            *keys, F.date_trunc(level, F.col(ts_col)).alias("bucket"))
            .agg(*[_PARTIAL[fn](c).alias(c) for c, fn in measures.items()])
            .withColumn("__batch_id", F.lit(int(batch_id))))
        if os.path.exists(path):
            old = spark.read.parquet(path).filter(
                F.col("__batch_id") != int(batch_id))
            base = _merge_partials(
                old, keys, measures).withColumn(
                "__batch_id", F.lit(-1))
            merged = base.unionByName(part)
        else:
            merged = part
        _atomic_snapshot_write(merged, path, int(batch_id))

    return sink


def _merge_partials(df: DataFrame, keys: list[str],
                    measures: dict[str, str]) -> DataFrame:
    """Re-combine per-batch partial rollup rows: counts re-merge by
    summing, the rest by their own merge fn (operators/scale._MERGE)."""
    from ..operators.scale import _MERGE
    return df.groupBy(*keys, "bucket").agg(
        *[_MERGE[fn](c).alias(c) for c, fn in measures.items()])


def read_continuous_rollup(spark: SparkSession, path: str,
                           keys: list[str], measures: dict[str, str],
                           levels: tuple[str, ...] = ("hour", "day",
                                                      "week")) -> DataFrame:
    """Serve the full level hierarchy from the maintained finest
    snapshot: merge the per-batch partials, then derive each coarser
    level from the previous one (hierarchical_time_rollup over the
    already-aggregated buckets — count partials re-merge as sums).
    The raw fact is never read."""
    from ..operators.scale import hierarchical_time_rollup
    finest = _merge_partials(spark.read.parquet(path), keys, measures)
    merge_measures = {c: ("sum" if fn == "count" else fn)
                      for c, fn in measures.items()}
    return hierarchical_time_rollup(finest, "bucket", keys,
                                    merge_measures, levels=levels)


# ---------------------------------------------------------------------------
# write-audit-publish (WAP)
# ---------------------------------------------------------------------------


def write_audit_publish(df: DataFrame, path: str, rules: list[dict],
                        batch_id: int = 0):
    """The WAP pattern (Iceberg-style) on a plain parquet directory:
    stage the snapshot, AUDIT it with the declarative rule set
    (operators/validation.check) against the STAGED files — auditing
    what was actually written, not the logical plan — and atomically
    publish (symlink repoint) only if every rule passes.  A failing
    audit leaves the previous snapshot live and the staged directory
    on disk for inspection.

    Returns (published: bool, report) where report rows are
    (rule, n_violations, n_rows).  Composes with foreachBatch for a
    streaming gate: ``lambda b, i: write_audit_publish(b, path,
    rules, i)``."""
    from ..operators.validation import check
    spark = df.sparkSession
    snap_root = path + ".__snapshots__"
    snap = os.path.join(snap_root, f"b{int(batch_id)}")
    df.write.mode("overwrite").parquet(snap)
    staged = spark.read.parquet(snap)
    report = check(staged, rules)
    bad = report.filter(F.col("n_violations") > 0).count()
    if bad:
        return False, report
    if os.path.exists(path) and not os.path.islink(path):
        shutil.rmtree(path)
    tmp_link = path + ".__repoint__"
    if os.path.lexists(tmp_link):
        os.unlink(tmp_link)
    os.symlink(os.path.abspath(snap), tmp_link)
    os.replace(tmp_link, path)
    return True, report


# ---------------------------------------------------------------------------
# streaming distribution-drift monitor
# ---------------------------------------------------------------------------


def drift_partials_sink(path: str, type_col: str = "event_type",
                        bucket_col: str = "bucket"):
    """``foreachBatch`` maintenance of the CURRENT-window value-bucket
    histogram for the drift monitor (qx_distribution_drift's
    streaming half): per-batch (type, bucket) count partials with the
    :func:`rollup_merge_sink` replay discipline — a replayed batch
    REPLACES its previous partial, older partials compact to one base
    row per group, snapshots write atomically.  The stored table is
    O(types x buckets), independent of stream length."""
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        part = (batch_df.groupBy(type_col, bucket_col)
                .agg(F.count(F.lit(1)).alias("cnt"))
                .withColumn("__batch_id", F.lit(int(batch_id))))
        if os.path.exists(path):
            old = spark.read.parquet(path).filter(
                F.col("__batch_id") != int(batch_id))
            base = (old.groupBy(type_col, bucket_col)
                    .agg(F.sum("cnt").alias("cnt"))
                    .withColumn("__batch_id", F.lit(-1)))
            merged = base.unionByName(part)
        else:
            merged = part
        _atomic_snapshot_write(merged, path, int(batch_id))

    return sink


def drift_vs_reference(spark: SparkSession, path: str,
                       reference: DataFrame,
                       type_col: str = "event_type",
                       bucket_col: str = "bucket") -> DataFrame:
    """Two-sample chi-square between a REFERENCE histogram
    (type, bucket, cnt — e.g. last deploy's first week, computed
    batch-side) and the histogram maintained by
    :func:`drift_partials_sink`, in the same exact BIGINT fixed point
    as qx_distribution_drift — so streaming drift equals the batch
    query on the same windows (pinned in tests/test_streaming.py).
    Types missing either side are excluded (the division guard)."""
    cur = (spark.read.parquet(path)
           .groupBy(type_col, bucket_col).agg(F.sum("cnt").alias("o2")))
    ref = reference.select(type_col, bucket_col,
                           F.col("cnt").alias("o1"))
    o = (ref.join(cur, [type_col, bucket_col], "full_outer")
         .select(type_col, bucket_col,
                 F.coalesce("o1", F.lit(0)).alias("o1"),
                 F.coalesce("o2", F.lit(0)).alias("o2")))
    n = (o.groupBy(type_col)
         .agg(F.sum("o1").alias("n1"), F.sum("o2").alias("n2"),
              F.sum(F.col("o1") + F.col("o2")).alias("nt")))
    t = (o.join(n.filter((F.col("n1") > 0) & (F.col("n2") > 0)),
                type_col)
         .withColumn("ok", F.col("o1") + F.col("o2"))
         .withColumn("d1", F.col("o1") * F.col("nt")
                     - F.col("ok") * F.col("n1"))
         .withColumn("d2", F.col("o2") * F.col("nt")
                     - F.col("ok") * F.col("n2"))
         .withColumn("t1", F.expr(
             "(d1 * d1 DIV (ok * n1)) * 1000000 DIV nt"))
         .withColumn("t2", F.expr(
             "(d2 * d2 DIV (ok * n2)) * 1000000 DIV nt")))
    return (t.groupBy(type_col)
            .agg(F.sum(F.col("t1") + F.col("t2")).alias("chi2_x1e6"),
                 F.count(F.lit(1)).alias("n_buckets"))
            .orderBy(type_col))

"""Structured Streaming tests: batch/stream equivalence under
availableNow, and watermark late-data dropping across checkpointed
restarts."""

import os
import shutil

import pandas as pd
import uuid

import pytest
from pyspark.sql import functions as F

from social_media_ai_engineering_etl_spark.streaming import (
    stream_events, tumbling_engagement)
from social_media_ai_engineering_etl_spark.streaming.windows import (
    run_stream_to_memory)


@pytest.fixture()
def events_batch(spark, sf_dir):
    from social_media_ai_engineering_etl_spark.streaming.windows import (
        load_events)
    return load_events(spark, os.path.join(sf_dir, "events.parquet"))


def test_stream_matches_batch_for_closed_windows(spark, sf_dir, events_batch,
                                                 tmp_path):
    """availableNow + append emits exactly the windows whose end is
    <= final watermark (max event time - delay); those must equal the
    batch result for the same windows."""
    src = str(tmp_path / "events_src")
    os.makedirs(src)
    shutil.copy(os.path.join(sf_dir, "events.parquet"),
                os.path.join(src, "events.parquet"))
    stream = tumbling_engagement(
        stream_events(spark, src),  # ts storage auto-probed from footers
        "1 hour", watermark="10 minutes")
    name = "t_" + uuid.uuid4().hex[:8]
    run_stream_to_memory(stream, name)
    got = {tuple(r) for r in spark.table(name).collect()}

    max_ts = events_batch.agg(F.max("ts")).collect()[0][0]
    batch = tumbling_engagement(events_batch, "1 hour")
    closed = batch.filter(
        F.col("window_start").cast("timestamp") + F.expr("INTERVAL 1 HOUR")
        <= F.lit(max_ts) - F.expr("INTERVAL 10 MINUTES"))
    want = {tuple(r) for r in closed.collect()}
    assert got == want
    assert len(got) > 0


def test_watermark_drops_late_data(spark, tmp_path):
    """Phase 1 establishes a watermark past hour-0; phase 2 delivers a
    late hour-0 row (dropped) and a fresh row (new window emitted)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def write_phase(rows, fname):
        df = spark.createDataFrame(
            rows, "event_id bigint, ts string, user_id bigint, "
                  "event_type string, value double, props string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        tmp = str(tmp_path / ("stage_" + fname))
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(tmp, part), os.path.join(src, fname))

    out = str(tmp_path / "out")

    def run():
        stream = tumbling_engagement(
            stream_events(spark, src), "1 hour", watermark="10 minutes")
        q = (stream.writeStream.format("parquet").option("path", out)
             .outputMode("append").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return spark.read.parquet(out).collect()

    write_phase([(1, "2024-01-01 00:10:00", 1, "click", 1.0, "{}"),
                 (2, "2024-01-01 00:20:00", 1, "click", 1.0, "{}"),
                 (3, "2024-01-01 03:00:00", 2, "view", 1.0, "{}")],
                "a.parquet")
    r1 = {(r.window_start, r.event_type): r.n_events for r in run()}
    # watermark after phase 1 = 03:00 - 10min -> hour-0 window closed
    assert r1[("2024-01-01 00:00:00", "click")] == 2

    write_phase([(4, "2024-01-01 00:30:00", 1, "click", 99.0, "{}"),   # LATE
                 (5, "2024-01-01 03:10:00", 2, "view", 1.0, "{}"),
                 (6, "2024-01-01 06:00:00", 3, "click", 1.0, "{}")],
                "b.parquet")
    rows2 = run()
    r2 = {(r.window_start, r.event_type): r.n_events for r in rows2}
    # file sink accumulates; the closed hour-0 window must keep its
    # phase-1 count — the late 99.0 click was dropped, not merged
    assert r2[("2024-01-01 00:00:00", "click")] == 2
    assert len([r for r in rows2
                if (r.window_start, r.event_type)
                == ("2024-01-01 00:00:00", "click")]) == 1
    # the fresh 03:xx window closes once watermark passes 04:00
    assert r2[("2024-01-01 03:00:00", "view")] == 2


def test_session_window_gap_semantics(spark):
    from social_media_ai_engineering_etl_spark.streaming import (
        sessionized_activity)
    rows = [(1, "2024-01-01 00:00:00", 7, "click", 1.0, "{}"),
            (2, "2024-01-01 00:29:59", 7, "click", 1.0, "{}"),
            (3, "2024-01-01 01:10:00", 7, "click", 1.0, "{}"),   # new session
            (4, "2024-01-01 00:05:00", 8, "view", 2.0, "{}")]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, "
              "event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {(r.user_id, r.session_start): r.n_events
           for r in sessionized_activity(df, "30 minutes").collect()}
    assert out == {(7, "2024-01-01 00:00:00"): 2,
                   (7, "2024-01-01 01:10:00"): 1,
                   (8, "2024-01-01 00:05:00"): 1}


def test_stateful_running_engagement_recovers_state(spark, tmp_path):
    """applyInPandasWithState: per-user totals accumulate across
    checkpointed availableNow runs (state survives restart)."""
    from social_media_ai_engineering_etl_spark.streaming.stateful import (
        running_user_engagement)

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    os.makedirs(src)

    def write_phase(rows, fname):
        df = spark.createDataFrame(
            rows, "event_id bigint, ts string, user_id bigint, "
                  "event_type string, value double, props string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        tmp = str(tmp_path / ("stage_" + fname))
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(tmp, part), os.path.join(src, fname))

    def run(qname):
        emitted = []

        def sink(batch_df, _batch_id):
            emitted.extend(batch_df.collect())

        stream = running_user_engagement(stream_events(spark, src))
        q = (stream.writeStream.foreachBatch(sink)
             .outputMode("update").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return {r.user_id: (r.total_value, r.n_events) for r in emitted}

    write_phase([(1, "2024-01-01 00:10:00", 1, "click", 1.0, "{}"),
                 (2, "2024-01-01 00:20:00", 1, "click", 2.0, "{}"),
                 (3, "2024-01-01 00:30:00", 2, "view", 5.0, "{}")],
                "a.parquet")
    r1 = run("st1")
    assert r1[1] == (3.0, 2) and r1[2] == (5.0, 1)

    write_phase([(4, "2024-01-01 01:00:00", 1, "click", 4.0, "{}")],
                "b.parquet")
    r2 = run("st2")
    assert r2[1] == (7.0, 3)          # state recovered: 3.0 + 4.0
    assert 2 not in r2                 # untouched user not re-emitted
    del out_dir


def test_stream_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: an in-horizon duplicate key is
    dropped; after the watermark passes, state for old keys is
    evicted (bounded state — the 100 TB property)."""
    from social_media_ai_engineering_etl_spark.streaming.windows import (
        dedup_events, stream_events)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)

    def write_phase(rows, fname):
        df = spark.createDataFrame(
            rows, "event_id bigint, ts string, user_id bigint, "
                  "event_type string, value double, props string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        tmp = str(tmp_path / ("stage_" + fname))
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(tmp, part), os.path.join(src, fname))

    def run():
        stream = dedup_events(stream_events(spark, src),
                              keys=("event_id",), watermark="10 minutes")
        q = (stream.writeStream.format("parquet").option("path", out)
             .outputMode("append").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return spark.read.parquet(out).collect()

    # phase 1: key 1 twice within the horizon -> one survivor
    write_phase([(1, "2024-01-01 00:10:00", 1, "click", 1.0, "{}"),
                 (1, "2024-01-01 00:12:00", 1, "click", 2.0, "{}"),
                 (2, "2024-01-01 00:15:00", 2, "view", 1.0, "{}")],
                "a.parquet")
    r1 = run()
    assert sorted(r.event_id for r in r1) == [1, 2]

    # phase 2 advances the watermark far past key 1's expiry
    # (00:10 + 10 min); its state is evicted at this batch's commit
    write_phase([(3, "2024-01-01 05:01:00", 3, "view", 1.0, "{}")],
                "b.parquet")
    r2 = run()
    assert sorted(r.event_id for r in r2) == [1, 2, 3]

    # phase 3: key 1 re-occurs AFTER eviction -> re-admitted. That is
    # the documented horizon contract: dedup is guaranteed only within
    # the watermark delay, which is exactly what bounds state at scale
    write_phase([(1, "2024-01-01 06:00:00", 1, "click", 3.0, "{}")],
                "c.parquet")
    r3 = run()
    assert sorted(r.event_id for r in r3) == [1, 1, 2, 3]


def test_stream_stream_conversion_join(spark, tmp_path):
    """Watermarked stream-stream interval join: purchases match only
    same-user clicks within the 1h horizon."""
    from social_media_ai_engineering_etl_spark.streaming.windows import (
        conversion_join, stream_events)
    src_c = str(tmp_path / "clicks")
    src_p = str(tmp_path / "purchases")
    os.makedirs(src_c); os.makedirs(src_p)

    def write(rows, d, fname):
        df = spark.createDataFrame(
            rows, "event_id bigint, ts string, user_id bigint, "
                  "event_type string, value double, props string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        tmp = str(tmp_path / ("stage_" + fname))
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(tmp, part), os.path.join(d, fname))

    write([(1, "2024-01-01 00:00:00", 7, "click", 0.0, "{}"),   # in horizon
           (2, "2024-01-01 02:00:00", 7, "click", 0.0, "{}"),   # after purchase
           (3, "2024-01-01 00:05:00", 8, "click", 0.0, "{}")],  # other user
          src_c, "c.parquet")
    write([(10, "2024-01-01 00:30:00", 7, "purchase", 9.5, "{}")],
          src_p, "p.parquet")

    joined = conversion_join(stream_events(spark, src_c),
                             stream_events(spark, src_p),
                             horizon="1 hour", watermark="10 minutes")
    out = str(tmp_path / "out")
    q = (joined.writeStream.format("parquet").option("path", out)
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.read.parquet(out).collect()
    assert [(r.purchase_id, r.click_id, r.lag_micros) for r in rows] == \
        [(10, 1, 1800 * 1_000_000)]


def test_stream_last_touch_attribution_state(spark, tmp_path):
    """Stateful as-of: purchases attribute to the user's latest click;
    state (one click per user) survives a checkpointed restart and a
    purchase in phase 2 attributes to the phase-1 click. Phase-1
    results must equal the batch twin on the same rows."""
    from social_media_ai_engineering_etl_spark.streaming.stateful import (
        stream_last_touch)
    from social_media_ai_engineering_etl_spark.streaming.windows import (
        last_touch_attribution)

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = ("event_id bigint, ts string, user_id bigint, "
              "event_type string, value double, props string")

    def write_phase(rows, fname):
        df = (spark.createDataFrame(rows, schema)
              .withColumn("ts", F.col("ts").cast("timestamp")))
        tmp = str(tmp_path / ("stage_" + fname))
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(tmp, part), os.path.join(src, fname))

    def run():
        emitted = []

        def sink(batch_df, _):
            emitted.extend(batch_df.collect())

        q = (stream_last_touch(stream_events(spark, src))
             .writeStream.foreachBatch(sink).outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return {(r.user_id, r.purchase_id): (r.click_id, r.lag_micros)
                for r in emitted}

    phase1 = [(1, "2024-01-01 00:00:00", 1, "click", 0.0, "{}"),
              (2, "2024-01-01 00:10:00", 1, "click", 0.0, "{}"),
              (3, "2024-01-01 00:20:00", 1, "purchase", 9.5, "{}"),
              (4, "2024-01-01 00:05:00", 2, "purchase", 1.0, "{}")]
    write_phase(phase1, "a.parquet")
    r1 = run()
    # purchase 3 -> latest click 2 (lag 10 min); user 2 has no click
    assert r1 == {(1, 3): (2, 600_000_000)}

    ev = (spark.createDataFrame(phase1, schema)
          .withColumn("ts", F.col("ts").cast("timestamp")))
    batch = last_touch_attribution(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"))
    want = {(r.user_id, r.purchase_id): (r.click_id, r.lag_micros)
            for r in batch.collect()}
    assert r1 == want

    # phase 2: purchase 30 min after the phase-1 click -> attributed
    # from RECOVERED state; a >1h-later purchase is outside horizon
    write_phase([(5, "2024-01-01 00:40:00", 1, "purchase", 2.0, "{}"),
                 (6, "2024-01-01 02:00:00", 2, "purchase", 3.0, "{}")],
                "b.parquet")
    r2 = run()
    assert r2 == {(1, 5): (2, 1_800_000_000)}


def test_stream_neardup_detects_cross_batch_pairs(spark, tmp_path):
    """Stateful MinHash/LSH near-dup: a document arriving in a LATER
    micro-batch than its near-duplicate is still flagged (bucket state
    is checkpointed and recovered), and unrelated docs never pair."""
    from social_media_ai_engineering_etl_spark.streaming.neardup import (
        stream_neardup_pairs)

    src = str(tmp_path / "nd_src")
    ckpt = str(tmp_path / "nd_ckpt")
    os.makedirs(src)

    base = ("the quick brown fox jumps over the lazy dog while the "
            "rain in spain falls mainly on the plain every single day "
            "of the long and winding road that leads to your door")
    near = base.replace("lazy dog", "sleepy dog")   # one-shingle edit
    other = ("completely different text about spark catalyst planner "
             "optimizations and shuffle partitioning strategies for "
             "large scale distributed joins on columnar parquet data")

    def write_phase(rows, fname):
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        tmp = str(tmp_path / ("nd_stage_" + fname))
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(tmp, part), os.path.join(src, fname))

    def run():
        emitted = []

        def sink(batch_df, _batch_id):
            emitted.extend(batch_df.collect())

        docs = (spark.readStream.schema("doc_id bigint, text string")
                .parquet(src))
        q = (stream_neardup_pairs(docs, threshold=0.5)
             .writeStream.foreachBatch(sink)
             .outputMode("update").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return {(r.id1, r.id2) for r in emitted}

    write_phase([(1, base), (2, other)], "a.parquet")
    assert run() == set()              # nothing to pair yet

    write_phase([(3, near), (4, "tiny unrelated snippet here")],
                "b.parquet")
    pairs = run()
    assert (1, 3) in pairs             # cross-batch near-dup found
    assert all(p == (1, 3) for p in pairs), f"false pairs: {pairs}"

    # stream == batch twin on the full corpus (same signature, same
    # banding, same agreement score)
    from social_media_ai_engineering_etl_spark.operators.dedup import (
        minhash_agreement_pairs)
    all_docs = spark.createDataFrame(
        [(1, base), (2, other), (3, near), (4, "tiny unrelated snippet here")],
        "doc_id bigint, text string")
    twin = {(r.id1, r.id2)
            for r in minhash_agreement_pairs(all_docs, "doc_id",
                                             "text").collect()}
    assert pairs == twin


def test_stream_funnel_matches_batch_across_restart(spark, tmp_path):
    """Streaming funnel: per-user step state survives a checkpointed
    restart (view in phase 1, click+purchase in phase 2 still walks
    all three steps), and counting emitted (user, step) rows equals
    the batch funnel's n_users per step on the full corpus."""
    from social_media_ai_engineering_etl_spark.operators.behavior import (
        funnel_steps)
    from social_media_ai_engineering_etl_spark.streaming.stateful import (
        stream_funnel)

    src = str(tmp_path / "fn_src")
    ckpt = str(tmp_path / "fn_ckpt")
    os.makedirs(src)
    steps = ("view", "click", "purchase")

    rows_p1 = [
        (1, "2024-01-01 00:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-01 00:01:00", 2, "view", 1.0, "{}"),
        (3, "2024-01-01 00:02:00", 2, "click", 1.0, "{}"),
        (4, "2024-01-01 00:03:00", 3, "click", 1.0, "{}"),  # no view: stuck
    ]
    rows_p2 = [
        (5, "2024-01-01 01:00:00", 1, "click", 1.0, "{}"),
        (6, "2024-01-01 01:05:00", 1, "purchase", 1.0, "{}"),
        (7, "2024-01-01 01:10:00", 2, "purchase", 1.0, "{}"),
        (8, "2024-01-01 01:15:00", 3, "view", 1.0, "{}"),
    ]

    def write_phase(rows, fname):
        df = spark.createDataFrame(
            rows, "event_id bigint, ts string, user_id bigint, "
                  "event_type string, value double, props string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        tmp = str(tmp_path / ("fn_stage_" + fname))
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(tmp, part), os.path.join(src, fname))

    emitted = []

    def run():
        def sink(batch_df, _):
            emitted.extend(batch_df.collect())
        q = (stream_funnel(stream_events(spark, src), steps)
             .writeStream.foreachBatch(sink)
             .outputMode("update").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    write_phase(rows_p1, "a.parquet")
    run()
    write_phase(rows_p2, "b.parquet")
    run()

    reached = {(r.user_id, r.step) for r in emitted}
    # user 1 walks all three (click/purchase arrive after restart);
    # user 2 reaches view+click+purchase; user 3's click precedes its
    # view, so it only ever reaches step 1
    assert reached == {(1, 1), (1, 2), (1, 3),
                       (2, 1), (2, 2), (2, 3),
                       (3, 1)}
    # stream == batch twin per-step counts on the full corpus
    all_rows = spark.createDataFrame(
        rows_p1 + rows_p2,
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batch = {r.step: r.n_users
             for r in funnel_steps(all_rows, steps).collect()}
    stream_counts: dict = {}
    for _u, s in reached:
        stream_counts[s] = stream_counts.get(s, 0) + 1
    assert stream_counts == batch


def test_max_files_per_trigger_bounds_micro_batches(spark, tmp_path):
    """Source rate limiting: with maxFilesPerTrigger=1, an availableNow
    run over 3 files processes them as 3 micro-batches (bounded
    per-batch input — the backpressure knob for file-source replay),
    and the union of batch outputs equals the batch read."""
    src = str(tmp_path / "rl_src")
    os.makedirs(src)

    def write_file(rows, fname):
        df = spark.createDataFrame(
            rows, "event_id bigint, ts string, user_id bigint, "
                  "event_type string, value double, props string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        tmp = str(tmp_path / ("rl_stage_" + fname))
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(tmp, part), os.path.join(src, fname))

    for i in range(3):
        write_file([(i * 10 + j, f"2024-01-01 0{i}:0{j}:00", j, "click",
                     1.0, "{}") for j in range(4)], f"f{i}.parquet")

    batches = []

    def sink(batch_df, batch_id):
        batches.append((batch_id, batch_df.count()))

    q = (stream_events(spark, src, max_files_per_trigger=1)
         .writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "rl_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert len(batches) == 3, batches
    assert all(n == 4 for _, n in batches), batches


def test_stream_expanding_zscore_matches_batch(spark, tmp_path, sf_dir):
    """Welford streaming z == batch expanding-window z for every
    event, across a checkpointed two-phase run (running moments
    recovered from state, not recomputed)."""
    import social_media_ai_engineering_etl_spark.queries  # noqa: F401
    from social_media_ai_engineering_etl_spark.registry import QUERIES
    from social_media_ai_engineering_etl_spark.streaming.stateful import (
        stream_expanding_zscore)
    from social_media_ai_engineering_etl_spark.streaming.windows import (
        load_events)

    batch = {r.event_id: r.z
             for r in QUERIES["qs_expanding_zscore"](spark, sf_dir).collect()}

    ev = load_events(spark, os.path.join(sf_dir, "events.parquet"))
    mid_us = ev.agg(
        F.expr("percentile(unix_micros(ts), 0.5)")).collect()[0][0]
    src = str(tmp_path / "z_src")
    os.makedirs(src)

    def write_phase(df, fname):
        tmp = str(tmp_path / ("z_stage_" + fname))
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(tmp, part), os.path.join(src, fname))

    emitted = []

    def run():
        def sink(batch_df, _):
            emitted.extend(batch_df.collect())
        q = (stream_expanding_zscore(stream_events(spark, src))
             .writeStream.foreachBatch(sink)
             .outputMode("update")
             .option("checkpointLocation", str(tmp_path / "z_ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination()

    write_phase(ev.filter(F.unix_micros("ts") <= mid_us), "a.parquet")
    run()
    write_phase(ev.filter(F.unix_micros("ts") > mid_us), "b.parquet")
    run()

    got = {r.event_id: r.z for r in emitted}
    assert got.keys() == batch.keys()
    for eid, z in batch.items():
        assert abs(got[eid] - z) < 1e-6, (eid, got[eid], z)


def test_stream_cohort_retention_matches_batch(spark, tmp_path, sf_dir):
    """Streaming cohort retention == the batch triangle: counting
    emitted (user, cohort, offset) rows per (cohort_week, offset)
    reproduces cohort_retention() exactly, across a checkpointed
    two-phase run (per-user cohort/weeks state recovered, a week
    already emitted in phase 1 is not re-emitted in phase 2)."""
    from social_media_ai_engineering_etl_spark.operators.behavior import (
        cohort_retention)
    from social_media_ai_engineering_etl_spark.streaming.stateful import (
        stream_cohort_retention)
    from social_media_ai_engineering_etl_spark.streaming.windows import (
        load_events)

    ev = load_events(spark, os.path.join(sf_dir, "events.parquet"))
    batch = {(r.cohort_week, r.week_offset): r.n_users
             for r in cohort_retention(ev).collect()}

    mid_us = ev.agg(
        F.expr("percentile(unix_micros(ts), 0.5)")).collect()[0][0]
    src = str(tmp_path / "co_src")
    os.makedirs(src)

    def write_phase(df, fname):
        tmp = str(tmp_path / ("co_stage_" + fname))
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(tmp, part), os.path.join(src, fname))

    emitted = []

    def run():
        def sink(batch_df, _):
            emitted.extend(batch_df.collect())
        q = (stream_cohort_retention(stream_events(spark, src))
             .writeStream.foreachBatch(sink)
             .outputMode("update")
             .option("checkpointLocation", str(tmp_path / "co_ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination()

    write_phase(ev.filter(F.unix_micros("ts") <= mid_us), "a.parquet")
    run()
    write_phase(ev.filter(F.unix_micros("ts") > mid_us), "b.parquet")
    run()

    import datetime
    stream_counts: dict = {}
    epoch_monday = datetime.date(1970, 1, 5)
    for r in emitted:
        week = (epoch_monday
                + datetime.timedelta(days=int(r.cohort_days))).isoformat()
        stream_counts[(week, r.week_offset)] = \
            stream_counts.get((week, r.week_offset), 0) + 1
    assert stream_counts == batch


def test_streaming_curation_gate_matches_batch(spark, sf_dir, tmp_path):
    """Stream-static curation gate (quality HOFs + benchmark-gram
    LEFT SEMI broadcast join) over a two-batch document stream,
    upserted by doc_id via the foreachBatch keyed sink, equals the
    batch twin computed directly."""
    from social_media_ai_engineering_etl_spark.operators.curation import (
        gopher_quality)
    from social_media_ai_engineering_etl_spark.operators.dedup import (
        word_shingles)
    from social_media_ai_engineering_etl_spark.streaming.sinks import (
        benchmark_gram_table, curated_document_stream, upsert_parquet_sink)

    docs_path = os.path.join(sf_dir, "documents.parquet")
    docs = spark.read.parquet(docs_path)
    src = str(tmp_path / "docs_src")
    # two micro-batch files
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1) \
        .write.mode("append").parquet(src)

    bench = benchmark_gram_table(spark, docs_path, n=5)
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = str(tmp_path / "curated")
    q = (curated_document_stream(stream, bench, n=5)
         .writeStream.foreachBatch(upsert_parquet_sink(out, ["doc_id"]))
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    got = {r["doc_id"]: (r["keep"], r["contaminated"])
           for r in spark.read.parquet(out).collect()}

    bench_hits = (docs.select(
        "doc_id", F.explode(word_shingles(F.col("text"), 5)).alias("gram"))
        .join(F.broadcast(bench), "gram", "left_semi")
        .select("doc_id").distinct())
    want_df = (gopher_quality(docs, "doc_id", "text")
               .join(bench_hits.withColumn("c", F.lit(1)), "doc_id", "left")
               .select("doc_id", "keep", F.coalesce("c", F.lit(0))
                       .alias("contaminated")))
    want = {r["doc_id"]: (r["keep"], r["contaminated"])
            for r in want_df.collect()}
    assert got == want
    assert sum(c for _, c in got.values()) > 0  # gate actually fired


def test_upsert_sink_is_idempotent_under_replay(spark, tmp_path):
    from social_media_ai_engineering_etl_spark.streaming.sinks import (
        upsert_parquet_sink)
    out = str(tmp_path / "tbl")
    sink = upsert_parquet_sink(out, ["k"])
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    sink(b0, 0)
    b1 = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    sink(b1, 1)
    after_first = sorted(map(tuple, spark.read.parquet(out)
                             .select("k", "v").collect()))
    assert after_first == [(1, "a"), (2, "B"), (3, "c")]  # latest wins
    sink(b1, 1)  # checkpoint-recovery replay of the same batch
    after_replay = sorted(map(tuple, spark.read.parquet(out)
                              .select("k", "v").collect()))
    assert after_replay == after_first


def test_upsert_sink_crash_windows_never_truncate_live_table(spark,
                                                             tmp_path):
    """r2 ADVICE: a failure between the snapshot write and the repoint
    must leave the previous snapshot live (readable, complete), and a
    replay must recover — the live table is only ever moved by an
    atomic symlink replace, never deleted first."""
    import os

    from social_media_ai_engineering_etl_spark.streaming.sinks import (
        upsert_parquet_sink)
    out = str(tmp_path / "tbl")
    sink = upsert_parquet_sink(out, ["k"])
    sink(spark.createDataFrame([(1, "a")], "k long, v string"), 0)
    assert os.path.islink(out)

    # simulate a crashed attempt of batch 1: partial snapshot dir
    # exists, repoint never happened
    part = out + ".__snapshots__/b1"
    os.makedirs(part, exist_ok=True)
    with open(os.path.join(part, "garbage.parquet"), "w") as fh:
        fh.write("not parquet")
    live = sorted(map(tuple, spark.read.parquet(out)
                      .select("k", "v").collect()))
    assert live == [(1, "a")]  # previous snapshot untouched

    # replay of batch 1 overwrites the partial dir and repoints
    sink(spark.createDataFrame([(2, "b")], "k long, v string"), 1)
    after = sorted(map(tuple, spark.read.parquet(out)
                       .select("k", "v").collect()))
    assert after == [(1, "a"), (2, "b")]
    # superseded snapshot pruned, temp link gone
    assert not os.path.lexists(out + ".__repoint__")
    snaps = os.listdir(out + ".__snapshots__")
    # the partial b1 dir existed, so the replay wrote the attempt-
    # suffixed b1.r1 and the prune retired the garbage b1
    assert snaps == ["b1.r1"]
    assert os.path.basename(os.path.realpath(out)).startswith("b1")


def test_stickiness_hll_tracks_exact_within_error(spark, sf_dir):
    """Trailing-MAU sketch union must stay within HLL++ error of the
    exact count (2% sketches, generous 6% gate) and DAU columns must
    be identical (DAU is exact in both)."""
    from social_media_ai_engineering_etl_spark.queries.warehouse_patterns import (
        qx_stickiness_exact, qx_stickiness_hll)
    exact = {r["day"]: (r["dau"], r["mau"])
             for r in qx_stickiness_exact(spark, sf_dir).collect()}
    approx = {r["day"]: (r["dau"], r["mau_approx"])
              for r in qx_stickiness_hll(spark, sf_dir).collect()}
    assert set(exact) == set(approx)
    for day, (dau, mau) in exact.items():
        a_dau, a_mau = approx[day]
        assert a_dau == dau
        assert abs(a_mau - mau) <= max(2, 0.06 * mau)


def test_streaming_windowed_topk_matches_batch(spark, sf_dir, tmp_path):
    """The trending top-k recipe the qs_windowed_topk docstring
    describes: watermarked hourly counts stream in append mode, the
    rank applies per micro-batch in foreachBatch; emitted (closed)
    hours must carry exactly the batch query's top-3."""
    from social_media_ai_engineering_etl_spark.queries.streaming_analytics import (
        qs_windowed_topk)
    from social_media_ai_engineering_etl_spark.streaming.windows import (
        load_events, stream_events)
    from pyspark.sql import Window

    src = str(tmp_path / "ev_src")
    os.makedirs(src)
    shutil.copy(os.path.join(sf_dir, "events.parquet"),
                os.path.join(src, "events.parquet"))

    counts = (stream_events(spark, src)
              .withWatermark("ts", "10 minutes")
              .groupBy(F.window("ts", "1 hour"), "event_type")
              .agg(F.count(F.lit(1)).alias("n")))
    emitted = []

    def sink(batch_df, _bid):
        w = Window.partitionBy("hour").orderBy(F.desc("n"), "event_type")
        ranked = (batch_df.select(
            F.date_format("window.start", "yyyy-MM-dd HH:00").alias("hour"),
            "event_type", "n")
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 3))
        emitted.extend(ranked.collect())

    q = (counts.writeStream.foreachBatch(sink).outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    got = {(r["hour"], r["rnk"]): (r["event_type"], r["n"])
           for r in emitted}
    assert got  # some windows closed
    want = {(r["hour"], r["rnk"]): (r["event_type"], r["n"])
            for r in qs_windowed_topk(spark, sf_dir).collect()}
    # every emitted (closed) hour matches the batch top-3 exactly
    hours = {h for h, _ in got}
    assert got == {k: v for k, v in want.items() if k[0] in hours}
    # no hour ever emits more than k rows
    assert all(len([1 for (h, _) in got if h == hr]) <= 3 for hr in hours)


def test_stream_neardup_portable_hash_matches_oracle_twin(spark, sf_dir,
                                                          tmp_path):
    """Chain-closing pin (r2 VERDICT #8): the STREAMING stateful
    near-dup operator run with the portable md5-prefix base hash over
    the documents fixture emits exactly the pair set of
    qs_neardup_pairs_portable — the query the driver value-checks
    against its DuckDB oracle. Driver-green row + this pin together
    cover streaming/neardup.py."""
    import os as _os

    from social_media_ai_engineering_etl_spark.operators.dedup import (
        portable_hash31)
    from social_media_ai_engineering_etl_spark.queries.dedup_similarity import (
        qs_neardup_pairs_portable)
    from social_media_ai_engineering_etl_spark.streaming.neardup import (
        stream_neardup_pairs)

    src = str(tmp_path / "ndp_src")
    ckpt = str(tmp_path / "ndp_ckpt")
    _os.makedirs(src)
    docs = (spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
            .filter(F.size(F.split(F.trim(F.col("text")), r"\s+")) >= 3)
            .select("doc_id", "text"))
    # split the corpus into two micro-batch files so cross-batch state
    # is actually exercised
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1) \
        .write.mode("overwrite").parquet(src + "/p0")
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1) \
        .write.mode("overwrite").parquet(src + "/p1")

    emitted = []

    def sink(batch_df, _bid):
        emitted.extend(batch_df.collect())

    stream = (spark.readStream.schema("doc_id bigint, text string")
              .option("recursiveFileLookup", "true").parquet(src))
    q = (stream_neardup_pairs(stream, base_hash=portable_hash31)
         .writeStream.foreachBatch(sink)
         .outputMode("update").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r.id1, r.id2, r.est_sim) for r in emitted}
    want = {(r.id1, r.id2, r.est_sim)
            for r in qs_neardup_pairs_portable(spark, sf_dir).collect()}
    assert got == want


def test_streaming_continuous_rollup_matches_batch(spark, sf_dir, tmp_path):
    """The foreachBatch-maintained continuous aggregate must converge
    to exactly the batch hierarchical rollup: split the fact into 3
    file micro-batches, maintain hour partials with per-batch
    replace + compaction, then serve hour/day/week from the snapshot
    (no fact rescan) and compare with one-shot batch aggregation —
    including a checkpoint-recovery replay of the final batch."""
    from social_media_ai_engineering_etl_spark.operators.scale import (
        hierarchical_time_rollup)
    from social_media_ai_engineering_etl_spark.streaming.sinks import (
        read_continuous_rollup, rollup_merge_sink)
    from social_media_ai_engineering_etl_spark.streaming.windows import (
        load_events)

    ev = load_events(spark, os.path.join(sf_dir, "events.parquet")).select(
        "event_type", "ts", F.lit(1).alias("n"),
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    measures = {"n": "count", "cents": "sum"}
    out = str(tmp_path / "rollup")
    sink = rollup_merge_sink(out, "ts", ["event_type"], measures)

    # three deterministic micro-batches (by event week-of-month slice)
    batches = [ev.filter(F.dayofmonth("ts") % 3 == i) for i in range(3)]
    for i, b in enumerate(batches):
        sink(b, i)
    sink(batches[2], 2)  # replay of the last batch must not double-sum

    got = read_continuous_rollup(spark, out, ["event_type"], measures) \
        .toPandas().sort_values(["level", "event_type", "bucket"]) \
        .reset_index(drop=True)
    want = hierarchical_time_rollup(ev, "ts", ["event_type"], measures,
                                    levels=("hour", "day", "week")) \
        .toPandas().sort_values(["level", "event_type", "bucket"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want)
    # stored snapshot stays O(groups): one base row + last batch's rows
    stored = spark.read.parquet(out)
    assert stored.select("__batch_id").distinct().count() <= 2


def test_continuous_rollup_stream_restart_recovers(spark, sf_dir, tmp_path):
    """The continuous aggregate driven by a REAL checkpointed file
    stream: phase 1 streams part of the fact, the query stops, phase 2
    adds files and restarts from the checkpoint — the maintained
    snapshot must equal the batch rollup over everything, with no
    double-count from the restart boundary."""
    from social_media_ai_engineering_etl_spark.operators.scale import (
        hierarchical_time_rollup)
    from social_media_ai_engineering_etl_spark.streaming.sinks import (
        read_continuous_rollup, rollup_merge_sink)
    from social_media_ai_engineering_etl_spark.streaming.windows import (
        load_events, stream_events)

    ev = load_events(spark, os.path.join(sf_dir, "events.parquet"))
    src = str(tmp_path / "cr_src")
    ckpt = str(tmp_path / "cr_ckpt")
    out = str(tmp_path / "cr_tbl")
    os.makedirs(src)

    def write_phase(df, fname):
        tmp = str(tmp_path / ("cr_stage_" + fname))
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(tmp, part), os.path.join(src, fname))

    measures = {"n": "count", "cents": "sum"}

    def run():
        stream = stream_events(spark, src).select(
            "event_type", "ts", F.lit(1).alias("n"),
            F.round(F.col("value") * 100).cast("long").alias("cents"))
        q = (stream.writeStream
             .foreachBatch(rollup_merge_sink(out, "ts", ["event_type"],
                                             measures))
             .outputMode("update").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    write_phase(ev.filter(F.dayofmonth("ts") <= 15), "p1.parquet")
    run()
    write_phase(ev.filter(F.dayofmonth("ts") > 15), "p2.parquet")
    run()

    eb = ev.select("event_type", "ts", F.lit(1).alias("n"),
                   F.round(F.col("value") * 100).cast("long").alias("cents"))
    got = read_continuous_rollup(spark, out, ["event_type"], measures) \
        .toPandas().sort_values(["level", "event_type", "bucket"]) \
        .reset_index(drop=True)
    want = hierarchical_time_rollup(eb, "ts", ["event_type"], measures,
                                    levels=("hour", "day", "week")) \
        .toPandas().sort_values(["level", "event_type", "bucket"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_write_audit_publish_gates_on_staged_data(spark, tmp_path):
    """WAP: a passing audit publishes atomically; a failing audit
    leaves the PREVIOUS snapshot live and the bad stage inspectable."""
    from social_media_ai_engineering_etl_spark.streaming.sinks import (
        write_audit_publish)
    out = str(tmp_path / "tbl")
    rules = [{"rule": "not_null", "col": "v"},
             {"rule": "in_range", "col": "v", "min": 0, "max": 100}]
    good = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    ok, rep = write_audit_publish(good, out, rules, batch_id=0)
    assert ok and spark.read.parquet(out).count() == 2

    bad = spark.createDataFrame([(3, 999)], "k long, v long")
    ok2, rep2 = write_audit_publish(bad, out, rules, batch_id=1)
    assert not ok2
    viol = {r["rule"]: r["n_violations"] for r in rep2.collect()}
    assert any(v > 0 for v in viol.values())
    # previous snapshot still live and intact
    live = sorted(r["k"] for r in spark.read.parquet(out).collect())
    assert live == [1, 2]
    # staged bad batch kept for inspection
    import os as _os
    assert _os.path.exists(out + ".__snapshots__/b1")


def test_streaming_drift_equals_batch_chisq(spark, sf_dir, tmp_path):
    """The streaming drift monitor (per-batch histogram partials,
    replay-replace) reaches EXACTLY the batch qx_distribution_drift
    fixed-point chi-square on the same windows, across two incremental
    phases AND a replayed final batch."""
    import social_media_ai_engineering_etl_spark.queries  # noqa: F401
    from social_media_ai_engineering_etl_spark.registry import QUERIES
    from social_media_ai_engineering_etl_spark.streaming.sinks import (
        drift_partials_sink, drift_vs_reference)
    from social_media_ai_engineering_etl_spark.streaming.windows import (
        load_events, stream_events)

    ev = load_events(spark, os.path.join(sf_dir, "events.parquet"))
    bucketize = F.floor(F.col("value") / 25).cast("long").alias("bucket")
    ref = (ev.filter(F.col("ts") < "2024-01-08")
           .groupBy("event_type", bucketize)
           .agg(F.count(F.lit(1)).alias("cnt")))

    src = str(tmp_path / "dr_src")
    ckpt = str(tmp_path / "dr_ckpt")
    out = str(tmp_path / "dr_tbl")
    os.makedirs(src)
    late = ev.filter(F.col("ts") >= "2024-01-24")

    def write_phase(df, fname):
        tmp = str(tmp_path / ("dr_stage_" + fname))
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(tmp, part), os.path.join(src, fname))

    def run():
        stream = stream_events(spark, src).select(
            "event_type", F.floor(F.col("value") / 25).cast("long")
            .alias("bucket"))
        q = (stream.writeStream
             .foreachBatch(drift_partials_sink(out))
             .outputMode("update").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    write_phase(late.filter(F.dayofmonth("ts") <= 27), "p1.parquet")
    run()
    write_phase(late.filter(F.dayofmonth("ts") > 27), "p2.parquet")
    run()

    got = drift_vs_reference(spark, out, ref).toPandas() \
        .sort_values("event_type").reset_index(drop=True)
    want = QUERIES["qx_distribution_drift"](spark, sf_dir).toPandas() \
        .sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[got.columns])

    # replay the last committed batch by hand: REPLACE, not double-sum
    sink = drift_partials_sink(out)
    replay = (spark.read.parquet(os.path.join(src, "p2.parquet"))
              .select("event_type",
                      F.floor(F.col("value") / 25).cast("long")
                      .alias("bucket")))
    sink(replay, 1)   # availableNow phase 2 committed as batch id 1
    again = drift_vs_reference(spark, out, ref).toPandas() \
        .sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(again, want[again.columns])


def test_upsert_sink_exactly_once_under_real_epoch_redelivery(
        spark, tmp_path):
    """VERDICT r4 #8, duplicate-replay proof against a REAL streaming
    query: run a checkpointed two-batch file stream into the
    idempotent sink, then delete the last epoch's commit marker from
    the checkpoint and restart — Structured Streaming re-executes that
    epoch (same batch id, same rows re-delivered), and the table must
    be byte-identical to the pre-tamper exactly-once result."""
    import shutil

    from social_media_ai_engineering_etl_spark.streaming.sinks import (
        upsert_parquet_sink)

    src = str(tmp_path / "src")
    rows = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "k long, v string")
    rows.filter(F.col("k") < 10).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    rows.filter(F.col("k") >= 10).coalesce(1) \
        .write.mode("append").parquet(src)

    out = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = (spark.readStream.schema(rows.schema)
             .option("maxFilesPerTrigger", 1).parquet(src)
             .writeStream.foreachBatch(upsert_parquet_sink(out, ["k"]))
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    run()
    want = sorted(map(tuple, spark.read.parquet(out)
                      .select("k", "v").collect()))
    assert want == [(i, f"v{i}") for i in range(20)]

    # tamper: drop the newest commit marker -> the engine considers
    # that epoch uncommitted and REPLAYS it on restart (the crash-
    # between-sink-and-commit window)
    commits = os.path.join(ckpt, "commits")
    epochs = [f for f in os.listdir(commits) if f.isdigit()]
    last = max(epochs, key=int)
    os.remove(os.path.join(commits, last))
    crc = os.path.join(commits, f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run()
    got = sorted(map(tuple, spark.read.parquet(out)
                     .select("k", "v").collect()))
    assert got == want, "re-delivered epoch must have exactly-once effect"


def test_upsert_sink_replay_replaces_partial_failed_attempt(spark,
                                                            tmp_path):
    """The harder replay case: the FAILED attempt of an epoch wrote a
    partial/garbled subset before dying; the re-delivered epoch (same
    batch id, full rows) must REPLACE everything the failed attempt
    wrote — no stacking, no orphaned rows from the dead attempt."""
    from social_media_ai_engineering_etl_spark.streaming.sinks import (
        upsert_parquet_sink)

    out = str(tmp_path / "tbl")
    sink = upsert_parquet_sink(out, ["k"])
    sink(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), 0)
    # failed attempt of batch 1: wrote only part of the batch, and a
    # row (k=9) the recomputed batch will NOT contain
    sink(spark.createDataFrame([(3, "c-part"), (9, "ghost")],
                               "k long, v string"), 1)
    # re-delivery of batch 1, full contents
    sink(spark.createDataFrame([(3, "c"), (4, "d")], "k long, v string"), 1)
    got = sorted(map(tuple, spark.read.parquet(out)
                     .select("k", "v").collect()))
    assert got == [(1, "a"), (2, "b"), (3, "c"), (4, "d")], got


def test_state_growth_stays_bounded_by_live_keys(spark, tmp_path):
    """VERDICT r5 ask #8 — state-growth probe: drive the watermarked
    dedup and the session windows through micro-batches whose key
    space grows 10x per batch (10 -> 100 -> 1,000 -> 10,000), then
    two small tail batches.  `stateOperators.numRowsTotal` must track
    the LIVE horizon (current batch's keys + at most the previous
    batch's, which evict one batch later when the watermark advances),
    never the ~11k cumulative distinct keys — the eviction-bounds-
    state contract that makes 100 TB/day ingest dedup feasible."""
    import json

    from social_media_ai_engineering_etl_spark.streaming.windows import (
        dedup_events, sessionized_activity, stream_events)

    phases = [10, 100, 1000, 10000, 10, 10]
    base = 1_000_000

    def write_phase(src, i, n_keys):
        # phase i sits 2 h after phase i-1; watermark is 10 min, so
        # each new phase expires everything before it
        t0 = 1704067200 + i * 7200
        rows = [(base * i + k,                      # unique event_id
                 base * i + k,                      # unique user/key
                 t0 + (k % 300), 1.0) for k in range(n_keys)]
        df = (spark.createDataFrame(
            rows, "event_id bigint, user_id bigint, epoch bigint, "
                  "value double")
            .select("event_id", "user_id",
                    F.col("epoch").cast("timestamp").alias("ts"),
                    F.lit("click").alias("event_type"), "value",
                    F.lit("{}").alias("props")))
        tmp = str(tmp_path / f"stage{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(tmp, part),
                    os.path.join(src, f"p{i}.parquet"))

    def state_rows(q):
        rows = None
        for p in q.recentProgress:
            ops = (p if isinstance(p, dict) else json.loads(p.json))[
                "stateOperators"]
            if ops:
                rows = ops[0]["numRowsTotal"]
        return rows

    results = {}
    for name, make in (
        ("dedup", lambda ev: dedup_events(ev, keys=("event_id",),
                                          watermark="10 minutes")),
        ("sessions", lambda ev: sessionized_activity(
            ev, gap="5 minutes", watermark="10 minutes")),
    ):
        src = str(tmp_path / f"src_{name}")
        ckpt = str(tmp_path / f"ckpt_{name}")
        out = str(tmp_path / f"out_{name}")
        os.makedirs(src)
        trace = []
        for i, n_keys in enumerate(phases):
            write_phase(src, i, n_keys)
            stream = make(stream_events(spark, src))
            mode = "append"
            q = (stream.writeStream.format("parquet")
                 .option("path", out).outputMode(mode)
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True).start())
            q.awaitTermination()
            trace.append((n_keys, state_rows(q)))
        results[name] = trace

    total_keys = sum(phases)                      # 11,130 ever seen
    for name, trace in results.items():
        # growth phases: state tracks live keys (current + at most the
        # not-yet-evicted previous batch), never the cumulative count
        for i, (n_keys, state) in enumerate(trace):
            assert state is not None, (name, i)
            prev = phases[i - 1] if i else 0
            assert state <= (n_keys + prev) * 1.25 + 16, \
                (name, i, n_keys, state)
            assert state >= n_keys, (name, i, n_keys, state)
        # the money pin: after the 10k batch passes out of the horizon,
        # state collapses to tens of rows while ~11k keys were seen
        final = trace[-1][1]
        assert final <= 64, (name, trace)
        assert final < total_keys * 0.01, (name, trace)


def test_tied_timestamps_form_one_session(spark):
    """r6 parity-flake pin: 100 events with ONE tied timestamp must be
    ONE session on both engines. The oracle's lag window and cumsum
    window used to order ties independently — rows sorted before the
    new_s=1 row landed in a phantom sid-0 session on some evaluations
    (caught by the repeated const-regime parity sweep; fixed with the
    event_id tie-break in both windows)."""
    import duckdb

    import social_media_ai_engineering_etl_spark.queries  # noqa: F401
    from social_media_ai_engineering_etl_spark.registry import (ORACLES,
                                                                QUERIES)
    import os
    import tempfile

    rows = [(i, "2024-01-01 00:09:58.778549", 13, "click", 1.0, "{}")
            for i in range(100)]
    df = (spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, "
              "event_type string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp")))
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = QUERIES["qs_session_windows"](spark, d).collect()
    assert len(got) == 1 and got[0].n_events == 100, got
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet/*.parquet')")
    for _ in range(5):   # the old bug was evaluation-order dependent
        want = con.execute(ORACLES["qs_session_windows"]).fetchall()
        assert len(want) == 1 and want[0][2] == 100, want
    prof = QUERIES["qs_session_depth_profile"](spark, d).collect()
    assert prof[0].n_sessions == 1 and prof[0].max_depth == 100

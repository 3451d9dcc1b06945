"""Event-time window transformations that run identically as batch
queries (DuckDB-oracle-checked) and as Structured Streaming plans
(watermark + append mode, tested with availableNow in
tests/test_streaming.py).

Design: each transformation is a pure ``DataFrame -> DataFrame``
function over the events schema ``(event_id, ts, user_id, event_type,
value, props)``. Batch callers pass ``spark.read.parquet``; streaming
callers pass ``stream_events(...)`` and get the same logical plan with
a watermark inserted, so late data is bounded-state at 100 TB/day
ingest rates: state per key is one window aggregate, evicted when the
watermark passes the window end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = ("event_id bigint, ts timestamp, user_id bigint, "
                 "event_type string, value double, props string")
# driver generations have stored events.ts as TIMESTAMP(NANOS) (surfaces
# as bigint nanos under spark.sql.legacy.parquet.nanosAsLong) or as
# micros-naive (surfaces as TIMESTAMP_NTZ); load_events/stream_events
# normalize both to session-tz TimestampType.
EVENTS_SCHEMA_NANOS = ("event_id bigint, ts bigint, user_id bigint, "
                       "event_type string, value double, props string")
EVENTS_SCHEMA_NTZ = ("event_id bigint, ts timestamp_ntz, user_id bigint, "
                     "event_type string, value double, props string")


def _nanos_to_ts(df: DataFrame) -> DataFrame:
    """bigint nanos -> micros TimestampType (floor division — the same
    truncation DuckDB applies when coercing NANOS to its micros
    TIMESTAMP)."""
    # integer `div`, not `/`: nanos exceed double precision (2^53) and
    # float division rounds the microsecond
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def load_events(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of an events parquet, normalizing ``ts`` to session-tz
    TimestampType whatever the file stores: bigint nanos (TIMESTAMP(NANOS)
    under nanosAsLong) or TIMESTAMP_NTZ (micros with isAdjustedToUTC=false,
    which ``unix_micros``/watermarks reject). The session timezone is UTC,
    so the NTZ cast is a pure reinterpretation — same wall-clock DuckDB
    sees for naive timestamps."""
    df = spark.read.parquet(path)
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = _nanos_to_ts(df)
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def stream_events(spark: SparkSession, path_or_dir: str,
                  max_files_per_trigger: int | None = None,
                  ts_storage: str | None = None) -> DataFrame:
    """readStream over an events parquet directory. Streaming file
    sources require an explicit schema (no inference pass), so the
    physical ``ts`` storage is probed from the existing files' footers
    via a lazy batch read — metadata only, no scan. ``ts_storage``
    overrides the probe for empty source dirs: one of ``"timestamp"``,
    ``"nanos"`` (bigint nanos), ``"ntz"`` (micros-naive)."""
    if ts_storage is None:
        probed = dict(spark.read.parquet(path_or_dir).dtypes).get("ts")
        ts_storage = {"bigint": "nanos", "timestamp_ntz": "ntz"}.get(
            probed, "timestamp")
    schema = {"nanos": EVENTS_SCHEMA_NANOS,
              "ntz": EVENTS_SCHEMA_NTZ}.get(ts_storage, EVENTS_SCHEMA)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.parquet(path_or_dir)
    if ts_storage == "nanos":
        return _nanos_to_ts(df)
    if ts_storage == "ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def tumbling_engagement(events: DataFrame, window: str = "1 hour",
                        watermark: str | None = None) -> DataFrame:
    """Tumbling-window engagement rollup per event type: count +
    value sum/avg. With ``watermark`` set (streaming), late rows
    beyond the delay are dropped and window state is evicted — the
    bounded-state scale path."""
    if watermark:
        events = events.withWatermark("ts", watermark)
    # value aggregates run in integer CENTS (values are 2-decimal by
    # data contract): float sum order is engine/partition dependent,
    # and at sf0.1 an avg() ulp landed exactly on a round(...,6)
    # boundary (43.472812 vs 43.472813 — r3 sf0.1 sweep).  Integer
    # sums are order-independent; the final /100.0 and /n divisions
    # are single IEEE ops identical on both engines.
    cents = F.round(F.col("value") * 100).cast("long")
    return (events
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(cents).alias("__c"))
            .select(F.col("w.start").cast("string").alias("window_start"),
                    "event_type", "n_events",
                    F.round(F.col("__c") / 100.0, 6).alias("sum_value"),
                    F.round(F.col("__c") / 100.0 / F.col("n_events"), 6)
                     .alias("avg_value")))


def sliding_event_rates(events: DataFrame, window: str = "2 hours",
                        slide: str = "1 hour",
                        watermark: str | None = None) -> DataFrame:
    """Sliding-window event counts (overlapping windows — each event
    lands in window/slide buckets)."""
    if watermark:
        events = events.withWatermark("ts", watermark)
    return (events
            .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("w.start").cast("string").alias("window_start"),
                    "event_type", "n_events"))


def sessionized_activity(events: DataFrame, gap: str = "30 minutes",
                         watermark: str | None = None) -> DataFrame:
    """Session windows per user: a session extends while consecutive
    events arrive within ``gap``. Output: per-session event count,
    value sum, and duration (first->last event, seconds)."""
    if watermark:
        events = events.withWatermark("ts", watermark)
    # integer-cents sum: same order-independence rationale as
    # tumbling_engagement (values are 2-decimal by data contract)
    cents = F.round(F.col("value") * 100).cast("long")
    return (events
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(cents).alias("__c"),
                 F.min("ts").alias("first_ts"),
                 F.max("ts").alias("last_ts"))
            .select("user_id",
                    F.col("first_ts").cast("string").alias("session_start"),
                    "n_events",
                    F.round(F.col("__c") / 100.0, 6).alias("sum_value"),
                    (F.unix_micros("last_ts") - F.unix_micros("first_ts"))
                    .alias("duration_us")))


def run_stream_to_memory(stream_df: DataFrame, table_name: str,
                         output_mode: str = "append") -> None:
    """Drive a streaming DataFrame to a memory sink with the
    availableNow trigger and block until all available data is
    processed (test/bench harness path)."""
    q = (stream_df.writeStream.format("memory")
         .queryName(table_name).outputMode(output_mode)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def dedup_events(events: DataFrame, keys: tuple[str, ...] = ("event_id",),
                 watermark: str | None = None) -> DataFrame:
    """Streaming-capable exact dedup on ``keys`` — the ingest-side
    guard of the training-data dedup family (north-star §7.9, applied
    at the stream boundary instead of corpus-wide).

    Batch: plain ``dropDuplicates``. Streaming (``watermark`` set):
    ``dropDuplicatesWithinWatermark`` — state holds one entry per key
    only until the watermark passes, so at 100 TB/day the dedup state
    is bounded by the late-data horizon, not by history. (The
    unbounded-state streaming ``dropDuplicates`` is deliberately not
    used.)"""
    if watermark:
        return (events.withWatermark("ts", watermark)
                .dropDuplicatesWithinWatermark(list(keys)))
    return events.dropDuplicates(list(keys))


def conversion_join(clicks: DataFrame, purchases: DataFrame,
                    horizon: str = "1 hour",
                    watermark: str | None = None) -> DataFrame:
    """Event-time interval join: each purchase matched to the same
    user's clicks in the preceding ``horizon`` (click-to-conversion
    attribution).

    Batch: plain range-predicate join. Streaming (``watermark``):
    both sides watermarked and the time bound made explicit, so
    Spark's stream-stream join keeps only ``horizon`` + delay of
    per-user state on each side — bounded regardless of stream
    length. Equi-key user_id keeps it a hash join (the range is a
    post-filter on the time columns), never a broadcast-nested-loop.
    """
    c = clicks.select(F.col("user_id").alias("c_user"),
                      F.col("ts").alias("c_ts"),
                      F.col("event_id").alias("click_id"))
    p = purchases.select(F.col("user_id").alias("p_user"),
                         F.col("ts").alias("p_ts"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("value").alias("amount"))
    if watermark:
        c = c.withWatermark("c_ts", watermark)
        p = p.withWatermark("p_ts", watermark)
    cond = ((F.col("c_user") == F.col("p_user"))
            & (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr(
                f"INTERVAL {horizon}")))
    return (p.join(c, cond)
            .select(F.col("p_user").alias("user_id"), "purchase_id",
                    "click_id", "amount",
                    (F.unix_micros(F.col("p_ts"))
                     - F.unix_micros(F.col("c_ts"))).alias("lag_micros")))


def last_touch_attribution(clicks: DataFrame, purchases: DataFrame,
                           horizon: str = "1 hour") -> DataFrame:
    """As-of join: each purchase attributed to its NEAREST preceding
    click within ``horizon`` (last-touch attribution).

    Spark has no native ASOF JOIN; the idiomatic composition is the
    bounded interval join (equi-key + range predicate, so it stays a
    hash join) followed by per-purchase top-1 — the rank-1 filter
    compiles to WindowGroupLimit, which keeps only the current best
    row per purchase inside each partial sort instead of
    materializing all candidates, so the extra cost over the raw
    interval join is one shuffle on purchase_id. Ties (two clicks at
    the same instant) break on click_id for determinism."""
    from pyspark.sql import Window

    cand = conversion_join(clicks, purchases, horizon)
    w = Window.partitionBy("purchase_id").orderBy(
        F.col("lag_micros").asc(), F.col("click_id").asc())
    return (cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).drop("rn"))

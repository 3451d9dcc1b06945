"""Temporal-join queries: unbounded as-of join, backward and
forward+tolerance (the no-equi-key range join lives in
streaming_analytics.py::qs_range_join_incidents on scale.range_join).

The reference's attribution stages only ever need the bounded
interval-join composition (SURVEY §2.12); these cover the general
temporal-join surface a warehouse user expects (pandas merge_asof /
DuckDB ASOF JOIN semantics), oracle-checked against DuckDB's native
ASOF JOIN — an independent implementation, not a transcription of the
Spark plan.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..operators.temporal import asof_join
from ..registry import register
from ..session import load_events_cached


def _events(spark, sf_dir):
    # immutable sf input: cached scan construction (session contract)
    return load_events_cached(spark, os.path.join(sf_dir, "events.parquet"))


# Equal-timestamp clicks are pre-deduped to max(event_id) on BOTH
# engines: DuckDB's ASOF JOIN picks an unspecified row among ties, so
# determinism must come from the input, not the join.
_CLICKS_DEDUP = """
    SELECT user_id, ts, max(event_id) AS click_id
    FROM events WHERE event_type = 'click' GROUP BY user_id, ts
"""


@register("qx_asof_last_click", bench=True, oracle=f"""
WITH p AS (
    SELECT event_id AS purchase_id, user_id, ts
    FROM events WHERE event_type = 'purchase'
), c AS ({_CLICKS_DEDUP})
SELECT p.purchase_id, p.user_id, c.click_id,
       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS lag_micros
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND c.ts <= p.ts
ORDER BY purchase_id
""")
def qx_asof_last_click(spark, sf_dir):
    """Unbounded as-of join: every purchase attributed to the user's
    latest click at-or-before it, however old (the horizon-free
    complement of qs_last_touch's bounded interval-join form).  ONE
    shuffle on user_id (union-merge window, operators/temporal.py);
    reference semantics: nearest-preceding attribution as in
    13-clean-pairs' effective join ordering."""
    ev = _events(spark, sf_dir)
    p = (ev.filter(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("purchase_id"), "user_id", "ts"))
    c = (ev.filter(F.col("event_type") == "click")
         .groupBy("user_id", "ts")
         .agg(F.max("event_id").alias("click_id")))
    j = asof_join(p, c, on=["user_id"], direction="backward",
                  right_tiebreak=None, prefix="c_")
    return (j.select(
        "purchase_id", "user_id", F.col("c_click_id").alias("click_id"),
        (F.unix_micros(F.col("ts"))
         - F.unix_micros(F.col("c_ts"))).cast("long").alias("lag_micros"))
        .orderBy("purchase_id"))


@register("qx_asof_next_error", oracle="""
WITH p AS (
    SELECT event_id AS purchase_id, user_id, ts
    FROM events WHERE event_type = 'purchase'
), e AS (
    SELECT user_id, ts, max(event_id) AS error_id
    FROM events WHERE event_type = 'error' GROUP BY user_id, ts
)
SELECT p.purchase_id, p.user_id,
       CASE WHEN e.ts <= p.ts + INTERVAL 1 HOUR
            THEN e.error_id END AS error_id,
       CASE WHEN e.ts <= p.ts + INTERVAL 1 HOUR
            THEN CAST(epoch_us(e.ts) - epoch_us(p.ts) AS BIGINT)
       END AS lead_micros
FROM p ASOF LEFT JOIN e
  ON p.user_id = e.user_id AND e.ts >= p.ts
ORDER BY purchase_id
""")
def qx_asof_next_error(spark, sf_dir):
    """Forward as-of with tolerance: the user's first error at-or-after
    each purchase, nulled when more than 1 hour out (post-purchase
    failure triage).  Exercises the operator's forward direction and
    tolerance nulling; oracle applies the same tolerance as a CASE over
    DuckDB's forward ASOF match."""
    ev = _events(spark, sf_dir)
    p = (ev.filter(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("purchase_id"), "user_id", "ts"))
    e = (ev.filter(F.col("event_type") == "error")
         .groupBy("user_id", "ts")
         .agg(F.max("event_id").alias("error_id")))
    j = asof_join(p, e, on=["user_id"], direction="forward",
                  tolerance="1 hour", prefix="e_")
    return (j.select(
        "purchase_id", "user_id", F.col("e_error_id").alias("error_id"),
        (F.unix_micros(F.col("e_ts"))
         - F.unix_micros(F.col("ts"))).cast("long").alias("lead_micros"))
        .orderBy("purchase_id"))


@register("qx_scd2_enrich", oracle="""
WITH k AS (
    SELECT user_id, ts, event_id,
           json_extract(props, '$.k')::BIGINT AS k
    FROM events
), changes AS (
    SELECT user_id, ts, event_id, k,
           lag(k) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS prev_k
    FROM k
), scd0 AS (
    SELECT user_id, k, ts AS valid_from,
           row_number() OVER (PARTITION BY user_id, ts
                              ORDER BY event_id DESC) AS rn
    FROM changes WHERE prev_k IS NULL OR k <> prev_k
), scd AS MATERIALIZED (
    -- MATERIALIZED: DuckDB's ASOF planner rejects windows in an
    -- inlined lateral input; two changes at one instant resolve to
    -- the (ts, event_id)-last one
    SELECT user_id, k, valid_from FROM scd0 WHERE rn = 1
), enriched AS (
    SELECT e.event_type, s.k AS k_at_event
    FROM events e
    ASOF LEFT JOIN scd s
      ON e.user_id = s.user_id AND s.valid_from <= e.ts
)
SELECT event_type, CAST(k_at_event AS BIGINT) AS k_at_event,
       count(*) AS n
FROM enriched GROUP BY 1, 2 ORDER BY event_type, k_at_event
""")
def qx_scd2_enrich(spark, sf_dir):
    """Point-in-time-correct enrichment (feature-store semantics):
    every event annotated with the SCD2 attribute value IN EFFECT at
    its timestamp — the change rows (qx_scd2_intervals' front half)
    as-of joined back onto the fact, so late re-runs can never leak a
    FUTURE attribute value into a training feature.  Composition of
    the two temporal operators: SCD2 change extraction + unbounded
    asof_join, ONE user-key window each."""
    from pyspark.sql import Window
    from ..operators.temporal import asof_join
    ev = _events(spark, sf_dir)
    k = ev.select("user_id", "ts", "event_id",
                  F.from_json("props", "k BIGINT").getField("k")
                  .alias("k"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (k.withColumn("prev_k", F.lag("k").over(w))
               .filter(F.col("prev_k").isNull()
                       | (F.col("k") != F.col("prev_k"))))
    w2 = Window.partitionBy("user_id", "ts").orderBy(
        F.col("event_id").desc())
    changes = (changes.withColumn("__r", F.row_number().over(w2))
               .filter(F.col("__r") == 1)
               .select("user_id", F.col("ts").alias("valid_from"), "k"))
    enriched = asof_join(
        ev.select("event_type", "user_id", "ts"),
        changes.withColumnRenamed("valid_from", "ts"),
        on=["user_id"], prefix="s_")
    return (enriched.groupBy(
        "event_type", F.col("s_k").cast("long").alias("k_at_event"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "k_at_event"))


@register("qx_resample_ffill", oracle="""
WITH obs AS (
    SELECT user_id, date_trunc('hour', ts) AS bucket,
           max(struct_pack(t := ts,
                           cents := CAST(round(value * 100) AS BIGINT)))
               AS last_obs
    FROM events WHERE user_id % 100 = 0
    GROUP BY user_id, bucket
), span AS (
    SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
    FROM obs GROUP BY user_id
), spine AS (
    SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
               AS bucket
    FROM span
), joined AS (
    SELECT s.user_id, s.bucket, o.last_obs
    FROM spine s LEFT JOIN obs o
      ON o.user_id = s.user_id AND o.bucket = s.bucket
)
SELECT user_id, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
       (last_value(last_obs IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)).cents
           AS cents,
       last_obs IS NULL AS is_gap
FROM joined ORDER BY user_id, bucket
""")
def qx_resample_ffill(spark, sf_dir):
    """Per-user hourly resampling with forward-fill (time_bucket_
    gapfill + locf): each user's observation span becomes a dense
    hourly spine, empty buckets carry the last observed value and an
    is_gap flag.  The spine explodes from each key's (min, max) — two
    scalars, never a driver-side range — and the carry is a
    partitioned ascending window.  See operators/temporal.py:
    resample_ffill."""
    from ..operators.temporal import resample_ffill

    ev = (_events(spark, sf_dir)
          .filter(F.col("user_id") % 100 == 0)
          .select("user_id", "ts",
                  F.round(F.col("value") * 100).cast("long")
                  .alias("cents")))
    out = resample_ffill(ev, "user_id", "ts", ["cents"], "1 hour")
    return (out.select("user_id",
                       F.date_format("bucket", "yyyy-MM-dd HH:mm:ss")
                       .alias("bucket"),
                       "cents", "is_gap")
            .orderBy("user_id", "bucket"))

"""As-of join — the temporal join Spark lacks natively, in its
unbounded union-merge form.

The streaming family covers the *bounded* as-of composition
(streaming/windows.py::last_touch_attribution: interval join + rank-1,
needs a horizon and a second shuffle), and scale.range_join covers the
no-equi-key point-in-interval case.  ``asof_join`` here is the
complementary unbounded form — the sort-merge formulation used by
pandas ``merge_asof`` and kdb ``aj``: tag both sides, union, one
partition-by-key window, carry the latest right row forward.  ONE
shuffle on the key, no horizon parameter, no candidate blow-up when a
user's nearest click is a month old.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_LEFT_RANK = 1


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str = "ts", right_ts: str = "ts",
              direction: str = "backward",
              tolerance: str | None = None,
              allow_exact_matches: bool = True,
              right_tiebreak: str | None = None,
              prefix: str = "r_") -> DataFrame:
    """For each left row, attach the nearest right row (per ``on``
    keys) at-or-before (``backward``) / at-or-after (``forward``) the
    left timestamp — pandas ``merge_asof`` semantics, distributed.

    Plan shape: unionByName -> ONE Exchange on ``on`` -> Sort ->
    Window(last over rows unbounded-preceding..current) -> filter to
    left rows.  At 100 TB both sides shuffle once on the key and the
    window is a linear per-partition pass; state never exceeds one
    carried struct per row.  Skewed keys behave like any keyed window
    (salt upstream if one user owns the partition).

    * ``tolerance``: SQL interval literal body (e.g. ``'1 hour'``);
      matches farther than it are nulled out, left rows kept.
    * ``allow_exact_matches=False``: strict inequality (a right row at
      exactly the left timestamp does not match).
    * ``right_tiebreak``: NUMERIC right column breaking
      equal-timestamp ties deterministically (cast to long; backward
      takes the greatest, forward the least — exactly pandas
      merge_asof over a right side pre-sorted by (ts, tiebreak)).
    * Right payload columns come back ``prefix``-renamed; the matched
      right timestamp is ``<prefix><right_ts>``.  Right rows with a
      NULL key are dropped (equi-join semantics: NULL matches
      nothing), and an all-NULL-payload right row still matches (the
      payload is carried as one non-null struct, so a legitimately
      NULL column never falls through to an older row's value).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction}")
    on = list(on)
    payload = [c for c in right.columns if c not in on]
    if right_ts not in payload:
        raise ValueError(f"right_ts {right_ts!r} must be a right column")
    reserved = {"__ts", "__rank", "__tie", "__rpay", "__m"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"reserved column names in input: {sorted(clash)}")
    out_clash = {f"{prefix}{p}" for p in payload} & set(left.columns)
    if out_clash:
        raise ValueError(
            f"prefixed right columns collide with left: {sorted(out_clash)}")

    # Equal-timestamp ordering: inclusive -> right sorts before left
    # (visible); strict -> right sorts after left (invisible).
    r_rank = _LEFT_RANK - 1 if allow_exact_matches else _LEFT_RANK + 1
    rt = right
    for k in on:
        rt = rt.filter(F.col(k).isNotNull())
    rt = rt.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(r_rank).alias("__rank"),
        (F.col(right_tiebreak) if right_tiebreak
         else F.lit(0)).cast("long").alias("__tie"),
        F.struct(*payload).alias("__rpay"))
    lt = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(_LEFT_RANK).alias("__rank"),
        F.lit(0).cast("long").alias("__tie"),
        F.lit(None).cast(rt.schema["__rpay"].dataType).alias("__rpay"))

    u = lt.unionByName(rt, allowMissingColumns=True)
    ts_ord = F.col("__ts").asc() if direction == "backward" \
        else F.col("__ts").desc()
    tie_ord = F.col("__tie").asc() if direction == "backward" \
        else F.col("__tie").desc()
    w = (Window.partitionBy(*on)
         .orderBy(ts_ord, F.col("__rank").asc(), tie_ord)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (u.withColumn("__m", F.last("__rpay", ignorenulls=True).over(w))
               .filter(F.col("__rank") == _LEFT_RANK))

    if tolerance is not None:
        m_ts = F.col("__m").getField(right_ts)
        if direction == "backward":
            ok = m_ts >= F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
        else:
            ok = m_ts <= F.col("__ts") + F.expr(f"INTERVAL {tolerance}")
        matched = matched.withColumn(
            "__m", F.when(ok, F.col("__m")))

    out_cols = [c for c in left.columns]
    out_cols += [F.col("__m").getField(p).alias(f"{prefix}{p}")
                 for p in payload]
    return matched.select(*out_cols)


def resample_ffill(df: DataFrame, key: str, ts_col: str,
                   values: Sequence[str],
                   interval: str = "1 hour") -> DataFrame:
    """Per-key regular-grid resampling with forward-fill — the
    gap-filling interpolation every time-series store ships
    (timescale's ``time_bucket_gapfill`` + ``locf``): bucket
    observations to the grid, generate each key's full bucket spine
    between its first and last observation, left-join observations
    onto the spine, and carry the last non-null aggregate forward
    into empty buckets.

    Plan shape: one per-key aggregate (last observation per bucket by
    event order), a per-key 2-scalar span aggregate whose spine
    EXPLODES from two values (never a driver-side range), one
    broadcast-or-shuffle equi-join back, and one partitioned
    ascending window for the carry — no unpartitioned sort, state
    linear in buckets.  Keys with a single observation degenerate to
    a 1-row spine (tested).

    ``values``: value columns; each bucket keeps its LAST observation
    by (timestamp, then column order stability via max struct) and
    filled buckets carry ``<v>`` plus an ``is_gap`` flag.
    """
    b = F.date_trunc(_interval_unit(interval), F.col(ts_col))
    obs = (df.withColumn("__b", b)
           .groupBy(key, "__b")
           .agg(F.max(F.struct(F.col(ts_col).alias("__t"),
                               *[F.col(v).alias(v) for v in values]))
                .alias("__last")))
    span = (obs.groupBy(key)
            .agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi")))
    spine = span.select(
        key, F.explode(F.sequence(
            "__lo", "__hi", F.expr(f"INTERVAL {interval}"))).alias("__b"))
    j = spine.join(obs, [key, "__b"], "left")
    w = (Window.partitionBy(key).orderBy(F.col("__b").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = j.withColumn("__f", F.last("__last", ignorenulls=True).over(w))
    return filled.select(
        key, F.col("__b").alias("bucket"),
        *[F.col("__f").getField(v).alias(v) for v in values],
        F.col("__last").isNull().alias("is_gap"))


def _interval_unit(interval: str) -> str:
    """'1 hour' -> 'hour' (date_trunc unit); only unit-1 grids map to
    date_trunc — callers needing '15 minutes' should pre-bucket with
    window() instead."""
    n, unit = interval.split()
    if n != "1":
        raise ValueError(f"resample_ffill needs a unit-1 interval: {interval}")
    return unit.rstrip("s")

"""Event-behavior analytics: funnels and cohort retention (north-star
extension alongside the streaming rollups — the batch analytics a
product team runs over the same events table the windows/sessionization
operators consume).

Both operators shuffle only on ``user_id`` (equi-joins + partial-
aggregating groupBys — co-partitioned stages, no windows, no per-user
sorts), so they scale the way the sessionizer does: by users, not by
events-per-user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(events: DataFrame, steps: tuple[str, ...],
                 user_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type") -> DataFrame:
    """Ordered-funnel user counts: a user reaches step i+1 iff they
    have a ``steps[i+1]`` event STRICTLY AFTER the earliest time they
    reached step i (min-reach semantics — the standard open-window
    product funnel). Returns (step, event_type, n_users).

    Plan shape: one filtered min-aggregate per step, each joined to
    the previous step's (user, reach_time) frame — k equi-joins on
    user_id over progressively SHRINKING frames, never a per-user
    event sort. The per-step filter pushes the event_type predicate
    into the scan."""
    reached = None
    tiers = []
    for i, step in enumerate(steps):
        ev = events.filter(F.col(type_col) == step)
        if reached is None:
            reached = (ev.groupBy(user_col)
                       .agg(F.min(ts_col).alias("__reach")))
        else:
            reached = (ev.join(reached, user_col)
                       .filter(F.col(ts_col) > F.col("__reach"))
                       .groupBy(user_col)
                       .agg(F.min(ts_col).alias("__reach")))
        tiers.append(reached.select(
            F.lit(i + 1).alias("step"),
            F.lit(step).alias("event_type"),
            F.col(user_col)))
    out = tiers[0]
    for t in tiers[1:]:
        out = out.unionByName(t)
    counts = (out.groupBy("step", "event_type")
              .agg(F.count(F.lit(1)).alias("n_users")))
    # every step appears in the report even when nobody reached it —
    # a groupBy drops empty groups, but "0 users purchased" is the
    # funnel's whole point (r5 degenerate-parity finding: single-row
    # fixtures made steps vanish while the oracle reported zeros)
    spine = events.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)],
        "step int, event_type string")
    return (F.broadcast(spine).join(counts, ["step", "event_type"], "left")
            .select("step", "event_type",
                    F.coalesce("n_users", F.lit(0).cast("long"))
                     .alias("n_users"))
            .orderBy("step"))


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their
    first event; for each (cohort_week, week_offset) the number of
    cohort members active in that later week. The classic retention
    triangle, fully distributed: one min-aggregate for cohorts, one
    distinct over (user, week), one equi-join, one count — all keyed
    on user_id / small composites."""
    firsts = (events.groupBy(user_col)
              .agg(F.date_trunc("week", F.min(ts_col)).alias("__cohort")))
    active = (events.select(F.col(user_col),
                            F.date_trunc("week", F.col(ts_col)).alias("__w"))
              .distinct())
    return (active.join(firsts, user_col)
            .select(
                F.date_format("__cohort", "yyyy-MM-dd").alias("cohort_week"),
                (F.datediff(F.col("__w").cast("date"),
                            F.col("__cohort").cast("date")) / 7)
                .cast("int").alias("week_offset"))
            .groupBy("cohort_week", "week_offset")
            .agg(F.count(F.lit(1)).alias("n_users"))
            .orderBy("cohort_week", "week_offset"))

"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.12/§2.13 green-field: the reference has no stateful
streaming; this is the engine's arbitrary-state template).

``running_user_engagement`` keeps one (total, count, last_seen) row of
state per user and emits the updated running aggregate every
micro-batch — the shape of per-entity counters/sessionizers at 100 TB:
state is O(distinct keys), checkpointed, and recovered across restarts
(tested with two availableNow runs in tests/test_streaming.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, total_value double, n_events bigint"
STATE_SCHEMA = "total double, n bigint"


def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        total, n = state.get
    else:
        total, n = 0.0, 0
    for pdf in pdfs:
        total += float(pdf["value"].fillna(0.0).sum())
        n += int(len(pdf))
    state.update((total, n))
    yield pd.DataFrame({"user_id": [key[0]], "total_value": [total],
                       "n_events": [n]})


def running_user_engagement(events: DataFrame,
                            watermark: str = "10 minutes") -> DataFrame:
    """Per-user running (sum(value), count) maintained as group state.
    Watermark bounds how long state for idle users must be retained
    when a timeout is configured; emitted rows are per-batch updates
    (output mode 'update')."""
    return (events.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _update, OUTPUT_SCHEMA, STATE_SCHEMA, "update",
                GroupStateTimeout.NoTimeout))


# ---------------------------------------------------------------------------
# streaming last-touch attribution (stateful as-of join)
# ---------------------------------------------------------------------------

ATTRIB_SCHEMA = ("user_id bigint, purchase_id bigint, click_id bigint, "
                 "amount double, lag_micros bigint")
CLICK_STATE_SCHEMA = "click_id bigint, click_us bigint"

_HORIZON_US = 3_600_000_000  # 1 hour


def _attrib_update(key: tuple, pdfs, state: GroupState):
    """Keep only the LATEST click per user in state; emit one
    attribution row per purchase against it. State is two bigints per
    user — the minimal as-of state — and is evicted by event-time
    timeout once the user is idle past the horizon."""
    if state.hasTimedOut:
        state.remove()
        return
        yield  # pragma: no cover - generator shape
    if state.exists:
        click_id, click_us = state.get
    else:
        click_id, click_us = None, None
    out = []
    max_us = None
    for pdf in pdfs:
        # Deterministic in-batch order mirroring the batch twin
        # (ADVICE r1): event-time ASC; at equal ts clicks process
        # BEFORE purchases (the batch interval join's c.ts <= p.ts
        # admits a simultaneous click), and equal-ts clicks process in
        # event_id ASC so the tie-break below is stable, not
        # whichever-row-sorted-last.
        pdf = pdf.assign(__prio=(pdf["event_type"] != "click")) \
                 .sort_values(["ts", "__prio", "event_id"])
        for row in pdf.itertuples(index=False):
            ts_us = int(row.ts.value) // 1000   # pandas ns -> micros
            max_us = ts_us if max_us is None else max(max_us, ts_us)
            if row.event_type == "click":
                # batch-twin tie-break: lag ASC then click_id ASC ==
                # newest click wins; among equal-ts clicks the SMALLER
                # click_id wins
                if (click_us is None or ts_us > click_us
                        or (ts_us == click_us
                            and int(row.event_id) < click_id)):
                    click_id, click_us = int(row.event_id), ts_us
            elif row.event_type == "purchase" and click_us is not None:
                lag = ts_us - click_us
                if 0 <= lag <= _HORIZON_US:
                    out.append((key[0], int(row.event_id), click_id,
                                float(row.value), lag))
    if click_us is not None:
        state.update((click_id, click_us))
        if max_us is not None:
            # evict idle users one horizon past their last event
            state.setTimeoutTimestamp((max_us + _HORIZON_US) // 1000)
    if out:
        yield pd.DataFrame(out, columns=["user_id", "purchase_id",
                                         "click_id", "amount",
                                         "lag_micros"])


def stream_last_touch(events: DataFrame,
                      watermark: str = "10 minutes") -> DataFrame:
    """Streaming twin of windows.last_touch_attribution: per-user
    LATEST-click state (two bigints) instead of the stream-stream
    interval join's full per-side event buffers — the classic
    state-size win of a purpose-built stateful operator over a
    generic join (O(users) vs O(events in horizon)).

    Exact when each user's events arrive in event-time order across
    micro-batches (in-batch order is enforced by sorting); late
    cross-batch clicks may be attributed differently than the batch
    twin — which is why the batch twin is the oracle-checked one and
    this is the low-latency serving path."""
    return (events.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _attrib_update, ATTRIB_SCHEMA, CLICK_STATE_SCHEMA,
                "append", GroupStateTimeout.EventTimeTimeout))


# ---------------------------------------------------------------------------
# streaming funnel: per-user ordered step tracking
# ---------------------------------------------------------------------------

FUNNEL_SCHEMA = "user_id bigint, step int, event_type string, ts timestamp"
FUNNEL_STATE_SCHEMA = "step int, reach_us bigint"


def _funnel_update_factory(steps: tuple[str, ...]):
    def update(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        step, reach_us = state.get if state.exists else (0, -1)
        out_step, out_type, out_ts = [], [], []
        for pdf in pdfs:
            # deterministic in-batch order: ts, then event_id
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, etype in zip(pdf["ts"], pdf["event_type"]):
                if step >= len(steps):
                    break
                ts_us = int(ts.value // 1000)   # pandas ns -> micros
                # min-reach semantics: the FIRST qualifying event
                # strictly after the previous step's reach advances
                if etype == steps[step] and ts_us > reach_us:
                    step += 1
                    reach_us = ts_us
                    out_step.append(step)
                    out_type.append(etype)
                    out_ts.append(ts)
        state.update((step, reach_us))
        if out_step:
            yield pd.DataFrame({"user_id": [key[0]] * len(out_step),
                                "step": out_step,
                                "event_type": out_type,
                                "ts": out_ts})

    return update


def stream_funnel(events: DataFrame, steps: tuple[str, ...],
                  watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of operators.behavior.funnel_steps: per-user
    (step, reach_time) group state; each user emits one advancement
    row per step, at the FIRST qualifying event strictly after the
    previous step's reach — so counting emitted (user, step) rows
    reproduces the batch funnel's n_users per step (equivalence
    pinned in tests/test_streaming.py across a checkpointed restart).

    Assumes per-user event-time order across micro-batches (the
    watermark bounds disorder, as for any streaming funnel): an event
    older than the current step's reach time cannot retroactively
    re-route an already-made advancement — the standard streaming
    funnel tradeoff vs the batch recompute.

    State is two scalars per user — O(users), checkpointed, the same
    footprint class as the running-aggregate operator above."""
    return (events.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _funnel_update_factory(tuple(steps)),
                FUNNEL_SCHEMA, FUNNEL_STATE_SCHEMA, "update",
                GroupStateTimeout.NoTimeout))


# ---------------------------------------------------------------------------
# streaming expanding z-score: per-user Welford running moments
# ---------------------------------------------------------------------------

ZSCORE_SCHEMA = "event_id bigint, user_id bigint, z double"
ZSCORE_STATE_SCHEMA = "n bigint, mean double, m2 double"


def _zscore_update(key: tuple, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
    out_id, out_z = [], []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for eid, v in zip(pdf["event_id"], pdf["value"]):
            v = float(v) if v == v else 0.0     # NaN guard
            # score against PRIOR state only (no self-leakage), THEN
            # fold the event in — mirrors the batch twin's
            # unbounded-preceding .. 1-preceding frame
            if n >= 2:
                var = m2 / (n - 1)
                if var > 0:
                    out_id.append(int(eid))
                    out_z.append((v - mean) / var ** 0.5)
            n += 1
            delta = v - mean
            mean += delta / n
            m2 += delta * (v - mean)
    state.update((n, mean, m2))
    if out_id:
        yield pd.DataFrame({"event_id": out_id,
                            "user_id": [key[0]] * len(out_id),
                            "z": out_z})


def stream_expanding_zscore(events: DataFrame,
                            watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of qs_expanding_zscore: per-user Welford
    (n, mean, M2) group state; each event is scored against the PRIOR
    moments, then folded in — numerically stable single-pass variance,
    O(users) state of three scalars, exact same semantics as the batch
    expanding window when events arrive in order (equivalence pinned
    in tests, values agree to 1e-9 despite the different summation
    orders)."""
    return (events.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _zscore_update, ZSCORE_SCHEMA, ZSCORE_STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))


# ---------------------------------------------------------------------------
# streaming cohort retention: per-user (cohort week, weeks seen) state
# ---------------------------------------------------------------------------

COHORT_SCHEMA = "user_id bigint, cohort_days bigint, week_offset int"
COHORT_STATE_SCHEMA = "cohort_days bigint, seen array<bigint>"


def _cohort_update(key: tuple, pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        cohort_days, seen = state.get
        seen = set(seen)
    else:
        cohort_days, seen = None, set()
    out_off = []
    for pdf in pdfs:
        for wd in sorted(int(w) for w in pdf["week_days"]):
            if cohort_days is None:
                cohort_days = wd
            if wd not in seen:
                seen.add(wd)
                out_off.append((wd - cohort_days) // 7)
    state.update((cohort_days, sorted(seen)))
    if out_off:
        yield pd.DataFrame({"user_id": [key[0]] * len(out_off),
                            "cohort_days": [cohort_days] * len(out_off),
                            "week_offset": out_off})


def stream_cohort_retention(events: DataFrame,
                            watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of operators.behavior.cohort_retention: per-user
    state is (cohort week, set of active weeks); each NEW active week
    emits one (user, cohort, offset) row, so counting emissions per
    (cohort, offset) reproduces the batch retention triangle
    (equivalence pinned in tests across a checkpointed restart).
    State is O(weeks-per-user) longs — bounded by the stream's age in
    weeks, not its event count. Assumes per-user event-time order
    across micro-batches for the cohort assignment (watermark bounds
    disorder), same contract as the streaming funnel."""
    weeks = events.select(
        "user_id",
        F.datediff(F.date_trunc("week", F.col("ts")).cast("date"),
                   F.lit("1970-01-05").cast("date")).cast("long")
        .alias("week_days"),
        F.col("ts"))
    # week_days is DAYS since epoch Monday (1970-01-05), always a
    # multiple of 7 apart between distinct weeks
    return (weeks.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _cohort_update, COHORT_SCHEMA, COHORT_STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))

"""Inline data-quality observability (``df.observe``).

A 100 TB pipeline cannot afford a second pass just to learn what it
processed: ``observe`` piggybacks aggregate metrics (row counts, null
counts, value ranges) on the SAME job that materializes the data —
zero extra scans, exact numbers, and in streaming the metrics arrive
per micro-batch in ``StreamingQueryProgress.observedMetrics`` where an
alerting hook reads them without touching the sink table.

This is the runtime complement to the static contract sidecar
(plans/manifest.py): the contract says what the data SHOULD look like,
the observation records what this run's data DID look like.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def quality_metrics(cols: list[str]):
    """The standard metric set: total rows + per-column null count
    and min/max (nulls ignored by min/max, counted separately)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"))
        aggs.append(F.min(c).alias(f"{c}__min"))
        aggs.append(F.max(c).alias(f"{c}__max"))
    return aggs


def observe_quality(df: DataFrame, cols: list[str],
                    name: str = "quality") -> tuple[DataFrame, Observation]:
    """Batch form: returns (df, observation); read ``observation.get``
    AFTER an action on the returned frame. The metrics are computed by
    the same tasks that produce the action's rows."""
    obs = Observation(name)
    return df.observe(obs, *quality_metrics(cols)), obs


def observe_quality_stream(df: DataFrame, cols: list[str],
                           name: str = "quality") -> DataFrame:
    """Streaming form (named observation — Observation objects are
    batch-only): metrics for every micro-batch appear under
    ``progress["observedMetrics"][name]``."""
    return df.observe(name, *quality_metrics(cols))

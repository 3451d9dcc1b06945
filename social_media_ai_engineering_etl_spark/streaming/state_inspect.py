"""Offline state-store inspection (``spark.read.format("statestore")``).

Operational capability the streaming family was missing: given only a
checkpoint directory, reconstruct what a stateful query currently
holds — per-key aggregate state, which windows the watermark has
evicted, per-partition skew of state rows — WITHOUT touching the
running query.  This is how you answer "why is this stream's state
8 GB" or "did the watermark drop my late window" in production: the
state store is a table, so the engine's own SQL analyzes it.

At scale the source reads one state file per shuffle partition in
parallel (the same layout the query wrote), so inspection cost is
O(state), independent of the stream's input history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_state(spark: SparkSession, checkpoint: str,
               batch_id: int | None = None,
               operator_id: int = 0) -> DataFrame:
    """The raw state rows (key struct, value struct, partition_id) of
    a stateful operator at a checkpoint — latest committed batch by
    default, or a specific ``batch_id`` for point-in-time debugging."""
    r = (spark.read.format("statestore")
         .option("operatorId", operator_id))
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    return r.load(checkpoint)


def state_skew_profile(spark: SparkSession, checkpoint: str) -> DataFrame:
    """State rows per shuffle partition: the first thing to look at
    when one task of a stateful stage lags — a hot key family lands
    all its state on one partition."""
    st = read_state(spark, checkpoint)
    total = st.count()
    per = (st.groupBy("partition_id")
           .agg(F.count(F.lit(1)).alias("state_rows")))
    return (per.withColumn(
        "share_ppm",
        (F.col("state_rows") * 1_000_000 / F.lit(max(total, 1)))
        .cast("long"))
        .orderBy(F.col("state_rows").desc(), F.col("partition_id")))

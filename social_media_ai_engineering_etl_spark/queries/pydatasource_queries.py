"""Queries over the custom Python data source (sources/pydatasource.py).

The synthetic generator is a pure function of the global row index, so
DuckDB replays the EXACT rows with ``generate_series`` + the same LCG
arithmetic — a custom Spark 4 DataSource whose output is value-hash
oracle-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import register
from ..sources.pydatasource import register_synthetic_source

_N = 100_000

_SYNTH_ORACLE = f"""
WITH g AS (
    SELECT i,
           (48271::BIGINT * (i + 1)) % 2147483647 AS h,
           (69621::BIGINT * ((48271::BIGINT * (i + 1)) % 2147483647))
               % 2147483647 AS h2
    FROM generate_series(0, {_N - 1}) t(i)
)
SELECT ['view','click','cart','purchase','share'][(h % 5) + 1]
           AS event_type,
       count(*) AS n_events,
       count(DISTINCT h % 1000) AS n_users,
       CAST(sum(h2 % 50000) AS BIGINT) AS total_cents,
       CAST(min(i) AS BIGINT) AS first_id,
       CAST(max(i) AS BIGINT) AS last_id
FROM g GROUP BY 1 ORDER BY 1
"""


@register("qds_synthetic_events", oracle=_SYNTH_ORACLE)
def qds_synthetic_events(spark, sf_dir):
    """Aggregate the custom Python DataSource (batch reader, 8
    range partitions, zero input files): per event type, the count,
    distinct users, total cents and id range over 100k generated rows.
    The oracle regenerates the identical rows in DuckDB from the LCG
    definition — if the source's partition planning ever dropped,
    duplicated, or reordered a range, the value hash breaks.  sf_dir
    is unused: the source needs no data directory by design."""
    register_synthetic_source(spark)
    df = (spark.read.format("synthetic_events")
          .option("rows", _N).option("numPartitions", 8).load())
    return (df.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.countDistinct("user_id").alias("n_users"),
                 F.sum(F.round(F.col("value") * 100).cast("long"))
                 .alias("total_cents"),
                 F.min("event_id").alias("first_id"),
                 F.max("event_id").alias("last_id"))
            .orderBy("event_type"))

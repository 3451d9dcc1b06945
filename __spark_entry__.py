"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2
backed by the central registry in
``social_media_ai_engineering_etl_spark.registry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import social_media_ai_engineering_etl_spark.queries  # noqa: F401,E402  (registers)
from social_media_ai_engineering_etl_spark.registry import (  # noqa: E402
    ORACLES,
    QUERIES,
)

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (stage-01 engagement tiering) on sf0.001."""
    return QUERIES["q01_tier_counts"](spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)

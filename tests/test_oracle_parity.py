"""Every registered query with an oracle must hash-match DuckDB —
the local mirror of the driver's CORRECTNESS gate."""

import pytest

import social_media_ai_engineering_etl_spark.queries  # noqa: F401
from social_media_ai_engineering_etl_spark.registry import ORACLES, QUERIES

from .conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck, sf_dir):
    assert_matches_oracle(QUERIES[name](spark, sf_dir), duck, ORACLES[name])


def test_every_query_runs(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(1).collect()

"""ANSI SQL surface: register_views exposes every table to spark.sql
with normalized timestamps; results match DuckDB running the same
statement."""

from social_media_ai_engineering_etl_spark.session import TABLES, register_views

from .conftest import SF_DIR, assert_matches_oracle

_SQL = """
SELECT e.event_type, count(*) AS n,
       round(sum(e.value), 6) AS sum_value
FROM events e
WHERE e.user_id % 2 = 0
GROUP BY e.event_type ORDER BY e.event_type
"""


def test_sql_over_views_matches_duckdb(spark, duck):
    register_views(spark, SF_DIR)
    assert_matches_oracle(spark.sql(_SQL), duck, _SQL)


def test_all_tables_registered(spark):
    register_views(spark, SF_DIR)
    for t in TABLES:
        assert spark.sql(f"SELECT * FROM {t} LIMIT 1").columns
    # events.ts must be a plain session-tz timestamp for SQL users
    assert dict(spark.table("events").dtypes)["ts"] == "timestamp"

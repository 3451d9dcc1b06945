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


_RECURSIVE_SQL = """
WITH RECURSIVE reach(node, hops) AS (
    SELECT 1, 0
    UNION ALL
    SELECT e.dst, r.hops + 1
    FROM reach r
    JOIN (SELECT * FROM (VALUES (1, 2), (2, 3), (3, 4), (4, 2), (1, 5))
          AS t(src, dst)) e ON e.src = r.node
    WHERE r.hops < 6
)
SELECT node, min(hops) AS min_hops, count(*) AS n_paths
FROM reach GROUP BY node ORDER BY node
"""


def test_recursive_cte_matches_duckdb(spark, duck):
    """Spark 4.1's WITH RECURSIVE (iterative UnionLoop execution)
    agrees with DuckDB on a bounded BFS over a cyclic edge list —
    min-hop per node AND path multiplicity (the 4->2 back edge makes
    path counts grow until the hop bound cuts recursion)."""
    register_views(spark, SF_DIR)
    assert_matches_oracle(spark.sql(_RECURSIVE_SQL), duck, _RECURSIVE_SQL)


def test_recursive_series_sum(spark):
    got = spark.sql("""
        WITH RECURSIVE s(n) AS (
            SELECT 1 UNION ALL SELECT n + 1 FROM s WHERE n < 100
        ) SELECT sum(n) AS total FROM s""").collect()[0].total
    assert got == 5050

"""GROUPED_AGG pandas-UDAF contract: the exact lower weighted median
(operators/udafs.py) equals a pure-SQL window transcription on
adversarial groups, and works OVER a window as well as in groupBy."""

from pyspark.sql import functions as F

from social_media_ai_engineering_etl_spark.operators.udafs import (
    weighted_median_udaf,
    weighted_quantile_udaf,
)

CASES = [
    # (group, value, weight) — ties, single rows, dominant weights,
    # even/odd cumulative splits, unsorted input order
    ("ties", 5, 1), ("ties", 5, 1), ("ties", 3, 1), ("ties", 9, 1),
    ("single", 42, 7),
    ("dominant", 1, 1), ("dominant", 2, 100), ("dominant", 3, 1),
    ("even_split", 1, 1), ("even_split", 2, 1),
    ("odd", 10, 3), ("odd", 20, 2), ("odd", 30, 1),
    ("unsorted", 30, 2), ("unsorted", 10, 2), ("unsorted", 20, 1),
]


def _expected(rows):
    groups = {}
    for g, v, w in rows:
        groups.setdefault(g, []).append((v, w))
    out = {}
    for g, vw in groups.items():
        vw.sort()
        total = sum(w for _, w in vw)
        cum = 0
        for v, w in vw:
            cum += w
            if 2 * cum >= total:
                out[g] = v
                break
    return out


def test_weighted_median_groupby_matches_reference(spark):
    df = spark.createDataFrame(CASES, ["g", "v", "w"])
    wm = weighted_median_udaf()
    got = {r["g"]: r["m"]
           for r in df.groupBy("g").agg(wm("v", "w").alias("m")).collect()}
    assert got == _expected(CASES)


def test_weighted_median_matches_sql_window_transcription(spark):
    """The same transcription qx_weighted_median's oracle uses,
    evaluated by Spark SQL itself, must agree with the UDAF."""
    df = spark.createDataFrame(CASES, ["g", "v", "w"])
    df.createOrReplaceTempView("wm_cases")
    sql = spark.sql("""
        WITH per_v AS (
            SELECT g, v, sum(w) AS wv FROM wm_cases GROUP BY g, v
        ), c AS (
            SELECT g, v,
                   sum(wv) OVER (PARTITION BY g ORDER BY v) AS cum,
                   sum(wv) OVER (PARTITION BY g) AS total
            FROM per_v
        )
        SELECT g, min(v) AS m FROM c WHERE 2 * cum >= total GROUP BY g
    """)
    wm = weighted_median_udaf()
    udaf = df.groupBy("g").agg(wm("v", "w").alias("m"))
    assert sorted(map(tuple, sql.collect())) \
        == sorted(map(tuple, udaf.collect()))


def test_weighted_median_over_window(spark):
    """GROUPED_AGG is legal OVER a partition window — every row of a
    group carries the group's median."""
    from pyspark.sql.window import Window
    df = spark.createDataFrame(CASES, ["g", "v", "w"])
    wm = weighted_median_udaf()
    out = df.withColumn("m", wm("v", "w").over(Window.partitionBy("g")))
    exp = _expected(CASES)
    for r in out.collect():
        assert r["m"] == exp[r["g"]], r


def test_weighted_median_property_random_groups(spark):
    """Hypothesis-style sweep without per-example Spark jobs: many
    random groups in ONE DataFrame, UDAF vs the pure-python fold."""
    import random
    rng = random.Random(0xC0FFEE)
    rows = []
    for g in range(40):
        n = rng.randint(1, 30)
        rows += [(f"g{g}", rng.randint(-1000, 1000), rng.randint(1, 50))
                 for _ in range(n)]
    df = spark.createDataFrame(rows, ["g", "v", "w"])
    wm = weighted_median_udaf()
    got = {r["g"]: r["m"]
           for r in df.groupBy("g").agg(wm("v", "w").alias("m")).collect()}
    assert got == _expected(rows)


def test_weighted_quantile_generalizes_median(spark):
    """q=1/2 must equal the median UDAF exactly; bands are monotone;
    random groups match a pure-python fold of the same policy."""
    import random

    from social_media_ai_engineering_etl_spark.operators.udafs import (
        weighted_quantile_udaf,
    )

    rng = random.Random(1234)
    rows = [(f"g{g}", rng.randint(-500, 500), rng.randint(1, 9))
            for g in range(25) for _ in range(rng.randint(1, 25))]
    df = spark.createDataFrame(rows, ["g", "v", "w"])

    def ref(vw, num, den):
        vw = sorted(vw)
        total = sum(w for _, w in vw)
        cum = 0
        for v, w in vw:
            cum += w
            if cum * den >= total * num:
                return v

    groups = {}
    for g, v, w in rows:
        groups.setdefault(g, []).append((v, w))

    wm = weighted_median_udaf()
    q25, q50, q75 = (weighted_quantile_udaf(1, 4),
                     weighted_quantile_udaf(1, 2),
                     weighted_quantile_udaf(3, 4))
    got = {r["g"]: r for r in df.groupBy("g").agg(
        wm("v", "w").alias("m"), q25("v", "w").alias("p25"),
        q50("v", "w").alias("p50"), q75("v", "w").alias("p75")).collect()}
    for g, vw in groups.items():
        r = got[g]
        assert r["p50"] == r["m"] == ref(vw, 1, 2), g
        assert r["p25"] == ref(vw, 1, 4) and r["p75"] == ref(vw, 3, 4), g
        assert r["p25"] <= r["p50"] <= r["p75"], g


def test_weighted_udafs_skip_nulls_like_sql_aggregates(spark):
    """ADVICE r3: nulls in value or weight must not crash the Arrow
    worker — they are skipped (SQL aggregate semantics), and an
    all-null group aggregates to NULL."""
    df = spark.createDataFrame(
        [("a", 10, 1), ("a", None, 5), ("a", 20, None), ("a", 30, 1),
         ("b", None, None), ("b", None, 1)],
        "g string, v long, w long")
    wm = weighted_median_udaf()
    q75 = weighted_quantile_udaf(3, 4)
    got = {r["g"]: r for r in df.groupBy("g").agg(
        wm("v", "w").alias("m"), q75("v", "w").alias("p75")).collect()}
    # group a reduces to [(10,1),(30,1)] -> lower median 10, p75 30
    assert got["a"]["m"] == 10 and got["a"]["p75"] == 30
    assert got["b"]["m"] is None and got["b"]["p75"] is None

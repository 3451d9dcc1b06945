"""As-of join operator: pandas merge_asof parity (the public
reference semantics) and the single-shuffle no-join plan shape."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from social_media_ai_engineering_etl_spark.operators.temporal import asof_join


def _frames(seed, n_left=400, n_right=300, n_keys=7):
    """Random keyed event frames with deliberate timestamp ties."""
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-03-01")
    # coarse second grid -> plenty of exact-timestamp collisions
    lt = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_left),
        "ts": base + pd.to_timedelta(rng.integers(0, 500, n_left), "s"),
        "lval": np.arange(n_left),
    })
    rt = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_right),
        "ts": base + pd.to_timedelta(rng.integers(0, 500, n_right), "s"),
        "tie": np.arange(n_right),
        "pay": rng.integers(0, 1000, n_right),
        # legitimately-NULL payload column: must come through as the
        # matched row's null, never an older row's value
        "maybe": pd.array(
            [None if i % 3 == 0 else i for i in range(n_right)],
            dtype="Int64"),
    })
    return lt, rt


def _expected(lt, rt, direction, strict, tol):
    """pandas merge_asof ground truth. Right pre-sorted by (ts, tie):
    backward resolves equal-ts ties to the LAST sorted row (max tie),
    forward to the FIRST (min tie) — exactly the operator's contract."""
    r = rt.sort_values(["ts", "tie"], kind="mergesort")
    want = pd.merge_asof(
        lt.sort_values("ts", kind="mergesort"), r,
        on="ts", by="k", direction=direction,
        allow_exact_matches=not strict,
        tolerance=pd.Timedelta(tol) if tol else None,
        suffixes=("", "_r"))
    return want.sort_values("lval").reset_index(drop=True)


@pytest.mark.parametrize("direction,strict,tol", [
    ("backward", False, None),
    ("backward", True, None),
    ("backward", False, "90 seconds"),
    ("forward", False, None),
    ("forward", True, "45 seconds"),
])
def test_asof_matches_pandas_merge_asof(spark, direction, strict, tol):
    lt, rt = _frames(seed=hash((direction, strict, tol)) % 2**32)
    got = asof_join(
        spark.createDataFrame(lt), spark.createDataFrame(rt),
        on=["k"], direction=direction,
        tolerance=tol.replace("seconds", "second") if tol else None,
        allow_exact_matches=not strict, right_tiebreak="tie",
        prefix="m_").toPandas().sort_values("lval").reset_index(drop=True)
    want = _expected(lt, rt, direction, strict, tol)
    assert len(got) == len(lt)
    for spark_col, pd_col in [("m_pay", "pay"), ("m_tie", "tie"),
                              ("m_maybe", "maybe")]:
        g = got[spark_col].astype("Float64")
        w = want[pd_col].astype("Float64")
        pd.testing.assert_series_equal(g, w, check_names=False)


def test_asof_null_keys(spark):
    """NULL keys use equi-join semantics: right NULL-key rows are
    dropped, left NULL-key rows survive unmatched."""
    lt = spark.createDataFrame(
        pd.DataFrame({"k": pd.array([1, None], dtype="Int64"),
                      "ts": pd.to_datetime(["2024-01-02", "2024-01-02"]),
                      "lid": [0, 1]}))
    rt = spark.createDataFrame(
        pd.DataFrame({"k": pd.array([1, None], dtype="Int64"),
                      "ts": pd.to_datetime(["2024-01-01", "2024-01-01"]),
                      "pay": [10, 20]}))
    out = (asof_join(lt, rt, on=["k"], prefix="m_")
           .toPandas().sort_values("lid"))
    assert out["m_pay"].tolist()[0] == 10
    assert pd.isna(out["m_pay"].tolist()[1])


def test_asof_plan_single_key_shuffle_no_join(spark):
    """The union-merge as-of is ONE hash shuffle on the key and a
    window — no join operator anywhere in the plan."""
    lt, rt = _frames(seed=7)
    out = asof_join(spark.createDataFrame(lt), spark.createDataFrame(rt),
                    on=["k"], right_tiebreak="tie")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan


def test_asof_rejects_colliding_column_names(spark):
    lt, rt = _frames(seed=1, n_left=5, n_right=5)
    with pytest.raises(ValueError, match="collide"):
        asof_join(spark.createDataFrame(lt.rename(columns={"lval": "m_pay"})),
                  spark.createDataFrame(rt), on=["k"], prefix="m_")
    with pytest.raises(ValueError, match="reserved"):
        asof_join(spark.createDataFrame(lt.rename(columns={"lval": "__ts"})),
                  spark.createDataFrame(rt), on=["k"])


def test_asof_composite_keys_match_pandas(spark):
    """Multi-column `on` keys partition jointly, matching merge_asof
    with a composite `by`."""
    rng = np.random.default_rng(17)
    base = pd.Timestamp("2024-03-01")
    lt = pd.DataFrame({
        "k1": rng.integers(0, 3, 300), "k2": rng.integers(0, 4, 300),
        "ts": base + pd.to_timedelta(rng.integers(0, 400, 300), "s"),
        "lval": np.arange(300)})
    rt = pd.DataFrame({
        "k1": rng.integers(0, 3, 200), "k2": rng.integers(0, 4, 200),
        "ts": base + pd.to_timedelta(rng.integers(0, 400, 200), "s"),
        "tie": np.arange(200), "pay": rng.integers(0, 99, 200)})
    got = asof_join(spark.createDataFrame(lt), spark.createDataFrame(rt),
                    on=["k1", "k2"], right_tiebreak="tie", prefix="m_") \
        .toPandas().sort_values("lval").reset_index(drop=True)
    want = pd.merge_asof(
        lt.sort_values("ts", kind="mergesort"),
        rt.sort_values(["ts", "tie"], kind="mergesort"),
        on="ts", by=["k1", "k2"], direction="backward",
        suffixes=("", "_r")).sort_values("lval").reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["m_pay"].astype("Float64"), want["pay"].astype("Float64"),
        check_names=False)


def test_resample_ffill_gapfill_and_carry(spark):
    """Dense spine per key between first and last bucket; empty
    buckets flagged is_gap and carrying the previous value; a
    single-observation key degenerates to a 1-row spine; within-bucket
    ties resolve to the LAST observation by (ts, value)."""
    from social_media_ai_engineering_etl_spark.operators.temporal import (
        resample_ffill,
    )
    rows = [
        (1, "2024-01-01 00:10:00", 10),
        (1, "2024-01-01 00:50:00", 11),   # same bucket, later ts wins
        (1, "2024-01-01 03:05:00", 30),   # 2 gap hours between
        (2, "2024-01-01 05:00:00", 99),   # single observation
    ]
    df = spark.createDataFrame(rows, "k int, ts string, v int") \
        .select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    got = {(r["k"], str(r["bucket"])): (r["v"], r["is_gap"])
           for r in resample_ffill(df, "k", "ts", ["v"], "1 hour").collect()}
    assert got == {
        (1, "2024-01-01 00:00:00"): (11, False),
        (1, "2024-01-01 01:00:00"): (11, True),
        (1, "2024-01-01 02:00:00"): (11, True),
        (1, "2024-01-01 03:00:00"): (30, False),
        (2, "2024-01-01 05:00:00"): (99, False),
    }


def test_resample_ffill_rejects_non_unit_interval(spark):
    import pytest as _pytest

    from social_media_ai_engineering_etl_spark.operators.temporal import (
        resample_ffill,
    )
    df = spark.createDataFrame([(1,)], "k int") \
        .select("k", F.current_timestamp().alias("ts"),
                F.lit(1).alias("v"))
    with _pytest.raises(ValueError):
        resample_ffill(df, "k", "ts", ["v"], "15 minutes").collect()

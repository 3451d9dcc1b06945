import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from social_media_ai_engineering_etl_spark.session import TABLES, get_spark
from social_media_ai_engineering_etl_spark.verify import exact_diff

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Mirror the driver's order-insensitive compare: sort columns by
    name, round floats, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_matches_oracle(spark_df, duck_con, sql: str):
    raw_got = spark_df.toPandas()
    raw_want = duck_con.execute(sql).fetchdf()
    got, want = normalize(raw_got.copy()), normalize(raw_want.copy())
    assert list(got.columns) == list(want.columns), \
        f"schema mismatch: {list(got.columns)} vs {list(want.columns)}"
    assert len(got) == len(want), f"row count {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=1e-6, atol=1e-9)
    # driver-faithful exact gate: int/float distinct, no tolerance —
    # the tolerant compare above diagnoses VALUE bugs, this catches
    # the hash-class (dtype/rendering) bugs the driver red-rows on.
    diff = exact_diff(raw_got, raw_want)
    assert diff is None, f"exact-hash mismatch (driver would red-row): {diff}"

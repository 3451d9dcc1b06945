"""Drive the driver contract end-to-end, as the driver does:
entry() smoke at sf0.001, then every queries()/oracle_sql() pair
side-by-side against DuckDB at sf0.01 (order-insensitive compare).

Usage: python scripts/verify_driver.py [sf_dir] [--only q1,q2,...]

``--only`` restricts the run to a comma-separated subset of query names
(substring match allowed) — the fast loop when iterating on one oracle.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb
import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    argv = list(sys.argv[1:])
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = [s.strip() for s in argv[i + 1].split(",") if s.strip()]
        del argv[i:i + 2]
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(ROOT, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from social_media_ai_engineering_etl_spark.session import TABLES, get_spark
    from social_media_ai_engineering_etl_spark.verify import exact_diff
    spark = get_spark("driver-sim")

    if only is None:
        rows = mod.entry(spark).collect()
        print(f"entry(): {len(rows)} rows :: {rows[:5]}")
        assert rows, "entry() returned no rows"

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs, oracles = mod.queries(), mod.oracle_sql()
    failed = []
    for name in sorted(qs):
        if only is not None and not any(pat in name for pat in only):
            continue
        # centralized cache ownership: release per-query persisted
        # subtrees so a ~95-query session holds one query's caches
        spark.catalog.clearCache()
        try:
            if name not in oracles:
                n = qs[name](spark, sf).count()
                print(f"{name}: rows-only ({n} rows)")
                continue
            got = qs[name](spark, sf).toPandas()
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # a raising query is a failure, not a crash
            failed.append(name)
            print(f"{name}: ERROR — {str(e)[:300]}")
            continue
        # driver-faithful EXACT compare (int/float distinct, no
        # tolerance) — the same class of order-insensitive value hash
        # the driver grades with.  The tolerant pandas compare is kept
        # only as a diagnostic to classify failures: value bug vs
        # dtype/rendering (hash-class) bug.
        diff = exact_diff(got, want)
        if diff is None:
            print(f"{name}: MATCH ({len(got)} rows)")
            continue
        failed.append(name)
        for df in (got, want):
            for c in df.columns:
                if pd.api.types.is_float_dtype(df[c]):
                    df[c] = df[c].round(6)
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        got = got.sort_values(list(got.columns), kind="mergesort").reset_index(drop=True)
        want = want.sort_values(list(want.columns), kind="mergesort").reset_index(drop=True)
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=False, rtol=1e-6, atol=1e-9)
            kind = "HASH-CLASS (values match under tolerance)"
        except AssertionError:
            kind = "VALUE"
        print(f"{name}: MISMATCH [{kind}] — {diff[:400]}")
    spark.stop()
    if failed:
        print(f"FAILED: {failed}")
        return 1
    print("ALL MATCH")
    return 0


if __name__ == "__main__":
    sys.exit(main())

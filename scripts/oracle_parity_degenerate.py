"""Oracle parity on DEGENERATE fixtures — the sweep that catches what
the crash-only robustness tests cannot.

The four-regime sweep (tests/test_empty_inputs.py) proves every query
*survives* empty / single-row / constant / null-heavy inputs; it says
nothing about whether engine and oracle still AGREE there.  Two real
r5 bugs motivated this script: bpe_encode tokenized NULL text as the
literal word "none" (str(None)) and attach_synthetic_media embedded
b"None" bodies — both invisible to a rows-only or crash check, both
value-hash divergences on a null-heavy fixture.

This script rebuilds the test fixtures' recipes at sf0.001 scale and
runs the FULL oracle-paired registry through the exact driver compare
(verify.exact_diff) on each:

  null   — ~30% NULLs in every non-key column (keys keep join
           semantics), the data-lake regime;
  const  — 100 identical copies of row 1 per table (zero variance);
  single — one row per table.

(The all-empty regime is covered by scripts/empty_input_sweep.py; with
zero rows both engines trivially agree, so it adds no parity signal.)

Usage: python scripts/oracle_parity_degenerate.py [--regime null|const|single]
Exit 0 = every oracle-paired query MATCHes on every regime run.
"""

from __future__ import annotations

import os
import sys
import tempfile

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BASE = os.environ.get("SPARK_GRAFT_PARITY_BASE", "/root/testdata/sf0.001")
# bump when any build_fixture recipe changes (invalidates --fixture-dir)
_RECIPE_VERSION = "2"
TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")
KEYS = {"doc_id", "vec_id", "event_id", "o_orderkey", "l_orderkey",
        "c_custkey", "s_suppkey", "p_partkey", "n_nationkey",
        "r_regionkey", "user_id", "o_custkey", "l_partkey",
        "l_suppkey", "n_regionkey", "s_nationkey", "c_nationkey",
        "l_linenumber", "ts"}


def build_fixture(spark, regime: str) -> str:
    from pyspark.sql import functions as F
    d = tempfile.mkdtemp(prefix=f"parity_{regime}_")
    for t in TABLES:
        df = spark.read.parquet(os.path.join(BASE, f"{t}.parquet"))
        if regime == "single":
            out = df.limit(1)
        elif regime == "const":
            # 100 copies of row 1 with FRESH primary keys: duplicated
            # keys violate every table's uniqueness contract and make
            # GROUP-BY-key oracles diverge from per-row engines for a
            # reason that cannot occur on real data — constant NON-KEY
            # columns are the regime under test
            key = [c for c in df.columns if c in KEYS][:1]
            out = df.limit(1).crossJoin(
                spark.range(100).select(F.col("id").alias("__i")))
            if key:
                ktype = df.schema[key[0]].dataType
                out = out.withColumn(key[0], F.col("__i").cast(ktype))
            out = out.drop("__i")
        elif regime == "null":
            key = [c for c in df.columns if c in KEYS][:1] or None
            out = df.select(*[
                F.col(f.name) if f.name in KEYS else
                F.when(F.xxhash64(F.lit(t),
                                  *(F.col(k) for k in (key or [])),
                                  F.lit(f.name)) % 10 < 3,
                       F.lit(None).cast(f.dataType))
                 .otherwise(F.col(f.name)).alias(f.name)
                for f in df.schema.fields])
        else:
            raise ValueError(regime)
        out.write.mode("overwrite").parquet(os.path.join(d, f"{t}.parquet"))
    return d


def main() -> int:
    regimes = ["null", "const", "single"]
    if "--regime" in sys.argv:
        regimes = [sys.argv[sys.argv.index("--regime") + 1]]
    only = None
    if "--only" in sys.argv:
        only = [s.strip() for s in
                sys.argv[sys.argv.index("--only") + 1].split(",")]
    fixture_dir = None
    if "--fixture-dir" in sys.argv:  # reuse a prebuilt fixture when iterating
        fixture_dir = sys.argv[sys.argv.index("--fixture-dir") + 1]

    import social_media_ai_engineering_etl_spark.queries  # noqa: F401
    from social_media_ai_engineering_etl_spark.registry import ORACLES, QUERIES
    from social_media_ai_engineering_etl_spark.session import get_spark
    from social_media_ai_engineering_etl_spark.verify import exact_diff

    spark = get_spark("oracle-parity-degenerate")
    failures: list[tuple[str, str, str]] = []
    for regime in regimes:
        if fixture_dir:
            d = os.path.join(fixture_dir, regime)
            # cache keyed on the recipe version: a stale fixture built
            # by an older recipe must be rebuilt, not silently reused
            # (the const recipe changed once already — unique keys)
            stamp = os.path.join(d, ".recipe_version")
            want = f"{_RECIPE_VERSION}:{BASE}"
            have = None
            if os.path.isfile(stamp):
                with open(stamp) as fh:
                    have = fh.read().strip()
            if have != want:
                import shutil
                shutil.rmtree(d, ignore_errors=True)
                os.makedirs(fixture_dir, exist_ok=True)
                built = build_fixture(spark, regime)
                # shutil.move, not os.rename: the fixture is built in
                # tempfile.mkdtemp (often a different filesystem than
                # --fixture-dir) and os.rename raises EXDEV across fs.
                shutil.move(built, d)
                with open(stamp, "w") as fh:
                    fh.write(want)
        else:
            d = build_fixture(spark, regime)
        con = duckdb.connect()
        for t in TABLES:
            # Spark writes a part-file DIRECTORY named <t>.parquet
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{d}/{t}.parquet/*.parquet')")
        n_ok = 0
        for name, fn in QUERIES.items():
            sql = ORACLES.get(name)
            if sql is None:
                continue
            if only and not any(o in name for o in only):
                continue
            try:
                got = fn(spark, d).toPandas()
                want = con.execute(sql).df()
                diff = exact_diff(got, want)
            except Exception as e:  # noqa: BLE001 - report, keep sweeping
                failures.append((regime, name, f"ERROR {type(e).__name__}: {e}"))
                spark.catalog.clearCache()
                continue
            if diff is None:
                n_ok += 1
            else:
                failures.append((regime, name, diff.splitlines()[0]))
                print(f"[{regime}] {name}: MISMATCH\n{diff}", flush=True)
            spark.catalog.clearCache()
        print(f"[{regime}] {n_ok} oracle-paired queries MATCH", flush=True)
        con.close()
    if failures:
        print(f"\n{len(failures)} PARITY FAILURES:")
        for regime, name, head in failures:
            print(f"  [{regime}] {name}: {head}")
        return 1
    print("ALL REGIMES: FULL ORACLE PARITY")
    return 0


if __name__ == "__main__":
    sys.exit(main())

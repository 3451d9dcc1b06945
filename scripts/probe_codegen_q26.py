"""Reproduce / verify-fixed: q26_rewards_scalar whole-stage-codegen
overflow (VERDICT r3 #1: 'Code grows beyond 64 KB' -> interpreted
fallback on the reward projection).

Runs the query with codegen fallback DISABLED: if any generated stage
fails to compile, the action raises instead of silently falling back.
Also scrapes the py4j JVM log level by registering a log appender is
overkill — fallback=false is the authoritative check:
  spark.sql.codegen.fallback=false  -> compile failure raises
  WHOLESTAGE_CODEGEN_FALLBACK ... otherwise the run is compile-clean.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from social_media_ai_engineering_etl_spark.session import get_spark
from social_media_ai_engineering_etl_spark import queries  # noqa: F401
from social_media_ai_engineering_etl_spark.registry import QUERIES

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = get_spark("codegen-probe", extra_conf={
    "spark.sql.codegen.fallback": "false",
})
print("fallback conf:", spark.conf.get("spark.sql.codegen.fallback"))

name = sys.argv[2] if len(sys.argv) > 2 else "q26_rewards_scalar"
fn = QUERIES[name]
t0 = time.time()
try:
    from pyspark.sql import functions as F
    df = fn(spark, SF)
    # checksum action: forces every output column to be computed
    # (count() would let Catalyst prune the whole projection — the
    # r3 bench-methodology discovery)
    row = df.agg(F.bit_xor(F.xxhash64(*df.columns)).alias("ck")).collect()
    print(f"OK: {name} -> checksum {row[0][0]} in {time.time()-t0:.2f}s")
except Exception as e:
    msg = str(e)
    print(f"FAIL: {name} raised under fallback=false:")
    print(msg[:3000])
    sys.exit(1)
finally:
    spark.catalog.clearCache()

"""Empty-input robustness sweep: build + execute EVERY registered
query against a zero-row copy of the tables (same schemas).  A 100 TB
job routinely plans over empty partitions, empty date slices and
empty filter survivors; a query that crashes on zero rows (driver-side
``collect()[0]``, ``np.stack([])``, division by an empty aggregate)
is a real defect this sweep surfaces at zero data cost.

PASS = the query builds and collect() returns (any row count, incl. 0).
Usage: python scripts/empty_input_sweep.py [empty_dir]
"""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import social_media_ai_engineering_etl_spark.queries  # noqa: F401,E402
from social_media_ai_engineering_etl_spark.registry import QUERIES  # noqa: E402
from social_media_ai_engineering_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    empty = sys.argv[1] if len(sys.argv) > 1 else "/tmp/empty_sf"
    spark = get_spark("empty-sweep")
    ok, failed = 0, []
    for name, fn in QUERIES.items():
        try:
            rows = fn(spark, empty).collect()
            ok += 1
            print(f"{name}: OK ({len(rows)} rows)")
        except Exception as e:
            failed.append(name)
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")
            traceback.print_exc(limit=2, file=sys.stderr)
        finally:
            spark.catalog.clearCache()
    print(f"\n{ok} ok, {len(failed)} failed: {failed}")


if __name__ == "__main__":
    main()

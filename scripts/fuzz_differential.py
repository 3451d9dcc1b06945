"""Randomized reference-differential fuzzing CLI (VERDICT r6 ask #1).

Drives N fresh seeded corpora — drawn from the four fuzz strata
(unicode whitespace / mixed-script / JSON-edge / empty-huge) — through
the reference chain (stages 1, 7, 12, 15, 18, 22, 23, 24) as
subprocesses and the engine's stage functions, comparing at the
SURVEY §4 contract level (tests/test_reference_differential.py's
check functions, reused verbatim).

Usage: python scripts/fuzz_differential.py [--fuzz N] [--seed0 S]
                                           [--n-posts K] [--keep]

Exit 0 = every corpus agreed; 1 = at least one divergence (the
failing corpus directory is kept and printed for replay; re-run the
same seed via SPARK_GRAFT_FUZZ_N/pytest or this CLI).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fuzz", type=int, default=5, help="corpora to run")
    ap.add_argument("--seed0", type=int, default=None,
                    help="first seed (default: the pytest FUZZ_SEED0)")
    ap.add_argument("--n-posts", type=int, default=None)
    ap.add_argument("--keep", action="store_true",
                    help="keep artifact dirs even on success")
    args = ap.parse_args()

    import test_reference_differential as td
    from social_media_ai_engineering_etl_spark.session import get_spark

    seed0 = args.seed0 if args.seed0 is not None else td.FUZZ_SEED0
    n_posts = args.n_posts or td.N_FUZZ_POSTS
    spark = get_spark("fuzz-differential")

    failures = []
    for i in range(args.fuzz):
        seed = seed0 + 13 * i
        tmp = tempfile.mkdtemp(prefix=f"refdiff-fuzz-{seed}-")
        try:
            td.run_fuzz_checks(spark, tmp, seed, n_posts=n_posts)
            print(f"seed {seed}: AGREE ({n_posts} posts)")
            if not args.keep:
                shutil.rmtree(tmp, ignore_errors=True)
        except (KeyboardInterrupt, SystemExit):
            raise  # an interrupt is an abort, not a divergence (ADVICE r7)
        except Exception as e:  # report-and-continue per corpus
            failures.append((seed, tmp, e))
            print(f"seed {seed}: DIVERGE — artifacts kept at {tmp}")
            traceback.print_exc(limit=4)
    print(f"\n{args.fuzz - len(failures)}/{args.fuzz} corpora agree")
    for seed, tmp, e in failures:
        print(f"  seed {seed}: {type(e).__name__} — replay dir {tmp}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

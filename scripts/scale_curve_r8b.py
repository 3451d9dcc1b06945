"""30x extension of the scaling curves (r8 continuation).

The r7/r8 curves stop at 10x sf0.1 (~50k docs) — fine for exponent
fits, but the near-linear claims for the FLAGSHIP scale paths deserve
one more octave.  This probe generates a gen30x corpus (150k docs /
60k vectors, same measured profile + seed lineage as scale_curve_r7)
and times the shapes whose 100 TB story is "near-linear, keep this
plan": the banded-MinHash auto path, the prefix-filtered exact
Jaccard, and the three reference-pipeline hot queries.  The
documented quadratics (plain inverted jaccard, winnow pair output,
queries-prop-to-corpus GEMM) are NOT re-run — their blow-up is already
measured and explained at 10x.

DOCUMENTED DEVIATION: corpora are generated locally (seed 20260816
lineage); /root/testdata is read-only and ships nothing above sf0.1.

Usage: python scripts/scale_curve_r8b.py [--out /tmp/scale_curve]
(shares --out with the r7/r8 scripts; 1x/3x/10x corpora are reused,
30x generated once).  Prints a markdown table for SCALING.md plus a
JSON line.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import random
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "scripts"))

import scale_curve_r7 as r7  # noqa: E402

QUERY_SHAPES = ("q17_author_words", "q26_rewards_scalar",
                "q22_fanout_pairs")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/scale_curve")
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    import social_media_ai_engineering_etl_spark.queries  # noqa: F401
    from social_media_ai_engineering_etl_spark.operators import dedup
    from social_media_ai_engineering_etl_spark.registry import QUERIES
    from social_media_ai_engineering_etl_spark.session import (cache_scope,
                                                               get_spark)
    spark = get_spark("scale-curve-r8b")

    dirs: dict[str, str] = {}
    for name, mult in {"gen3x": 3, "gen10x": 10, "gen30x": 30}.items():
        d = os.path.join(args.out, name)
        os.makedirs(d, exist_ok=True)
        dp = os.path.join(d, "documents.parquet")
        ep = os.path.join(d, "embeddings.parquet")
        if not os.path.exists(dp):
            rng = random.Random(r7.SEED + mult)
            r7._gen_docs(5000 * mult, rng).to_parquet(dp, index=False)
            r7._gen_emb(2000 * mult, r7.SEED + mult).to_parquet(
                ep, index=False)
        dirs[name] = d

    def op_shapes(sf_dir: str) -> dict:
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet"))
        return {
            "minhash_auto": lambda: dedup.minhash_dedup_pairs_auto(
                docs, "doc_id", "text", threshold=0.5),
            "ngram_prefix": lambda: dedup.ngram_jaccard_pairs_prefix(
                docs, "doc_id", "text", threshold=0.5),
        }

    results: dict[str, dict[str, float]] = {}
    rowcounts: dict[str, dict[str, int]] = {}
    for scale, sf_dir in dirs.items():
        builders: dict = {}
        builders.update({s: (lambda s=s, d=sf_dir:
                             QUERIES[s](spark, d))
                         for s in QUERY_SHAPES})
        builders.update(op_shapes(sf_dir))
        for shape, build in builders.items():
            best = math.inf
            n = 0
            for _ in range(args.passes):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                with cache_scope(spark):
                    n = r7._materialize(build())
                best = min(best, time.perf_counter() - t0)
            results.setdefault(shape, {})[scale] = round(best, 3)
            rowcounts.setdefault(shape, {})[scale] = n
            print(f"# {scale} {shape}: {best:.3f}s ({n} rows)",
                  file=sys.stderr)

    print("| shape | gen 3x | gen 10x | gen 30x | e(3x->10x) | "
          "e(10x->30x) | rows 3x/10x/30x |")
    print("|---|---|---|---|---|---|---|")
    fits = {}
    for shape, r in results.items():
        e310 = math.log(r["gen10x"] / r["gen3x"]) / math.log(10 / 3)
        e1030 = math.log(r["gen30x"] / r["gen10x"]) / math.log(3)
        fits[shape] = {"e310": round(e310, 2), "e1030": round(e1030, 2)}
        rc = rowcounts[shape]
        print(f"| {shape} | {r['gen3x']:.2f} | {r['gen10x']:.2f} | "
              f"{r['gen30x']:.2f} | {e310:.2f} | {e1030:.2f} | "
              f"{rc['gen3x']}/{rc['gen10x']}/{rc['gen30x']} |")
    print(json.dumps({"results": results, "fits": fits,
                      "rows": rowcounts}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

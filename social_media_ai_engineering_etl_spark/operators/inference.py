"""Batch-inference operator for the LLM-extraction stages 03/06/09/
11/14 (SURVEY §3.2, §2.13): ``mapInPandas`` with a per-partition
backend instance — the Spark shape of the reference's
``batch_iter -> llm.generate -> constrain-to-domain`` skeleton
(3-extract-structures.py:114-129, 186-188; 9-extract-tone.py:100-170).

Backends:
  * :class:`RuleClassifierBackend` — deterministic keyword rules with
    an md5-hash fallback; the TEST backend (the reference swaps in
    vLLM + Qwen for real runs, 3-extract-structures.py:245-249). Being
    rule-based makes the surrounding dataflow oracle-checkable.
  * :class:`VLLMBackend` — real-inference stub, gated behind an
    import-try (vLLM is not in this environment); instantiates one
    engine per executor via ``mapInPandas``'s per-partition factory.

Guided decoding (choice / JSON-schema constraints, 3:186-188,
9:108-116) becomes post-hoc domain validation with a fallback label —
the same observable contract.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (ArrayType, DoubleType, IntegerType,
                               StringType, StructField, StructType)


def md5_bucket(s: str, n: int) -> int:
    """Deterministic engine-mirrorable bucket: first 6 hex digits of
    md5 mod n (DuckDB: ('0x' || substr(md5(s),1,6))::BIGINT % n)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:6], 16) % n


class RuleClassifierBackend:
    """First-keyword-match classifier with md5-hash fallback over the
    label domain. ``text_regex`` recovers the raw post text from the
    chat-templated prompt so hashing ignores the template."""

    def __init__(self, labels: list[str],
                 keywords: dict[str, list[str]] | None = None,
                 text_regex: str = r"\*\*Social Media Post\*\*\n\n(.*?)(?:<\|im_end\|>|\Z)"):
        self.labels = labels
        self.keywords = keywords or {}
        self.text_regex = re.compile(text_regex, re.DOTALL)

    def _post_text(self, prompt: str) -> str:
        m = self.text_regex.search(prompt)
        return m.group(1) if m else prompt

    def generate(self, prompts: list[str]) -> list[str]:
        out = []
        for p in prompts:
            text = self._post_text(p).lower()
            label = None
            for lab, words in self.keywords.items():
                if any(w in text for w in words):
                    label = lab
                    break
            if label is None:
                label = self.labels[md5_bucket(self._post_text(p),
                                               len(self.labels))]
            out.append(label)
        return out


class FirstLongWordBackend:
    """Topic extractor stand-in (stage 06): emits the JSON object the
    guided decoder would ({"topic": w}) with w = first token of length
    >= ``min_len``, else 'unknown'."""

    def __init__(self, min_len: int = 6,
                 text_regex: str = r"\*\*Social Media Post\*\*\n\n(.*?)(?:<\|im_end\|>|\Z)"):
        self.min_len = min_len
        self.text_regex = re.compile(text_regex, re.DOTALL)

    def generate(self, prompts: list[str]) -> list[str]:
        out = []
        for p in prompts:
            m = self.text_regex.search(p)
            text = (m.group(1) if m else p).lower()
            word = next((w for w in text.split()
                         if len(w) >= self.min_len), "unknown")
            out.append(json.dumps({"topic": word}))
        return out


class HashToneBackend:
    """Tone extractor stand-in (stage 09): a JSON array of 1-3 tones
    hash-picked from the domain — exercises the array-of-enum guided
    decoding contract (9-extract-tone.py:108-116)."""

    def __init__(self, tones: list[str],
                 text_regex: str = r"\*\*Social Media Post\*\*\n\n(.*?)(?:<\|im_end\|>|\Z)"):
        self.tones = tones
        self.text_regex = re.compile(text_regex, re.DOTALL)

    def generate(self, prompts: list[str]) -> list[str]:
        out = []
        for p in prompts:
            m = self.text_regex.search(p)
            text = m.group(1) if m else p
            h = md5_bucket(text, 1 << 20)
            k = h % 3 + 1
            picks = [self.tones[(h // (7 ** i)) % len(self.tones)]
                     for i in range(k)]
            out.append(json.dumps(picks))
        return out


class FreeJsonOpinionBackend:
    """Opinion extractor stand-in (stages 11/14): exercises the FREE
    JSON guided-decoding contract (11-extract-opinion.py:21-29,
    14-extract-context.py:22-30) — unlike the choice/schema stages,
    the decoder here is unconstrained, so outputs are not guaranteed
    to parse. Deterministically, texts whose md5 bucket hits 0 mod
    ``malformed_every`` get raw un-JSON output (the postprocess
    fallback path); everything else gets {"opinion": first sentence,
    trimmed, capped at ``max_chars``}."""

    def __init__(self, max_chars: int = 120, malformed_every: int = 7,
                 text_regex: str = r"\*\*Social Media Post\*\*\n\n(.*?)(?:<\|im_end\|>|\Z)"):
        self.max_chars = max_chars
        self.malformed_every = malformed_every
        self.text_regex = re.compile(text_regex, re.DOTALL)

    def generate(self, prompts: list[str]) -> list[str]:
        out = []
        for p in prompts:
            m = self.text_regex.search(p)
            text = m.group(1) if m else p
            sent = text.split(".", 1)[0].strip()[:self.max_chars]
            if md5_bucket(text, self.malformed_every) == 0:
                out.append(sent)  # free decode drifted off-format
            else:
                out.append(json.dumps({"opinion": sent}))
        return out


class VLLMBackend:  # pragma: no cover - real-inference path
    """Real vLLM engine, one per executor (import-gated: vLLM is not
    installed in this environment; SURVEY §3.2 maps the reference's
    in-process engine to a per-partition factory here)."""

    def __init__(self, model: str, max_tokens: int = 16,
                 temperature: float = 0.0):
        try:
            from vllm import LLM, SamplingParams
        except ImportError as e:
            raise NotImplementedError(
                "vLLM is not available in this environment; use "
                "RuleClassifierBackend for tests") from e
        self._llm = LLM(model=model)
        self._params = SamplingParams(temperature=temperature,
                                      max_tokens=max_tokens)

    def generate(self, prompts: list[str]) -> list[str]:
        outputs = self._llm.generate(prompts, self._params)
        return [o.outputs[0].text if o.outputs else "" for o in outputs]


def infer_column(df: DataFrame, text_col: str, out_col: str,
                 backend_factory: Callable[[], object],
                 prompt_builder: Callable[[str], str],
                 postprocess: Callable[[str], str],
                 empty_label: str) -> DataFrame:
    """The stage-03 skeleton as a Spark operator: skip empty texts
    (P11 gate -> ``empty_label``), batch the rest through the backend,
    constrain outputs via ``postprocess``. One backend instance per
    partition (the mp-pool/batch-256 analogue, SURVEY §4 batching);
    Arrow batches bound peak memory."""
    # fresh StructType — StructType.add would MUTATE df.schema in place
    out_schema = StructType(list(df.schema.fields)
                            + [StructField(out_col, StringType())])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = backend_factory()
        for pdf in batches:
            texts = pdf[text_col].fillna("")
            mask = texts.str.strip() != ""
            labels = pd.Series([empty_label] * len(pdf), index=pdf.index,
                               dtype=object)
            todo = texts[mask]
            if len(todo):
                raw = backend.generate([prompt_builder(t) for t in todo])
                labels.loc[mask] = [postprocess(r) for r in raw]
            pdf = pdf.copy()
            pdf[out_col] = labels
            yield pdf

    return df.mapInPandas(fn, out_schema)


# ---------------------------------------------------------------------------
# stage domains + prompt templates (verbatim label sets from the reference)
# ---------------------------------------------------------------------------

STRUCTURE_LABELS = [
    "educational", "instructional", "inspirational", "analytical",
    "controversial", "insightful", "comparative", "reflective",
    "evolutionary", "announcement",
]
# cue keywords for the rule backend (engine-defined; the reference's
# classifier is an LLM — these only need to be deterministic)
STRUCTURE_KEYWORDS = {
    "instructional": ["how to", "step"],
    "analytical": ["data", "metric"],
    "announcement": ["announc", "launch"],
    "comparative": ["versus", " vs "],
}

AVAILABLE_TONES = [
    "friendly", "professional", "serious", "informative", "cheerful",
    "scholarly", "charming", "witty", "sarcastic", "rebellious",
]


def chat_prompt(task: str, text: str) -> str:
    """Qwen chat template (3-extract-structures.py:52)."""
    return (f"<|im_start|>user\n{task}\n\n**Social Media Post**\n\n{text}"
            f"<|im_end|>\n<|im_start|>assistant\n")


def constrain_to(labels: list[str], fallback: str) -> Callable[[str], str]:
    """Choice-constrained decoding as validation (3:74-77)."""
    def post(raw: str) -> str:
        t = raw.strip().lower()
        return t if t in labels else fallback
    return post


def parse_tone_array(tones: list[str]) -> Callable[[str], str]:
    """Stage-09 JSON-array postprocess: parse, keep known tones,
    dedupe preserving order, cap 3, join ', ' (9:150-163)."""
    def post(raw: str) -> str:
        try:
            data = json.loads(raw)
        except Exception:
            return raw or "Unknown"
        if not isinstance(data, list):
            return "Unknown"
        seen, out = set(), []
        for item in data:
            if isinstance(item, str):
                norm = item.strip().lower()
                if norm in tones and norm not in seen:
                    out.append(norm)
                    seen.add(norm)
                    if len(out) == 3:
                        break
        return ", ".join(out) if out else "Unknown"
    return post


def parse_json_field(field: str, fallback: str) -> Callable[[str], str]:
    """Stage-06/11/14 JSON-object postprocess (P7 unwrap shape)."""
    def post(raw: str) -> str:
        try:
            data = json.loads(raw)
            v = data.get(field) if isinstance(data, dict) else None
            return v if isinstance(v, str) and v else fallback
        except Exception:
            return fallback
    return post


# ---------------------------------------------------------------------------
# M10 — text-embedding inference (21-embedding-and-clustering.py:252-273)
# ---------------------------------------------------------------------------


class DeterministicEmbeddingBackend:
    """Test embedder: unit-norm md5-stream vector per text (stable
    across runs/engines; stands in for all-MiniLM-L6-v2, which is not
    installed here)."""

    def __init__(self, dim: int = 32):
        self.dim = dim

    def embed(self, texts: list[str]) -> list[list[float]]:
        out = []
        for t in texts:
            seed = hashlib.md5(t.encode("utf-8")).digest()
            vals: list[float] = []
            counter = 0
            while len(vals) < self.dim:
                block = hashlib.md5(seed + counter.to_bytes(4, "big")).digest()
                vals.extend(b / 255.0 - 0.5 for b in block)
                counter += 1
            vals = vals[:self.dim]
            norm = sum(v * v for v in vals) ** 0.5 or 1.0
            out.append([v / norm for v in vals])
        return out


class HashedNgramEmbeddingBackend:
    """Content-SENSITIVE deterministic embedder: signed feature-hashed
    character n-grams (3..5) -> ``dim`` buckets, L2-normalized — the
    classic hashing-trick featurizer (torch/ONNX-free; the 32-bit
    md5-prefix hash is stable across processes and executors, unlike
    salted ``hash()``, AND portable: DuckDB computes the identical
    bucket + sign via ('0x' || substr(md5(g), 1, 8))::BIGINT, which is
    what lets qm_text_embeddings and q17_topic_shifts_model carry
    full value-hash oracles — same portability move as
    dedup.portable_hash31.  r5 note: this replaced zlib.crc32, which
    no SQL engine exposes; the hashing-trick statistics are
    hash-agnostic, so the semantic contracts pinned in
    tests/test_inference.py are unchanged).

    Unlike :class:`DeterministicEmbeddingBackend` (md5 stream — every
    distinct text is an independent random point, so all cosine
    distances cluster near 1), texts sharing vocabulary land near each
    other, which makes downstream cosine semantics REAL: topic-shift
    scores (T12) dip within-topic and spike at topic changes, and
    embedding clustering (M10) groups lexically similar docs.  This is
    the default backend for q17_topic_shifts_model / qm_text_embeddings;
    the env-gated sentence-transformers seam stays for the true model
    path (21-embedding-and-clustering.py:252-273)."""

    def __init__(self, dim: int = 64, ngram_min: int = 3,
                 ngram_max: int = 5):
        self.dim, self.lo, self.hi = dim, ngram_min, ngram_max

    def embed(self, texts: list[str]) -> list[list[float]]:
        import numpy as np
        out = np.zeros((len(texts), self.dim), dtype=np.float64)
        for r, t in enumerate(texts):
            s = " " + (t or "").lower() + " "
            row = out[r]
            for n in range(self.lo, self.hi + 1):
                for i in range(len(s) - n + 1):
                    h = int(hashlib.md5(
                        s[i:i + n].encode("utf-8")).hexdigest()[:8], 16)
                    row[h % self.dim] += 1.0 if h & 0x80000000 else -1.0
            norm = float(np.sqrt((row * row).sum()))
            if norm > 0:
                row /= norm
        return [list(map(float, v)) for v in out]


def default_embedding_backend(dim: int = 64):
    """Backend seam: ``SPARK_GRAFT_EMBED_BACKEND=st`` selects the real
    sentence-transformers model (import-gated); anything else (and the
    default) the hashed char-ngram featurizer — deterministic, content-
    sensitive, dependency-free."""
    if os.environ.get("SPARK_GRAFT_EMBED_BACKEND") == "st":
        return SentenceTransformerBackend()
    return HashedNgramEmbeddingBackend(dim=dim)


class SentenceTransformerBackend:  # pragma: no cover - real path
    """Real sentence-transformers embedder, import-gated."""

    def __init__(self, model: str = "all-MiniLM-L6-v2"):
        try:
            from sentence_transformers import SentenceTransformer
        except ImportError as e:
            raise NotImplementedError(
                "sentence-transformers is not installed; use "
                "DeterministicEmbeddingBackend for tests") from e
        self._model = SentenceTransformer(model)

    def embed(self, texts: list[str]) -> list[list[float]]:
        return [list(map(float, v)) for v in self._model.encode(texts)]


def embed_column(df: DataFrame, text_col: str, out_col: str,
                 backend_factory: Callable[[], object]) -> DataFrame:
    """M10: batched embedding inference — one model instance per
    partition, Arrow batches in/out, output array<float>."""
    from pyspark.sql.types import ArrayType, FloatType

    out_schema = StructType(list(df.schema.fields)
                            + [StructField(out_col, ArrayType(FloatType()))])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = backend_factory()
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = backend.embed(
                [t if isinstance(t, str) else "" for t in pdf[text_col]])
            yield pdf

    return df.mapInPandas(fn, out_schema)


def topic_shift_scores(df: DataFrame, text_col: str, out_col: str,
                       backend_factory: Callable[[], object],
                       threshold: float = 0.5) -> DataFrame:
    """T12 model-backed variant (17-writing-style.py:175-218; disabled
    in the reference's main path — see narrative17.
    topic_transitions_disabled for the main-path literal): score topic
    shifts between ADJACENT SENTENCES as cosine distance of their
    embeddings, emit ``array<struct<idx,score>>`` of boundaries whose
    distance >= threshold (idx = index of the sentence the shift leads
    into).

    The reference scores segment shifts with a BERT next-segment
    model; the pluggable backend stands in (SentenceTransformerBackend
    when installed, DeterministicEmbeddingBackend in tests — same
    substitution as M10). Plumbing is the production shape: one
    backend per partition, ONE batched embed() call per row's
    sentences, Arrow in/out, no per-sentence Python round-trips."""
    import re as _re

    import numpy as np

    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(out_col, ArrayType(StructType([
            StructField("idx", IntegerType()),
            StructField("score", DoubleType())])))])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = backend_factory()
        for pdf in batches:
            res = []
            for t in pdf[text_col]:
                sents = [s.strip()
                         for s in _re.split(r"(?<=[.!?])\s+", t or "")
                         if s.strip()]
                if len(sents) < 2:
                    res.append([])
                    continue
                E = np.asarray(backend.embed(sents), dtype=np.float64)
                nn = np.linalg.norm(E, axis=1, keepdims=True)
                En = E / np.where(nn == 0, 1.0, nn)
                dist = 1.0 - (En[:-1] * En[1:]).sum(axis=1)
                res.append([{"idx": i + 1, "score": round(float(d), 6)}
                            for i, d in enumerate(dist) if d >= threshold])
            pdf = pdf.copy()
            pdf[out_col] = res
            yield pdf

    return df.mapInPandas(fn, out_schema)

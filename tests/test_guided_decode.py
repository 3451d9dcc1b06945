"""Hypothesis property tests for the four guided-decoding contract
shapes (SURVEY §3.2; reference 3-extract-structures.py:186-188,
9-extract-tone.py:108-116, 11-extract-opinion.py:21-29): whatever a
backend emits — including a future REAL vLLM backend replacing the
deterministic stand-ins — the postprocess layer must land every output
in the declared domain. These are pure-Python (no Spark session), so
hypothesis can run its full example budget.

Contract shapes covered:
  1. choice-constrained decode   (constrain_to: label enum or fallback)
  2. enum-array decode           (parse_tone_array: dedupe/cap/join)
  3. JSON-object-field decode    (parse_json_field: unwrap or fallback)
  4. free/unconstrained decode   (FreeJsonOpinionBackend drift + parse)
"""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from social_media_ai_engineering_etl_spark.operators import inference as inf

text_st = st.text(max_size=300)


# ---------------------------------------------------------------------------
# shape 1: choice-constrained (structure labels)
# ---------------------------------------------------------------------------


@settings(max_examples=300)
@given(raw=text_st)
def test_choice_constraint_closed_domain(raw):
    post = inf.constrain_to(inf.STRUCTURE_LABELS, "unknown")
    out = post(raw)
    assert out in inf.STRUCTURE_LABELS or out == "unknown"


@settings(max_examples=100)
@given(label=st.sampled_from(inf.STRUCTURE_LABELS),
       pad=st.text(alphabet=" \t\n", max_size=5))
def test_choice_constraint_accepts_padded_case_variants(label, pad):
    post = inf.constrain_to(inf.STRUCTURE_LABELS, "unknown")
    assert post(pad + label.upper() + pad) == label


# ---------------------------------------------------------------------------
# shape 2: enum-array (tones): parse -> keep known -> dedupe -> cap 3
# ---------------------------------------------------------------------------

json_scalar = st.one_of(st.none(), st.booleans(),
                        st.integers(-10, 10), text_st)
tone_items = st.lists(
    st.one_of(st.sampled_from(inf.AVAILABLE_TONES),
              st.sampled_from([t.upper() for t in inf.AVAILABLE_TONES]),
              json_scalar),
    max_size=8)


@settings(max_examples=300)
@given(items=tone_items)
def test_tone_array_dedupe_cap_order(items):
    out = inf.parse_tone_array(inf.AVAILABLE_TONES)(json.dumps(items))
    # reproduce the declared semantics independently
    seen, expect = set(), []
    for it in items:
        if isinstance(it, str):
            norm = it.strip().lower()
            if norm in inf.AVAILABLE_TONES and norm not in seen:
                expect.append(norm)
                seen.add(norm)
                if len(expect) == 3:
                    break
    assert out == (", ".join(expect) if expect else "Unknown")
    # domain: every emitted tone is known, distinct, capped at 3
    if out != "Unknown":
        parts = out.split(", ")
        assert 1 <= len(parts) <= 3
        assert len(set(parts)) == len(parts)
        assert all(p in inf.AVAILABLE_TONES for p in parts)


@settings(max_examples=300)
@given(raw=text_st)
def test_tone_array_garbage_never_escapes_domain(raw):
    """Non-JSON input: the contract passes raw through only when
    non-empty (legacy comma-joined form) — never crashes."""
    out = inf.parse_tone_array(inf.AVAILABLE_TONES)(raw)
    assert isinstance(out, str) and out != ""


# ---------------------------------------------------------------------------
# shape 3: JSON-object field (topic/opinion unwrap)
# ---------------------------------------------------------------------------

json_value = st.recursive(
    json_scalar,
    lambda children: st.one_of(
        st.lists(children, max_size=3),
        st.dictionaries(st.text(max_size=8), children, max_size=3)),
    max_leaves=8)


@settings(max_examples=300)
@given(val=json_value)
def test_json_field_unwrap_or_fallback(val):
    post = inf.parse_json_field("topic", "unknown")
    out = post(json.dumps(val))
    if isinstance(val, dict) and isinstance(val.get("topic"), str) \
            and val["topic"]:
        assert out == val["topic"]
    else:
        assert out == "unknown"


@settings(max_examples=300)
@given(raw=text_st)
def test_json_field_malformed_falls_back(raw):
    try:
        parsed = json.loads(raw)
        is_good = (isinstance(parsed, dict)
                   and isinstance(parsed.get("topic"), str)
                   and bool(parsed["topic"]))
    except Exception:
        is_good = False
    out = inf.parse_json_field("topic", "unknown")(raw)
    assert out == (parsed["topic"] if is_good else "unknown")


# ---------------------------------------------------------------------------
# shape 4: free decode (opinion) — drift + postprocess end-to-end
# ---------------------------------------------------------------------------


@settings(max_examples=200)
@given(text=st.text(min_size=1, max_size=300))
def test_free_decode_chain_lands_in_domain(text):
    """Backend may drift off-format (~1/7 of texts by md5 bucket); the
    composed chain must still land every output in the declared domain:
    a non-empty string of at most max_chars, or the fallback."""
    backend = inf.FreeJsonOpinionBackend(max_chars=120)
    raw = backend.generate([inf.chat_prompt("Extract the opinion.",
                                            text)])[0]
    out = inf.parse_json_field("opinion", "unknown")(raw)
    assert isinstance(out, str)
    assert out == "unknown" or (0 < len(out) <= 120)
    drifted = inf.md5_bucket(text, 7) == 0
    if drifted:
        assert out == "unknown"   # raw drift can never masquerade


# ---------------------------------------------------------------------------
# backend stand-ins obey their decode constraints (so swapping in a
# real constrained decoder keeps the same downstream guarantees)
# ---------------------------------------------------------------------------


@settings(max_examples=200)
@given(text=st.text(min_size=1, max_size=200))
def test_rule_backend_emits_only_labels(text):
    b = inf.RuleClassifierBackend(inf.STRUCTURE_LABELS,
                                  inf.STRUCTURE_KEYWORDS)
    out = b.generate([inf.chat_prompt("Classify.", text)])
    assert all(o in inf.STRUCTURE_LABELS for o in out)


@settings(max_examples=200)
@given(text=st.text(min_size=1, max_size=200))
def test_tone_backend_emits_valid_enum_arrays(text):
    b = inf.HashToneBackend(inf.AVAILABLE_TONES)
    raw = b.generate([inf.chat_prompt("Tones.", text)])[0]
    arr = json.loads(raw)
    assert isinstance(arr, list) and 1 <= len(arr) <= 3
    assert all(t in inf.AVAILABLE_TONES for t in arr)

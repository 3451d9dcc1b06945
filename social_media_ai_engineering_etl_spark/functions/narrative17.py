"""Stage-17 main-path narrative variants (SURVEY T7/T8/T10 — the
'backup behavior' implementations at 17-writing-style.py:269-330,
selected per §7 variant reconciliation; the cue-word/slope variants
live in functions/rewards.py as the base.py flavors).

All native expressions. The [:5000] truncation is replicated — it is
semantics, not just perf (SURVEY §4). Deviations as in rewards.py:
engine sentence split + mini-lexicon sentiment; the reference's
random.sample sentence sampling becomes the deterministic stride of
base.py (engines cannot share Python's global random stream).

Deliberately not ported (documented dead code, SURVEY §2.8):
  * T13 get_action_to_descriptive_ratio / get_new_entity_rate
    (17:155-173) — defined but never called in the reference's main
    path; no engine surface.
  * T14 `similar` phrase fuzz (17:385-400) — only reachable inside
    the A7 spaCy miner, which the reference always bypasses via the
    TypeError fallback (SURVEY Q3); the engine implements the
    effective A8 fallback path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .rewards import _mean, _py_words, sentences, sentiment_scores


def _truncated(text: Column) -> Column:
    return F.substring(text, 1, 5000)


def narrative_flow_17(text: Column) -> Column:
    """T7 main-path (17:274-284): ['Introduction/Setup'] +
    ['Content'] * (n_sentences - 1); [] for empty."""
    n = F.size(sentences(_truncated(text)))
    return (F.when(n <= 0, F.array().cast("array<string>"))
             .otherwise(F.concat(
                 F.array(F.lit("Introduction/Setup")),
                 F.array_repeat(F.lit("Content"), (n - 1).cast("int")))))


def pacing_17(text: Column) -> Column:
    """T8 main-path (17:286-298): avg sentence token count <10 Fast /
    >20 Slow / else Moderate; <3 sentences -> Short/Not Enough Data.
    (No stddev 'Variable' branch — that is the base.py flavor.)
    Token counts are ``str.split()`` semantics (r8, as in
    rewards.py)."""
    sents = sentences(_truncated(text))
    lens = F.transform(sents, lambda s: F.size(_py_words(s)))
    avg = _mean(lens)
    return (F.when(F.size(sents) < 3, F.lit("Short/Not Enough Data"))
             .when(avg < 10, F.lit("Fast"))
             .when(avg > 20, F.lit("Slow"))
             .otherwise(F.lit("Moderate")))


def sentiment_arc_17(text: Column) -> Column:
    """T10 main-path (17:314-324): mean sampled sentiment > 0.2
    Positive / < -0.2 Negative / else Neutral; <3 scores ->
    'Short/Not Enough Data for Arc'."""
    scores = sentiment_scores(_truncated(text))
    avg = F.aggregate(scores, F.lit(0.0), lambda a, x: a + x) / F.size(scores)
    return (F.when(F.size(scores) < 3, F.lit("Short/Not Enough Data for Arc"))
             .when(avg > 0.2, F.lit("Positive"))
             .when(avg < -0.2, F.lit("Negative"))
             .otherwise(F.lit("Neutral")))


def rolling_average(values: Column, window: int = 3) -> Column:
    """17:269-272 / features/narrative.py:44-47: centered-forward
    rolling mean; arrays shorter than the window pass through."""
    n = F.size(values)
    idx = F.sequence(F.lit(1), n - (window - 1))
    rolled = F.transform(idx, lambda i: F.aggregate(
        F.slice(values, i, window), F.lit(0.0), lambda a, x: a + x) / window)
    return F.when(n < window, values.cast("array<double>")).otherwise(rolled)


# ---------------------------------------------------------------------------
# features/narrative.py flavors (the cue-word / p75 / slope variants)
# ---------------------------------------------------------------------------

INTRO_CUES = ("today", "announce", "we're", "introduce", "sharing")
OUTRO_CUES = ("follow", "check out", "sign up", "learn more", "share",
              "comment")


def narrative_flow_cue(text: Column, max_sentences: int = 20) -> Column:
    """T7 cue variant (features/narrative.py:10-26): first two
    sentences with intro cues -> Introduction/Setup, last two with
    outro cues -> Outro/CTA, else Content."""
    sents = F.slice(sentences(_truncated(text)), 1, max_sentences)
    n = F.size(sents)

    def any_cue(s, cues):
        expr = F.lit(False)
        for c in cues:
            expr = expr | F.lower(s).contains(c)
        return expr

    labels = F.zip_with(
        sents, F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda s, i: F.when((i <= 2) & any_cue(s, INTRO_CUES),
                            F.lit("Introduction/Setup"))
                      .when((i >= n - 1) & any_cue(s, OUTRO_CUES),
                            F.lit("Outro/CTA"))
                      .otherwise(F.lit("Content")))
    # reference returns [] for no sentences (narrative.py:13-14);
    # without this guard zip_with pads the empty array against the
    # 1-element index sequence and fabricates ['Content'] (r8
    # differential catch)
    return F.when(n <= 0, F.array().cast("array<string>")
                  ).otherwise(labels)


def _percentile_linear(sorted_arr: Column, q: float) -> Column:
    """np.percentile linear interpolation over a sorted array."""
    n = F.size(sorted_arr)
    pos = F.lit(q) * (n - 1).cast("double")
    lo = F.floor(pos).cast("int")
    frac = pos - lo.cast("double")
    a = F.element_at(sorted_arr, lo + 1).cast("double")
    b = F.element_at(sorted_arr, F.least(lo + 2, n)).cast("double")
    return a * (1.0 - frac) + b * frac


def pacing_p75(text: Column, max_sentences: int = 50) -> Column:
    """T8 p75 variant (narrative.py:29-41): 75th-percentile sentence
    token count <= 10 Fast / > 20 Slow / else Moderate."""
    sents = sentences(_truncated(text))
    lens = F.transform(F.slice(sents, 1, max_sentences),
                       lambda s: F.size(_py_words(s)))
    p75 = _percentile_linear(F.array_sort(lens), 0.75)
    return (F.when(F.size(sents) < 3, F.lit("Short/Not Enough Data"))
             .when(p75 <= 10, F.lit("Fast"))
             .when(p75 > 20, F.lit("Slow"))
             .otherwise(F.lit("Moderate")))


def sentiment_arc_slope(scores: Column, window: int = 3,
                        short_threshold: int = 4) -> Column:
    """T10 slope variant (narrative.py:50-67): least-squares slope of
    the rolling-mean-smoothed scores; > 0.03 Rising / < -0.03 Falling
    / else Flat."""
    smoothed = rolling_average(scores, window)
    m = F.size(smoothed).cast("double")
    idx = F.sequence(F.lit(0), F.size(smoothed) - 1)
    sum_y = F.aggregate(smoothed, F.lit(0.0), lambda a, x: a + x)
    sum_t = (m - 1) * m / 2
    sum_t2 = (m - 1) * m * (2 * m - 1) / 6
    sum_ty = F.aggregate(
        F.zip_with(idx, smoothed, lambda i, y: i.cast("double") * y),
        F.lit(0.0), lambda a, x: a + x)
    denom = sum_t2 - sum_t * sum_t / m
    slope = F.when(denom > 0, (sum_ty - sum_t * sum_y / m) / denom
                   ).otherwise(F.lit(0.0))
    return (F.when(F.size(scores) < short_threshold,
                   F.lit("Short/Not Enough Data for Arc"))
             .when(slope > 0.03, F.lit("Rising"))
             .when(slope < -0.03, F.lit("Falling"))
             .otherwise(F.lit("Flat")))


def topic_transitions_disabled() -> Column:
    """T12 (17:175-218, disabled by default via PERFORMANCE_CONFIG
    17:31, 138-147, 689-693): BERT segment-shift scoring is OFF in the
    reference's main path, so the effective main-path value is the
    empty array. The model-backed variant is
    operators.inference.topic_shift_scores (pluggable embedding
    backend, registered as q17_topic_shifts_model); this literal is
    what stage-17 actually emits."""
    return F.array().cast("array<struct<idx:int,score:double>>")


# ---------------------------------------------------------------------------
# T5/T6 feature-variant detectors (features/bullets.py:8-42,
# features/dividers.py:9-17) — the STAGE-17 flavor, distinct from the
# reward-stage flavor in rewards.py (training/rewards/base.py): labels
# are 'Numbered'/'Lettered' (not 'Numbers'/'Letters'), patterns match
# the RAW line (only the EMPTY check strips), ties resolve
# Counter.most_common-style (max count, FIRST-ENCOUNTERED wins), and
# the divider is a backreference run of one symbol.
# Unit-differentialed against the genuine reference modules in
# tests/test_reference_units_differential.py.
# ---------------------------------------------------------------------------


def _most_common_first(labels: Column) -> Column:
    """Counter(labels).most_common(1)[0][0]: the max-count element,
    ties broken by FIRST insertion (array_distinct preserves first
    occurrence; a strict > keeps the earliest max)."""
    uniq = F.array_distinct(labels)
    counted = F.transform(
        uniq, lambda x: F.struct(
            F.size(F.filter(labels, lambda y: y == x)).alias("n"),
            x.alias("lab")))
    return F.aggregate(
        counted,
        F.struct(F.lit(0).alias("n"),
                 F.lit(None).cast("string").alias("lab")),
        lambda acc, s: F.when(s.getField("n") > acc.getField("n"), s)
                        .otherwise(acc)).getField("lab")


def detect_bullet_styles_17(text: Column) -> Column:
    """features/bullets.py:8-42 — per-line label in priority order
    Numbered / Lettered / indent-symbol / symbol over CPython classes
    on the RAW line (blank lines skip via python-strip emptiness);
    NULL when no line labels; >1 distinct -> 'Mixed Bullet Styles';
    else the most-common label, first-encountered tie-break.

    The indent rule (``^ {4,}([^\\w\\s])``) yields the same group-1
    symbol the symbolic rule would — label-equivalent, so not
    separately branched.  The emoji branch (bullets.py:25-31) is
    UNREACHABLE even with the ``emojis`` package installed: an
    emoji-led line is always captured by the symbolic
    ``^\\s*([^\\w\\s])`` rule first (single-codepoint RGI emoji are
    category So — never Python ``\\w``), and a word-led first token
    fails ``all(emojis.count)`` on its first character.  r8
    differential proof: tests/test_reference_units_differential.py::
    test_bullets17_emoji_branch_is_dead runs the genuine reference
    WITH an emojis seam and pins both the equality and that the
    Emoji/EmojiBullets/Differing-Emojis labels never fire."""
    from .cleaning import (PY_DIGIT_CHAR, PY_NONWORDSPACE_CHAR, py_strip)
    sp = r"[\s\x1c-\x1f]"
    numbered = "(?U)^" + sp + "*" + PY_DIGIT_CHAR + "+[.)]" + sp + "+"
    lettered = "(?U)^" + sp + "*[a-zA-Z]+[.)]" + sp + "+"
    symbolic = "(?U)^" + sp + "*(" + PY_NONWORDSPACE_CHAR + ")"
    lines = F.filter(F.split(text, "\n", -1),
                     lambda l: py_strip(l) != "")
    labels = F.transform(
        lines,
        lambda l: F.when(l.rlike(numbered), F.lit("Numbered"))
                   .when(l.rlike(lettered), F.lit("Lettered"))
                   .when(l.rlike(symbolic),
                         F.regexp_extract(l, symbolic, 1)))
    labels = F.filter(labels, lambda x: x.isNotNull() & (x != ""))
    distinct = F.array_distinct(labels)
    return (F.when(F.size(labels) == 0, F.lit(None).cast("string"))
             .when(F.size(distinct) > 1, F.lit("Mixed Bullet Styles"))
             .otherwise(F.element_at(distinct, 1)))


def detect_divider_style_17(text: Column) -> Column:
    """features/dividers.py:9-17 — a divider line is
    ``^\\s*([^\\w\\s])\\1{3,}\\s*$`` on the RAW line (4+ repeats of
    one symbol, CPython classes; Java regex supports the
    backreference), most-common divider char wins with
    first-encountered tie-break; NULL when none."""
    from .cleaning import PY_NONWORDSPACE_CHAR
    sp = r"[\s\x1c-\x1f]"
    pat = ("(?U)^" + sp + "*(" + PY_NONWORDSPACE_CHAR + r")\1{3,}"
           + sp + "*$")
    lines = F.split(text, "\n", -1)
    found = F.filter(
        F.transform(lines, lambda l: F.when(l.rlike(pat),
                                            F.regexp_extract(l, pat, 1))),
        lambda x: x.isNotNull() & (x != ""))
    return F.when(F.size(found) > 0,
                  _most_common_first(found)).otherwise(
        F.lit(None).cast("string"))

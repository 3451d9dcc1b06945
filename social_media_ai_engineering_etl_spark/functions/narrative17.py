"""Stage-17 main-path narrative variants (SURVEY T7/T8/T10 — the
'backup behavior' implementations at 17-writing-style.py:269-330,
selected per §7 variant reconciliation; the cue-word/slope variants
live in functions/rewards.py as the base.py flavors).

All native expressions. The [:5000] truncation is replicated — it is
semantics, not just perf (SURVEY §4). Deviations as in rewards.py:
engine sentence split + mini-lexicon sentiment; the reference's
random.sample sentence sampling becomes the deterministic stride of
base.py (engines cannot share Python's global random stream).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .rewards import _mean, sentences, sentiment_scores


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
    (No stddev 'Variable' branch — that is the base.py flavor.)"""
    sents = sentences(_truncated(text))
    lens = F.transform(sents, lambda s: F.size(F.split(s, "\\s+")))
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

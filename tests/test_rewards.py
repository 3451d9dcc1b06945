"""Unit tests for the reward library — hand-built (prompt, completion)
pairs with threshold assertions, mirroring the reference's
tests/test_rewards.py:11-57 strategy."""

import pytest
from pyspark.sql import functions as F

from social_media_ai_engineering_etl_spark.functions import rewards as rw


def _score(spark, fn, prompt, completion):
    df = spark.createDataFrame([(prompt, completion)], "p string, c string")
    return df.select(fn(F.col("p"), F.col("c")).alias("r")).collect()[0].r


def _score1(spark, fn, completion):
    df = spark.createDataFrame([(completion,)], "c string")
    return df.select(fn(F.col("c")).alias("r")).collect()[0].r


def test_precise_length_buckets(spark):
    p = "**Suggested Post Length**: Up to 750 characters\n"
    assert _score(spark, rw.precise_post_length, p, "x" * 400) == pytest.approx(
        0.7 + 0.3 * 400 / 750)
    assert _score(spark, rw.precise_post_length, p, "x" * 800) == 0.6
    assert _score(spark, rw.precise_post_length, p, "x" * 2000) == 0.0
    p2 = "**Suggested Post Length**: Between 750 and 1,500 characters\n"
    assert _score(spark, rw.precise_post_length, p2, "x" * 375) == pytest.approx(
        0.7 * 375 / 750)
    assert _score(spark, rw.precise_post_length, p2, "x" * 1125) == pytest.approx(0.85)
    # generic fallback (R2): 'up to N characters' regex, comma thousands
    p3 = "**Suggested Post Length**: Up to 1,200 characters\n"
    assert _score(spark, rw.precise_post_length, p3, "x" * 1000) == 1.0
    assert _score(spark, rw.precise_post_length, p3, "x" * 1300) == 0.7
    # no field -> 0.5
    assert _score(spark, rw.precise_post_length, "no style", "x") == 0.5


def test_hashtag_limit_last_line_only(spark):
    ok = "body text\n#a #b #c"
    assert _score1(spark, rw.hashtag_limit, ok) == 1.0
    spam = "body\n#a #b #c #d #e"
    assert _score1(spark, rw.hashtag_limit, spam) == pytest.approx(0.6)
    # hashtags NOT in the last line are ignored (hashtags.py:11 tail)
    midway = "#a #b #c #d #e\nclean last line"
    assert _score1(spark, rw.hashtag_limit, midway) == 1.0


def test_chinese_guard(spark):
    assert _score1(spark, rw.chinese_character_guard, "all ascii") == 1.0
    assert _score1(spark, rw.chinese_character_guard, "mixed 中文 text") == 0.0


def test_divider_style(spark):
    p = "**Section Divider**: `-`\n"
    assert _score(spark, rw.divider_style, p, "a\n----\nb") == 1.0
    assert _score(spark, rw.divider_style, p, "a\n====\nb") == 0.3
    assert _score(spark, rw.divider_style, p, "no dividers here") == 0.0
    # spaced divider form '- - -' (>=5 chars, alternating)
    assert _score(spark, rw.divider_style, p, "a\n- - -\nb") == 1.0
    assert _score(spark, rw.divider_style, "no field", "a\n---\nb") == 0.5


def test_bullet_styles(spark):
    det = "1. one\n2. two"
    p_num = "**Bullet Styles**: Numbers\n"
    assert _score(spark, rw.bullet_style, p_num, det) == pytest.approx(0.9)
    # mixed styles -> 'Mixed Bullet Styles' -> no 'numbers' substring
    mixed = "1. one\n- two"
    assert _score(spark, rw.bullet_style, p_num, mixed) == 0.0
    # no desired styles: detected anything -> 1.0, none -> 0.0
    p_none = "**Bullet Styles**: None specified\n"
    assert _score(spark, rw.bullet_style, p_none, det) == 1.0
    assert _score(spark, rw.bullet_style, p_none, "plain text only") == 0.0


def test_sentiment_arc_and_tone(spark):
    rising = ("This is bad and awful. It got somewhat better later. "
              "Now everything is great and amazing and wonderful.")
    arc = spark.createDataFrame([(rising,)], "c string").select(
        rw.sentiment_arc(rw.sentiment_scores(F.col("c"))).alias("a")
    ).collect()[0].a
    assert arc == "Rising"
    p = "**Tone**: friendly, cheerful\n"
    assert _score(spark, rw.tone_alignment, p, rising) == 1.0
    p_neg = "**Tone**: serious\n"
    assert _score(spark, rw.tone_alignment, p_neg, rising) == pytest.approx(0.6)
    assert _score(spark, rw.tone_alignment, "no tone", rising) == 0.5


def test_fabrication_penalties(spark):
    p = ("# Request\nCreate a LinkedIn post that follows the writing style "
         "below on the topic of`: `analytics`\n\n### Key Message\n```\n"
         "Quarterly results improved\n```\n")
    clean = "Results improved across the board this quarter"
    assert _score(spark, rw.fabrication_guard, p, clean) == 1.0
    with_url = clean + " https://sketchy.example.com/buy"
    assert _score(spark, rw.fabrication_guard, p, with_url) == pytest.approx(0.3)
    with_names = clean + " according to Jane Doe"
    assert _score(spark, rw.fabrication_guard, p, with_names) == pytest.approx(0.9)
    with_promo = clean + " sign up for our newsletter"
    assert _score(spark, rw.fabrication_guard, p, with_promo) == pytest.approx(0.7)


def test_aggregate_weighted_mean(spark):
    df = spark.createDataFrame([(1.0, 0.5)], "a double, b double")
    agg = rw.aggregate_rewards({"a": F.col("a"), "b": F.col("b")},
                               {"a": 3.0, "b": 1.0})
    assert df.select(agg.alias("r")).collect()[0].r == pytest.approx(
        (3.0 * 1.0 + 0.5) / 4.0)

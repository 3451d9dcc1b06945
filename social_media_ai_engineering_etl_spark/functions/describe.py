"""Stage-18 feature->English describe chains (18-generate-prompts.py:
22-354), expressed as native CASE-WHEN column expressions — fully
codegen'd, fully oracle-verifiable (SURVEY §2.9).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .textstats import PUNCT_MARKS


def describe_sentence_structure(sentence_lengths: Column) -> Column:
    """avg(sentence word-lengths) <10 short / >20 long / else mixed
    (18:22-32)."""
    n = F.size(sentence_lengths)
    avg = (F.aggregate(sentence_lengths, F.lit(0),
                       lambda acc, x: acc + x).cast("double") / n)
    return (F.when((sentence_lengths.isNull()) | (n == 0),
                   F.lit("No sentences found."))
             .when(avg < 10, F.lit("Short sentences, suggesting brevity and conciseness."))
             .when(avg > 20, F.lit("Long and complex sentences, indicating a detailed and elaborate style."))
             .otherwise(F.lit("A mix of short and long sentences, showing a balanced style.")))


def describe_vocabulary_usage(vocab_count: Column, post_text: Column) -> Column:
    """unique/alpha-token ratio bins .5/.35/.25/.15 (18:34-49). Note
    the reference recomputes words as isalpha()-filtered split — NOT
    the same tokens as vocabulary_usage itself (SURVEY §2.9)."""
    # PY_ALPHA_CHAR (unicode letters + the measured Unicode-14-vs-13
    # skew ranges), not bare \p{L} or [A-Za-z]: the reference filters
    # with str.isalpha() under CPython's Unicode tables — the r7 fuzz
    # program caught U+9FFF counting as a word in the reference but
    # not in Java 17 (Unicode 13), shifting the vocabulary bucket;
    # the split is str.split() = unicode whitespace — all pinned by
    # the reference differential + skew-sweep tests
    from .cleaning import PY_ALPHA_CHAR, PY_WS_SPLIT
    words = F.filter(F.split(F.trim(post_text), PY_WS_SPLIT),
                     lambda w: w.rlike("^" + PY_ALPHA_CHAR + "+$"))
    total = F.size(words)
    ratio = F.when(total > 0, vocab_count.cast("double") / total).otherwise(F.lit(0.0))
    return (F.when(ratio > 0.5, F.lit("A rich vocabulary, showcasing extensive language use and depth."))
             .when(ratio > 0.35, F.lit("A developed vocabulary, indicating a wide range of language and expression."))
             .when(ratio > 0.25, F.lit("A normal vocabulary, reflecting a balanced and versatile use of language."))
             .when(ratio > 0.15, F.lit("A conservative vocabulary, suggesting a focused and deliberate choice of words."))
             .otherwise(F.lit("A very narrow vocabulary, highlighting a specific and targeted use of language.")))


def describe_line_breaks(line_breaks: Column, avg_breaks: Column) -> Column:
    """Order matters: ==0, >10, avg<0.2, else (18:51-60)."""
    return (F.when(line_breaks == 0, F.lit("No line breaks, indicating a continuous block of text."))
             .when(line_breaks > 10, F.lit("Frequent line breaks, contributing to an easy-to-read structure."))
             .when(avg_breaks < 0.2, F.lit("Fewer line breaks, indicating a more compact writing style."))
             .otherwise(F.lit("A moderate number of line breaks, balancing readability and density.")))


_PUNCT_NAMES = {
    ".": "periods", ",": "commas", "!": "exclamation marks",
    "?": "question marks", ";": "semicolons",
}


def describe_punctuation(punct_map: Column, post_text: Column) -> Column:
    """Per-mark heavy/regular clauses joined with ' ' in map insertion
    order (18:62-102); 'Standard punctuation usage.' when none fire."""
    total = F.length(post_text)
    parts = []
    for mark in PUNCT_MARKS:
        cnt = F.coalesce(punct_map.getItem(mark), F.lit(0))
        ratio = cnt.cast("double") / total
        name = _PUNCT_NAMES[mark]
        parts.append(
            F.when((cnt > 0) & (ratio > 0.02), F.lit(f"Heavy use of {name}."))
             .when((cnt > 0) & (ratio > 0.01), F.lit(f"Regular use of {name}."))
             .otherwise(F.lit(None))
        )
    joined = F.concat_ws(" ", F.array_compact(F.array(*parts)))
    return (F.when(total < 1, F.lit("No punctuation data."))
             .when(joined == "", F.lit("Standard punctuation usage."))
             .otherwise(joined))


ILLOGICAL_BULLETS = ('"', "'", '""', '#', '$', '%', '&', '(', ')', ',', '.',
                     '/', ':', ';', '<', '=', '>', '?', '@', '[', '\\', ']',
                     '^', '_', '`', '{', '|', '}')


def describe_bullet_styles(bullet_style: Column) -> Column:
    """Illogical symbols remap to '•' first (18:104-124)."""
    remapped = F.when(bullet_style.isin(*ILLOGICAL_BULLETS), F.lit("•")) \
                .otherwise(bullet_style)
    return (F.when(remapped.isNull(),
                   F.lit("No specific bullet style, indicating a straightforward narrative style."))
             .when(remapped == "Differing Emojis",
                   F.lit("Uses varying emojis as bullet points, adding a casual and modern touch."))
             .when(remapped == "EmojiBullets",
                   F.lit("Uses multiple emojis as bullet points, bringing a fun, visually engaging style."))
             .when(remapped == "Mixed Bullet Styles",
                   F.lit("Multiple bullet styles detected, indicating a creative or varied structuring."))
             .otherwise(F.concat(F.lit("Uses "), remapped,
                                 F.lit(" for bullet points, indicating a structured format."))))


def describe_topic_shifts(shift_scores: Column) -> Column:
    """Max shift_score bins .8/.6/.4/.2 (18:125-151). Takes the
    array<double> of scores (callers project struct.shift_score)."""
    mx = F.array_max(shift_scores)
    consistent = "Consistent topic focus, highlighting a thorough exploration of a single subject."
    return (F.when(shift_scores.isNull() | (F.size(shift_scores) == 0), F.lit(consistent))
             .when(mx > 0.8, F.lit("Dynamic topic shifts, showing a highly versatile and engaging writing style."))
             .when(mx > 0.6, F.lit("Regular topic shifts, reflecting a balanced and varied approach."))
             .when(mx > 0.4, F.lit("Moderate topic shifts, indicating a well-rounded but focused narrative."))
             .when(mx > 0.2, F.lit("Conservative topic shifts, suggesting a cautious approach to topic changes."))
             .otherwise(F.lit("Consistent topic focus, highlighting a deep and thorough exploration of subjects.")))


_FLOW_TEXT_FIRST = {
    "Introduction/Setup": "introducing the subject",
    "Introduction/Development": "introducing or expanding on key concepts",
    "Conflict/Resolution Point": "highlighting conflict or resolution",
    "Transition/Reflection": "shifting into reflection or transitioning between ideas",
}
_FLOW_TEXT_LATER = dict(_FLOW_TEXT_FIRST,
                        **{"Introduction/Setup": "setting up a new idea"})


def describe_narrative_flow(flow: Column) -> Column:
    """<=4 labels -> '; then '-joined phrases; more -> 'complex'
    (18:152-185). Position 0 of Introduction/Setup reads differently."""
    def phrase(label: Column, is_first: bool) -> Column:
        table = _FLOW_TEXT_FIRST if is_first else _FLOW_TEXT_LATER
        expr = label  # fallback: the raw label
        for k, v in table.items():
            expr = F.when(label == k, F.lit(v)).otherwise(expr)
        return expr

    phrases = F.zip_with(
        flow,
        F.sequence(F.lit(0), F.size(flow) - 1),
        lambda lbl, i: F.when(i == 0, phrase(lbl, True)).otherwise(phrase(lbl, False)),
    )
    combined = F.array_join(phrases, "; then ")
    return (F.when(flow.isNull() | (F.size(flow) == 0),
                   F.lit("No discernible narrative flow detected."))
             .when(F.size(flow) <= 4,
                   F.concat(F.lit("The narrative flow includes: "), combined, F.lit(".")))
             .otherwise(F.lit("A complex narrative flow that progresses through multiple stages, "
                              "indicating a dynamic and layered storytelling approach.")))


def describe_pacing(pacing: Column) -> Column:
    return (F.when(pacing == "Short/Not Enough Data",
                   F.lit("Pacing analysis is inconclusive due to the brevity of the text."))
             .otherwise(F.concat(F.lit("The pacing is described as '"), pacing,
                                 F.lit("', indicating the rhythm and speed of the narrative."))))


_ARC_DESCRIPTIONS = {
    "Upward Trend": "A steadily rising sentiment, indicating an increasingly positive or hopeful tone.",
    "Downward Trend": "A consistently declining sentiment, suggesting a shift toward negativity or seriousness.",
    "Stable": "A relatively stable sentiment, implying a consistent emotional tone throughout.",
    "Complex/Variable": "A multifaceted sentiment arc with multiple ups and downs, reflecting a nuanced emotional journey.",
    "Short/Not Enough Data for Arc": "Insufficient length to determine a clear sentiment progression.",
    "Positive": "Overall positive tone, conveying optimism or encouragement.",
    "Negative": "Overall negative tone, conveying concern or seriousness.",
    "Neutral": "Balanced tone without a strong emotional shift.",
}


def describe_sentiment_arc(arc: Column) -> Column:
    expr = F.lit("A diverse emotional range, showcasing a dynamic and unpredictable sentiment.")
    for k, v in reversed(list(_ARC_DESCRIPTIONS.items())):
        expr = F.when(arc == k, F.lit(v)).otherwise(expr)
    return expr


def describe_phrases(phrases: Column) -> Column:
    return (F.when(phrases.isNull() | (F.size(phrases) == 0),
                   F.lit("No particularly common or distinctive phrases identified."))
             .otherwise(F.array_join(phrases, ", ")))


STRUCTURE_COMMANDS = {
    "instructional": "Create a LinkedIn post that **shares a step-by-step guide**",
    "reflective": "Create a LinkedIn post that **reflects on an experience**",
    "inspirational": "Create a LinkedIn post that **inspires and motivates**",
    "controversial": "Create a LinkedIn post that **challenges popular opinions**",
    "insightful": "Create a LinkedIn post that **offers keen observations**",
    "comparative": "Create a LinkedIn post that **compares two or more items**",
    "announcement": "Create a LinkedIn post that **announces something new**",
}


def structure_command(structure: Column,
                      default: str = "Create a LinkedIn post") -> Column:
    expr = F.lit(default)
    for k, v in reversed(STRUCTURE_COMMANDS.items()):
        expr = F.when(structure == k, F.lit(v)).otherwise(expr)
    return expr


def writing_style_summary(structure: Column, topic: Column, key_msg: Column,
                          max_length: Column, tone: Column,
                          emoji_usage: Column, *,
                          slens: Column | None = None,
                          post_text: Column | None = None,
                          vocab_count: Column | None = None,
                          common_phrases: Column | None = None,
                          divider_style: Column | None = None,
                          line_breaks: Column | None = None,
                          avg_breaks: Column | None = None,
                          punct_map: Column | None = None,
                          bullet_style: Column | None = None,
                          shift_scores: Column | None = None,
                          flow: Column | None = None,
                          pacing_label: Column | None = None,
                          arc_label: Column | None = None,
                          profanity: Column | None = None,
                          include_writing_style: bool = True) -> Column:
    """generate_writing_style_summary (18:245-354): the final markdown
    prompt — head + constraints + NULL-gated style-feature sections,
    joined with newlines. One concat_ws over an array_compact'd array;
    entirely native."""
    items: list[Column] = [
        F.lit("# Request"),
        F.concat(structure_command(structure),
                 F.lit(" **on the topic of**: `"), topic, F.lit("`\n")),
        F.lit("### Key Message"),
        F.concat(F.lit("```\n"), key_msg, F.lit("\n```")),
        F.lit("### Writing Constraints"),
        F.concat(F.lit("- **Suggested Post Length**: "), max_length),
        F.concat(F.lit("- **Emoji Usage**: "), emoji_usage),
        F.concat(F.lit("- **Tone**: "), tone),
    ]
    if include_writing_style:
        items.append(F.lit("### Writing Style Features"))

        def sec(present: Column, label: str, body: Column) -> Column:
            return F.when(present, F.concat(F.lit(f"- **{label}**: "), body))

        if slens is not None:
            items.append(sec(slens.isNotNull(), "Sentence Structure",
                             describe_sentence_structure(slens)))
        if vocab_count is not None:
            items.append(sec(vocab_count.isNotNull(), "Vocabulary Usage",
                             describe_vocabulary_usage(vocab_count, post_text)))
        if common_phrases is not None:
            items.append(sec(F.size(common_phrases) > 0, "Common Phrases",
                             describe_phrases(common_phrases)))
        if divider_style is not None:
            items.append(F.when(divider_style.isNotNull(),
                                F.concat(F.lit("- **Section Divider**: `"),
                                         divider_style, F.lit("`"))))
        if line_breaks is not None:
            items.append(sec(line_breaks.isNotNull() & avg_breaks.isNotNull(),
                             "Line Break Usage",
                             describe_line_breaks(line_breaks, avg_breaks)))
        if punct_map is not None:
            items.append(sec(punct_map.isNotNull(), "Punctuation",
                             describe_punctuation(punct_map, post_text)))
        if bullet_style is not None:
            # NULL bullet_style is a real value ('no specific style');
            # the section is gated on the FIELD being present upstream,
            # which callers encode by passing a non-null sentinel or
            # pre-gating; here we gate on non-null like the reference's
            # dict-key check.
            items.append(sec(bullet_style.isNotNull(), "Bullet Styles",
                             describe_bullet_styles(bullet_style)))
        if shift_scores is not None:
            items.append(sec(shift_scores.isNotNull(), "Topic Shifts",
                             describe_topic_shifts(shift_scores)))
        if flow is not None:
            items.append(sec(flow.isNotNull(), "Narrative Flow",
                             describe_narrative_flow(flow)))
        if pacing_label is not None:
            items.append(sec(pacing_label.isNotNull(), "Pacing",
                             describe_pacing(pacing_label)))
        if arc_label is not None:
            items.append(sec(arc_label.isNotNull(), "Sentiment Arc",
                             describe_sentiment_arc(arc_label)))
        if profanity is not None:
            items.append(sec(profanity.isNotNull(), "Profanity Level",
                             profanity))
    return F.array_join(F.array_compact(F.array(*items)), "\n")

"""Stage-22 fan-out: one post -> up to 5 (system, prompt, chosen,
rejected) training rows (22-generate-dataset.py:99-190; SURVEY F1).

Expressed as a conditional struct array + inline explode — a UDTF
shape with zero Python. The reference's run-id double-write (SURVEY
Q2: ``csvwriter = std_writer`` alias writes every row twice) is NOT
reproduced — documented deviation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SYSTEM_MESSAGE = (
    "Below is an instruction from the user that describes a task. It is "
    "crucial to avoid making up any facts or mentioning entities that are "
    "not explicitly stated in the instruction. Strictly adhere to the "
    "information provided and do not introduce any external or irrelevant "
    "details."
)

# Exact templates from 22-generate-dataset.py:20-97, split at the
# {post_text} interpolation point.
TOPIC_PREFIX = """## Prompt
Analyze the following social media post and identify its primary topic **in a single phrase or sentence**.

### Content to Analyze
```
"""
TOPIC_SUFFIX = """
```

### Writing Constraints
- **Response Type**: Topic classification
- **Format**: Single phrase or short sentence
- **Tone**: Analytical, objective
- **Length**: Keep your response under 10 words
"""

OPINION_PREFIX = """# Request
Extract the core opinion from this social media post and present it in first person.

## Content to Analyze
```
"""
OPINION_SUFFIX = """
```

## Writing Constraints
- **Response Type**: Opinion statement
- **Format**: First-person perspective
- **Tone**: Match the author's voice
- **Length**: One or two sentences
"""

TONE_LIST = (
    "Adventurous, Artistic, Assertive, Authoritative, Bold, Bright, Calm, "
    "Capable, Caring, Casual, Charming, Cheerful, Clever, Cocky, Colorful, "
    "Comfortable, Conversational, Creative, Daring, Delightful, Detailed, "
    "Dramatic, Dry, Eccentric, Elegant, Endearing, Energetic, Engaging, "
    "Exciting, Fabulous, Fancy, Fierce, Formal, Friendly, Fun, Futuristic, "
    "Glamorous, Honorable, Industrial, Informative, Inspiring, Intense, "
    "Inviting, Lively, Natural, No-nonsense, Persuasive, Playful, Powerful, "
    "Professional, Quirky, Rebellious, Reliable, Sarcastic, Savvy, Scholarly, "
    "Secure, Serious, Silly, Sleek, Smart, Soothing, Sophisticated, Stable, "
    "Stimulating, Strong, Swanky, Tasteful, Thoughtful, Trustworthy, "
    "Unconventional, Unique, Upbeat, Versatile, Whimsical, Witty."
)

TONE_PREFIX = """# Request
Analyze this social media post and identify up to three primary tones from the provided list.

## Content to Analyze
```
"""
TONE_SUFFIX = f"""
```

## Available Tones
{TONE_LIST}

## Writing Constraints
- **Response Type**: Tone classification
- **Format**: Comma-separated list
- **Maximum Selections**: Three tones
- **Prohibited**: No explanations or additional text
"""

STRUCTURE_PREFIX = """# Request
Classify the structural format of this social media post using the provided categories.

## Content to Analyze
```
"""
STRUCTURE_SUFFIX = """
```

## Structure Categories
- **Instructional**: Posts offering practical, step-by-step advice
- **Inspirational**: Posts that share success stories or words of encouragement
- **Controversial**: Posts that challenge conventional wisdom or popular opinion
- **Insightful**: Posts sharing thoughts on current events or industry changes
- **Comparative**: Posts that compare two or more things
- **Reflective**: Posts reflecting on past experiences
- **Announcement**: Posts that grow excitement for something new

## Writing Constraints
- **Response Type**: Structure classification
- **Format**: Single word (category name only)
- **Required**: Choose exactly one category
"""


def _wrap(prefix: str, text: Column, suffix: str) -> Column:
    return F.concat(F.lit(prefix), text, F.lit(suffix))


def topic_prompt(post_text: Column) -> Column:
    return _wrap(TOPIC_PREFIX, post_text, TOPIC_SUFFIX)


def opinion_prompt(post_text: Column) -> Column:
    return _wrap(OPINION_PREFIX, post_text, OPINION_SUFFIX)


def tone_prompt(post_text: Column) -> Column:
    return _wrap(TONE_PREFIX, post_text, TONE_SUFFIX)


def structure_prompt(post_text: Column) -> Column:
    return _wrap(STRUCTURE_PREFIX, post_text, STRUCTURE_SUFFIX)


def generate_training_pairs(posts: DataFrame, id_cols: tuple[str, ...] = (),
                            post_text: str = "post_text") -> DataFrame:
    """Fan each post out into up to 5 training rows, one per non-null
    source field, preserving the reference's emission order
    (topic, opinion, tone, structure, post-generation).

    Output schema: *id_cols, pair_idx int, system/prompt/chosen/
    rejected string. Rows with empty post_text are dropped first
    (22:137-139). Generation-prompt rows use the post's own ``prompt``
    field with post_text as chosen (22:177-183).

    r8 (optimization round): the candidate-struct array is a CONSTANT
    Column tree over fixed column names — five template concats whose
    big string literals cost ~350 ms of py4j round-trips per build —
    so it is built once per JVM gateway via session.cached_exprs
    (the q26 idiom) and shared by every caller (q22, qe2e, q23
    family).
    """
    from ..session import cached_exprs

    text = F.col(post_text)

    def _build_kept() -> Column:
        candidates = F.array(
            F.struct(F.lit(0).alias("pair_idx"),
                     topic_prompt(text).alias("prompt"),
                     F.col("topic").alias("chosen")),
            F.struct(F.lit(1).alias("pair_idx"),
                     opinion_prompt(text).alias("prompt"),
                     F.col("opinion").alias("chosen")),
            F.struct(F.lit(2).alias("pair_idx"),
                     tone_prompt(text).alias("prompt"),
                     F.col("tone").alias("chosen")),
            F.struct(F.lit(3).alias("pair_idx"),
                     structure_prompt(text).alias("prompt"),
                     F.col("structure").alias("chosen")),
            F.struct(F.lit(4).alias("pair_idx"),
                     F.col("prompt").alias("prompt"),
                     text.alias("chosen")),
        )
        return F.filter(candidates,
                        lambda c: c.getField("chosen").isNotNull()
                        & c.getField("prompt").isNotNull())

    kept = cached_exprs(f"fanout_candidates:{post_text}", _build_kept)
    out = (posts.filter(text.isNotNull() & (text != ""))
                .select(*id_cols, F.explode(kept).alias("pair")))
    return out.select(
        *id_cols,
        F.col("pair.pair_idx").alias("pair_idx"),
        F.lit(SYSTEM_MESSAGE).alias("system"),
        F.col("pair.prompt").alias("prompt"),
        F.col("pair.chosen").alias("chosen"),
        F.lit(None).cast("string").alias("rejected"),
    )

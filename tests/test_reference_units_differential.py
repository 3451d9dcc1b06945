"""Unit-level differentials against REFERENCE functions (r7).

The stage-level differential (test_reference_differential.py) covers
the pipeline scripts; six reward/feature functions the engine
re-expresses natively are additionally runnable as genuine reference
code in this sandbox and get their own function-level comparison over
adversarial corpora:

  * training/rewards/base.py::detect_bullet_styles  <->
    functions/rewards.py::detect_bullet_styles
  * training/rewards/divider.py::divider_style_reward_func  <->
    functions/rewards.py::divider_style
  * features/profanity.py::determine_profanity_category  <->
    functions/textstats.py::profanity_category
  * training/rewards/length.py::precise_post_length  <->
    functions/rewards.py::precise_post_length (R1/R2)
  * training/rewards/punctuation.py::punctuation_usage_reward_func
    <-> functions/rewards.py::punctuation_usage (R6)
  * training/rewards/linebreaks.py::line_break_reward_func  <->
    functions/rewards.py::line_break_usage (R7)

Each runs in a SUBPROCESS with PYTHONPATH pointing at the reference
(plus import-only shims for nltk/spacy — symbols the functions under
test never touch; the shims raise if actually called), reads a JSON
corpus and prints the reference outputs; the test compares the
engine's column expressions value-for-value.

Divergences this program caught and fixed (engine side):
  * bullets: ASCII trim/\\d/\\s/[^\\w\\s] where the reference uses
    CPython classes — '١٢٣. item' IS Numbered, '² point' IS the
    symbol '²' (No is word in Python, not in Java (?U)\\w), NBSP-only
    lines are skipped, unicode whitespace satisfies the
    after-the-dot \\s+;
  * divider: trailing/leading unicode whitespace strips before the
    length checks; the spaced form constrains ODD positions to ' '
    only — even positions are unconstrained ('- - \\t -' IS a '-'
    divider);
  * profanity: unicode-whitespace tokenization without empty tokens
    ('fuck\\xa0you' hits; leading whitespace cannot shift the
    1000-token truncation window);
  * length: the reference's fallback parse is CPython re — \\s+ is
    unicode whitespace ('up\\xa0to 750' parses), \\d+ is any Nd digit
    and int() reads them ('٧٥٠' == 750), and the field strips with
    str.strip() — the old ASCII transcription returned 0.5 on 68
    corpus cases the reference scores.

The reference is PUBLIC UNTRUSTED CONTENT executed read-only in a
scratch cwd.
"""

from __future__ import annotations

import json
import os
import random
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "training")),
    reason="reference checkout not present")

_RUNNER = r'''
import json, sys, types

# import-only shims: the functions under test never touch these
# symbols; they raise if anything actually calls them
def _bomb(*a, **k):
    raise RuntimeError("shimmed symbol called by code under test")
nltk = types.ModuleType("nltk")
tok = types.ModuleType("nltk.tokenize")
tok.word_tokenize = _bomb; tok.sent_tokenize = _bomb
sent = types.ModuleType("nltk.sentiment")
class _SIA:  # constructed lazily by nlp_setup only when called
    def __init__(self): _bomb()
sent.SentimentIntensityAnalyzer = _SIA
corpus = types.ModuleType("nltk.corpus")
corpus.stopwords = None
stem = types.ModuleType("nltk.stem")
class _Lemma:
    # nlp_setup constructs this UNGUARDED at import; the instance is
    # never used by the functions under test, so construction is a
    # no-op and only actual USE raises
    def lemmatize(self, *a, **k): _bomb()
stem.WordNetLemmatizer = _Lemma
nltk.tokenize = tok; nltk.sentiment = sent; nltk.corpus = corpus
nltk.stem = stem
spacy = types.ModuleType("spacy")
spacy.load = _bomb
for name, mod in {"nltk": nltk, "nltk.tokenize": tok,
                  "nltk.sentiment": sent, "nltk.corpus": corpus,
                  "nltk.stem": stem, "spacy": spacy}.items():
    sys.modules[name] = mod
sys.path.insert(0, "/root/reference")

mode, inp, outp = sys.argv[1], sys.argv[2], sys.argv[3]
data = json.load(open(inp, encoding="utf-8"))
if mode == "bullets":
    from training.rewards.base import detect_bullet_styles
    out = [detect_bullet_styles(t) for t in data]
elif mode == "divider":
    from training.rewards.divider import divider_style_reward_func
    out = divider_style_reward_func([p for p, c in data],
                                    [c for p, c in data])
elif mode == "profanity":
    from features.profanity import determine_profanity_category
    out = [determine_profanity_category(t) for t in data]
elif mode == "length":
    from training.rewards.length import precise_post_length
    out = precise_post_length([p for p, c in data], [c for p, c in data])
elif mode == "punctuation":
    from training.rewards.punctuation import punctuation_usage_reward_func
    out = punctuation_usage_reward_func([p for p, c in data],
                                        [c for p, c in data])
elif mode == "linebreaks":
    from training.rewards.linebreaks import line_break_reward_func
    out = line_break_reward_func([p for p, c in data],
                                 [c for p, c in data])
elif mode == "bullets17":
    from features.bullets import detect_bullet_styles
    from features.context import FeatureContext
    ctx = FeatureContext.from_spacy(None)
    out = [detect_bullet_styles(t, ctx) for t in data]
elif mode == "bullets17_emoji":
    # the emojis package INSTALLED (shimmed): count(ch) truthy iff ch
    # is an engine-emoji-class codepoint that is NOT Python \w —
    # single-codepoint RGI emoji are all category So (never \w), so
    # the word-class codepoints the engine's broader class admits
    # (dingbat circled digits U+2776..) must not count, exactly like
    # the real package's shortcode DB
    import re as _re
    _em = _re.compile(data["pattern"])
    _w = _re.compile(r"\w")
    emojis_mod = types.ModuleType("emojis")
    emojis_mod.count = lambda s: sum(
        1 for ch in s if _em.match(ch) and not _w.match(ch))
    sys.modules["emojis"] = emojis_mod
    from features.bullets import detect_bullet_styles
    from features.context import FeatureContext
    ctx = FeatureContext.from_spacy(None)
    out = [detect_bullet_styles(t, ctx) for t in data["texts"]]
elif mode == "dividers17":
    from features.dividers import detect_divider_styles
    from features.context import FeatureContext
    ctx = FeatureContext.from_spacy(None)
    out = [detect_divider_styles(t, ctx) for t in data]
elif mode == "hashtags":
    from training.rewards.hashtags import hashtag_limit_reward_func
    out = hashtag_limit_reward_func([""] * len(data), data)
elif mode == "chinese":
    from training.rewards.language import chinese_character_reward_func
    out = chinese_character_reward_func([""] * len(data), data)
elif mode == "scenarios":
    from training.grpo.scenarios import (get_scenario_type,
                                         normalize_scenario_score)
    out = [[get_scenario_type(p),
            normalize_scenario_score(s, get_scenario_type(p))]
           for p, s in data]
elif mode == "emoji_variety":
    # the `emojis` package is absent from this sandbox; shim its
    # count() with the engine's measured emoji class so THIS
    # differential pins the ratio/uniqueness/bin arithmetic (the
    # membership set itself is by-construction shared — documented
    # in the test)
    import re as _re
    _em = _re.compile(data["pattern"])
    emojis_mod = types.ModuleType("emojis")
    emojis_mod.count = lambda s: len(_em.findall(s))
    sys.modules["emojis"] = emojis_mod
    from training.rewards.emoji_variety import emoji_variety_reward
    out = [emoji_variety_reward(t) for t in data["texts"]]
elif mode == "aggregator":
    from training.rewards.aggregator import aggregate_rewards
    from training.rewards.hashtags import hashtag_limit_reward_func
    from training.rewards.language import chinese_character_reward_func

    def _boom(prompts, completions):
        raise RuntimeError("per-func failure path")

    def _half(prompts, completions):
        return [0.5] * len(completions)

    def _overscale(prompts, completions):
        return [1.0 + 0.25 * (i % 4) for i in range(len(completions))]

    funcs = {"hash": hashtag_limit_reward_func,
             "cjk": chinese_character_reward_func,
             "boom": _boom, "half": _half, "big": _overscale}
    comps = data["completions"]
    prompts = [""] * len(comps)
    out = {
        "plain": aggregate_rewards(prompts, comps, funcs,
                                   data["weights"]),
        "clip": aggregate_rewards(prompts, comps, funcs,
                                  data["weights"], normalize="clip"),
        "zero_w": aggregate_rewards(prompts, comps, funcs,
                                    {k: 0.0 for k in funcs}),
    }
elif mode == "length_grpo":
    from training.grpo.prompt_parsing import parse_writing_style_block
    from training.rewards.length import precise_post_length_reward
    out = [precise_post_length_reward(
               parse_writing_style_block(p).get("post_length_requirement"),
               c)
           for p, c in data]
elif mode == "emoji_enhanced":
    import re as _re
    _em = _re.compile(data["pattern"])
    emojis_mod = types.ModuleType("emojis")
    emojis_mod.count = lambda s: len(_em.findall(s))
    sys.modules["emojis"] = emojis_mod
    from training.grpo.prompt_parsing import parse_writing_style_block
    from training.rewards.emoji import enhanced_emoji_usage_reward
    out = [enhanced_emoji_usage_reward(
               parse_writing_style_block(p).get("emoji_usage_requirement"),
               c)
           for p, c in data["pairs"]]
elif mode == "emoji_coarse":
    import re as _re
    _em = _re.compile(data["pattern"])
    emojis_mod = types.ModuleType("emojis")
    emojis_mod.count = lambda s: len(_em.findall(s))
    sys.modules["emojis"] = emojis_mod
    from training.rewards.emoji import emoji_usage_reward
    out = [emoji_usage_reward(req, c) for req, c in data["pairs"]]
elif mode == "fabrication":
    # word_tokenize shim = str.split(): the corpus keeps NAME-bearing
    # text space-separated (where treebank tokenization and split()
    # agree by construction), so THIS differential pins the URL
    # branch logic, new-name counting/cap/lowered-membership, the
    # first-char upper-alpha class, promo/action phrase gating, the
    # topic/key-message extraction regexes, and the penalty clamp —
    # tokenization of punctuation-adjacent text stays the engine's
    # documented deviation (functions/rewards.py module docstring)
    sys.modules["nltk.tokenize"].word_tokenize = lambda s: s.split()
    from training.rewards.fabrication import (
        fabrication_detection_reward_func)
    out = fabrication_detection_reward_func([p for p, c in data],
                                            [c for p, c in data])
elif mode == "vocabulary":
    # same shim + pure-alpha space-separated corpus: proves the field
    # parse (case-sensitive name, substring keyword precedence), the
    # unique/total ratio arithmetic and ALL four bin ladders, and the
    # 0.5/0.2 fallback order; word_tokenize-vs-[a-z]+ tokenization of
    # general text is the documented deviation
    sys.modules["nltk.tokenize"].word_tokenize = lambda s: s.split()
    from training.rewards.vocabulary import vocabulary_usage_reward_func
    out = vocabulary_usage_reward_func([p for p, c in data],
                                       [c for p, c in data])
elif mode in ("tone", "sent_structure", "narrative", "semantic",
              "topics", "arcpacing"):
    # declared seams = the engine's documented deviations, injected at
    # the reference's own extension points (sent_tokenize /
    # word_tokenize / VADER / spaCy similarity); every OTHER line of
    # tone.py / structure.py / narrative.py / semantic.py / topics.py
    # / base.py runs as genuine reference code
    import re as _re
    POS, NEG = set(data["pos"]), set(data["neg"])

    def _sent_tok(t):
        return [s for s in (x.strip(" ") for x in _re.split(r"[.!?]+", t))
                if s]

    def _compound(s):
        toks = s.lower().split()
        p = sum(t in POS for t in toks)
        n = sum(t in NEG for t in toks)
        return max(-1.0, min(1.0, 5.0 * (p - n) / max(len(toks), 1)))

    class _MiniSIA:
        def polarity_scores(self, s):
            return {"compound": _compound(s)}

    tok.sent_tokenize = _sent_tok
    tok.word_tokenize = lambda s: s.split()
    sent.SentimentIntensityAnalyzer = _MiniSIA
    pairs = data["pairs"]
    ps, cs = [p for p, c in pairs], [c for p, c in pairs]
    if mode == "topics":
        class _Doc:
            def __init__(self, text):
                self.t = set(text.lower().split())

            def similarity(self, other):
                u = len(self.t | other.t)
                return (len(self.t & other.t) / u) if u else 0.0
        spacy.load = lambda name: (lambda p: _Doc(p))
        from training.rewards.topics import topic_shifts_reward_func
        out = topic_shifts_reward_func(ps, cs)
    elif mode == "tone":
        from training.rewards.tone import tone_alignment_reward_func
        out = tone_alignment_reward_func(ps, cs)
    elif mode == "sent_structure":
        from training.rewards.structure import (
            sentence_structure_reward_func)
        out = sentence_structure_reward_func(ps, cs)
    elif mode == "narrative":
        from training.rewards.narrative import (
            narrative_structure_reward_func)
        out = narrative_structure_reward_func(ps, cs)
    elif mode == "semantic":
        from training.rewards.semantic import semantic_coherence_reward
        out = semantic_coherence_reward(ps, cs)
    else:  # arcpacing: the base.py labels themselves
        from training.rewards import base as rb
        out = [[rb.analyze_sentiment_arc(rb.get_sentiment_scores(c)),
                rb.analyze_pacing(c)] for c in cs]
elif mode in ("feat_narrative", "arc_slope", "text_stats"):
    # features/narrative.py + features/text_stats.py (stage-17
    # feature flavors).  line/punct stats are PURE stdlib (no seams);
    # sentence/token seams as in the sentiment-family modes;
    # arc_slope takes raw score lists so np.polyfit runs genuinely.
    import re as _re
    tok.sent_tokenize = lambda t: [
        s for s in (x.strip(" ") for x in _re.split(r"[.!?]+", t)) if s]
    tok.word_tokenize = lambda s: s.split()
    if mode == "feat_narrative":
        from features.narrative import (analyze_narrative_flow,
                                        analyze_pacing)
        out = [[analyze_narrative_flow(t), analyze_pacing(t)]
               for t in data]
    elif mode == "arc_slope":
        from features.narrative import analyze_sentiment_arc
        out = [analyze_sentiment_arc(scores) for scores in data]
    else:
        from features.text_stats import (analyze_line_breaks,
                                         analyze_sentence_structure,
                                         analyze_vocabulary_usage,
                                         punctuation_counts)
        out = []
        for t in data:
            lb, ab = analyze_line_breaks(t)
            out.append([lb, ab, punctuation_counts(t),
                        analyze_sentence_structure(t),
                        analyze_vocabulary_usage(t)])
elif mode == "violations":
    from utils.violations import violate_hashtags, violate_length
    out = []
    for text, kind in data:
        if kind == "hashtags":
            out.append(violate_hashtags(text))
        elif kind == "under":
            out.append(violate_length(text, target="under"))
        else:
            out.append(violate_length(text, target="over"))
else:
    raise SystemExit(2)
json.dump(out, open(outp, "w", encoding="utf-8"))
'''


def _run_ref_units(mode: str, payload, tmp_path):
    inp = tmp_path / f"{mode}-in.json"
    outp = tmp_path / f"{mode}-out.json"
    inp.write_text(json.dumps(payload, ensure_ascii=True),
                   encoding="utf-8")
    r = subprocess.run([sys.executable, "-c", _RUNNER, mode, str(inp),
                        str(outp)],
                       capture_output=True, text=True, timeout=300,
                       cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-3000:]
    return json.loads(outp.read_text(encoding="utf-8"))


_WS = ("\t", "\n", "\x0b", "\x1c", "\x85", " ", " ",
       " ", "　", " ")
_SYMS = ("-", "•", "*", "~", "(", "#", "¡", "§", "²", "½", "Ⅳ",
         "🚀", "一", "٣", "𝄞", "´", "́")


def _bullet_corpus(seed: int = 424242, n: int = 400) -> list[str]:
    rng = random.Random(seed)
    texts = [
        "1. first\n2. second\n3. third",
        "a) alpha\nb) beta",
        "• dot one\n• dot two",
        "- dash\n• dot",                     # mixed
        "١٢٣. arabic-indic numbered line",   # unicode digits
        "１２. fullwidth digits",             # Nd fullwidth
        "𖭐𖭑. tangsa-adjacent digits",
        "² superscript-led line",            # No: word in Python
        "½ vulgar fraction lead",
        "Ⅳ) roman numeral",                  # Nl
        "一 cjk-led line",                    # letter in both
        "🚀 emoji-led line\n🚀 again",
        "´ acute-accent lead",               # Sk symbol
        "́combining-mark lead",         # Mn: word in Java only
        "1.\nno trailing space",             # dot without \s+
        "1. nbsp after dot",            # unicode \s+ after dot
        "     ",                        # ws-only line
        "plain text no bullets",
        "\t1. tab-led numbered",
        "　1. ideographic-space led",
    ]
    for _ in range(n):
        lines = []
        for _ in range(rng.randint(1, 5)):
            kind = rng.random()
            pad = rng.choice(_WS) * rng.randint(0, 2)
            if kind < 0.3:
                lines.append(f"{pad}{rng.randint(1, 99)}"
                             f"{rng.choice('.)')}"
                             f"{rng.choice(_WS)}item")
            elif kind < 0.45:
                lines.append(f"{pad}{rng.choice('abXY')}"
                             f"{rng.choice('.)')} item")
            elif kind < 0.75:
                lines.append(f"{pad}{rng.choice(_SYMS)} point")
            elif kind < 0.85:
                lines.append(pad)
            else:
                lines.append("plain words here")
        texts.append("\n".join(lines))
    return texts


def test_bullet_detector_matches_reference(spark, tmp_path):
    from social_media_ai_engineering_etl_spark.functions.rewards import (
        detect_bullet_styles)
    texts = _bullet_corpus()
    want = _run_ref_units("bullets", texts, tmp_path)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    got = {r.i: r.b for r in df.select(
        "i", detect_bullet_styles(F.col("t")).alias("b")).collect()}
    bad = [(texts[i], got[i], want[i]) for i in range(len(texts))
           if got[i] != want[i]]
    assert not bad, bad[:5]
    # non-degeneracy: every label class appeared
    seen = {v for v in want if v}
    assert "Numbers" in seen and "Letters" in seen
    assert "Mixed Bullet Styles" in seen and None in set(want)


def _divider_corpus(seed: int = 777, n: int = 300):
    rng = random.Random(seed)
    pairs = [
        ("**Section Divider**: `-`", "text\n---\nmore"),
        ("**Section Divider**: `*`", "text\n----\nmore"),      # 0.3
        ("**Section Divider**: `~`", "no dividers at all"),    # 0.0
        ("no divider requested", "text\n***\n"),               # 0.5
        ("**Section Divider**: `-`", "x\n- - -\ny"),           # spaced
        ("**Section Divider**: `-`", "x\n- - \t -\ny"),        # even pos \t
        ("**Section Divider**: `-`", "x\n　---　\ny"),  # uni-ws pad
        ("**Section Divider**: `-`", "x\n---\ny"),        # nbsp in req
        ("**Section Divider**: `—`", "x\n———\ny"),             # em-dash
        ("**Section Divider**: `*`", "x\n**\ny"),              # len 2
        ("**Section Divider**: `-`", "x\n- -\ny"),             # len < 5
    ]
    syms = "-*~=—·"
    for _ in range(n):
        req = rng.choice(syms)
        body = []
        for _ in range(rng.randint(1, 4)):
            r = rng.random()
            pad = rng.choice(_WS) * rng.randint(0, 2)
            if r < 0.4:
                body.append(pad + rng.choice(syms) * rng.randint(2, 6)
                            + pad)
            elif r < 0.6:
                c = rng.choice(syms)
                body.append(f"{c} {c} {c}")
            else:
                body.append("words " + pad)
        pairs.append((f"**Section Divider**: `{req}`",
                      "\n".join(body)))
    return pairs


def test_divider_reward_matches_reference(spark, tmp_path):
    from social_media_ai_engineering_etl_spark.functions.rewards import (
        divider_style)
    pairs = _divider_corpus()
    want = _run_ref_units("divider", pairs, tmp_path)
    df = spark.createDataFrame(
        [(i, p, c) for i, (p, c) in enumerate(pairs)],
        "i long, p string, c string")
    got = {r.i: r.s for r in df.select(
        "i", divider_style(F.col("p"), F.col("c")).alias("s")).collect()}
    bad = [(pairs[i], got[i], want[i]) for i in range(len(pairs))
           if abs(got[i] - want[i]) > 1e-9]
    assert not bad, bad[:5]
    assert {0.0, 0.3, 0.5, 1.0} <= {round(v, 1) for v in want}


_PROF_LIGHT = ("arsehole", "ass", "asshole", "bollocks", "hell",
               "piss", "pissed")
_PROF_MODERATE = ("apeshit", "bastard", "bullshit", "bitch", "damn",
                  "damnit", "holy shit", "horseshit", "shit")
_PROF_HEAVY = ("clusterfuck", "fuck", "fucker", "fuckin", "fucking",
               "goddamn", "motherfucker", "mother fucker")


def _profanity_corpus(seed: int = 1337, n: int = 300) -> list[str]:
    rng = random.Random(seed)
    words = list(_PROF_LIGHT + _PROF_MODERATE + _PROF_HEAVY)
    texts = [
        "what the hell is this",
        "HOLY SHIT that worked",            # two-token entry never hits
        "damn fine shipping",
        "fuck that noise",             # nbsp-joined token
        "   piss\tat the edges  fuck", # unicode ws tokens
        "ass, with punctuation",            # 'ass,' != 'ass'
        " ".join(["filler"] * 1000) + " fuck",    # beyond the window
        " ".join(["filler"] * 999) + " fuck",     # exactly token 1000
        "  " * 50 + "fuck " + "tail " * 10,  # leading-ws shift trap
        "",
    ]
    for _ in range(n):
        toks = rng.choices(["clean", "word", "café", "一",
                            rng.choice(words)], k=rng.randint(1, 40))
        texts.append(rng.choice(["", " ", "　"]).join([""])
                     + rng.choice(_WS).join(toks))
    return texts


def test_profanity_matches_reference(spark, tmp_path):
    from social_media_ai_engineering_etl_spark.functions.textstats import (
        profanity_category)
    texts = _profanity_corpus()
    want = _run_ref_units("profanity", texts, tmp_path)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    cat = profanity_category(F.col("t"), light=_PROF_LIGHT,
                             moderate=_PROF_MODERATE, heavy=_PROF_HEAVY)
    got = {r.i: r.c for r in df.select("i", cat.alias("c")).collect()}
    bad = [(texts[i][:60], got[i], want[i]) for i in range(len(texts))
           if got[i] != want[i]]
    assert not bad, bad[:5]
    assert {"none", "light", "moderate", "heavy"} <= set(want)


# ---------------------------------------------------------------------------
# pure-stdlib reward functions: length (R1/R2), punctuation (R6),
# line breaks (R7)
# ---------------------------------------------------------------------------

_LEN_REQS = (
    "Up to 750 characters", "up to 750 CHARACTERS",
    "Between 750 and 1,500 characters",
    "Between 1,500 and 3,000 characters",
    "up to 2,000 characters",            # generic fallback
    "UP  TO\t300 characters",            # multi-ws, case
    "up to 750 characters",         # unicode \s+ in fallback
    "up to ٧٥٠ characters",              # Nd digits, int()-readable
    "short and sweet",                   # no parse -> 0.5
    "",                                  # absent -> 0.5
    "  ",                      # ws-only field -> strip -> 0.5
)


def _length_corpus(seed: int = 9090, n: int = 250):
    rng = random.Random(seed)
    pairs = []
    # boundary lengths around every bucket edge
    edges = [0, 1, 374, 375, 749, 750, 751, 824, 825, 826, 937, 938,
             939, 1499, 1500, 1501, 1650, 1651, 1875, 1876, 2999,
             3000, 3001, 3300, 3301, 3750, 3751, 200, 2000, 2200, 2500]
    for req in _LEN_REQS:
        for ln in rng.sample(edges, 12):
            prompt = (f"## Style\n**Suggested Post Length**: {req}\n"
                      "**Emoji Usage**: low") if req else "## Style\nnone"
            pairs.append((prompt, "x" * ln))
    for _ in range(n):
        pairs.append((f"**Suggested Post Length**: {rng.choice(_LEN_REQS)}",
                      "y" * rng.randint(0, 4000)))
    return pairs


def test_length_reward_matches_reference(spark, tmp_path):
    from social_media_ai_engineering_etl_spark.functions.rewards import (
        precise_post_length)
    pairs = _length_corpus()
    runner_pairs = pairs
    want_raw = _run_ref_units("length", runner_pairs, tmp_path)
    df = spark.createDataFrame(
        [(i, p, c) for i, (p, c) in enumerate(pairs)],
        "i long, p string, c string")
    got = {r.i: r.s for r in df.select(
        "i", precise_post_length(F.col("p"), F.col("c")).alias("s"))
        .collect()}
    bad = [(pairs[i][0][:60], len(pairs[i][1]), got[i], want_raw[i])
           for i in range(len(pairs))
           if abs(got[i] - want_raw[i]) > 1e-9]
    assert not bad, bad[:6]
    assert {0.0, 0.5, 1.0} <= {round(v, 1) for v in want_raw}


_PUNCT_FIELDS = (
    "Heavy use of periods and heavy use of commas",
    "heavy use of exclamation points",
    "normal balanced punctuation",
    "heavy use of semicolons, heavy use of question marks",
    "heavy use of question marks",
    "",                                  # absent field -> 0.5
)


def _punct_corpus(seed: int = 6060, n: int = 250):
    rng = random.Random(seed)
    pairs = []
    # exact-threshold completions: freq == low/normal/heavy boundaries
    for fld in _PUNCT_FIELDS:
        for ln, marks in [(100, 1), (100, 2), (100, 3), (1000, 1),
                          (1000, 5), (1000, 10), (2000, 1), (2000, 4),
                          (0, 0), (400, 0)]:
            for ch in ".,!?;":
                body = ch * marks + "z" * max(0, ln - marks)
                prompt = (f"**Punctuation**: {fld}\nmore" if fld
                          else "no field here")
                pairs.append((prompt, body))
    for _ in range(n):
        body = "".join(rng.choices("abcde .,!?;\n", k=rng.randint(1, 800)))
        pairs.append((f"**Punctuation**: {rng.choice(_PUNCT_FIELDS)}",
                      body))
    return pairs


def test_punctuation_reward_matches_reference(spark, tmp_path):
    from social_media_ai_engineering_etl_spark.functions.rewards import (
        punctuation_usage)
    pairs = _punct_corpus()
    want = _run_ref_units("punctuation", pairs, tmp_path)
    df = spark.createDataFrame(
        [(i, p, c) for i, (p, c) in enumerate(pairs)],
        "i long, p string, c string")
    got = {r.i: r.s for r in df.select(
        "i", punctuation_usage(F.col("p"), F.col("c")).alias("s"))
        .collect()}
    bad = [(pairs[i][0][:50], pairs[i][1][:20], got[i], want[i])
           for i in range(len(pairs))
           if abs(got[i] - want[i]) > 1e-9]
    assert not bad, bad[:6]


_LB_FIELDS = ("Frequent line breaks for readability",
              "Fewer, more compact paragraphs", "compact style",
              "no line breaks, continuous prose", "continuous flow",
              "Moderate, balanced line breaks", "mystery style", "")


def _lb_corpus(seed: int = 3030, n: int = 250):
    rng = random.Random(seed)
    pairs = []
    for fld in _LB_FIELDS:
        # ratios at the documented boundaries: (lines-1)/len*100
        for total, breaks in [(100, 0), (100, 1), (200, 1), (100, 2),
                              (100, 3), (500, 1), (500, 4), (1000, 5),
                              (400, 2), (125, 1), (0, 0), (50, 1)]:
            body = ("ab\n" * breaks) + "c" * max(0, total - 3 * breaks)
            prompt = (f"**Line Break Usage**: {fld}\nnext" if fld
                      else "nothing")
            pairs.append((prompt, body))
    for _ in range(n):
        pairs.append((f"**Line Break Usage**: {rng.choice(_LB_FIELDS)}",
                      "".join(rng.choices("word \n", k=rng.randint(0, 600)))))
    return pairs


def test_linebreak_reward_matches_reference(spark, tmp_path):
    from social_media_ai_engineering_etl_spark.functions.rewards import (
        line_break_usage)
    pairs = _lb_corpus()
    want = _run_ref_units("linebreaks", pairs, tmp_path)
    df = spark.createDataFrame(
        [(i, p, c) for i, (p, c) in enumerate(pairs)],
        "i long, p string, c string")
    got = {r.i: r.s for r in df.select(
        "i", line_break_usage(F.col("p"), F.col("c")).alias("s"))
        .collect()}
    bad = [(pairs[i][0][:50], got[i], want[i]) for i in range(len(pairs))
           if abs(got[i] - want[i]) > 1e-9]
    assert not bad, bad[:6]


# ---------------------------------------------------------------------------
# stage-17 FEATURE-variant detectors (features/bullets.py,
# features/dividers.py) — distinct semantics from the reward flavor:
# 'Numbered'/'Lettered' labels, raw-line matching, most-common
# first-encountered tie-break, backreference divider runs
# ---------------------------------------------------------------------------

def _divider17_corpus(seed: int = 5151, n: int = 300) -> list[str]:
    rng = random.Random(seed)
    syms = "-*~=—·_"                    # NB: '_' is \w -> never a divider
    texts = [
        "a\n----\nb",                     # 4-run: divider
        "a\n---\nb",                      # 3-run: NOT (needs 1+3 repeats)
        "a\n****\n----\n****\nz",        # most-common '*'
        "a\n----\n****\nz",              # tie -> first encountered '-'
        "x\n\t====\t\n",                 # ws-padded (unicode strip)
        "x\n　····　\nz",                  # ideographic-space pad
        "x\n____\nz",                     # underscore: word char, no
        "x\n🚀🚀🚀🚀\nz",                  # astral backreference
        "x\n————\nz",                     # em-dash run
        "x\n- - - -\nz",                  # spaced: NOT this detector
        "no dividers here",
    ]
    for _ in range(n):
        lines = []
        for _ in range(rng.randint(1, 5)):
            r = rng.random()
            pad = rng.choice(_WS) * rng.randint(0, 2)
            if r < 0.5:
                lines.append(pad + rng.choice(syms) * rng.randint(2, 7)
                             + pad)
            else:
                lines.append("words " + pad)
        texts.append("\n".join(lines))
    return texts


def test_divider17_matches_reference(spark, tmp_path):
    from social_media_ai_engineering_etl_spark.functions.narrative17 import (
        detect_divider_style_17)
    texts = _divider17_corpus()
    want = _run_ref_units("dividers17", texts, tmp_path)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    got = {r.i: r.d for r in df.select(
        "i", detect_divider_style_17(F.col("t")).alias("d")).collect()}
    bad = [(repr(texts[i][:40]), got[i], want[i])
           for i in range(len(texts)) if got[i] != want[i]]
    assert not bad, bad[:6]
    assert any(v for v in want) and any(v is None for v in want)


# ---------------------------------------------------------------------------
# r8 (VERDICT r7 ask #6): the remaining pure-stdlib reference
# functions — hashtags (R16), language (R17), scenarios (R20),
# aggregator (R19 incl. the per-func-exception->zeros path),
# emoji_variety (R5 ratio bins), violations (P16 deterministic parts)
# ---------------------------------------------------------------------------

def _hashtag_corpus(seed: int = 2025, n: int = 300) -> list[str]:
    rng = random.Random(seed)
    texts = [
        "post body\n#one #two #three",
        "post body\n#one #two #three #four",          # 4 -> 0.8
        "#a #b #c #d #e #f #g #h #i",                 # 9 -> 0.0 floor
        "tags up here #one #two #three #four\nclean last line",
        "no newline at all #x #y #z #w",              # tail == whole
        "ends with newline #x #y\n",                  # tail == ''
        "unicode #日本語 #tag_1 #TAG2 #tag-3",         # ascii \w only
        "#__ #_a #1 #2 #3 #4",                        # _ and digits
        "midline #inline tag\n# spaced not-a-tag",
        "",
        "\n\n\n#solo",
    ]
    for _ in range(n):
        lines = [" ".join(rng.choices(
            ["word", "#tag", f"#tag{rng.randint(0, 9)}", "#日", "x#y"],
            k=rng.randint(0, 10))) for _ in range(rng.randint(1, 4))]
        texts.append("\n".join(lines))
    return texts


def test_hashtag_reward_matches_reference(spark, tmp_path):
    from social_media_ai_engineering_etl_spark.functions.rewards import (
        hashtag_limit)
    texts = _hashtag_corpus()
    want = _run_ref_units("hashtags", texts, tmp_path)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    got = {r.i: r.s for r in df.select(
        "i", hashtag_limit(F.col("t")).alias("s")).collect()}
    bad = [(repr(texts[i][:50]), got[i], want[i])
           for i in range(len(texts))
           if abs(got[i] - want[i]) > 1e-9]
    assert not bad, bad[:6]
    assert {0.0, 0.8, 1.0} <= {round(v, 1) for v in want}


def _chinese_corpus(seed: int = 4242, n: int = 200) -> list[str]:
    rng = random.Random(seed)
    texts = [
        "plain ascii", "", "emoji 🚀 only",
        "cjk 中文 inside", "\u4e00 range floor", "\u9fff range ceil",
        "\u33ff just below", "\ua000 just above",
        "\u3400 ext-A outside the reference's range",
        "katakana カタカナ outside", "hangul 한글 outside",
        "mixed 中 and latin",
    ]
    pool = ["word", "中", "文", "カ", "한", "🚀", "\u4e00", "\u9fff",
            "\u3400", "x"]
    for _ in range(n):
        texts.append("".join(rng.choices(pool, k=rng.randint(0, 30))))
    return texts


def test_chinese_guard_matches_reference(spark, tmp_path):
    from social_media_ai_engineering_etl_spark.functions.rewards import (
        chinese_character_guard)
    texts = _chinese_corpus()
    want = _run_ref_units("chinese", texts, tmp_path)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    got = {r.i: r.s for r in df.select(
        "i", chinese_character_guard(F.col("t")).alias("s")).collect()}
    bad = [(repr(texts[i][:40]), got[i], want[i])
           for i in range(len(texts))
           if abs(got[i] - want[i]) > 1e-9]
    assert not bad, bad[:6]
    assert {0.0, 1.0} == set(want)


_SCENARIO_PHRASES = (
    "Create a LinkedIn post that explains X",
    "Analyze the following social media post and identify its "
    "primary topic",
    "Extract the core opinion from this social media post and "
    "present it in first person",
    "Analyze this social media post and identify up to three "
    "primary tones",
    "Classify the structural format of this social media post",
    "Do something else entirely",
)


def _scenario_corpus(seed: int = 808, n: int = 250):
    rng = random.Random(seed)
    pairs = []
    scores = [-3.0, 0.0, 2.5, 9.999, 10.0, 10.001, 25.0, 7.3]
    for ph in _SCENARIO_PHRASES:
        for s in scores:
            pairs.append((f"## Task\n{ph}\nmore text", s))
            pairs.append((ph.upper(), s))                  # case-folded
    # precedence: prompt containing TWO phrases takes the first match
    pairs.append((_SCENARIO_PHRASES[1] + "\n" + _SCENARIO_PHRASES[0], 5.0))
    pairs.append((_SCENARIO_PHRASES[0] + "\n" + _SCENARIO_PHRASES[3], 5.0))
    # unicode case-lowering edge (Turkish dotted capital I)
    pairs.append(("CREATE A LİNKEDIN POST THAT ...", 5.0))
    for _ in range(n):
        ph = rng.choice(_SCENARIO_PHRASES)
        body = ph if rng.random() < 0.7 else ph.replace(" post", "")
        pairs.append((f"{'#' * rng.randint(0, 3)} {body}",
                      rng.uniform(-2, 15)))
    return pairs


def test_scenario_typing_matches_reference(spark, tmp_path):
    from social_media_ai_engineering_etl_spark.functions.rewards import (
        normalize_scenario_score, scenario_type)
    pairs = _scenario_corpus()
    want = _run_ref_units("scenarios", pairs, tmp_path)
    df = spark.createDataFrame(
        [(i, p, s) for i, (p, s) in enumerate(pairs)],
        "i long, p string, s double")
    got = {r.i: (r.t, r.n) for r in df.select(
        "i", scenario_type(F.col("p")).alias("t"),
        normalize_scenario_score(F.col("s")).alias("n")).collect()}
    bad = [(repr(pairs[i][0][:50]), got[i], want[i])
           for i in range(len(pairs))
           if got[i][0] != want[i][0]
           or abs(got[i][1] - want[i][1]) > 1e-12]
    assert not bad, bad[:6]
    assert set(range(6)) == {w[0] for w in want}


def _emoji_variety_corpus(seed: int = 1212, n: int = 250) -> list[str]:
    rng = random.Random(seed)
    ems = list("😀😃🔥✨👍✅❌💡📈📉🚀")
    texts = [
        "", "no emoji at all",
        "😀",                                # 1/1 -> 1.0
        "😀😀😀😀😀😀😀😀😀😀",                 # 1/10 -> 0.4
        "😀😃🔥✨👍",                          # 5/5 -> 1.0
        "😀😀😃🔥✨👍👍👍",                    # ratio 5/8 = 0.625 -> 0.6
        "😀😃🔥✨👍✅❌💡📈😀",                 # 9/10 -> 1.0 (>= 0.9)
        "text ✨ mixed 🔥 with ✨ words",
        "❤\ufe0f variation selector",        # FE0F in the class
    ]
    for _ in range(n):
        k = rng.randint(0, 25)
        texts.append("".join(rng.choices(ems + ["x", " "], k=k)))
    return texts


def test_emoji_variety_matches_reference(spark, tmp_path):
    """R5 differential.  The `emojis` package is absent from the
    sandbox, so its per-char count() is SHIMMED with the engine's
    measured emoji class — this pins the reference's ratio /
    uniqueness / bin arithmetic (total==0 -> 0.0, >=0.9/0.7/0.5
    ladder) value-for-value; set membership itself is shared by
    construction and is NOT what this test proves."""
    import re as _re

    from social_media_ai_engineering_etl_spark.functions.rewards import (
        emoji_variety)
    from social_media_ai_engineering_etl_spark.functions.textstats import (
        EMOJI_CLASS)
    py_pattern = _re.sub(r"\\x\{([0-9A-Fa-f]+)\}",
                         lambda m: re_escape_cp(int(m.group(1), 16)),
                         EMOJI_CLASS)
    texts = _emoji_variety_corpus()
    want = _run_ref_units("emoji_variety",
                          {"pattern": py_pattern, "texts": texts},
                          tmp_path)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    got = {r.i: r.s for r in df.select(
        "i", emoji_variety(F.col("t")).alias("s")).collect()}
    bad = [(repr(texts[i][:40]), got[i], want[i])
           for i in range(len(texts))
           if abs(got[i] - want[i]) > 1e-9]
    assert not bad, bad[:6]
    assert {0.0, 0.4, 0.6, 0.8, 1.0} <= {round(v, 1) for v in want}


def re_escape_cp(cp: int) -> str:
    return "\\U%08X" % cp if cp > 0xFFFF else "\\u%04X" % cp


_LEN_GRPO_LINES = (
    "- Post length: up to 750 characters",        # dash form
    "- post LENGTH: up to 1,200 characters",      # (?i) dash
    "- Post length: up to ٧٥٠ characters",        # unicode \d in dash
    "- Post length: between 750 and 1,500 characters",  # dash no-match
    "- Post length: up to 750 characters\n"
    "**Suggested Post Length**: between 750 and 1,500 characters",
    "**Suggested Post Length**: Up to 750 characters",
    "**suggested post length**: up to 750 characters",  # (?i) star
    "**SUGGESTED POST LENGTH**: between 1,500 and 3,000 characters",
    "**Suggested Post Length**: up to 300 characters\xa0",  # strip
    "**Suggested Post Length**:\xa0up to 300 characters",   # \s* pad
    "**Suggested Post Length**:   ",              # ws-only -> 0.5
    "no length field at all",
)


def _length_grpo_corpus(seed: int = 4242, n: int = 150):
    rng = random.Random(seed)
    pairs = []
    lens = [0, 1, 200, 299, 300, 301, 330, 331, 374, 375, 749, 750,
            751, 824, 825, 826, 937, 938, 1199, 1200, 1201, 1499,
            1500, 1501, 2999, 3000, 3001, 3300, 3750, 3751]
    for ln in _LEN_GRPO_LINES:
        for k in rng.sample(lens, 10):
            pairs.append((f"# Request\nPost please.\n\n## Writing "
                          f"Style\n{ln}\n**Tone**: bold\n", "x" * k))
    for _ in range(n):
        pairs.append((f"## Style\n{rng.choice(_LEN_GRPO_LINES)}",
                      "y" * rng.randint(0, 4000)))
    return pairs


def test_length_grpo_path_matches_reference(spark, tmp_path):
    """R1 via the GRPO effective invocation (26-train-grpo.py:198 ->
    parse_writing_style_block): dash-form precedence, (?i) field
    names, unicode digits, str.strip — against the engine's
    precise_post_length_grpo.  The length.py-wrapper path has its own
    differential above (both are genuine reference surfaces)."""
    from social_media_ai_engineering_etl_spark.functions.rewards import (
        precise_post_length_grpo)
    pairs = _length_grpo_corpus()
    want = _run_ref_units("length_grpo", pairs, tmp_path)
    df = spark.createDataFrame(
        [(i, p, c) for i, (p, c) in enumerate(pairs)],
        "i long, p string, c string")
    got = {r.i: r.s for r in df.select(
        "i", precise_post_length_grpo(F.col("p"), F.col("c"))
        .alias("s")).collect()}
    bad = [(repr(pairs[i][0].split(chr(10))[-3])[:60],
            len(pairs[i][1]), got[i], want[i])
           for i in range(len(pairs))
           if abs(got[i] - want[i]) > 1e-9]
    assert not bad, (len(bad), bad[:8])
    assert {0.0, 0.5, 1.0} <= {round(v, 1) for v in want}


def _py_emoji_pattern() -> str:
    import re as _re

    from social_media_ai_engineering_etl_spark.functions.textstats import (
        EMOJI_CLASS)
    return _re.sub(r"\\x\{([0-9A-Fa-f]+)\}",
                   lambda m: re_escape_cp(int(m.group(1), 16)),
                   EMOJI_CLASS)


_EMOJI_FIELD_VALUES = (
    "none", "very low", "low", "medium", "high", "extreme",
    "infrequent", "frequent", "occasional", "None", "HIGH",
    " low ", "low\xa0", "\u3000medium", "", "  ")


def _emoji_completion_pool(seed: int = 3434, n: int = 40) -> list[str]:
    rng = random.Random(seed)
    pool = [
        "",                                   # len 0 -> freq 0
        "plain words no emoji at all",
        "😀" + "x" * 1999,                    # 1/2000 = 0.0005 edge
        "😀" + "x" * 999,                     # 1/1000 = 0.001 edge
        "😀😀😀😀😀" + "x" * 995,              # 5/1000 = 0.005 edge
        "😀" * 10 + "x" * 990,                # 10/1000 = 0.01 edge
        "😀" * 50 + "x" * 50,                 # 0.5 extreme
        "🔥✨👍 three in ten chars",
        "😀" + "x" * 2000,                    # just under 0.0005
    ]
    for _ in range(n):
        k = rng.randint(0, 12)
        body = "x" * rng.randint(0, 1200)
        pool.append("🚀" * k + body)
    return pool


def _emoji_prompt(field_line: str) -> str:
    return ("# Request\nCreate a post.\n\n## Writing Style\n"
            f"{field_line}\n**Tone**: friendly\n")


def _emoji_enhanced_corpus(seed: int = 555):
    rng = random.Random(seed)
    lines = (
        ["**Emoji Usage**: " + v for v in _EMOJI_FIELD_VALUES]
        + ["**emoji usage**: high",           # case-insensitive name
           "**EMOJI USAGE**: none",
           "- Emoji Usage: infrequent",       # dash form (precedence)
           "- emoji usage: frequent",
           "- Emoji Usage: frequent\n**Emoji Usage**: none",  # both
           "**Emoji Usage**:\xa0high",        # unicode \s* after colon
           "no field at all"])
    comps = _emoji_completion_pool()
    pairs = []
    for ln in lines:
        for c in rng.sample(comps, 8):
            pairs.append((_emoji_prompt(ln), c))
    return pairs


def test_emoji_enhanced_reward_matches_reference(spark, tmp_path):
    """R3 differential via the reference's EFFECTIVE invocation
    (26-train-grpo.py:204: parse_writing_style_block ->
    enhanced_emoji_usage_reward).  The `emojis` package is shimmed
    with the engine's measured class (membership shared by
    construction; the parse/strip/bin arithmetic is what this
    proves)."""
    from social_media_ai_engineering_etl_spark.functions.rewards import (
        enhanced_emoji_usage)
    pairs = _emoji_enhanced_corpus()
    want = _run_ref_units("emoji_enhanced",
                          {"pattern": _py_emoji_pattern(),
                           "pairs": pairs}, tmp_path)
    df = spark.createDataFrame(
        [(i, p, c) for i, (p, c) in enumerate(pairs)],
        "i long, p string, c string")
    got = {r.i: r.s for r in df.select(
        "i", enhanced_emoji_usage(F.col("p"), F.col("c")).alias("s"))
        .collect()}
    bad = [(repr(pairs[i][0].split(chr(10))[4])[:60],
            repr(pairs[i][1][:20]), got[i], want[i])
           for i in range(len(pairs))
           if abs(got[i] - want[i]) > 1e-9]
    assert not bad, (len(bad), bad[:8])
    assert {0.0, 0.4, 0.7, 1.0, 0.5} <= {round(v, 1) for v in want}


def test_emoji_coarse_reward_matches_reference(spark, tmp_path):
    """R4 differential: emoji_usage_reward(required, completion) as a
    pure function grid — the reference lowers WITHOUT stripping here
    (unlike R3's parse), so padded values fall to its else-branches."""
    from social_media_ai_engineering_etl_spark.functions.rewards import (
        emoji_usage_coarse)
    rng = random.Random(777)
    comps = _emoji_completion_pool(seed=778)
    pairs = [(req, c) for req in _EMOJI_FIELD_VALUES
             for c in rng.sample(comps, 6)]
    want = _run_ref_units("emoji_coarse",
                          {"pattern": _py_emoji_pattern(),
                           "pairs": pairs}, tmp_path)
    df = spark.createDataFrame(
        [(i, req, c) for i, (req, c) in enumerate(pairs)],
        "i long, req string, c string")
    got = {r.i: r.s for r in df.select(
        "i", emoji_usage_coarse(
            F.lit(None).cast("string"), F.col("c"),
            field=F.lower(F.col("req"))).alias("s")).collect()}
    bad = [(repr(pairs[i][0]), repr(pairs[i][1][:20]), got[i], want[i])
           for i in range(len(pairs))
           if abs(got[i] - want[i]) > 1e-9]
    assert not bad, (len(bad), bad[:8])


def test_aggregator_matches_reference(spark, tmp_path):
    """R19 differential: genuine aggregate_rewards over five funcs —
    two real reward functions, a RAISING func (the degrade-to-zeros
    path), a constant, and an out-of-range func (clip normalize) —
    against the engine's weighted-mean Column form with the failed
    func modeled as a zero column.  Also pins the all-zero-weights
    guard (0.0, not a divide-by-zero null)."""
    from social_media_ai_engineering_etl_spark.functions.rewards import (
        aggregate_rewards, chinese_character_guard, hashtag_limit)
    comps = _hashtag_corpus(seed=99, n=80) + _chinese_corpus(seed=98,
                                                             n=80)
    weights = {"hash": 2.0, "cjk": 0.5, "boom": 3.0, "big": 1.25}
    # "half" intentionally missing -> default weight 1.0
    want = _run_ref_units("aggregator",
                          {"completions": comps, "weights": weights},
                          tmp_path)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(comps)],
                               "i long, t string")
    big = 1.0 + 0.25 * (F.col("i") % 4).cast("double")
    cols = {"hash": hashtag_limit(F.col("t")),
            "cjk": chinese_character_guard(F.col("t")),
            "boom": F.lit(0.0),       # reference degrades to zeros
            "half": F.lit(0.5), "big": big}
    got = {r.i: (r.plain, r.clip, r.zw) for r in df.select(
        "i",
        aggregate_rewards(cols, weights).alias("plain"),
        aggregate_rewards(cols, weights, clip=True).alias("clip"),
        aggregate_rewards(cols, {k: 0.0 for k in cols}).alias("zw"))
        .collect()}
    bad = []
    for i in range(len(comps)):
        trip = (want["plain"][i], want["clip"][i], want["zero_w"][i])
        if any(abs(a - b) > 1e-12 for a, b in zip(got[i], trip)):
            bad.append((repr(comps[i][:40]), got[i], trip))
    assert not bad, bad[:6]


def _violations_corpus(seed: int = 6161, n: int = 220):
    rng = random.Random(seed)
    pairs = [
        ("plain body", "hashtags"),
        ("trailing spaces   ", "hashtags"),
        ("trailing nbsp\xa0\xa0", "hashtags"),        # unicode rstrip
        ("trailing mix \t\n\xa0\u3000", "hashtags"),
        ("", "hashtags"),
        ("\u2028line-sep tail\u2028", "hashtags"),
        ("x", "under"), ("xy", "under"), ("xyz", "under"),
        ("", "under"),
        ("🚀😀 emoji length", "under"),               # codepoint len
        ("x" * 119, "over"), ("x" * 120, "over"),     # reps boundary
        ("x" * 121, "over"), ("x" * 240, "over"),
        ("", "over"), ("short", "over"),
    ]
    for _ in range(n):
        body = "".join(rng.choices("abc \t\n\xa0　🚀中", k=rng.randint(0, 300)))
        pairs.append((body, rng.choice(["hashtags", "under", "over"])))
    return pairs


def test_violations_match_reference(spark, tmp_path):
    """P16 differential for the DETERMINISTIC violations
    (violate_hashtags, violate_length under/over) — the random-draw
    violations (urls/names/emoji) are md5-derived by documented
    deviation and excluded."""
    from social_media_ai_engineering_etl_spark.operators.negatives import (
        violate_hashtags, violate_length)
    pairs = _violations_corpus()
    want = _run_ref_units("violations", pairs, tmp_path)
    df = spark.createDataFrame(
        [(i, t, k) for i, (t, k) in enumerate(pairs)],
        "i long, t string, k string")
    out = (F.when(F.col("k") == "hashtags", violate_hashtags(F.col("t")))
            .when(F.col("k") == "under", violate_length(F.col("t"), "under"))
            .otherwise(violate_length(F.col("t"), "over")))
    got = {r.i: r.o for r in df.select("i", out.alias("o")).collect()}
    bad = [(repr(pairs[i]), repr(got[i][:60]), repr(want[i][:60]))
           for i in range(len(pairs)) if got[i] != want[i]]
    assert not bad, bad[:6]


def test_bullets17_matches_reference(spark, tmp_path):
    from social_media_ai_engineering_etl_spark.functions.narrative17 import (
        detect_bullet_styles_17)
    texts = _bullet_corpus(seed=515151)      # same strata, fresh seed
    want = _run_ref_units("bullets17", texts, tmp_path)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    got = {r.i: r.b for r in df.select(
        "i", detect_bullet_styles_17(F.col("t")).alias("b")).collect()}
    bad = [(repr(texts[i][:45]), got[i], want[i])
           for i in range(len(texts)) if got[i] != want[i]]
    assert not bad, bad[:6]
    seen = {v for v in want if v}
    assert "Numbered" in seen and "Lettered" in seen
    assert "Mixed Bullet Styles" in seen


# ---------------------------------------------------------------------------
# R18 fabrication + R15 vocabulary (r8): word_tokenize shimmed to
# str.split(); name-bearing corpus text stays space-separated so the
# shim and treebank agree by construction — the differential pins the
# nltk-FREE logic (URL branches, name arithmetic, upper-alpha class,
# phrase gates, extraction regexes, bin ladders)
# ---------------------------------------------------------------------------

_FAB_URL = "https://example.com/Launch_(v2),x%2Fok!"
_FAB_URL2 = "http://other.io/p+q&r@s"


def _fab_prompt(topic=None, key=None, tail=""):
    s = ("# Request\nCreate a LinkedIn post that follows the writing "
         "style below")
    if topic is not None:
        s += " on the topic of`: `" + topic + "`"
    s += "\n"
    if key is not None:
        s += "\n### Key Message\n```\n" + key + "\n```\n"
    return s + "\n## Writing Style\n**Tone**: informative\n" + tail


def _fabrication_corpus():
    P = _fab_prompt
    pairs = [
        # --- URL branch logic ---
        (P(topic="cloud costs"), f"Read this {_FAB_URL} today"),       # 0.7
        (P(topic=f"see {_FAB_URL} soon"), f"Read {_FAB_URL} now"),     # 0.0
        (P(topic=f"see {_FAB_URL} soon"), f"Read {_FAB_URL2} now"),    # 0.5
        (P(key=f"details at {_FAB_URL}"), f"Go {_FAB_URL} ok"),        # key-msg URL
        (P(topic="x"), "HTTPS://example.com stays uppercase"),         # no match
        (P(topic="x"), f"two {_FAB_URL} and {_FAB_URL2}"),
        (P(topic=f"a {_FAB_URL2} b"), f"two {_FAB_URL} and {_FAB_URL2}"),
        (P(), "bare http:// nothing"),
        # --- name counting / cap / membership ---
        (P(topic="growth"), "met Alice Johnson yesterday"),            # 1 new
        (P(topic="growth"), "Alice Johnson Bob Smith talked"),         # chain of 3
        (P(topic="growth"), "Alice Johnson and Alice Johnson again"),  # dup = 2
        (P(topic="Alice Johnson profile"), "Alice Johnson spoke"),     # known
        (P(topic="ALICE JOHNSON"), "Alice Johnson spoke"),             # case fold
        (P(key="Alice Johnson praised the launch"), "Alice Johnson"),  # wait: single
        (P(key="quarterly Alice Johnson notes"), "per Alice Johnson plan"),
        (P(), "Aa Bb Cc Dd Ee Ff Gg Hh"),                              # 7 pairs -> cap 0.5
        (P(), "A Team works"),                                         # len-1 initial: no
        (P(), "A1 Steak house"),                                       # digit 2nd char: yes
        (P(), "1st Place Winners shine"),                              # Place Winners only
        (P(), "mid sentence So It Goes"),                              # chains count
        # --- unicode name initials (genuine class differences) ---
        (P(topic="growth"), "met Éric Dupont today"),             # É Lu
        (P(topic="Éric Dupont bio"), "saw Éric Dupont talk"),
        (P(), "Ωmega Protocol launch"),                           # Ω Lu
        (P(), "ǅungla Grad spot"),                                # ǅ Lt: NOT upper
        (P(), "\U00010570ek Test run"),                                # Vithkuqi U14 Lu
        (P(topic="İstanbul Merkez"), "the İstanbul Merkez hub"),
        (P(), "the İstanbul Merkez hub"),
        # --- promo / newsletter gates ---
        (P(topic="x"), "Sign up for our newsletter today"),            # 0.3
        (P(topic="x"), "signup bonus newsletter drop"),                # \s* form
        (P(topic="x"), "SUBSCRIBE TO OUR NEWSLETTER"),                 # (?i)
        (P(topic="x"), "join the " + "x" * 24 + " newsletter"),        # gap 30
        (P(topic="x"), "join the " + "x" * 31 + " newsletter"),        # gap > 30
        (P(topic="x"), "join our\nnewsletter please"),                 # \n in gap
        (P(topic="x"), "Register for the webinar now"),
        (P(topic="x"), "join us at the big event"),
        (P(topic="sign up for our newsletter info"),
         "Sign up for our newsletter today"),                          # topic gate
        (P(key="Sign up for our newsletter"), "sign up for our newsletter"),
        (P(topic="x"), "link in bio for more"),                        # 0.3 + 0.4
        # --- action gates ---
        (P(topic="x"), "DM me for details"),
        (P(topic="x"), "email me at team aliases"),
        (P(topic="x"), "call us at 555 0100"),
        (P(topic="x"), "LIMITED TIME OFFER ends"),
        (P(topic="x"), "an exclusive deal for you"),
        (P(topic="exclusive offer week"), "an exclusive offer for you"),
        (P(key="limited time offer terms"), "limited time offer terms"),
        (P(topic="x"), "link in comments below"),
        (P(topic="x"), "link in description area"),
        (P(topic="x"), "linK in bio now"),      # KELVIN SIGN folds to k
        (P(topic="x"), "SIGN UP for our NEWSLETTER"),
        # --- penalty clamp ---
        (P(), f"{_FAB_URL} Alice Johnson Bob Smith Carol Danvers Dave "
              f"Evans sign up for our newsletter dm me for stuff"),
        # --- extraction regex edges (unicode \s, strip, DOTALL) ---
        ("talk on the topic of:\xa0\nexclusive deal insights\nrest",
         "an exclusive deal story"),
        ("on the topic of: \nAlice Johnson wins",
         "Alice Johnson wins big"),
        ("# R\n### Key Message\n```\n\xa0Alice Johnson praised us\xa0\n"
         "```\nrest", "Alice Johnson praised us"),
        ("# R\n### Key Message\n```\r\nwin with Carol Danvers\r\n```\n",
         "Carol Danvers agrees"),
        ("ON THE TOPIC OF: Quantum Leaders today\nrest",
         "Quantum Leaders rally"),                                     # (?i) topic
        ("on the topic of Big Rocks strategy\nrest",
         "Big Rocks strategy wins"),                                   # no `:` form
        ("### key message\n```\nMary Jones quote\n```\n",
         "Mary Jones agrees"),                                         # (?i) key
        ("# R\n### Key Message (draft)\n```\nMary Jones quote\n```\n",
         "Mary Jones agrees"),                                         # no match: text between
        ("on the topic of: Alice Johnson   \nrest",
         "Alice Johnson leads"),                                       # trailing strip
        (P(topic=None), "plain text no fields at all"),
        ("", ""),
        ("", "Alice Johnson " + _FAB_URL + " sign up for a newsletter"),
    ]
    return pairs


def test_fabrication_matches_reference(spark, tmp_path):
    """R18 differential (word_tokenize shimmed to split; names stay
    space-separated by construction).  Pins: URL 0.7/0.5 branches and
    URL-set equality, sliding capitalized-bigram names with dup
    counting and the 0.5 cap, the CPython upper-alpha first-char
    class (PY_UPPER_ALPHA_CHAR), lowered membership vs topic/key
    names, promo (+0.3) / action (+0.4) phrase gates incl. the
    .{0,30} span and (?i), the topic/key-message extraction regexes
    (unicode \\s*, str.strip, DOTALL), and the max(0, 1-penalty)
    clamp."""
    from social_media_ai_engineering_etl_spark.functions.rewards import (
        fabrication_guard)
    pairs = _fabrication_corpus()
    want = _run_ref_units("fabrication", pairs, tmp_path)
    df = spark.createDataFrame(
        [(i, p, c) for i, (p, c) in enumerate(pairs)],
        "i long, p string, c string")
    got = {r.i: r.s for r in df.select(
        "i", fabrication_guard(F.col("p"), F.col("c")).alias("s"))
        .collect()}
    bad = [(i, repr(pairs[i][0][:60]), repr(pairs[i][1][:60]),
            got[i], want[i])
           for i in range(len(pairs)) if abs(got[i] - want[i]) > 1e-9]
    assert not bad, (len(bad), bad[:8])
    # the corpus must actually exercise every branch
    assert {0.3, 0.5, 0.7, 1.0} <= {round(v, 6) for v in want}
    assert min(want) == 0.0


_VOCAB_FIELDS = (
    "Rich and varied", "rich", "enriched prose", "Developed",
    "underdeveloped style", "Normal", "abnormally fancy", "Conservative",
    "narrow", "Conservative and narrow", "rich developed normal narrow",
    "Sophisticated", "", None, "RICH",
)


def _vocab_completion(unique, total):
    # pure-alpha tokens: word_tokenize's isalpha filter and the
    # engine's [a-z]+ runs agree by construction
    words = ["w" + chr(97 + i % 26) + chr(97 + i // 26)
             for i in range(unique)]
    words += [words[0]] * (total - unique)
    return " ".join(words)


def _vocab_corpus(seed=828282):
    rng = random.Random(seed)
    pairs = []
    ratios = [(1, 2), (2, 5), (3, 10), (7, 20), (3, 5), (1, 4), (1, 5),
              (3, 20), (11, 20), (13, 20), (2, 3), (9, 20), (1, 10),
              (4, 10), (6, 10), (5, 20), (8, 20), (1, 1), (19, 20)]
    for fld in _VOCAB_FIELDS:
        if fld is None:
            prompt = "## Style\n**Tone**: bold\n"
        else:
            prompt = "## Style\n**Vocabulary Usage**: %s\n**Tone**: x\n" % fld
        for u, t in rng.sample(ratios, 8):
            pairs.append((prompt, _vocab_completion(u, t)))
        pairs.append((prompt, ""))                     # empty completion
        pairs.append((prompt, "   "))                  # ws-only
        pairs.append((prompt, "Alpha alpha ALPHA beta"))
    # case-sensitive field name: lowercase field must NOT match
    pairs.append(("**vocabulary usage**: rich\n", _vocab_completion(3, 5)))
    pairs.append(("**Vocabulary Usage**:rich\n", _vocab_completion(3, 5)))
    pairs.append(("**Vocabulary Usage**: rich", _vocab_completion(3, 5)))
    return pairs


def test_vocabulary_matches_reference(spark, tmp_path):
    """R15 differential (word_tokenize shimmed to split; completions
    are pure-alpha space-separated by construction).  Pins: the
    case-SENSITIVE field regex, substring keyword precedence
    (rich > developed > normal > conservative|narrow), the
    unique/total ratio and all four bin ladders at their exact
    boundaries, and the 0.5 (no field) / 0.2 (no words) fallback
    order."""
    from social_media_ai_engineering_etl_spark.functions.rewards import (
        vocabulary_usage)
    pairs = _vocab_corpus()
    want = _run_ref_units("vocabulary", pairs, tmp_path)
    df = spark.createDataFrame(
        [(i, p, c) for i, (p, c) in enumerate(pairs)],
        "i long, p string, c string")
    got = {r.i: r.s for r in df.select(
        "i", vocabulary_usage(F.col("p"), F.col("c")).alias("s"))
        .collect()}
    bad = [(i, repr(pairs[i][0][:48]), repr(pairs[i][1][:32]),
            got[i], want[i])
           for i in range(len(pairs)) if abs(got[i] - want[i]) > 1e-9]
    assert not bad, (len(bad), bad[:8])
    assert {0.2, 0.3, 0.5, 0.8, 1.0} <= {round(v, 6) for v in want}


# ---------------------------------------------------------------------------
# R8 tone / R9 structure / R12 narrative / R13 topics / R14 semantic +
# the base.py arc/pacing labels (r8): sent_tokenize / word_tokenize /
# VADER / spaCy similarity are shimmed at the documented-deviation
# seams ([.!?]+ strip-split, str.split(), the mini-lexicon compound,
# token-Jaccard); every other reference line runs genuinely, so the
# differentials pin field parses (unicode \s crossing newlines,
# str.strip, case sensitivity), the [:5000]/[:1000] truncations, arc
# thresholds and stride sampling, pacing/variance arithmetic,
# paragraph gates and clamps.
# ---------------------------------------------------------------------------

_FILLERS = ("alpha", "beta", "gamma", "delta", "omega", "plan",
            "work", "idea", "note", "step")


def _sent(k, pos=0, neg=0, tag="w"):
    toks = (["good"] * pos) + (["terrible"] * neg)
    toks += [f"{tag}{i}" for i in range(k - len(toks))]
    return " ".join(toks)


def _sentifam_prompts():
    return [
        "## Style\n**Tone**: friendly\n**Sentence Structure**: short sentences\n",
        "## Style\n**Tone**: serious\n**Sentence Structure**: long and complex\n",
        "## Style\n**Tone**: professional\n**Sentence Structure**: a balanced mix\n",
        "## Style\n**Tone**: friendly, serious, professional\n",
        "## Style\n**Tone**: friendly\xa0, CHARMING\n**Sentence Structure**:\xa0short sentences\n",
        "## Style\n**Tone**:friendly\n**sentence structure**: short sentences\n",
        "## Style\n**Tone**: \n\ncheerful\n**Sentence Structure**:\nmix of lengths\n",
        "- Tone: cheerful\n",
        "- Tone: sarcastic\n**Sentence Structure**: long complex clauses\n",
        "## Style\n**Tone**: bold, , mysterious\n**Sentence Structure**: free form\n",
        "## Style\n**Tone**: \n**Sentence Structure**: \n",
        "no fields at all\n",
        "## Style\n**TONE**: friendly\n**Sentence Structure**: Short Sentences please\n",
    ]


def _sentifam_completions(rng):
    C = [
        "",
        "   ",
        "one bare sentence with a handful of tokens",
        _sent(5) + ". " + _sent(5) + ".",
        ". ".join(_sent(5, tag=f"f{i}") for i in range(3)) + ".",
        ". ".join(_sent(25, tag=f"s{i}") for i in range(3)) + ".",
        ". ".join(_sent(15, tag=f"m{i}") for i in range(3)) + ".",
        _sent(2) + ". " + _sent(30) + ". " + _sent(2) + ".",
        _sent(10) + ". " + _sent(20) + ". " + _sent(15) + ".",
        _sent(8) + ". " + _sent(22) + ". " + _sent(15) + ".",
        _sent(25) + ". " + _sent(40) + ".",
        _sent(10, neg=1) + ". " + _sent(10) + ". " + _sent(10, pos=1) + ".",
        _sent(10, pos=1) + ". " + _sent(10) + ". " + _sent(10, neg=1) + ".",
        _sent(10) + ". " + _sent(10, tag="x") + ". " + _sent(10, tag="y") + ".",
        _sent(10, pos=1) + ". " + _sent(10) + ". " + _sent(10, pos=1) + ".",
        _sent(25, pos=1) + ". " + _sent(25, pos=1) + ". " + _sent(25, pos=1) + ".",
        _sent(4, neg=2) + "! " + _sent(9, pos=1) + "? " + _sent(2, pos=2) + ".",
        "lead\xa0pair here. \nnewline led sentence. tail  spaced .",
        "para one alpha beta. second thought here. third one lands.\n\n"
        "para two gamma delta. more words follow. closing line here.",
        "single paragraph. with three sentences. all in one block.",
        "para only\n\nsecond para",
        "same tokens here. same tokens here.\n\nsame tokens here. extra.",
        "alpha beta. gamma delta.\n\nepsilon zeta. eta theta.",
        "alpha beta shared. words here.\n\nalpha gamma shared. words there.",
        ("good day. " * 520).strip(),
        ("🚀 good win. " + "plain words here now. " * 260).strip(),
        " ".join(f"long{i}" for i in range(1200)) + ". tail sentence one."
        " more after that. and a third.",
        (" ".join(f"pa{i}" for i in range(600)) + "\n\n"
         + " ".join(f"pa{i}" for i in range(300))
         + " " + " ".join(f"pb{i}" for i in range(300))
         + "\n\nshort tail. here now. done."),
    ]
    # 20-sentence (stride 2) and 35-sentence (stride 3) profiles
    C.append(" ".join(
        _sent(rng.randint(3, 12), pos=rng.randint(0, 1),
              neg=rng.randint(0, 1), tag=f"t{i}") + "."
        for i in range(20)))
    C.append(" ".join(
        _sent(rng.randint(2, 26), pos=rng.randint(0, 2),
              neg=rng.randint(0, 2), tag=f"u{i}") + rng.choice([". ", "! "])
        for i in range(35)))
    return C


def _rand_completion(rng):
    parts = []
    for _ in range(rng.choice([0, 1, 2, 3, 4, 8, 12, 22])):
        k = rng.randint(1, 28)
        toks = []
        for _ in range(k):
            r = rng.random()
            if r < 0.12:
                toks.append(rng.choice(
                    ["good", "great", "love", "win", "amazing"]))
            elif r < 0.2:
                toks.append(rng.choice(
                    ["bad", "terrible", "hate", "loss", "awful"]))
            else:
                toks.append(rng.choice(_FILLERS))
        parts.append(" ".join(toks)
                     + rng.choice([". ", "! ", "? ", ".\n", "!\n\n", "... "]))
    txt = "".join(parts)
    if rng.random() < 0.3:
        txt = txt.replace(" ", "\xa0", 1)
    if rng.random() < 0.2:
        txt = "\n" + txt
    # unicode stratum: exotic case-folds (KELVIN SIGN, İ), unicode
    # whitespace (em-space, FS), mixed-script tokens — the lexicon
    # membership, tokenization and lower() must stay parity
    if rng.random() < 0.25:
        txt = txt.replace(" ", rng.choice([" ", "\x1c", "　"]), 2)
    if rng.random() < 0.2:
        txt = rng.choice(["K elvin prefix. ", "İstanbul lead. ",
                          "ǅungla mix. ", "你好 мир. "]) + txt
    return txt


def _rand_prompt(rng):
    tone = rng.choice([
        "friendly", "serious", "professional", "cheerful", "sarcastic",
        "scholarly", "bold", "friendly, professional",
        "charming ,rebellious", "informative\xa0"])
    ss = rng.choice([
        "short sentences", "long and complex", "balanced mix",
        "a mix of lengths", "free form", "Short Sentences",
        "long, complex clauses"])
    fmt = rng.random()
    if fmt < 0.2:
        return f"- Tone: {tone}\n**Sentence Structure**: {ss}\n"
    if fmt < 0.3:
        return f"**Sentence Structure**: {ss}\n"
    if fmt < 0.4:
        return f"**Tone**: {tone}\n"
    return f"**Tone**: {tone}\n**Sentence Structure**: {ss}\n"


def _sentifam_payload(seed=515151):
    from social_media_ai_engineering_etl_spark.functions.rewards import (
        NEGATIVE_WORDS, POSITIVE_WORDS)
    rng = random.Random(seed)
    prompts, comps = _sentifam_prompts(), _sentifam_completions(rng)
    pairs = [(p, c) for p in prompts[:4] for c in comps]
    pairs += [(p, comps[11]) for p in prompts]
    pairs += [(p, comps[4]) for p in prompts]
    pairs += [(rng.choice(prompts), c) for c in comps]
    pairs += [(_rand_prompt(rng), _rand_completion(rng)) for _ in range(90)]
    return {"pos": list(POSITIVE_WORDS), "neg": list(NEGATIVE_WORDS),
            "pairs": pairs}


def _sentifam_diff(spark, tmp_path, mode, expr_fn, tol=1e-9):
    payload = _sentifam_payload()
    pairs = payload["pairs"]
    want = _run_ref_units(mode, payload, tmp_path)
    df = spark.createDataFrame(
        [(i, p, c) for i, (p, c) in enumerate(pairs)],
        "i long, p string, c string")
    got = {r.i: r.s for r in df.select(
        "i", expr_fn(F.col("p"), F.col("c")).alias("s")).collect()}
    bad = [(i, repr(pairs[i][0][:48]), repr(pairs[i][1][:48]),
            got[i], want[i])
           for i in range(len(pairs))
           if (abs(got[i] - want[i]) > tol
               if isinstance(want[i], float) else got[i] != want[i])]
    assert not bad, (len(bad), bad[:8])
    return want


def test_tone_alignment_matches_reference(spark, tmp_path):
    """R8 differential: two-form field parse (unicode \\s* crossing
    newlines, literal-space form, case-insensitive), comma-split
    str.strip tones, tone_map targets vs arc, 1.0/0.6 mean, 0.5
    no-tone fallback."""
    from social_media_ai_engineering_etl_spark.functions.rewards import (
        tone_alignment)
    want = _sentifam_diff(spark, tmp_path, "tone", tone_alignment)
    assert {0.5, 0.6, 1.0} <= {round(v, 6) for v in want}


def test_sentence_structure_matches_reference(spark, tmp_path):
    """R9 differential: case-SENSITIVE field regex with \\s* crossing
    newlines, short/long/balanced keyword routing, paragraph fallback
    (str.strip), <2-sentence 0.3 gate, avg/np.var ladders."""
    from social_media_ai_engineering_etl_spark.functions.rewards import (
        sentence_structure)
    want = _sentifam_diff(spark, tmp_path, "sent_structure",
                          sentence_structure)
    assert {0.2, 0.3, 0.4, 0.5, 0.7, 0.9, 1.0} <= {round(v, 6) for v in want}


def test_narrative_structure_matches_reference(spark, tmp_path):
    """R12 differential: 0.4 pacing + 0.3 arc + the flow[0] quirk
    (first CHARACTER of the flow label is never in the exclusion
    list, so +0.3 is constant) — all over [:5000]-truncated text."""
    from social_media_ai_engineering_etl_spark.functions.rewards import (
        narrative_structure)
    want = _sentifam_diff(spark, tmp_path, "narrative",
                          lambda p, c: narrative_structure(c))
    # arc == Neutral  <=>  <3 truncated sentences  <=>  pacing Short,
    # so the only reachable values are 0.3 and 1.0 (differential-
    # verified: the mixed 0.7 outcome cannot occur)
    assert {0.3, 1.0} == {round(v, 6) for v in want}


def test_semantic_coherence_matches_reference(spark, tmp_path):
    """R14 differential: UNtruncated sentence-count gate (0.6/0.5) vs
    truncated pacing/arc bonuses, clamp."""
    from social_media_ai_engineering_etl_spark.functions.rewards import (
        semantic_coherence)
    want = _sentifam_diff(spark, tmp_path, "semantic",
                          lambda p, c: semantic_coherence(c))
    # the 0.75 middle rung is unreachable (arc Neutral <=> pacing
    # Short, both from the truncated sentence count); 0.5 covers both
    # the 0-sentence gate and the long-text nst<3 full-branch case
    assert {0.5, 0.6, 1.0} == {round(v, 6) for v in want}


def test_topic_shifts_matches_reference(spark, tmp_path):
    """R13 differential (token-Jaccard injected as doc.similarity):
    <3-sentence 0.5 gate, str.strip paragraphs, [:1000] truncation
    BEFORE tokenizing, empty-similarity -> avg 0.5 -> 1.0, clamp."""
    from social_media_ai_engineering_etl_spark.functions.rewards import (
        topic_shifts_score)
    want = _sentifam_diff(spark, tmp_path, "topics",
                          lambda p, c: topic_shifts_score(c))
    assert {0.5, 1.0} <= {round(v, 6) for v in want}
    assert any(0.5 < v < 1.0 for v in want)


def test_arc_pacing_labels_match_reference(spark, tmp_path):
    """base.py label differential: analyze_sentiment_arc over
    stride-sampled mini-lexicon scores and analyze_pacing over
    str.split token counts, both on text[:5000]."""
    from social_media_ai_engineering_etl_spark.functions import rewards as rw
    payload = _sentifam_payload()
    pairs = payload["pairs"]
    want = _run_ref_units("arcpacing", payload, tmp_path)
    df = spark.createDataFrame(
        [(i, p, c) for i, (p, c) in enumerate(pairs)],
        "i long, p string, c string")
    got = {r.i: (r.arc, r.pac) for r in df.select(
        "i",
        rw.sentiment_arc(rw.sentiment_scores(F.col("c"))).alias("arc"),
        rw.pacing(F.col("c")).alias("pac")).collect()}
    bad = [(i, repr(pairs[i][1][:60]), got[i], tuple(want[i]))
           for i in range(len(pairs)) if got[i] != tuple(want[i])]
    assert not bad, (len(bad), bad[:8])
    arcs = {w[0] for w in want}
    pacs = {w[1] for w in want}
    assert {"Neutral", "Rising", "Falling", "Flat", "Variable"} <= arcs
    assert {"Short/Not Enough Data", "Fast", "Slow", "Moderate",
            "Variable"} <= pacs


# ---------------------------------------------------------------------------
# features/narrative.py + features/text_stats.py flavors (r8):
# cue-based flow, p75 pacing, polyfit-slope arc, and the pure-stdlib
# line/punctuation/sentence stats
# ---------------------------------------------------------------------------


def _feat_texts(seed=616161):
    rng = random.Random(seed)
    texts = [
        "",
        "   ",
        "\n\n",
        "Today we announce the launch. middle content here. "
        "follow us for more.",
        "sharing something new. check out the docs.",
        "plain start here. we're introducing a tool. sign up now. done.",
        "ANNOUNCE in caps. more words. LEARN MORE tail.",
        "no cues at all. just plain text. nothing special. the end.",
        "comment below please. then content. today we start.",
        " ".join(_sent(5, tag=f"p{i}") + "." for i in range(25)),
        " ".join(_sent(rng.randint(2, 30), tag=f"q{i}") + "."
                 for i in range(55)),
        ("good win. " * 520).strip(),
        "line one\ntwo\n\n\nthree\n",
        "\r\nwindows\r\nlines\r\n",
        "uni break\x85line end",
        "dots... mixed!! marks?? ok;; and, some. more",
        "¡inverted! ？fullwidth 。ideographic",
        "trailing newline run\n\n\n",
        "a\nb",
        "single",
        "lead\xa0pair. \nnewline led. tail  spaced .",
    ]
    texts += _sentifam_completions(rng)
    texts += [_rand_completion(rng) for _ in range(60)]
    return texts


def test_feat_narrative_matches_reference(spark, tmp_path):
    """features/narrative.py cue-flow + p75-pacing differential: the
    intro/outro cue zones and precedence, the [:20]/[:50] slices vs
    the pre-slice <3 gate, np.percentile(75) linear interpolation
    (dyadic-exact on integer counts), the [:5000] truncation, and the
    []-for-empty return (the r8 zip_with-padding catch)."""
    from social_media_ai_engineering_etl_spark.functions import (
        narrative17 as n17)
    texts = _feat_texts()
    want = _run_ref_units("feat_narrative", texts, tmp_path)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {r.i: (list(r.flow), r.pac) for r in df.select(
        "i",
        n17.narrative_flow_cue(F.col("t")).alias("flow"),
        n17.pacing_p75(F.col("t")).alias("pac")).collect()}
    bad = [(i, repr(texts[i][:60]), got[i], (want[i][0], want[i][1]))
           for i in range(len(texts))
           if got[i] != (want[i][0], want[i][1])]
    assert not bad, (len(bad), bad[:6])
    labels = {l for w in want for l in w[0]}
    assert {"Introduction/Setup", "Outro/CTA", "Content"} <= labels
    assert {"Short/Not Enough Data", "Fast", "Slow",
            "Moderate"} <= {w[1] for w in want}


def _arc_score_lists(seed=717171):
    rng = random.Random(seed)
    lists = [
        [],
        [0.1],
        [0.1, 0.2],
        [0.1, 0.2, 0.3],
        [0.0, 0.0, 0.0, 0.0],
        [0.0, 0.2, 0.4, 0.6],
        [0.6, 0.4, 0.2, 0.0],
        [0.1, -0.1, 0.1, -0.1, 0.1],
        [-1.0, 1.0, -1.0, 1.0],
        [0.0, 0.029, 0.058, 0.087],
        [0.0, 0.031, 0.062, 0.093],
        [0.0, -0.031, -0.062, -0.093],
        [0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5],
    ]
    for _ in range(40):
        n = rng.randint(4, 14)
        lists.append([round(rng.uniform(-1, 1), 3) for _ in range(n)])
    return lists


def test_arc_slope_matches_reference(spark, tmp_path):
    """features/narrative.py polyfit-slope arc differential: rolling
    window-3 smoothing, the <4 short gate, np.polyfit degree-1 slope
    vs the engine's closed-form least squares, +-0.03 thresholds."""
    from social_media_ai_engineering_etl_spark.functions import (
        narrative17 as n17)
    lists = _arc_score_lists()
    want = _run_ref_units("arc_slope", lists, tmp_path)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(lists)],
        "i long, v array<double>")
    got = {r.i: r.a for r in df.select(
        "i", n17.sentiment_arc_slope(F.col("v")).alias("a")).collect()}
    bad = [(i, lists[i][:6], got[i], want[i])
           for i in range(len(lists)) if got[i] != want[i]]
    assert not bad, (len(bad), bad[:6])
    assert {"Short/Not Enough Data for Arc", "Rising", "Falling",
            "Flat"} <= set(want)


def test_text_stats_matches_reference(spark, tmp_path):
    """features/text_stats.py differential — analyze_line_breaks
    (count('\\n') + blank-line fraction over n_lines-1, PURE stdlib,
    no seams), punctuation_counts (.,;!? only — unicode variants
    excluded), analyze_sentence_structure token counts, and
    analyze_vocabulary_usage (CASE-SENSITIVE distinct tokens — the r8
    catch: the engine used to lowercase)."""
    from social_media_ai_engineering_etl_spark.functions import (
        rewards as rw, textstats as ts)
    texts = _feat_texts()
    texts.append("Case case CASE casE keeps four distinct tokens")
    want = _run_ref_units("text_stats", texts, tmp_path)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string")
    slens = F.transform(rw.sentences(F.col("t")),
                        lambda s: F.size(rw._py_words(s)))
    got = {r.i: (r.lb, r.ab, dict(r.pc), list(r.sl), r.vc)
           for r in df.select(
        "i",
        ts.line_break_count(F.col("t")).alias("lb"),
        ts.blank_line_fraction(F.col("t")).alias("ab"),
        ts.punctuation_counts(F.col("t")).alias("pc"),
        slens.alias("sl"),
        ts.distinct_word_count(F.col("t")).alias("vc")).collect()}
    bad = []
    for i in range(len(texts)):
        lb, ab, pc, sl, vc = want[i]
        g = got[i]
        if (g[0] != lb or abs(g[1] - ab) > 1e-12 or g[2] != pc
                or g[3] != sl or g[4] != vc):
            bad.append((i, repr(texts[i][:48]), g, want[i]))
    assert not bad, (len(bad), bad[:6])
    assert any(w[0] > 0 and w[1] > 0 for w in want)
    assert any(w[2]["."] > 0 and w[2]["!"] > 0 for w in want)
    assert want[-1][4] == 8


def test_bullets17_emoji_branch_is_dead(spark, tmp_path):
    """Differential proof for the reference's emoji bullet branch
    (features/bullets.py:25-31) WITH the emojis package present
    (shimmed: engine emoji class minus \\w — single-codepoint RGI
    emoji are all category So, never Python \\w, so the real
    package's DB admits no word-class codepoint either).

    The branch is UNREACHABLE: an emoji-led line is always captured
    by the symbolic ``^\\s*([^\\w\\s])`` rule first (emoji are
    non-word), and a word-led first token fails ``all(emojis.count)``
    on its first character.  So the engine's branchless
    detect_bullet_styles_17 equals the reference with the package
    installed, and the Emoji/EmojiBullets/Differing-Emojis labels
    never fire."""
    from social_media_ai_engineering_etl_spark.functions.narrative17 import (
        detect_bullet_styles_17)
    texts = _bullet_corpus(seed=626262)
    texts += [
        "🚀 point one\n🚀 point two",
        "🚀🔥 double lead\n🚀🔥 again",
        "🚀 rocket\n🔥 flame",                 # two symbolic emoji labels
        "🚀 rocket\n• dot",                    # emoji + dot -> mixed
        "❶ dingbat first\n❷ dingbat second",  # \w-class: NO label
        "1️⃣ keycap lead\n2️⃣ keycap lead",      # digit-led keycap: NO label
        "    🚀 indented emoji",
        "🚀🚀🚀",
        "\xa0🚀 nbsp then emoji",
        "word 🚀 emoji not first",
        "❶❷ multi dingbat word",
        "☔ so-class weather\n☔ again",
    ]
    from social_media_ai_engineering_etl_spark.functions.textstats import (
        EMOJI_CLASS)
    import re as _re
    py_pattern = _re.sub(r"\\x\{([0-9A-Fa-f]+)\}",
                         lambda m: "\\U%08x" % int(m.group(1), 16),
                         EMOJI_CLASS)
    want = _run_ref_units("bullets17_emoji",
                          {"pattern": py_pattern, "texts": texts},
                          tmp_path)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, t string")
    got = {r.i: r.b for r in df.select(
        "i", detect_bullet_styles_17(F.col("t")).alias("b")).collect()}
    bad = [(repr(texts[i][:45]), got[i], want[i])
           for i in range(len(texts)) if got[i] != want[i]]
    assert not bad, bad[:6]
    # the dead-branch proof: with the package present, the emoji
    # labels never fire on ANY corpus line
    assert not any(w and "Emoji" in w for w in want)
    # ...while emoji-led lines DO label via the symbolic rule
    assert "🚀" in {v for v in want if v}

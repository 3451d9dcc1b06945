"""Unit-level differentials against REFERENCE functions (r7).

The stage-level differential (test_reference_differential.py) covers
the pipeline scripts; three reward/feature DETECTORS the engine
re-expresses natively are additionally runnable as genuine reference
code in this sandbox and get their own function-level comparison over
adversarial corpora:

  * training/rewards/base.py::detect_bullet_styles  <->
    functions/rewards.py::detect_bullet_styles
  * training/rewards/divider.py::divider_style_reward_func  <->
    functions/rewards.py::divider_style
  * features/profanity.py::determine_profanity_category  <->
    functions/textstats.py::profanity_category

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
    1000-token truncation window).

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

"""Unicode-version skew sweep: CPython vs Java 17 (Spark) vs RE2
(DuckDB) regex-class classification over EVERY codepoint.

The engines ship different Unicode tables (CPython 3.11 = 14.0,
Java 17 = 13.0, DuckDB's RE2 = 15.x), so `str.isalpha()` /
``re \\d \\w \\s`` and their `\\p{L}` / ``(?U)`` transcriptions
disagree on codepoints assigned between versions — found live by the
r7 differential fuzzer (U+9FFF counted as a word by the reference but
not by a Java ``\\p{L}`` filter, shifting a stage-18 vocabulary
bucket).

This script MEASURES the deltas and verifies the GENERATED constants
module ``functions/_unicode_py_classes.py`` (with ``--emit`` it
rewrites the module).  It also verifies the derived fragments
end-to-end: ``PY_ALPHA_CHAR`` / ``PY_DIGIT_CHAR`` /
``PY_NONWORDSPACE_CHAR`` must classify every codepoint exactly as
CPython does, and the whitespace classes must equal ``str.isspace()``
with NO correction in both engines.

tests/test_null_semantics.py::test_unicode_alpha_skew_pinned drives
the skew codepoints through all three engines per test run; this
script is the full-sweep regeneration path.

Usage: python scripts/unicode_skew.py [--emit]
"""

from __future__ import annotations

import os
import re
import sys

import duckdb
import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

MODULE = os.path.join(ROOT, "social_media_ai_engineering_etl_spark",
                      "functions", "_unicode_py_classes.py")


def _ranges(xs):
    out: list[list[int]] = []
    for x in sorted(xs):
        if out and x == out[-1][1] + 1:
            out[-1][1] = x
        else:
            out.append([x, x])
    return out


def _parts(rr):
    return [f"\\x{{{a:X}}}" if a == b else f"\\x{{{a:X}}}-\\x{{{b:X}}}"
            for a, b in rr]


def _pywrap(name, rr, width=64):
    lines, cur = [], ""
    for piece in _parts(rr):
        if len(cur) + len(piece) > width and cur:
            lines.append(cur)
            cur = piece
        else:
            cur += piece
    lines.append(cur)
    body = "\n    ".join(f'r"{c}"' for c in lines)
    return f"{name} = (\n    {body})\n"


_HEADER = '''"""MEASURED Unicode-class skew constants — GENERATED, do not edit.

Regenerate + verify with ``python scripts/unicode_skew.py`` (add
``--emit`` to rewrite this file).  Provenance: CPython 3.11 ships
Unicode 14.0 tables, Java 17 (the Spark JVM) ships 13.0, DuckDB's RE2
ships 15.x — so ``str.isalpha()`` / ``re`` ``\\\\d \\\\w \\\\s`` and their
naive ``\\\\p{L}`` / ``(?U)`` transcriptions disagree on the codepoints
(re)assigned between those versions.  Every constant below is the
exact measured delta from sweeping ALL codepoints through the live
engines (r7 fuzz program; the stage-18 vocabulary-bucket divergence on
U+9FFF was the motivating catch).

Measured facts the transcriptions rely on:
  * WHITESPACE needs no correction anywhere: Java ``(?U)[\\\\s\\\\x1c-\\\\x1f]``
    and RE2 ``[\\\\s\\\\x{0B}\\\\p{Z}\\\\x{85}\\\\x{1C}-\\\\x{1F}]`` both equal
    ``str.isspace()`` / ``re \\\\s`` EXACTLY over all codepoints.
  * Java letters are a strict SUBSET of CPython letters (+515 cps);
    RE2 letters a strict SUPERSET (-4348 cps).
  * Java ``(?U)\\\\d`` misses the 10 Tangsa digits (Unicode 14).
  * CPython ``\\\\w`` adds Nl/No numerics (isalnum) and Unicode-14
    letters (+1420 cps) while Java ``(?U)\\\\w`` adds combining marks
    CPython excludes (-2436 cps).
"""

'''

_FOOTER = r'''

# ---------------------------------------------------------------------------
# derived single-char pattern fragments (Java fragments assume the
# enclosing pattern carries the (?U) flag)
# ---------------------------------------------------------------------------

# one Python-isalpha char, Java regex
PY_ALPHA_CHAR = "[\\p{L}" + JAVA_ALPHA_EXTRA + "]"
# one Python-isalpha char, RE2 (DuckDB): letter AND NOT a U15-only cp
PY_ALPHA_CHAR_RE2 = "[^\\P{L}" + RE2_ALPHA_EXCESS + "]"
# one Python re-\d char, Java (?U) context
PY_DIGIT_CHAR = "[\\d" + JAVA_DIGIT_EXTRA + "]"
# one Python re-\s char, Java (?U) context (isspace-faithful)
PY_SPACE_CHAR = "[\\s\\x1c-\\x1f]"
# one CPython upper-alpha char (isalpha() and isupper()), Java regex.
# Measured: the set equals category Lu under CPython's tables (no
# Other_Uppercase survivor is isalpha), Java 17's Lu is a strict
# subset (Unicode-14 additions), RE2's Lu matches it EXACTLY.
PY_UPPER_ALPHA_CHAR = "[\\p{Lu}" + JAVA_UPPER_EXTRA + "]"
# same class, RE2 (DuckDB) — measured exactly equal, no correction
PY_UPPER_ALPHA_CHAR_RE2 = "\\p{Lu}"
# one char matching Python [^\w\s] (the symbolic-bullet class), Java
# (?U) context: either a Java-word char Python does NOT count as word
# (combining marks), or not-word/space under the Python-adjusted sets
PY_NONWORDSPACE_CHAR = ("(?:[" + JAVA_WORD_EXCESS + "]|[^\\w\\s"
                        + "\\x1c-\\x1f" + JAVA_WORD_EXTRA + "])")


# ---------------------------------------------------------------------------
# Python int() accepts ANY Unicode-Nd digit ('١٢٣' == 123), so a
# CPython-faithful numeric parse of a \d+ capture must translate the
# non-ASCII digits to their decimal values before cast (one char per
# Nd codepoint, F.translate-ready)
# ---------------------------------------------------------------------------

NON_ASCII_ND_SRC = "__ND_SRC__"
NON_ASCII_ND_DST = "__ND_DST__"
'''


def main() -> int:
    emit = "--emit" in sys.argv

    cps = [i for i in range(0x110000) if not (0xD800 <= i <= 0xDFFF)]
    rd, rw = re.compile(r"\d"), re.compile(r"\w")
    py_alpha, py_space, py_d, py_w = set(), set(), set(), set()
    py_up = set()
    for i in cps:
        c = chr(i)
        if c.isalpha():
            py_alpha.add(i)
            if c.isupper():
                py_up.add(i)
        if c.isspace():
            py_space.add(i)
        if rd.match(c):
            py_d.add(i)
        if rw.match(c):
            py_w.add(i)
    # re \s for str equals the isspace set (verified each run)
    assert all(bool(re.match(r"\s", chr(i))) == (i in py_space)
               for i in list(py_space) + [0x41, 0x2028])

    from pyspark.sql import functions as F

    from social_media_ai_engineering_etl_spark.functions import (
        _unicode_py_classes as gen)
    from social_media_ai_engineering_etl_spark.functions.cleaning import (
        PY_WS_SPLIT)
    from social_media_ai_engineering_etl_spark.session import get_spark

    spark = get_spark("unicode-skew")
    pdf = pd.DataFrame({"id": cps, "c": [chr(i) for i in cps]})
    sdf = spark.createDataFrame(pdf)
    res = sdf.select(
        "id",
        F.col("c").rlike("^\\p{L}$").alias("jl"),
        F.col("c").rlike("^" + PY_WS_SPLIT.replace("+", "") + "$")
         .alias("js"),
        F.col("c").rlike("^(?U)\\d$").alias("jd"),
        F.col("c").rlike("^(?U)\\w$").alias("jw"),
        F.col("c").rlike("^\\p{Lu}$").alias("ju"),
        # the derived fragments, end-to-end
        F.col("c").rlike("^(?U)" + gen.PY_ALPHA_CHAR + "$").alias("fa"),
        F.col("c").rlike("^(?U)" + gen.PY_DIGIT_CHAR + "$").alias("fd"),
        F.col("c").rlike("^(?U)" + gen.PY_NONWORDSPACE_CHAR + "$")
         .alias("fn"),
        F.col("c").rlike("^(?U)" + getattr(gen, "PY_UPPER_ALPHA_CHAR",
                                           "$^") + "$").alias("fu")
        ).collect()
    j_alpha = {r.id for r in res if r.jl}
    j_space = {r.id for r in res if r.js}
    j_d = {r.id for r in res if r.jd}
    j_w = {r.id for r in res if r.jw}
    j_up = {r.id for r in res if r.ju}
    frag_alpha = {r.id for r in res if r.fa}
    frag_d = {r.id for r in res if r.fd}
    frag_nws = {r.id for r in res if r.fn}
    frag_up = {r.id for r in res if r.fu}

    con = duckdb.connect()
    con.register("pdf", pdf)
    dres = con.execute(
        r"SELECT id, regexp_matches(c, '^\p{L}$') AS dl, "
        r"regexp_matches(c, '^[\s\x{0B}\p{Z}\x{85}\x{1C}-\x{1F}]$') AS ds, "
        "regexp_matches(c, '^" + gen.PY_ALPHA_CHAR_RE2 + "$') AS fa, "
        r"regexp_matches(c, '^\p{Lu}$') AS du "
        "FROM pdf").fetchall()
    d_alpha = {r[0] for r in dres if r[1]}
    d_space = {r[0] for r in dres if r[2]}
    dfrag_alpha = {r[0] for r in dres if r[3]}
    d_up = {r[0] for r in dres if r[4]}

    print(f"py alpha {len(py_alpha)} | java \\p{{L}} {len(j_alpha)} | "
          f"re2 \\p{{L}} {len(d_alpha)}")
    print(f"py \\d {len(py_d)} | java (?U)\\d {len(j_d)}")
    print(f"py \\w {len(py_w)} | java (?U)\\w {len(j_w)}")

    deltas = {
        "JAVA_ALPHA_EXTRA": _ranges(py_alpha - j_alpha),
        "RE2_ALPHA_EXCESS": _ranges(d_alpha - py_alpha),
        "JAVA_DIGIT_EXTRA": _ranges(py_d - j_d),
        "JAVA_WORD_EXTRA": _ranges(py_w - j_w),
        "JAVA_WORD_EXCESS": _ranges(j_w - py_w),
        "JAVA_UPPER_EXTRA": _ranges(py_up - j_up),
    }

    ok = True
    # one-way containments the fragment construction relies on
    for name, bad in [("java alpha not py", j_alpha - py_alpha),
                      ("py alpha not re2", py_alpha - d_alpha),
                      ("java digit not py", j_d - py_d),
                      ("java Lu not py upper-alpha", j_up - py_up),
                      ("re2 Lu != py upper-alpha", d_up ^ py_up)]:
        if bad:
            ok = False
            print(f"CONTAINMENT BROKEN: {name}: {len(bad)} cps")
    # whitespace exactness
    if not (py_space == j_space == d_space):
        ok = False
        print("WHITESPACE DELTA:", sorted(py_space ^ j_space),
              sorted(py_space ^ d_space))
    # derived fragments classify exactly as CPython
    py_nws = {i for i in cps
              if i not in py_w and i not in py_space}
    has_up = hasattr(gen, "PY_UPPER_ALPHA_CHAR")
    for name, got, want in [("PY_ALPHA_CHAR", frag_alpha, py_alpha),
                            ("PY_DIGIT_CHAR", frag_d, py_d),
                            ("PY_NONWORDSPACE_CHAR", frag_nws, py_nws),
                            ("PY_ALPHA_CHAR_RE2", dfrag_alpha, py_alpha)
                            ] + ([("PY_UPPER_ALPHA_CHAR", frag_up, py_up)]
                                 if has_up else []):
        if got != want:
            ok = False
            print(f"FRAGMENT DIVERGES: {name}: {len(got ^ want)} cps, "
                  f"e.g. {sorted(hex(x) for x in (got ^ want))[:8]}")
    # generated constants match the fresh measurement
    comments = {
        "RE2_ALPHA_EXCESS": "\n# RE2 letters NOT Python-alpha "
                            "(Unicode-15 additions)\n",
        "JAVA_DIGIT_EXTRA": "\n# Python re \\\\d minus Java (?U)\\\\d "
                            "(Tangsa digits)\n",
        "JAVA_WORD_EXTRA": "\n# Python re \\\\w minus Java (?U)\\\\w "
                           "(Nl/No numerics + U14 letters)\n",
        "JAVA_WORD_EXCESS": "\n# Java (?U)\\\\w minus Python re \\\\w "
                            "(combining marks Mn/Mc/Me)\n",
        "JAVA_UPPER_EXTRA": "\n# CPython upper-alpha (isalpha & isupper"
                            " == category Lu under CPython's tables)\n"
                            "# minus Java \\\\p{Lu} (Unicode-14 "
                            "additions, e.g. Vithkuqi)\n",
    }
    body = [_HEADER]
    for name, rr in deltas.items():
        body.append(comments.get(name, ""))
        body.append(_pywrap(name, rr))
        measured = "".join(_parts(rr))
        if getattr(gen, name, None) != measured:
            ok = False
            print(f"PINNED CONSTANT STALE: {name}")
    import unicodedata
    nd_src, nd_dst = [], []
    for i in sorted(py_d):
        c = chr(i)
        if not ("0" <= c <= "9"):
            nd_src.append(c)
            nd_dst.append(str(unicodedata.digit(c)))
    esc = "".join(f"\\U{ord(c):08X}" if ord(c) > 0xFFFF
                  else f"\\u{ord(c):04X}" for c in nd_src)
    footer = _FOOTER.replace("__ND_SRC__", esc)
    footer = footer.replace("__ND_DST__", "".join(nd_dst))
    body.append(footer)

    if emit:
        with open(MODULE, "w") as f:
            f.write("".join(body))
        print(f"emitted {MODULE}")
        return 0

    print("SWEEP", "CLEAN — constants + fragments verified"
          if ok else "DIVERGED — rerun with --emit and re-test")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

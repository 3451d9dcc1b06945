"""Unicode-version skew sweep: CPython vs Java 17 (Spark) vs RE2
(DuckDB) letter/whitespace classification over EVERY codepoint.

The engines ship different Unicode tables (CPython 3.11 = 14.0,
Java 17 = 13.0, DuckDB's RE2 = 15.x), so `str.isalpha()` and any
`\\p{L}` transcription of it disagree on the codepoints assigned
between those versions — found live by the r7 differential fuzzer
(U+9FFF counted as a word by the reference but not by a Java \\p{L}
filter, shifting a stage-18 vocabulary bucket).

This script MEASURES the deltas and prints them as regex-class
fragments; the pinned constants in functions/cleaning.py
(_JAVA_ALPHA_EXTRA / _RE2_ALPHA_EXCESS) must equal its output —
tests/test_null_semantics.py::test_unicode_alpha_skew_pinned checks
every skew codepoint through all three engines at test time.

Also verified here (and relied on everywhere): WHITESPACE needs no
correction — Java `(?U)[\\s\\x1c-\\x1f]` and the RE2 class
`[\\s\\x{0B}\\p{Z}\\x{85}\\x{1C}-\\x{1F}]` both equal
`str.isspace()` EXACTLY over all codepoints.

Usage: python scripts/unicode_skew.py
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from social_media_ai_engineering_etl_spark.functions import cleaning  # noqa: E402
from social_media_ai_engineering_etl_spark.session import get_spark  # noqa: E402


def _ranges(xs):
    out: list[list[int]] = []
    for x in sorted(xs):
        if out and x == out[-1][1] + 1:
            out[-1][1] = x
        else:
            out.append([x, x])
    return out


def _cls(ranges):
    return "".join(f"\\x{{{a:X}}}" if a == b else f"\\x{{{a:X}}}-\\x{{{b:X}}}"
                   for a, b in ranges)


def main() -> int:
    cps = [i for i in range(0x110000) if not (0xD800 <= i <= 0xDFFF)]
    py_alpha = {i for i in cps if chr(i).isalpha()}
    py_space = {i for i in cps if chr(i).isspace()}
    pdf = pd.DataFrame({"id": cps, "c": [chr(i) for i in cps]})

    from pyspark.sql import functions as F
    spark = get_spark("unicode-skew")
    res = spark.createDataFrame(pdf).select(
        "id",
        F.col("c").rlike("^\\p{L}$").alias("jl"),
        F.col("c").rlike("^" + cleaning.PY_WS_SPLIT.replace("+", "") + "$")
         .alias("js")).collect()
    j_alpha = {r.id for r in res if r.jl}
    j_space = {r.id for r in res if r.js}

    con = duckdb.connect()
    con.register("pdf", pdf)
    dres = con.execute(
        r"SELECT id, regexp_matches(c, '^\p{L}$') AS dl, "
        r"regexp_matches(c, '^[\s\x{0B}\p{Z}\x{85}\x{1C}-\x{1F}]$') AS ds "
        "FROM pdf").fetchall()
    d_alpha = {r[0] for r in dres if r[1]}
    d_space = {r[0] for r in dres if r[2]}

    print("py_alpha:", len(py_alpha), "java \\p{L}:", len(j_alpha),
          "re2 \\p{L}:", len(d_alpha))
    java_extra = _cls(_ranges(py_alpha - j_alpha))
    re2_excess = _cls(_ranges(d_alpha - py_alpha))
    print("\n_JAVA_ALPHA_EXTRA (py-alpha, not java-letter):\n", java_extra)
    print("\njava-letter not py-alpha (must be empty):",
          _cls(_ranges(j_alpha - py_alpha)) or "<empty>")
    print("\n_RE2_ALPHA_EXCESS (re2-letter, not py-alpha):\n", re2_excess)
    print("\npy-alpha not re2-letter (must be empty):",
          _cls(_ranges(py_alpha - d_alpha)) or "<empty>")
    print("\nwhitespace deltas (all must be empty):",
          sorted(py_space ^ j_space), sorted(py_space ^ d_space))

    ok = (java_extra == cleaning._JAVA_ALPHA_EXTRA.replace("\\\\", "\\")
          or java_extra == cleaning._JAVA_ALPHA_EXTRA)
    ok &= (re2_excess == cleaning._RE2_ALPHA_EXCESS.replace("\\\\", "\\")
           or re2_excess == cleaning._RE2_ALPHA_EXCESS)
    ok &= not (j_alpha - py_alpha) and not (py_alpha - d_alpha)
    ok &= py_space == j_space == d_space
    print("\nPINNED CONSTANTS", "MATCH" if ok else "DIVERGE — update cleaning.py")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

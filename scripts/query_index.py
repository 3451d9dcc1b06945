"""Generate QUERIES.md: every registered query, its oracle status,
bench membership, grade-window slot, and docstring summary.

    python scripts/query_index.py > QUERIES.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import social_media_ai_engineering_etl_spark.queries as q  # noqa: E402
from social_media_ai_engineering_etl_spark.registry import (  # noqa: E402
    BENCH,
    ORACLES,
    QUERIES,
)


def main() -> None:
    window = set(q.GRADE_WINDOW)
    print("# Query index\n")
    print(f"{len(QUERIES)} registered queries — {len(ORACLES)} "
          "oracle-checked (driver value-hash vs DuckDB), the rest "
          "rows-only by design (seeded/model/sketch paths) with pytest "
          "contracts. Flags: O = oracle-paired, W = in the driver's "
          "50-slot grade window, B = bench headliner.\n")
    print("| # | query | flags | summary |")
    print("|---|---|---|---|")
    for i, (name, fn) in enumerate(QUERIES.items(), 1):
        doc = (fn.__doc__ or "").strip().split("\n")
        summary = " ".join(s.strip() for s in doc[:2]).strip()
        if len(summary) > 110:
            summary = summary[:107] + "..."
        flags = "".join(["O" if name in ORACLES else "-",
                         "W" if name in window else "-",
                         "B" if name in BENCH else "-"])
        print(f"| {i} | `{name}` | {flags} | {summary} |")




def census() -> None:
    """Cumulative 'driver-graded at least once' census (VERDICT r5
    ask #2): which oracle-paired queries have appeared in a
    CORRECTNESS_r*.json grade window, and in which rounds."""
    import glob
    import json
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    graded: dict[str, list[str]] = {}
    for f in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(f).split("_r")[1].split(".")[0]
        for k in json.load(open(f)):
            graded.setdefault(k, []).append(rnd)
    window = set(q.GRADE_WINDOW)
    oracle_paired = [n for n in QUERIES if n in ORACLES]
    pending_now = [n for n in oracle_paired
                   if n not in graded and n in window]
    never = [n for n in oracle_paired
             if n not in graded and n not in window]
    print("\n## Driver-graded census\n")
    print(f"Oracle-paired: {len(oracle_paired)}. Driver-graded at least "
          f"once: {len(graded)}. In the current window awaiting their "
          f"first grading: {len(pending_now)}. Not yet graded and not "
          f"in the current window: {len(never)} (next rotations pull "
          "from this list).\n")
    print("| query | graded in rounds |")
    print("|---|---|")
    for n in oracle_paired:
        if n in graded:
            print(f"| `{n}` | {', '.join(graded[n])} |")
    print("\nAwaiting first grading in the current window: "
          + ", ".join(f"`{n}`" for n in pending_now) + "\n")
    print("Never graded, not in window: "
          + ", ".join(f"`{n}`" for n in never) + "\n")


if __name__ == "__main__":
    main()
    census()

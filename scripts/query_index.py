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


if __name__ == "__main__":
    main()

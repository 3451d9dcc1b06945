"""Generate COVERAGE.md: SURVEY §2 row-ID -> implementation sites.

Scans the package + tests for word-boundary mentions of each operator
row ID (P1..P20, A1..A16, ...) and emits a table with file:line
references, so the §2 line-by-line check is a lookup, not a hunt.

    python scripts/coverage_map.py > COVERAGE.md
"""

from __future__ import annotations

import pathlib
import re

ROWS = [("S", 10), ("P", 20), ("A", 16), ("J", 6), ("B", 8), ("F", 2),
        ("T", 15), ("M", 18), ("R", 20)]

SECTIONS = {
    "S": "2.1 scans/sources/sinks", "P": "2.2 row transforms",
    "A": "2.3 aggregations", "J": "2.4 join-shaped",
    "B": "2.5 sampling/balancing/splits", "F": "2.6 fan-out",
    "T": "2.8 text/NLP features", "M": "2.10 ML/analytics",
    "R": "2.11 rewards",
}


def main() -> None:
    files: dict[str, list[str]] = {}
    for base in ("social_media_ai_engineering_etl_spark", "tests"):
        for p in sorted(pathlib.Path(base).rglob("*.py")):
            files[str(p)] = p.read_text().splitlines()

    print("# SURVEY §2 coverage map\n")
    print("Where each operator row is implemented/tested "
          "(word-boundary mentions of the row ID in docstrings and "
          "comments; regenerate with scripts/coverage_map.py).\n")
    for prefix, maxn in ROWS:
        print(f"## {SECTIONS[prefix]}\n")
        print("| row | sites |")
        print("|---|---|")
        for i in range(1, maxn + 1):
            rid = f"{prefix}{i}"
            pat = re.compile(rf"\b{rid}\b")
            sites = []
            for path, lines in files.items():
                for ln, line in enumerate(lines, 1):
                    if pat.search(line):
                        sites.append(f"{path}:{ln}")
            shown = sites[:4]
            more = f" (+{len(sites) - 4} more)" if len(sites) > 4 else ""
            cell = "<br>".join(shown) + more if shown else "—"
            print(f"| {rid} | {cell} |")
        print()


if __name__ == "__main__":
    main()

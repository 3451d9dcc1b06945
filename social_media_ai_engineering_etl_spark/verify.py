"""Driver-faithful exact result comparison.

The driver's CORRECTNESS gate compares a Spark result and a DuckDB
oracle result with an order-insensitive **exact value hash**: columns
sorted by name, each cell canonically stringified with the int/float
distinction preserved and no numeric tolerance.  Two rounds running, a
hash-class bug (float-ulp in r1, DuckDB HUGEINT sums rendering ``7195.0``
vs Spark's ``7195`` in r2) passed the repo's tolerant local compare and
failed the driver.  This module is the local mirror of that hash so the
failure class cannot pass locally again: :func:`exact_value_hash` is run
over every oracle-paired query in tests/ and scripts/verify_driver.py.

Canonical form per cell:

* missing (``None``/``NaN``/``NaT``) -> ``NULL``
* bool -> ``true`` / ``false``         (checked before int: bool < int)
* integer kinds -> ``str(int(v))``     (``7195``)
* float kinds -> ``repr(float(v))``    (``7195.0`` — distinct from int)
* bytes -> ``0x`` hex
* arrays/structs -> recursive ``[...]`` / ``{k:v,...}`` (keys sorted)
* timestamps/dates -> ISO format
* everything else -> ``str``
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

__all__ = ["canon_cell", "canon_rows", "exact_value_hash", "exact_diff"]


def canon_cell(v) -> str:
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{k}:{canon_cell(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return "NULL" if math.isnan(f) else repr(f)
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[str]:
    """Sorted canonical row strings (columns sorted by name)."""
    df = df.reindex(sorted(df.columns), axis=1)
    return sorted(
        "\x1f".join(canon_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None))


def exact_value_hash(df: pd.DataFrame) -> str:
    h = hashlib.md5()
    for r in canon_rows(df):
        h.update(r.encode("utf-8", "surrogatepass"))
        h.update(b"\x1e")
    return h.hexdigest()


def exact_diff(got: pd.DataFrame, want: pd.DataFrame,
               max_rows: int = 3) -> str | None:
    """None when the exact hashes agree; else a short human diff of the
    first few canonical rows present on one side only."""
    g, w = canon_rows(got), canon_rows(want)
    if g == w:
        return None
    gs, ws = set(g), set(w)
    only_g = [r for r in g if r not in ws][:max_rows]
    only_w = [r for r in w if r not in gs][:max_rows]
    parts = []
    if len(g) != len(w):
        parts.append(f"row count {len(g)} vs {len(w)}")
    for label, rows in (("spark-only", only_g), ("oracle-only", only_w)):
        for r in rows:
            parts.append(f"{label}: {r.replace(chr(31), ' | ')[:220]}")
    if not parts:  # same multiset as sets — duplicate-count difference
        parts.append("duplicate-row multiplicity differs")
    return "; ".join(parts)

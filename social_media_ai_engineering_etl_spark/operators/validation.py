"""Declarative data-quality constraints (expectations-style checker,
generalizing the reference's P18 record validation,
23-prepare-dataset.py record gates, into a reusable surface).

``check(df, rules)`` evaluates every rule in ONE pass: each rule
compiles to a 0/1 violation expression, all of them summed in a single
map-side-combinable aggregate — never one job (or one scan) per rule.
``unique`` rules are the exception by nature (they need a per-key
count) and run as one extra aggregate per distinct key-set, shuffled
on that key.

Rule shapes (dicts, so configs can live in JSON sidecars):
  {"rule": "not_null",  "col": c}
  {"rule": "in_range",  "col": c, "min": x, "max": y}   # inclusive
  {"rule": "in_set",    "col": c, "values": [...]}
  {"rule": "matches",   "col": c, "pattern": regex}
  {"rule": "unique",    "cols": [c, ...]}
NULLs: not_null counts them; the value rules treat NULL as a
violation too (a NULL price is not "in range") — the null-blind
~predicate trap the r1 ADVICE flagged in _validate_split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _violation_expr(rule: dict):
    kind = rule["rule"]
    if kind == "not_null":
        return F.col(rule["col"]).isNull()
    if kind == "in_range":
        ok = (F.col(rule["col"]) >= rule["min"]) \
            & (F.col(rule["col"]) <= rule["max"])
    elif kind == "in_set":
        ok = F.col(rule["col"]).isin(*rule["values"])
    elif kind == "matches":
        ok = F.col(rule["col"]).rlike(rule["pattern"])
    else:
        raise ValueError(f"unknown rule {kind!r}")
    # NULL fails value rules (coalesce, not NULL-propagating ~ok)
    return ~F.coalesce(ok, F.lit(False))


def rule_name(rule: dict) -> str:
    if "name" in rule:
        return rule["name"]
    col = rule.get("col") or ",".join(rule.get("cols", []))
    return f"{rule['rule']}({col})"


def check(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate all rules; returns (rule, n_violations, n_rows) one
    row per rule, stable rule order by name."""
    scalar = [r for r in rules if r["rule"] != "unique"]
    uniq = [r for r in rules if r["rule"] == "unique"]
    spark = df.sparkSession

    parts = []
    if scalar:
        aggs = [F.sum(_violation_expr(r).cast("long")).alias(rule_name(r))
                for r in scalar]
        aggs.append(F.count(F.lit(1)).alias("__n"))
        row = df.agg(*aggs)
        stack = ", ".join(
            f"'{rule_name(r)}', `{rule_name(r)}`" for r in scalar)
        parts.append(row.selectExpr(
            f"stack({len(scalar)}, {stack}) AS (rule, n_violations)",
            "__n AS n_rows"))
    for r in uniq:
        keys = r["cols"]
        # violations = rows belonging to a key seen more than once
        dup = (df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__c"))
               .filter(F.col("__c") > 1)
               .agg(F.coalesce(F.sum("__c"), F.lit(0)).alias("n_violations")))
        total = df.count()
        parts.append(dup.select(F.lit(rule_name(r)).alias("rule"),
                                F.col("n_violations"),
                                F.lit(total).alias("n_rows")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("rule")


def gate(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Row-level gate: keep only rows violating NO scalar rule (the
    P18/_validate_split shape). ``unique`` rules are report-only —
    deciding WHICH duplicate to keep is dedup's job, not a filter's."""
    keep = F.lit(True)
    for r in rules:
        if r["rule"] == "unique":
            continue
        keep = keep & ~_violation_expr(r)
    return df.filter(keep)

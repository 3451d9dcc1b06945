"""Grouped-aggregate pandas UDAFs — the §2.13 aggregate-function
surface (scalar pandas UDFs, mapInPandas, applyInPandas and UDTFs are
covered elsewhere; this module adds the GROUPED_AGG shape, which
Spark runs as a real partial-less aggregate over Arrow batches and
which is also legal OVER a window).

Only aggregates whose semantics built-ins cannot express belong here:
a weighted median has no native Spark expression (percentile() is
unweighted; percentile_approx() is both unweighted and approximate).
The implementation is exact and integer-deterministic, so DuckDB can
replay it with a window transcription and the driver can value-hash
it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.pandas.functions import pandas_udf


def weighted_median_udaf():
    """Exact lower weighted median as a GROUPED_AGG pandas UDF:
    the smallest value v whose cumulative weight reaches half the
    group's total weight (2 * cum(v) >= total) — the deterministic
    tie policy both engines can agree on, with no interpolation and
    no floating point anywhere.

    Scale shape: GROUPED_AGG ships each group's (value, weight)
    columns as ONE Arrow batch to a worker — O(group) memory, fine
    for per-key grains (a group = one source / author / day), wrong
    for whole-table medians (use percentile_approx's mergeable
    sketch there).  Sorting is in-worker numpy, never a Spark-side
    global sort.
    """

    @pandas_udf("long")
    def weighted_median(v: pd.Series, w: pd.Series) -> int:
        # drop null value/weight rows explicitly: np.asarray(int64) on
        # a pandas Series holding NaN raises an opaque Arrow-worker
        # error; SQL aggregates skip nulls, so the UDAF does too
        mask = v.notna() & w.notna()
        arr = np.asarray(v[mask], dtype=np.int64)
        wt = np.asarray(w[mask], dtype=np.int64)
        if arr.size == 0:
            return None  # all-null group -> NULL, like any SQL agg
        order = np.argsort(arr, kind="stable")
        arr = arr[order]
        cum = np.cumsum(wt[order])
        total = cum[-1]
        idx = int(np.searchsorted(2 * cum, total, side="left"))
        return int(arr[idx])

    return weighted_median


def weighted_quantile_udaf(q_num: int, q_den: int):
    """Exact lower weighted q-quantile (q = q_num/q_den, 0 < q <= 1)
    as a GROUPED_AGG pandas UDF: the smallest value v with
    cum_weight(v) * q_den >= total_weight * q_num — the same
    integer cross-multiplied tie policy as :func:`weighted_median_udaf`
    (which is the q=1/2 instance), so any quantile is replayable in
    SQL with no floating point.  Same O(group)-memory scale shape."""
    assert 0 < q_num <= q_den, "need 0 < q <= 1"

    @pandas_udf("long")
    def weighted_quantile(v: pd.Series, w: pd.Series) -> int:
        # null handling: see weighted_median (SQL-aggregate skip-null
        # semantics; avoids the Arrow int64-with-NaN cast error)
        mask = v.notna() & w.notna()
        arr = np.asarray(v[mask], dtype=np.int64)
        wt = np.asarray(w[mask], dtype=np.int64)
        if arr.size == 0:
            return None  # all-null group -> NULL, like any SQL agg
        order = np.argsort(arr, kind="stable")
        arr = arr[order]
        cum = np.cumsum(wt[order])
        total = cum[-1]
        idx = int(np.searchsorted(cum * q_den, total * q_num,
                                  side="left"))
        return int(arr[idx])

    return weighted_quantile

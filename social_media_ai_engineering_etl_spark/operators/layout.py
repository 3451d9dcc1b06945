"""Z-order (Morton) data layout: multi-dimensional clustering so
parquet min/max statistics prune scans on EVERY interleaved dimension,
not just the leading sort key.

At 100 TB the table is written once and queried by many predicates;
a linear sort serves only its leading column (a filter on the second
column touches every file). Interleaving the bits of k bucketized
columns into one sort key bounds each file's span in ALL k dimensions,
so row-group pruning works for box predicates on any of them — the
technique behind Delta/Iceberg OPTIMIZE ZORDER.  Everything here is
integer bit arithmetic on already-bucketized columns (native exprs,
bit-identical in any engine), which is what makes the layout
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Morton-interleave ``bits`` low bits of each non-negative
    bucketized column: output bit ``i*k + j`` is bit ``i`` of column
    ``j``.  k*bits must stay <= 63.  Callers bucketize raw values
    first (clamped width_bucket / DIV); out-of-range bits above
    ``bits`` are masked off so a stray large bucket cannot corrupt
    neighbours' bit lanes."""
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds a long")
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        cl = c.cast("long")
        for i in range(bits):
            bit = F.shiftright(cl, i).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, i * k + j)
    return key


def zorder_key_sql(col_names: list[str], bits: int = 8) -> str:
    """The identical interleave as a SQL expression string (unrolled
    shifts) — the oracle twin of :func:`zorder_key`."""
    terms = []
    for j, c in enumerate(col_names):
        for i in range(bits):
            terms.append(
                f"(({c} // {1 << i}) % 2) * {1 << (i * len(col_names) + j)}")
    return "(" + " + ".join(terms) + ")"


def zorder_cell_stats(df: DataFrame, bucket_cols: list[str],
                      bits: int = 8, cell_shift: int = 10) -> DataFrame:
    """Cluster-quality profile of a z-ordered layout: group rows into
    coarse cells (zkey >> cell_shift ~ one file / row group each) and
    report each cell's row count and per-dimension min/max span.
    Under a good z-layout EVERY dimension's span is ~2^(cell_shift/k)
    buckets — small for all, instead of tiny for the sort-leader and
    full-range for the rest.  Pure map + one groupBy on the cell id."""
    zk = zorder_key([F.col(c) for c in bucket_cols], bits)
    d = df.withColumn("__cell",
                      F.shiftright(zk, cell_shift).cast("long"))
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in bucket_cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return d.groupBy(F.col("__cell").alias("cell")).agg(*aggs)


def compaction_plan(spark, path: str,
                    target_bytes: int = 128 * 1024 * 1024):
    """Small-file compaction PLAN for a parquet directory: group files
    into next-fit bins of ~``target_bytes`` using only the scan's
    ``_metadata`` hidden column (file path + size) — pure metadata,
    no row data read.  The small-files pathology is the silent 100 TB
    killer: a table of 10 KB files pays a scan-task + footer read per
    file and floods the driver with splits; nightly compaction keeps
    scan tasks ~one row-group each.

    Returns (bin_id, n_files, total_bytes, files) — one row per
    output file the compactor should write.  Bin assignment is
    deterministic: files ordered by (size DESC, path) fold into
    next-fit bins (the qx_pack_sequences discipline applied to file
    sizes).
    """
    from pyspark.sql import functions as F

    meta = (spark.read.parquet(path)
            .select(F.col("_metadata.file_path").alias("file"),
                    F.col("_metadata.file_size").alias("bytes"))
            .distinct().orderBy(F.col("bytes").desc(), F.col("file")))
    rows = meta.collect()          # one row per FILE: metadata-sized
    bins, cur, cur_bytes, bin_id = [], [], 0, 0
    for r in rows:
        if cur and cur_bytes + r["bytes"] > target_bytes:
            bins.append((bin_id, len(cur), cur_bytes, [f for f in cur]))
            bin_id, cur, cur_bytes = bin_id + 1, [], 0
        cur.append(r["file"])
        cur_bytes += r["bytes"]
    if cur:
        bins.append((bin_id, len(cur), cur_bytes, cur))
    return spark.createDataFrame(
        bins, "bin_id INT, n_files INT, total_bytes BIGINT, "
              "files array<string>")


def compact(spark, path: str, out_path: str,
            target_bytes: int = 128 * 1024 * 1024) -> int:
    """Execute a :func:`compaction_plan`: rewrite the directory so
    each output file is ~``target_bytes``.  Row data is read ONCE;
    the bin count from the plan sizes the repartition, so output
    files land near the target without a second pass.  Returns the
    number of output files written."""
    plan = compaction_plan(spark, path, target_bytes)
    n_bins = plan.count()
    df = spark.read.parquet(path)
    df.repartition(max(n_bins, 1)).write.mode("overwrite").parquet(out_path)
    import os as _os
    return sum(1 for f in _os.listdir(out_path)
               if f.endswith(".parquet"))

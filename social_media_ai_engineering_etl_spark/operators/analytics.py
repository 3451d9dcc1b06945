"""Analytics operators for stages 20/21 (SURVEY §2.10) — the native
(non-MLlib) pieces: feature tables, scaling, correlation, cluster
distribution/purity, centroid separability, ablation metrics. MLlib
model operators (RF, KMeans, PCA) live in :mod:`.mllib_pipeline`.

All-native expressions/aggregations; every operator here is
DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textstats import avg_word_length, char_count, word_count


def text_feature_table(df: DataFrame, text_col: str) -> DataFrame:
    """M1 (20-permutation-and-correlation.py:159-241): numeric text
    features as one wide projection."""
    t = F.col(text_col)
    return df.withColumns({
        "text_length": F.length(t),
        "word_count": word_count(t),
        "avg_word_length": F.round(avg_word_length(t), 6),
        "punct_period": char_count(t, "."),
        "punct_comma": char_count(t, ","),
        "punct_exclaim": char_count(t, "!"),
        "punct_question": char_count(t, "?"),
        "line_count": char_count(t, "\n") + 1,
        "paragraph_count": F.size(F.filter(
            F.transform(F.split(t, "\n\n"), lambda p: F.trim(p)),
            lambda p: p != "")),
    })


def standard_scale(df: DataFrame, cols: list[str],
                   suffix: str = "_scaled") -> DataFrame:
    """M3 (20:293-312): (x - mean) / stddev_pop per column, one
    single-pass aggregate broadcast back (no per-column shuffles).
    NULLs fill 0 before scaling (reference fillna(0)).

    INTEGER columns take the exact-moments path: mean = Sx/n and
    stddev_pop = sqrt(Sxx/n - (Sx/n)^2) from exact BIGINT sums, so
    the broadcast stats are bit-identical on every engine and every
    partial-aggregation order (avg()/stddev_pop() float merging is
    order-dependent; with 5000+ rounded output cells, a last-ulp
    drift in the stats flips some round(·,6) digit somewhere — the r3
    sf0.1-sweep failure class).  Float columns keep the native path."""
    int_types = {"tinyint", "smallint", "int", "bigint"}
    dtypes = dict(df.dtypes)
    aggs = []
    for c in cols:
        if dtypes.get(c) in int_types:
            x = F.coalesce(F.col(c), F.lit(0)).cast("long")
            aggs += [(F.sum(x).cast("double") / F.count(F.lit(1)))
                     .alias(f"__m_{c}"),
                     F.sqrt(F.sum(x * x).cast("double") / F.count(F.lit(1))
                            - (F.sum(x).cast("double") / F.count(F.lit(1)))
                            * (F.sum(x).cast("double") / F.count(F.lit(1))))
                     .alias(f"__s_{c}")]
        else:
            filled = F.coalesce(F.col(c).cast("double"), F.lit(0.0))
            aggs += [F.avg(filled).alias(f"__m_{c}"),
                     F.stddev_pop(filled).alias(f"__s_{c}")]
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        filled = F.coalesce(F.col(c).cast("double"), F.lit(0.0))
        scaled = F.when(F.col(f"__s_{c}") > 0,
                        (filled - F.col(f"__m_{c}")) / F.col(f"__s_{c}")
                        ).otherwise(F.lit(0.0))
        out = out.withColumn(c + suffix, F.round(scaled, 6))
    return out.drop(*[f"__m_{c}" for c in cols], *[f"__s_{c}" for c in cols])


def min_max_normalize(df: DataFrame, col: str, out: str) -> Column | DataFrame:
    """A14 (20:150-153): (x - min) / (max - min) via a broadcast 1-row
    aggregate; 0.0 when constant."""
    stats = df.agg(F.min(col).alias("__lo"), F.max(col).alias("__hi"))
    joined = df.crossJoin(F.broadcast(stats))
    norm = F.when(F.col("__hi") > F.col("__lo"),
                  (F.col(col) - F.col("__lo"))
                  / (F.col("__hi") - F.col("__lo"))).otherwise(F.lit(0.0))
    return joined.withColumn(out, F.round(norm, 6)).drop("__lo", "__hi")


def feature_target_correlations(df: DataFrame, feature_cols: list[str],
                                target: str) -> DataFrame:
    """M7 (20:384-407): Pearson r of each feature vs the target in ONE
    aggregate pass (map-side combinable corr), unpivoted to
    (feature, correlation) rows sorted by |r| desc."""
    def pearson(c):
        # try_divide instead of corr(): ANSI mode makes corr() raise
        # on zero-variance features; NULL -> 0.0 downstream instead.
        x, y = F.col(c).cast("double"), F.col(target).cast("double")
        return F.try_divide(F.covar_pop(x, y),
                            F.stddev_pop(x) * F.stddev_pop(y))

    aggs = [pearson(c).alias(c) for c in feature_cols]
    row = df.agg(*aggs)
    stacked = row.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("feature"),
                 F.round(F.coalesce(F.col(c), F.lit(0.0)), 6)
                 .alias("correlation"))
        for c in feature_cols])).alias("kv")).select("kv.*")
    return stacked.orderBy(F.abs(F.col("correlation")).desc(), "feature")


def cluster_value_distribution(df: DataFrame, cluster_col: str,
                               value_col: str) -> DataFrame:
    """A11 (21:409-461): per-cluster value shares + dominant flag via
    one groupBy + two windows (no crosstab materialization)."""
    counts = (df.groupBy(cluster_col, value_col)
              .agg(F.count(F.lit(1)).alias("n")))
    w_cluster = Window.partitionBy(cluster_col)
    w_rank = Window.partitionBy(cluster_col).orderBy(
        F.col("n").desc(), F.col(value_col))
    return (counts
            .withColumn("share",
                        F.round(F.col("n") / F.sum("n").over(w_cluster), 6))
            .withColumn("rank", F.row_number().over(w_rank))
            .withColumn("is_dominant", (F.col("rank") == 1).cast("int"))
            .drop("rank"))


def feature_purity(df: DataFrame, value_col: str,
                   cluster_col: str) -> DataFrame:
    """A12 (21:463-518): for each feature value, the dominant cluster
    and its share of that value's rows."""
    counts = (df.groupBy(value_col, cluster_col)
              .agg(F.count(F.lit(1)).alias("n")))
    w_val = Window.partitionBy(value_col)
    w_rank = Window.partitionBy(value_col).orderBy(
        F.col("n").desc(), F.col(cluster_col))
    return (counts
            .withColumn("share",
                        F.round(F.col("n") / F.sum("n").over(w_val), 6))
            .withColumn("rk", F.row_number().over(w_rank))
            .filter(F.col("rk") == 1)
            .select(value_col, F.col(cluster_col).alias("dominant_cluster"),
                    F.col("share").alias("purity")))


def group_centroids(df: DataFrame, group_col: str,
                    vec_col: str) -> DataFrame:
    """Element-wise mean vector per group: posexplode -> groupBy
    (group, dim) -> avg -> re-assemble sorted by dim. Scales as one
    shuffle on (group, dim)."""
    exploded = df.select(F.col(group_col).alias("g"),
                         F.posexplode(F.col(vec_col).cast("array<double>"))
                         .alias("dim", "x"))
    means = exploded.groupBy("g", "dim").agg(F.avg("x").alias("m"))
    return (means.groupBy("g")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m")))
                 .alias("dm"))
            .select("g", F.transform(F.col("dm"), lambda s: s["m"])
                    .alias("centroid")))


def separability(df: DataFrame, group_col: str, vec_col: str) -> DataFrame:
    """M14 (21:825-890): mean pairwise L2 distance between group
    centroids — the between-group separability score. Centroid table
    is tiny (one row per group), so the pairwise stage is a broadcast
    self-join."""
    cents = group_centroids(df, group_col, vec_col)
    a = cents.select(F.col("g").alias("g1"), F.col("centroid").alias("c1"))
    b = cents.select(F.col("g").alias("g2"), F.col("centroid").alias("c2"))
    dist = F.sqrt(F.aggregate(
        F.zip_with(F.col("c1"), F.col("c2"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, v: acc + v))
    return (a.join(F.broadcast(b), F.col("g1") < F.col("g2"))
            .select("g1", "g2", F.round(dist, 6).alias("centroid_l2")))


def ablation_text_diffs(df: DataFrame, text_a: str, text_b: str) -> DataFrame:
    """M16 (4-structure-micro-ablation.py:152-195): with/without text
    diffs — length delta %, paragraph count delta, bullet-line count
    delta."""
    def paras(c):
        return F.size(F.filter(
            F.transform(F.split(F.col(c), "\n\n"), lambda p: F.trim(p)),
            lambda p: p != ""))

    def bullets(c):
        lines = F.split(F.col(c), "\n", -1)
        return F.size(F.filter(
            lines, lambda l: F.trim(l).rlike(r"^(\d+[.)]|[-*•])\s+")))

    len_a = F.length(text_a)
    return df.withColumns({
        "length_delta_pct": F.round(
            F.when(len_a > 0,
                   (F.length(text_b) - len_a).cast("double") * 100 / len_a)
            .otherwise(F.lit(0.0)), 6),
        "paragraph_delta": paras(text_b) - paras(text_a),
        "bullet_delta": bullets(text_b) - bullets(text_a),
    })


def feature_target_correlations_exact(df: DataFrame,
                                      feature_cols: list[str],
                                      target: str,
                                      target_scale: int = 1_000_000
                                      ) -> DataFrame:
    """Cross-engine-DETERMINISTIC Pearson r: the target is quantized
    per row to ``target_scale`` integer units, every moment (n, Sx,
    Sy, Sxx, Syy, Sxy) is an exact BIGINT sum (integer addition is
    order-independent — ``corr()``'s float moment merging is not, and
    its last-ulp drift flips round(...,6) digits at sf0.1), and the
    final r combines those integers in one fixed IEEE op sequence
    identical to the SQL oracle's.  Features must be integer-valued
    columns.  Returns (feature, correlation) rows."""
    y = F.round(F.col(target) * target_scale).cast("long")

    def pearson(c):
        x = F.col(c).cast("long")
        n = F.count(F.lit(1)).cast("double")
        sx = F.sum(x).cast("double")
        sy = F.sum(y).cast("double")
        sxx = F.sum(x * x).cast("double")
        syy = F.sum(y * y).cast("double")
        sxy = F.sum(x * y).cast("double")
        num = n * sxy - sx * sy
        den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        return F.try_divide(num, den)

    row = df.agg(*[pearson(c).alias(c) for c in feature_cols])
    return row.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("feature"),
                 F.coalesce(F.col(c), F.lit(0.0)).alias("correlation"))
        for c in feature_cols])).alias("fc")).select("fc.feature",
                                                     "fc.correlation")

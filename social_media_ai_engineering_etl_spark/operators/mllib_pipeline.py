"""M18 TF-IDF: imported-only in the reference (21:20), never used — no engine surface (documented n/a).

MLlib model operators (SURVEY §2.10 M2, M4-M6, M11-M13): one-hot
encoding, random-forest importance, permutation importance, KMeans
sweep with silhouette, PCA projection.

Implementation notes vs the reference (sklearn):
  * RandomForestRegressor/KMeans/PCA are MLlib — same hyperparameters
    (n=100/depth=10/seed=42; k sweep seed 42), different internals, so
    checks are metric-level (rows-only for the driver), matching
    SURVEY §2.10 'no oracle' markers.
  * permutation importance (M6, 20:361-382) has no MLlib built-in:
    implemented by re-keying ONE feature with rand(seed) per repeat
    (a distributed shuffle of that column) and re-scoring.
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.evaluation import ClusteringEvaluator, RegressionEvaluator
from pyspark.ml.feature import PCA, VectorAssembler
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.ml.regression import RandomForestRegressor
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def one_hot_counts(df: DataFrame, col: str,
                   null_label: str = "unknown") -> DataFrame:
    """M2 (20:243-291) as its oracle-checkable projection: category ->
    count with NULL -> 'unknown' (reference NaN handling). The dense
    vector form for models comes from ``assemble_features``."""
    return (df.select(F.coalesce(F.col(col), F.lit(null_label)).alias(col))
            .groupBy(col).agg(F.count(F.lit(1)).alias("n")))


def assemble_features(df: DataFrame, numeric_cols: list[str],
                      out: str = "features") -> DataFrame:
    """Numeric columns -> MLlib vector (NULL -> 0.0)."""
    filled = df.withColumns({
        c: F.coalesce(F.col(c).cast("double"), F.lit(0.0))
        for c in numeric_cols})
    return VectorAssembler(inputCols=numeric_cols, outputCol=out
                           ).transform(filled)


def rf_importance(df: DataFrame, numeric_cols: list[str], target: str,
                  n_trees: int = 100, max_depth: int = 10,
                  seed: int = 42):
    """M4/M5 (20:314-359): 80/20 split, RF fit, (mse, r2, per-feature
    importances) — returns (metrics_dict, importance_rows).

    Zero input rows (an empty date slice / filter survivor set — the
    routine 100 TB edge) -> no model: returns (None-metrics, [], None)
    instead of MLlib's IllegalArgumentException."""
    df = df.filter(F.col(target).isNotNull())  # MLlib: labels non-null
    if df.isEmpty():
        return {"mse": None, "r2": None}, [], None
    data = assemble_features(df, numeric_cols)
    train, test = data.randomSplit([0.8, 0.2], seed=seed)
    if train.isEmpty():  # 1-row inputs can land entirely in test
        return {"mse": None, "r2": None}, [], None
    model = RandomForestRegressor(
        featuresCol="features", labelCol=target,
        numTrees=n_trees, maxDepth=max_depth, seed=seed).fit(train)
    if test.isEmpty():  # tiny inputs: the 20% side can be empty —
        mse = r2 = None  # model + importances exist, metrics don't
    else:
        pred = model.transform(test)
        mse = RegressionEvaluator(labelCol=target,
                                  metricName="mse").evaluate(pred)
        r2 = RegressionEvaluator(labelCol=target,
                                 metricName="r2").evaluate(pred)
    imps = list(model.featureImportances.toArray())
    rows = [(c, float(i)) for c, i in zip(numeric_cols, imps)]
    return {"mse": mse, "r2": r2}, rows, model


def with_random_index(df: DataFrame, seed: int,
                      buckets: int = 64) -> DataFrame:
    """Attach a dense random index ``__idx`` in [1, n] WITHOUT a global
    single-partition sort: rows are salted into ``buckets`` random
    buckets, numbered within each bucket by a PARTITIONED window (every
    task sorts only its slice), and per-bucket offsets — a ``buckets``-row
    aggregate collected as a scalar config map — make the index globally
    dense. Returns a persisted frame (caller unpersists); the persist
    also pins the rand() bucket assignment so the offset map and the
    main plan agree."""
    d = (df.withColumn("__s", (F.rand(seed) * buckets).cast("int"))
         .persist())
    counts = {r["__s"]: r["n"]
              for r in d.groupBy("__s").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    args, acc = [], 0
    for s in sorted(counts):
        args += [F.lit(s), F.lit(acc)]
        acc += counts[s]
    off = F.create_map(*args)[F.col("__s")]
    rn = F.row_number().over(
        Window.partitionBy("__s").orderBy(F.rand(seed + 7919)))
    return d.withColumn("__idx", off + rn).drop("__s")


def permutation_importance(df: DataFrame, numeric_cols: list[str],
                           target: str, model, n_repeats: int = 3,
                           seed: int = 42) -> list[tuple[str, float]]:
    """M6 (20:361-382): baseline r2 minus r2 with one column shuffled.

    ``model is None`` (rf_importance's empty-input result) or an empty
    frame -> no importances ([]), mirroring the SQL empty-aggregate
    convention.

    Distributed shuffle of the feature columns: one random-index
    construction per repeat (``with_random_index`` — salted, partitioned
    windows only) pairs every row with a uniformly random donor row via
    an equi-join on the dense int index. No unpartitioned
    ``Window.orderBy(rand)`` anywhere (the r1 single-partition
    bottleneck; plan-pinned in tests/test_plans.py), and the donor
    permutation is shared across columns within a repeat — sklearn
    scores each column independently, so reusing one permutation per
    repeat changes nothing statistically while doing one join per
    repeat instead of one per (column, repeat)."""
    df = df.filter(F.col(target).isNotNull())  # MLlib: labels non-null
    if model is None or df.isEmpty():
        return []
    evaluator = RegressionEvaluator(labelCol=target, metricName="r2")
    base = evaluator.evaluate(model.transform(
        assemble_features(df, numeric_cols)))
    shuf = {c: f"__shuf_{c}" for c in numeric_cols}
    base_idx = with_random_index(df, seed)
    donors = df.select([F.col(c).alias(shuf[c]) for c in numeric_cols])
    deltas = {c: [] for c in numeric_cols}
    cached = [base_idx]
    try:
        for r in range(n_repeats):
            donor_idx = with_random_index(donors, seed + 1009 * (r + 1))
            joined = base_idx.join(donor_idx, "__idx").drop("__idx").persist()
            cached += [donor_idx, joined]
            for c in numeric_cols:
                swapped = joined.withColumn(c, F.col(shuf[c]))
                scored = model.transform(
                    assemble_features(swapped, numeric_cols))
                deltas[c].append(base - evaluator.evaluate(scored))
    finally:
        for d in cached:
            d.unpersist()
    return [(c, float(sum(v) / len(v))) for c, v in deltas.items()]


def kmeans_sweep(df: DataFrame, vec_col: str, k_range=range(2, 9),
                 seed: int = 42) -> DataFrame:
    """M11 (21:315-380): silhouette + inertia per k. Returns a small
    driver-built DataFrame (k, silhouette, inertia).  Empty input ->
    empty sweep (no k can be fit)."""
    spark = df.sparkSession
    df = df.filter(F.col(vec_col).isNotNull())
    n = df.limit(max(k_range) + 1).count()
    if n < 2:
        return spark.createDataFrame(
            [], "k int, silhouette double, inertia double")
    k_range = [k for k in k_range if k <= n]
    data = df.withColumn("features",
                         array_to_vector(F.col(vec_col).cast("array<double>")))
    data = data.cache()
    rows = []
    try:
        for k in k_range:
            model = KMeans(k=k, seed=seed, featuresCol="features").fit(data)
            pred = model.transform(data)
            try:
                sil = float(ClusteringEvaluator(
                    featuresCol="features").evaluate(pred))
            except Exception:
                # all-identical points collapse into one cluster and
                # silhouette is undefined — report NaN, keep the row
                sil = float("nan")
            rows.append((k, sil, float(model.summary.trainingCost)))
    finally:
        data.unpersist()
    return spark.createDataFrame(rows, "k int, silhouette double, inertia double")


def kmeans_assign(df: DataFrame, vec_col: str, k: int,
                  seed: int = 42) -> DataFrame:
    """M12: final fit_predict — adds a ``cluster`` column (null
    vectors dropped: nothing to assign)."""
    df = df.filter(F.col(vec_col).isNotNull())
    data = df.withColumn("features",
                         array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(k=k, seed=seed, featuresCol="features").fit(data)
    return (model.transform(data)
            .withColumnRenamed("prediction", "cluster").drop("features"))


def pca_project(df: DataFrame, vec_col: str, n_components: int = 2,
                out: str = "pca") -> DataFrame:
    """M13 (21:275-313): PCA to n components, back to array<double>.
    Empty input -> zero rows with the output column typed (no fit;
    a NULL literal, not array() — ConstantFolding would evaluate a
    caller's element_at(array(), i) at PLAN time and raise even with
    zero rows)."""
    df = df.filter(F.col(vec_col).isNotNull())  # no vector, no projection
    if df.limit(2).count() < 2:
        # zero or one row: components are undefined (covariance of
        # <= 1 point) -> NULL, rows preserved
        return df.withColumn(out, F.lit(None).cast("array<double>"))
    data = df.withColumn("__vec",
                         array_to_vector(F.col(vec_col).cast("array<double>")))
    model = PCA(k=n_components, inputCol="__vec", outputCol="__pca").fit(data)
    return (model.transform(data)
            .withColumn(out, vector_to_array(F.col("__pca")))
            .drop("__vec", "__pca"))


def _import_reducer(method: str):
    """Import seam for the driver-side 2-D reducers (monkeypatched in
    tests); raises ImportError when the library is absent."""
    if method == "tsne":
        from sklearn.manifold import TSNE
        return lambda X, seed: TSNE(n_components=2, random_state=seed,
                                    init="pca").fit_transform(X)
    if method == "umap":
        from umap import UMAP
        return lambda X, seed: UMAP(n_components=2,
                                    random_state=seed).fit_transform(X)
    raise ValueError(f"unknown 2-D reduction method: {method}")


def project_2d(df: DataFrame, id_col: str, vec_col: str,
               method: str = "pca", sample_size: int = 2000,
               seed: int = 42) -> DataFrame:
    """M13 t-SNE/UMAP fallback chain (21-embedding-and-clustering.py:
    275-313): 2-D projection for VISUALIZATION ONLY.

    ``method='pca'`` (the default and the reference's own fallback) is
    the distributed MLlib path over the full table. ``'tsne'``/
    ``'umap'`` are inherently driver-side algorithms: a deterministic
    bounded sample (first ``sample_size`` rows by id — a plot never
    needs more points) is collected and reduced with sklearn /
    umap-learn when importable; if the library is absent the call
    degrades to PCA, mirroring the reference. The ``method`` output
    column records which path actually ran, so the fallback is
    observable. Never part of a data pipeline — viz-only scope."""
    df = df.filter(F.col(vec_col).isNotNull())
    if df.limit(2).count() < 2:
        # zero/one point: no reducer is defined; keep the rows with
        # NULL coordinates and an observable method marker
        return df.select(F.col(id_col), F.lit(None).cast("double").alias("x"),
                         F.lit(None).cast("double").alias("y"),
                         F.lit("degenerate").alias("method"))
    if method != "pca":
        try:
            reducer = _import_reducer(method)
        except ImportError:
            method = "pca"
        else:
            import numpy as np
            import pandas as pd

            sample = (df.select(F.col(id_col),
                                F.col(vec_col).cast("array<double>")
                                 .alias("__v"))
                      .orderBy(id_col).limit(sample_size).toPandas())
            X = np.stack(sample["__v"].to_numpy()).astype("float64")
            Y = reducer(X, seed)
            out = pd.DataFrame({id_col: sample[id_col],
                                "x": Y[:, 0], "y": Y[:, 1]})
            out["method"] = method
            return df.sparkSession.createDataFrame(out)
    proj = pca_project(df, vec_col, 2)
    return proj.select(id_col,
                       F.element_at("pca", 1).alias("x"),
                       F.element_at("pca", 2).alias("y"),
                       F.lit("pca").alias("method"))

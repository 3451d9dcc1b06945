"""Stage-20/21 analytics queries (SURVEY §2.10). Native pieces carry
DuckDB oracles; MLlib model operators (RF/KMeans/PCA) register
rows-only, matching the survey's 'no oracle' markers — their
correctness is asserted at the metric level in tests/test_analytics.py.
"""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators import (analytics, mllib_pipeline, phrases, sampling,
                         textquality)
from ..registry import register
from ..session import read_parquet_cached, widen_scan


def _docs(spark, sf_dir):
    # CPU-heavy per-row work (regex/string/shingle projections): widen
    # the single-row-group local scan to all cores — on a real cluster
    # the scan is already wide and widen_scan is a no-op (see
    # session.widen_scan; found via the r3 bench fix, where the whole
    # reward projection ran on 1 of 32 cores)
    path = os.path.join(sf_dir, "documents.parquet")
    return widen_scan(read_parquet_cached(spark, path), path)


def _emb(spark, sf_dir):
    return read_parquet_cached(spark, os.path.join(sf_dir, "embeddings.parquet"))


# --------------------------------------------------------------------------
# M1 feature table
# --------------------------------------------------------------------------

@register("q20_feature_table", bench=True, oracle=r"""
SELECT doc_id,
       len(text) AS text_length,
       len(string_split_regex(trim(text), '\s+')) AS word_count,
       round(list_sum(list_transform(string_split_regex(trim(text), '\s+'),
                                     t -> len(t)))::DOUBLE
             / len(string_split_regex(trim(text), '\s+')), 6)
           AS avg_word_length,
       len(text) - len(replace(text, '.', '')) AS punct_period,
       len(text) - len(replace(text, ',', '')) AS punct_comma,
       len(text) - len(replace(text, '!', '')) AS punct_exclaim,
       len(text) - len(replace(text, '?', '')) AS punct_question,
       len(text) - len(replace(text, chr(10), '')) + 1 AS line_count,
       len(list_filter(list_transform(string_split(text, chr(10) || chr(10)),
                                      p -> trim(p)), p -> p <> ''))
           AS paragraph_count
FROM documents
""")
def q20_feature_table(spark, sf_dir):
    """M1: numeric text-feature table as one wide native projection."""
    return analytics.text_feature_table(_docs(spark, sf_dir), "text").select(
        "doc_id", "text_length", "word_count", "avg_word_length",
        "punct_period", "punct_comma", "punct_exclaim", "punct_question",
        "line_count", "paragraph_count")


# --------------------------------------------------------------------------
# A15 deterministic synthetic engagement + M3 scaling + A14 min-max
# --------------------------------------------------------------------------

_SYNTH_CTE = """
    SELECT doc_id, text, lang, source,
           (CASE lang WHEN 'en' THEN 1.0 WHEN 'de' THEN 0.8
                      WHEN 'fr' THEN 0.7 ELSE 0.5 END
            + CASE source WHEN 'reddit' THEN 0.9 WHEN 'twitter' THEN 0.7
                          ELSE 0.6 END)
           * exp(-((len(text) - 1000.0) * (len(text) - 1000.0))
                 / (2 * 500.0 * 500.0)) AS engagement
    FROM documents
"""


@register("q20_engagement_synth", oracle="WITH synth AS (" + _SYNTH_CTE + """
)
SELECT doc_id, round(engagement, 6) AS engagement FROM synth
""")
def q20_engagement_synth(spark, sf_dir):
    """A15 (20:85-155) deterministic core: category lookup scores
    (create_map) x a 1000-char length sweet spot. The reference adds
    seed-42 gaussian noise; exact noise parity is impossible across
    engines, so the engine keeps the deterministic part (documented
    deviation, SURVEY A15 'partial')."""
    return _synth_engagement(_docs(spark, sf_dir)).select(
        "doc_id", F.round("engagement", 6).alias("engagement"))


def _synth_engagement(df):
    lang_score = (F.when(F.col("lang") == "en", 1.0)
                   .when(F.col("lang") == "de", 0.8)
                   .when(F.col("lang") == "fr", 0.7).otherwise(F.lit(0.5)))
    src_score = (F.when(F.col("source") == "reddit", 0.9)
                  .when(F.col("source") == "twitter", 0.7)
                  .otherwise(F.lit(0.6)))
    n = F.length("text")
    sweet = F.exp(-((n - 1000.0) * (n - 1000.0)) / (2 * 500.0 * 500.0))
    return df.withColumn("engagement", (lang_score + src_score) * sweet)


@register("q20_scaling", oracle=r"""
WITH f AS (
    SELECT doc_id, len(text) AS x1,
           len(string_split_regex(trim(text), '\s+')) AS x2
    FROM documents
), m AS (
    SELECT count(*)::DOUBLE AS n,
           CAST(sum(x1) AS BIGINT)::DOUBLE AS sx1,
           CAST(sum(x1 * x1) AS BIGINT)::DOUBLE AS sxx1,
           CAST(sum(x2) AS BIGINT)::DOUBLE AS sx2,
           CAST(sum(x2 * x2) AS BIGINT)::DOUBLE AS sxx2
    FROM f
)
SELECT doc_id,
       round(CASE WHEN sqrt(sxx1 / n - (sx1 / n) * (sx1 / n)) > 0
                  THEN (coalesce(x1, 0) - sx1 / n)
                       / sqrt(sxx1 / n - (sx1 / n) * (sx1 / n))
                  ELSE 0.0 END, 6) AS text_length_scaled,
       round(CASE WHEN sqrt(sxx2 / n - (sx2 / n) * (sx2 / n)) > 0
                  THEN (coalesce(x2, 0) - sx2 / n)
                       / sqrt(sxx2 / n - (sx2 / n) * (sx2 / n))
                  ELSE 0.0 END, 6) AS word_count_scaled
FROM f, m
""")
def q20_scaling(spark, sf_dir):
    """M3: standard scaling via one broadcast aggregate pass (exact
    integer moments — see standard_scale — so the 2x5000 rounded
    output cells cannot ulp-flip across engines)."""
    feats = analytics.text_feature_table(_docs(spark, sf_dir), "text")
    return analytics.standard_scale(
        feats, ["text_length", "word_count"]).select(
        "doc_id", "text_length_scaled", "word_count_scaled")


@register("q20_minmax", oracle="WITH synth AS (" + _SYNTH_CTE + """
)
SELECT doc_id,
       round(CASE WHEN max(engagement) OVER () > min(engagement) OVER ()
                  THEN (engagement - min(engagement) OVER ())
                       / (max(engagement) OVER () - min(engagement) OVER ())
                  ELSE 0.0 END, 6) AS engagement_norm
FROM synth
""")
def q20_minmax(spark, sf_dir):
    """A14: min-max normalization of the synthetic engagement score."""
    synth = _synth_engagement(_docs(spark, sf_dir))
    return analytics.min_max_normalize(synth, "engagement",
                                       "engagement_norm").select(
        "doc_id", "engagement_norm")


# --------------------------------------------------------------------------
# M7 feature<->target correlations
# --------------------------------------------------------------------------

@register("q20_correlations", oracle="WITH synth AS (" + _SYNTH_CTE + r"""
), f AS (
    SELECT engagement,
           len(text) AS text_length,
           len(string_split_regex(trim(text), '\s+')) AS word_count,
           len(text) - len(replace(text, '.', '')) AS punct_period,
           len(text) - len(replace(text, chr(10), '')) + 1 AS line_count
    FROM synth
), c AS (
    SELECT 'text_length' AS feature,
           round(coalesce(corr(text_length, engagement), 0.0), 6) AS correlation FROM f
    UNION ALL SELECT 'word_count', round(coalesce(corr(word_count, engagement), 0.0), 6) FROM f
    UNION ALL SELECT 'punct_period', round(coalesce(corr(punct_period, engagement), 0.0), 6) FROM f
    UNION ALL SELECT 'line_count', round(coalesce(corr(line_count, engagement), 0.0), 6) FROM f
)
SELECT feature, correlation FROM c ORDER BY abs(correlation) DESC, feature
""")
def q20_correlations(spark, sf_dir):
    """M7: Pearson r of each feature vs engagement, one agg pass,
    sorted by |r| desc."""
    synth = _synth_engagement(_docs(spark, sf_dir))
    feats = analytics.text_feature_table(synth, "text")
    return analytics.feature_target_correlations(
        feats, ["text_length", "word_count", "punct_period", "line_count"],
        "engagement")


# --------------------------------------------------------------------------
# A11/A12 cluster distribution + purity (deterministic pseudo-clusters)
# --------------------------------------------------------------------------

@register("q21_cluster_distribution", oracle="""
WITH assigned AS (
    SELECT doc_id % 5 AS cluster, lang FROM documents
), counts AS (
    SELECT cluster, lang, count(*) AS n FROM assigned GROUP BY cluster, lang
)
SELECT cluster, lang, n,
       round(n::DOUBLE / sum(n) OVER (PARTITION BY cluster), 6) AS share,
       CASE WHEN row_number() OVER (PARTITION BY cluster
                                    ORDER BY n DESC, lang) = 1
            THEN 1 ELSE 0 END AS is_dominant
FROM counts ORDER BY cluster, lang
""")
def q21_cluster_distribution(spark, sf_dir):
    """A11 over deterministic pseudo-clusters (doc_id % 5) so the
    window logic itself is value-checked; the MLlib-cluster variant is
    qm_kmeans_distribution (rows-only)."""
    assigned = _docs(spark, sf_dir).select(
        (F.col("doc_id") % 5).alias("cluster"), "lang")
    return analytics.cluster_value_distribution(
        assigned, "cluster", "lang").orderBy("cluster", "lang")


@register("q21_purity", oracle="""
WITH assigned AS (
    SELECT doc_id % 5 AS cluster, lang FROM documents
), counts AS (
    SELECT lang, cluster, count(*) AS n FROM assigned GROUP BY lang, cluster
), ranked AS (
    SELECT lang, cluster AS dominant_cluster,
           round(n::DOUBLE / sum(n) OVER (PARTITION BY lang), 6) AS purity,
           row_number() OVER (PARTITION BY lang ORDER BY n DESC, cluster) AS rk
    FROM counts
)
SELECT lang, dominant_cluster, purity FROM ranked WHERE rk = 1 ORDER BY lang
""")
def q21_purity(spark, sf_dir):
    """A12: dominant cluster share per feature value."""
    assigned = _docs(spark, sf_dir).select(
        (F.col("doc_id") % 5).alias("cluster"), "lang")
    return analytics.feature_purity(assigned, "lang", "cluster").orderBy("lang")


@register("q21_separability", oracle="""
WITH g AS (
    SELECT vec_id % 4 AS g, embedding FROM embeddings
), d AS (
    SELECT g, i, avg(embedding[i]::DOUBLE) AS m
    FROM g, range(1, 65) t(i) GROUP BY g, i
)
SELECT a.g AS g1, b.g AS g2,
       round(sqrt(sum((a.m - b.m) * (a.m - b.m))), 6) AS centroid_l2
FROM d a JOIN d b ON a.i = b.i AND a.g < b.g
GROUP BY a.g, b.g ORDER BY g1, g2
""")
def q21_separability(spark, sf_dir):
    """M14: pairwise centroid L2 between (deterministic) groups of
    embeddings — posexplode centroids + broadcast pairwise join."""
    grouped = _emb(spark, sf_dir).select(
        (F.col("vec_id") % 4).alias("grp"), "embedding")
    return analytics.separability(grouped, "grp", "embedding").orderBy(
        "g1", "g2")


# --------------------------------------------------------------------------
# M16 ablation diffs
# --------------------------------------------------------------------------

@register("q04_ablation_diffs", oracle=r"""
WITH pairs AS (
    SELECT doc_id, text AS text_a,
           CASE WHEN doc_id % 3 = 0
                THEN text || chr(10) || chr(10) || '1. extra point'
                     || chr(10) || '2. second point'
                ELSE text END AS text_b
    FROM documents
)
SELECT doc_id,
    round(CASE WHEN len(text_a) > 0
          THEN (len(text_b) - len(text_a))::DOUBLE * 100 / len(text_a)
          ELSE 0.0 END, 6) AS length_delta_pct,
    len(list_filter(list_transform(string_split(text_b, chr(10) || chr(10)),
                                   p -> trim(p)), p -> p <> ''))
    - len(list_filter(list_transform(string_split(text_a, chr(10) || chr(10)),
                                     p -> trim(p)), p -> p <> ''))
        AS paragraph_delta,
    len(list_filter(string_split(text_b, chr(10)),
        l -> regexp_matches(trim(l), '^(\d+[.)]|[-*•])\s+')))
    - len(list_filter(string_split(text_a, chr(10)),
        l -> regexp_matches(trim(l), '^(\d+[.)]|[-*•])\s+')))
        AS bullet_delta
FROM pairs
""")
def q04_ablation_diffs(spark, sf_dir):
    """M16: with/without ablation text diffs (length %, paragraphs,
    bullet lines) over derived pairs."""
    pairs = _docs(spark, sf_dir).select(
        "doc_id", F.col("text").alias("text_a"),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.col("text"),
                        F.lit("\n\n1. extra point\n2. second point")))
         .otherwise(F.col("text")).alias("text_b"))
    return analytics.ablation_text_diffs(pairs, "text_a", "text_b").select(
        "doc_id", "length_delta_pct", "paragraph_delta", "bullet_delta")


# --------------------------------------------------------------------------
# MLlib model operators — rows-only (SURVEY M4-M6, M11-M13)
# --------------------------------------------------------------------------

_RF_FEATURES = ["text_length", "word_count", "avg_word_length",
                "punct_period", "line_count"]


@register("qm_rf_importance")
def qm_rf_importance(spark, sf_dir):
    """M4/M5: RandomForestRegressor(n=100, depth=10, seed=42) feature
    importances for the synthetic engagement target."""
    synth = _synth_engagement(_docs(spark, sf_dir))
    feats = analytics.text_feature_table(synth, "text")
    _metrics, rows, _m = mllib_pipeline.rf_importance(
        feats, _RF_FEATURES, "engagement")
    return spark.createDataFrame(rows, "feature string, importance double")


@register("qm_permutation_importance")
def qm_permutation_importance(spark, sf_dir):
    """M6: permutation importance (r2 drop per shuffled feature)."""
    synth = _synth_engagement(_docs(spark, sf_dir))
    feats = analytics.text_feature_table(synth, "text")
    _metrics, _rows, model = mllib_pipeline.rf_importance(
        feats, _RF_FEATURES, "engagement")
    out = mllib_pipeline.permutation_importance(
        feats, _RF_FEATURES, "engagement", model, n_repeats=2)
    return spark.createDataFrame(out, "feature string, r2_drop double")


@register("qm_kmeans_sweep")
def qm_kmeans_sweep(spark, sf_dir):
    """M11: KMeans k=2..6 sweep with silhouette + inertia (seed 42)."""
    return mllib_pipeline.kmeans_sweep(_emb(spark, sf_dir), "embedding",
                                       k_range=range(2, 7))


@register("qm_pca_projection")
def qm_pca_projection(spark, sf_dir):
    """M13: 2-component PCA of the embedding table."""
    out = mllib_pipeline.pca_project(_emb(spark, sf_dir), "embedding", 2)
    return out.select("vec_id",
                      F.round(F.element_at("pca", 1), 6).alias("pc1"),
                      F.round(F.element_at("pca", 2), 6).alias("pc2"))


@register("qm_projection_2d")
def qm_projection_2d(spark, sf_dir):
    """M13 fallback chain: request t-SNE; in this container sklearn is
    absent so the call observably degrades to distributed PCA (the
    reference's own fallback, 21:275-313) — the ``method`` column
    records which reducer ran. Rows-only (viz-scope by design)."""
    out = mllib_pipeline.project_2d(_emb(spark, sf_dir), "vec_id",
                                    "embedding", method="tsne",
                                    sample_size=500)
    return out.select("vec_id", F.round("x", 6).alias("x"),
                      F.round("y", 6).alias("y"), "method")


# --------------------------------------------------------------------------
# M15 + A9: aligned cosine similarity and grouped mean/std/count
# --------------------------------------------------------------------------

_PERTURB_CTE = """
    SELECT vec_id, vec_id % 4 AS structure,
           embedding::DOUBLE[] AS va,
           list_prepend(-((embedding::DOUBLE[])[1]),
                        (embedding::DOUBLE[])[2:]) AS vb
    FROM embeddings
"""


@register("q04_grouped_similarity", oracle="WITH p AS (" + _PERTURB_CTE + """
), scored AS (
    -- null vectors leave the cosine NULL but still count toward n;
    -- the WHERE (not a CASE) keeps DuckDB's vectorized executor from
    -- ever touching list_dot_product with a NULL argument
    SELECT structure,
           list_dot_product(va, vb)
           / (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb)))
               AS sim
    FROM p WHERE va IS NOT NULL
), cnt AS (SELECT structure, count(*) AS n FROM p GROUP BY structure)
SELECT cnt.structure, round(avg(s.sim), 6) AS mean_sim,
       round(stddev_samp(s.sim), 6) AS std_sim, cnt.n
FROM cnt LEFT JOIN scored s USING (structure)
GROUP BY cnt.structure, cnt.n ORDER BY structure
""")
def q04_grouped_similarity(spark, sf_dir):
    """M15 + A9 (4-structure-micro-ablation.py:136-150, 228): aligned
    cosine between original and perturbed vectors (first component
    negated), then per-group mean/stddev_samp/count."""
    from ..operators.dedup import cosine
    emb = _emb(spark, sf_dir)
    va = F.col("embedding").cast("array<double>")
    vb = F.concat(
        F.array(-F.element_at(va, 1)),
        F.slice(va, 2, F.greatest(F.size(va) - 1, F.lit(0))))
    scored = emb.select((F.col("vec_id") % 4).alias("structure"),
                        cosine(va, vb).alias("sim"))
    return (scored.groupBy("structure")
            .agg(F.round(F.avg("sim"), 6).alias("mean_sim"),
                 F.round(F.stddev_samp("sim"), 6).alias("std_sim"),
                 F.count(F.lit(1)).alias("n"))
            .orderBy("structure"))


# --------------------------------------------------------------------------
# M8: pairwise feature correlation matrix
# --------------------------------------------------------------------------

_CORR_FEATURES = ["text_length", "word_count", "punct_period", "line_count"]


@register("q20_corr_matrix", oracle=r"""
WITH f AS (
    SELECT len(text) AS text_length,
           len(string_split_regex(trim(text), '\s+')) AS word_count,
           len(text) - len(replace(text, '.', '')) AS punct_period,
           len(text) - len(replace(text, chr(10), '')) + 1 AS line_count
    FROM documents
), pairs AS (
    SELECT 'text_length' AS f1, 'word_count' AS f2,
           coalesce(corr(text_length, word_count), 0.0) AS r FROM f
    UNION ALL SELECT 'text_length', 'punct_period',
           coalesce(corr(text_length, punct_period), 0.0) FROM f
    UNION ALL SELECT 'text_length', 'line_count',
           coalesce(corr(text_length, line_count), 0.0) FROM f
    UNION ALL SELECT 'word_count', 'punct_period',
           coalesce(corr(word_count, punct_period), 0.0) FROM f
    UNION ALL SELECT 'word_count', 'line_count',
           coalesce(corr(word_count, line_count), 0.0) FROM f
    UNION ALL SELECT 'punct_period', 'line_count',
           coalesce(corr(punct_period, line_count), 0.0) FROM f
)
SELECT f1, f2, round(r, 6) AS correlation FROM pairs ORDER BY f1, f2
""")
def q20_corr_matrix(spark, sf_dir):
    """M8 + A10 (20:409-427, 4:304-312): upper-triangle pairwise Pearson matrix over
    the interaction features, ONE aggregate pass (all pairs as
    map-side-combinable corr aggregates, no per-pair jobs)."""
    feats = analytics.text_feature_table(_docs(spark, sf_dir), "text")

    def pearson(a, b):
        x, y = F.col(a).cast("double"), F.col(b).cast("double")
        return F.coalesce(
            F.try_divide(F.covar_pop(x, y),
                         F.stddev_pop(x) * F.stddev_pop(y)), F.lit(0.0))

    pairs = [(a, b) for i, a in enumerate(_CORR_FEATURES)
             for b in _CORR_FEATURES[i + 1:]]
    row = feats.agg(*[pearson(a, b).alias(f"{a}|{b}") for a, b in pairs])
    return (row.select(F.explode(F.array(*[
        F.struct(F.lit(a).alias("f1"), F.lit(b).alias("f2"),
                 F.round(F.col(f"`{a}|{b}`"), 6).alias("correlation"))
        for a, b in pairs])).alias("kv")).select("kv.*")
        .orderBy("f1", "f2"))


# --------------------------------------------------------------------------
# M2: one-hot category counts (NULL -> 'unknown')
# --------------------------------------------------------------------------

@register("qm_onehot_counts", oracle="""
SELECT coalesce(CASE WHEN doc_id % 11 = 0 THEN NULL ELSE lang END,
                'unknown') AS lang,
       count(*) AS n
FROM documents GROUP BY 1 ORDER BY 1
""")
def qm_onehot_counts(spark, sf_dir):
    """M2 (20:243-291) oracle-checkable projection: category counts
    with the reference's NaN->'unknown' fill (every 11th doc's lang
    nulled to exercise it)."""
    df = _docs(spark, sf_dir).select(
        F.when(F.col("doc_id") % 11 == 0, F.lit(None))
         .otherwise(F.col("lang")).alias("lang"))
    return mllib_pipeline.one_hot_counts(df, "lang").orderBy("lang")


# --------------------------------------------------------------------------
# B7/B8: random split + percent sampling (seeded; rows-only contracts)
# --------------------------------------------------------------------------

@register("qb7_train_test_split")
def qb7_train_test_split(spark, sf_dir):
    """B7 (20:321, 25:181-183): randomSplit([0.8, 0.2], seed=42).
    Rows-only: split sizes are binomial around 80/20 (exact counts are
    partition-order-defined); determinism + ratio asserted in
    tests/test_sampling_extras.py."""
    train, test = _docs(spark, sf_dir).randomSplit([0.8, 0.2], seed=42)
    return spark.createDataFrame(
        [("train", train.count()), ("test", test.count())],
        "split string, n long")


@register("qb7_hash_split", oracle="""
SELECT split, count(*) AS n FROM (
    SELECT CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                     % 100 < 20
                THEN 'test' ELSE 'train' END AS split
    FROM documents)
GROUP BY split ORDER BY split
""")
def qb7_hash_split(spark, sf_dir):
    """B7 scale variant: deterministic md5-keyed 80/20 split —
    reshard/append-stable assignment (pure function of doc_id), and
    therefore oracle-checkable bit-for-bit where seeded randomSplit
    (qb7_train_test_split) can only be rows-only."""
    docs = _docs(spark, sf_dir)
    out = sampling.hash_split(docs, F.col("doc_id"), test_pct=20)
    return (out.groupBy("split").agg(F.count(F.lit(1)).alias("n"))
            .orderBy("split"))


@register("qb8_percent_sample", oracle="""
SELECT count(*) AS n_sampled, count(DISTINCT doc_id) AS n_distinct
FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000 < 2500
""")
def qb8_percent_sample(spark, sf_dir):
    """B8 (17:783-786): 25% sampling gate — registered on the
    deterministic md5 hash-gate (sampling.percent_gate_hash, VERDICT
    r4 #4) so the kept set is a pure function of doc_id and the gate
    is oracle-checkable bit-for-bit; the reference's seeded Bernoulli
    ``df.sample`` form survives as sampling.percent_gate with its
    bounds+determinism pytest contract."""
    docs = _docs(spark, sf_dir)
    sampled = sampling.percent_gate_hash(docs, F.col("doc_id"), 25.0)
    return sampled.agg(F.count(F.lit(1)).alias("n_sampled"),
                       F.count_distinct(F.col("doc_id"))
                       .alias("n_distinct"))


# --------------------------------------------------------------------------
# M9 + A13: feature-category mapping and category-mean importance
# --------------------------------------------------------------------------

@register("q20_category_importance", oracle="WITH synth AS (" + _SYNTH_CTE + r"""
), f AS (
    SELECT CAST(round(engagement * 1000000) AS BIGINT) AS y,
           len(text) AS text_length,
           len(string_split_regex(trim(text), '\s+')) AS word_count,
           len(text) - len(replace(text, '.', '')) AS punct_period,
           len(text) - len(replace(text, chr(10), '')) + 1 AS line_count
    FROM synth
), m AS (
    SELECT count(*)::DOUBLE AS n, CAST(sum(y) AS BIGINT)::DOUBLE AS sy,
           CAST(sum(y * y) AS BIGINT)::DOUBLE AS syy,
           CAST(sum(text_length) AS BIGINT)::DOUBLE AS sx1,
           CAST(sum(text_length * text_length) AS BIGINT)::DOUBLE AS sxx1,
           CAST(sum(text_length * y) AS BIGINT)::DOUBLE AS sxy1,
           CAST(sum(word_count) AS BIGINT)::DOUBLE AS sx2,
           CAST(sum(word_count * word_count) AS BIGINT)::DOUBLE AS sxx2,
           CAST(sum(word_count * y) AS BIGINT)::DOUBLE AS sxy2,
           CAST(sum(punct_period) AS BIGINT)::DOUBLE AS sx3,
           CAST(sum(punct_period * punct_period) AS BIGINT)::DOUBLE AS sxx3,
           CAST(sum(punct_period * y) AS BIGINT)::DOUBLE AS sxy3,
           CAST(sum(line_count) AS BIGINT)::DOUBLE AS sx4,
           CAST(sum(line_count * line_count) AS BIGINT)::DOUBLE AS sxx4,
           CAST(sum(line_count * y) AS BIGINT)::DOUBLE AS sxy4
    FROM f
), c AS (
    SELECT 'text_length' AS feature,
           CAST(round(abs(coalesce((n*sxy1 - sx1*sy)
               / sqrt((n*sxx1 - sx1*sx1) * (n*syy - sy*sy)), 0.0))
               * 1000000) AS BIGINT) AS imp_e6 FROM m
    UNION ALL SELECT 'word_count',
           CAST(round(abs(coalesce((n*sxy2 - sx2*sy)
               / sqrt((n*sxx2 - sx2*sx2) * (n*syy - sy*sy)), 0.0))
               * 1000000) AS BIGINT) FROM m
    UNION ALL SELECT 'punct_period',
           CAST(round(abs(coalesce((n*sxy3 - sx3*sy)
               / sqrt((n*sxx3 - sx3*sx3) * (n*syy - sy*sy)), 0.0))
               * 1000000) AS BIGINT) FROM m
    UNION ALL SELECT 'line_count',
           CAST(round(abs(coalesce((n*sxy4 - sx4*sy)
               / sqrt((n*sxx4 - sx4*sx4) * (n*syy - sy*sy)), 0.0))
               * 1000000) AS BIGINT) FROM m
), categorized AS (
    SELECT CASE WHEN contains(feature, 'punct') THEN 'punctuation'
                WHEN contains(feature, 'length') OR contains(feature, 'count')
                THEN 'structure' ELSE 'other' END AS category,
           imp_e6
    FROM c
)
SELECT category,
       round(CAST(sum(imp_e6) AS BIGINT)::DOUBLE / count(*) / 1000000.0, 6)
           AS mean_importance
FROM categorized GROUP BY category ORDER BY category
""")
def q20_category_importance(spark, sf_dir):
    """M9 (20:429-460) prefix-rule category mapping + A13 (20:674-689)
    category-mean importance, using |corr| as the oracle-able
    importance signal.

    Pearson r comes from feature_target_correlations_exact (integer
    moments — exact BIGINT sums combined in one fixed IEEE sequence),
    and each |r| is quantized to integer micro-units BEFORE the
    category mean: ``corr()``'s float moment merging and the float
    mean over a 3-row group are both summation-order dependent, and
    at sf0.1 the last ulp landed exactly on a round(...,6) boundary
    (0.609613 vs 0.609612 — found by the r3 sf0.1 sweep)."""
    synth = _synth_engagement(_docs(spark, sf_dir))
    feats = analytics.text_feature_table(synth, "text")
    corrs = analytics.feature_target_correlations_exact(
        feats, ["text_length", "word_count", "punct_period", "line_count"],
        "engagement")
    categorized = corrs.select(
        F.when(F.col("feature").contains("punct"), "punctuation")
         .when(F.col("feature").contains("length")
               | F.col("feature").contains("count"), "structure")
         .otherwise(F.lit("other")).alias("category"),
        F.round(F.abs(F.col("correlation")) * 1_000_000).cast("long")
         .alias("imp_e6"))
    return (categorized.groupBy("category")
            .agg(F.round(F.sum("imp_e6").cast("double")
                         / F.count(F.lit(1)) / 1_000_000.0, 6)
                 .alias("mean_importance"))
            .orderBy("category"))


# --------------------------------------------------------------------------
# J4: importance tables merged on Feature (left joins x3)
# --------------------------------------------------------------------------

@register("qm_importance_merged")
def qm_importance_merged(spark, sf_dir):
    """J4 (20:573-589): RF importance LEFT JOIN permutation importance
    LEFT JOIN |correlation| on the feature key. Rows-only (MLlib
    inputs); join-shape is what the inventory requires."""
    synth = _synth_engagement(_docs(spark, sf_dir))
    feats = analytics.text_feature_table(synth, "text")
    _m, rf_rows, model = mllib_pipeline.rf_importance(
        feats, _RF_FEATURES, "engagement")
    rf = spark.createDataFrame(rf_rows, "feature string, rf_importance double")
    perm = spark.createDataFrame(
        mllib_pipeline.permutation_importance(
            feats, _RF_FEATURES, "engagement", model, n_repeats=1),
        "feature string, perm_importance double")
    corrs = analytics.feature_target_correlations(
        feats, _RF_FEATURES, "engagement").select(
        "feature", F.abs(F.col("correlation")).alias("abs_corr"))
    return (rf.join(perm, "feature", "left")
            .join(corrs, "feature", "left")
            .orderBy("feature"))


# --------------------------------------------------------------------------
# M10: embedding inference + feature-vector concat (21:252-273)
# --------------------------------------------------------------------------

@register("qm_text_embeddings", oracle=r"""
WITH f AS (
    SELECT doc_id, text,
           coalesce(len(text), 0) AS x1,
           coalesce(len(string_split_regex(trim(text), '\s+')), 0) AS x2
    FROM documents
), m AS (
    SELECT count(*)::DOUBLE AS n,
           CAST(sum(x1) AS BIGINT)::DOUBLE AS sx1,
           CAST(sum(x1 * x1) AS BIGINT)::DOUBLE AS sxx1,
           CAST(sum(x2) AS BIGINT)::DOUBLE AS sx2,
           CAST(sum(x2 * x2) AS BIGINT)::DOUBLE AS sxx2
    FROM f
), sc AS (
    SELECT doc_id,
           round(CASE WHEN sqrt(sxx1 / n - (sx1 / n) * (sx1 / n)) > 0
                      THEN (x1 - sx1 / n)
                           / sqrt(sxx1 / n - (sx1 / n) * (sx1 / n))
                      ELSE 0.0 END, 6) AS r1,
           round(CASE WHEN sqrt(sxx2 / n - (sx2 / n) * (sx2 / n)) > 0
                      THEN (x2 - sx2 / n)
                           / sqrt(sxx2 / n - (sx2 / n) * (sx2 / n))
                      ELSE 0.0 END, 6) AS r2
    FROM f, m
), st AS (
    SELECT doc_id, ' ' || lower(coalesce(text, '')) || ' ' AS s FROM f
), grams AS (
    SELECT doc_id, unnest(list_concat(list_concat(
        [substr(s, i, 3) for i in generate_series(1, len(s) - 2)],
        [substr(s, i, 4) for i in generate_series(1, len(s) - 3)]),
        [substr(s, i, 5) for i in generate_series(1, len(s) - 4)])) AS g
    FROM st
), v AS (
    SELECT doc_id, h % 32 AS bucket,
           CAST(sum(CASE WHEN h >= 2147483648 THEN 1 ELSE -1 END)
                AS BIGINT) AS vb
    FROM (SELECT doc_id,
                 ('0x' || substr(md5(g), 1, 8))::BIGINT AS h FROM grams)
    GROUP BY 1, 2
), nrm AS (
    SELECT doc_id, CAST(sum(vb * vb) AS BIGINT) AS S FROM v GROUP BY 1
), esq AS (
    SELECT v.doc_id,
           sum(CAST(CAST(vb / sqrt(S) AS REAL) AS DOUBLE)
               * CAST(CAST(vb / sqrt(S) AS REAL) AS DOUBLE)) AS e2
    FROM v JOIN nrm USING (doc_id) WHERE S > 0
    GROUP BY v.doc_id
)
SELECT sc.doc_id, 34 AS dim,
       round(coalesce(e.e2, 0.0) + sc.r1 * sc.r1 + sc.r2 * sc.r2, 6)
           AS sq_norm
FROM sc LEFT JOIN esq e ON e.doc_id = sc.doc_id
""")
def qm_text_embeddings(spark, sf_dir):
    """M10: batched text embedding (hashed char-ngram featurizer by
    default — content-sensitive and deterministic; the real
    sentence-transformers path stays env-gated behind
    SPARK_GRAFT_EMBED_BACKEND=st) concatenated with scaled numeric
    features — the stage-21 combined-vector input.  ORACLE-CHECKED
    since r5 (was rows-only): the embedder's md5-prefix hash is
    portable, so DuckDB rebuilds every signed bucket sum, replays the
    float32 Arrow quantization with CAST(... AS REAL), and predicts
    the combined vector's exact rounded squared norm (unit embedding
    + the two scaled features); determinism + shape +
    content-sensitivity stay asserted in tests."""
    from ..operators.inference import default_embedding_backend, embed_column
    feats = analytics.standard_scale(
        analytics.text_feature_table(_docs(spark, sf_dir), "text"),
        ["text_length", "word_count"])
    embedded = embed_column(feats, "text", "emb",
                            lambda: default_embedding_backend(dim=32))
    combined = embedded.withColumn(
        "combined",
        F.concat(F.col("emb").cast("array<double>"),
                 F.array("text_length_scaled", "word_count_scaled")))
    return combined.select(
        "doc_id", F.size("combined").alias("dim"),
        F.round(F.aggregate(F.col("combined"), F.lit(0.0),
                            lambda a, x: a + x * x), 6).alias("sq_norm"))


# --------------------------------------------------------------------------
# M17: keyword extraction (heuristic stand-in for the spaCy path)
# --------------------------------------------------------------------------

_KW_STOPWORDS_SQL = "[" + ", ".join(
    f"'{w}'" for w in phrases.STOPWORDS_EN) + "]"

_KEYWORDS_SQL = f"""
WITH cands AS (
    SELECT doc_id,
           unnest(list_concat(
               list_filter(
                   list_transform(
                       regexp_extract_all(text, '[A-Za-z]{{4,}}'),
                       t -> lower(t)),
                   t -> NOT list_contains({_KW_STOPWORDS_SQL}, t)),
               list_transform(
                   regexp_extract_all(text, '[A-Z][a-z]+(?: [A-Z][a-z]+)+'),
                   t -> lower(t)))) AS kw
    FROM documents WHERE doc_id % 10 = 0
), freq AS (
    SELECT doc_id, kw, count(*) AS freq
    FROM cands GROUP BY doc_id, kw
)
SELECT doc_id, kw, freq FROM (
    SELECT doc_id, kw, freq,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY freq DESC, kw) AS rk
    FROM freq
) WHERE rk <= 15 ORDER BY doc_id, kw
"""


@register("qm_keywords", oracle=_KEYWORDS_SQL)
def qm_keywords(spark, sf_dir):
    """M17: per-document top-15 keywords (freq desc, word asc) from
    the heuristic candidate set — content words (alpha, len>=4,
    non-stopword, lowercased) plus consecutive-capitalized-word
    entity phrases (training/rewards/base.py:19-35; NER fallback
    shape from training/grpo/prompt_parsing.py:223-236). Every 10th
    doc to keep the oracle cheap; semantics are per-row, so the
    sample is representative."""
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") % 10 == 0)
    cands = docs.select(
        "doc_id",
        F.explode(textquality.keyword_candidates(
            F.col("text"), phrases.STOPWORDS_EN)).alias("kw"))
    freq = cands.groupBy("doc_id", "kw").agg(
        F.count(F.lit(1)).alias("freq"))
    w = Window.partitionBy("doc_id").orderBy(F.col("freq").desc(),
                                             F.col("kw"))
    return (freq.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 15).drop("rk")
            .orderBy("doc_id", "kw"))


@register("q17_topic_shifts_model", oracle=r"""
WITH sl AS (
    SELECT doc_id,
           list_filter(
               [trim(p, ' ' || chr(9) || chr(10) || chr(13)
                        || chr(12) || chr(11))
                for p in string_split(
                    regexp_replace(coalesce(text, ''),
                                   '([.!?])\s+', '\1' || chr(30), 'g'),
                    chr(30))],
               x -> x <> '') AS sents
    FROM documents
), sent AS (
    SELECT doc_id, i AS sidx, ' ' || lower(sents[i]) || ' ' AS s
    FROM sl, unnest(generate_series(1, len(sents))) AS t(i)
    WHERE len(sents) >= 2
), grams AS (
    SELECT doc_id, sidx, unnest(list_concat(list_concat(
        [substr(s, i, 3) for i in generate_series(1, len(s) - 2)],
        [substr(s, i, 4) for i in generate_series(1, len(s) - 3)]),
        [substr(s, i, 5) for i in generate_series(1, len(s) - 4)])) AS g
    FROM sent
), v AS (
    SELECT doc_id, sidx, h % 64 AS bucket,
           CAST(sum(CASE WHEN h >= 2147483648 THEN 1 ELSE -1 END)
                AS BIGINT) AS vb
    FROM (SELECT doc_id, sidx,
                 ('0x' || substr(md5(g), 1, 8))::BIGINT AS h FROM grams)
    GROUP BY 1, 2, 3
), nrm AS (
    SELECT doc_id, sidx, CAST(sum(vb * vb) AS BIGINT) AS S
    FROM v GROUP BY 1, 2
), bound AS (
    SELECT doc_id, i AS idx
    FROM sl, unnest(generate_series(1, len(sents) - 1)) AS t(i)
    WHERE len(sents) >= 2
), dots AS (
    SELECT a.doc_id, a.sidx AS idx,
           CAST(sum(a.vb * b.vb) AS BIGINT) AS dp
    FROM v a JOIN v b ON a.doc_id = b.doc_id AND b.sidx = a.sidx + 1
                     AND a.bucket = b.bucket
    GROUP BY 1, 2
), dist AS (
    SELECT b.doc_id, b.idx,
           1.0 - CASE WHEN coalesce(n1.S, 0) > 0 AND coalesce(n2.S, 0) > 0
                      THEN coalesce(d.dp, 0)
                           / (sqrt(n1.S) * sqrt(n2.S))
                      ELSE 0.0 END AS d
    FROM bound b
    LEFT JOIN dots d ON d.doc_id = b.doc_id AND d.idx = b.idx
    LEFT JOIN nrm n1 ON n1.doc_id = b.doc_id AND n1.sidx = b.idx
    LEFT JOIN nrm n2 ON n2.doc_id = b.doc_id AND n2.sidx = b.idx + 1
), agg AS (
    SELECT doc_id,
           CAST(count(*) FILTER (d >= 0.5) AS INT) AS n_shifts,
           round(coalesce(max(round(d, 6)) FILTER (d >= 0.5), 0.0), 6)
               AS max_shift
    FROM dist GROUP BY doc_id
)
SELECT sl.doc_id,
       coalesce(a.n_shifts, 0) AS n_shifts,
       coalesce(a.max_shift, 0.0) AS max_shift
FROM sl LEFT JOIN agg a USING (doc_id)
ORDER BY sl.doc_id
""")
def q17_topic_shifts_model(spark, sf_dir):
    """T12 model-backed variant (17-writing-style.py:175-218): topic
    shifts as cosine distance between adjacent-sentence embeddings.
    Default backend is the hashed char-ngram featurizer — content-
    sensitive, so scores dip within-topic and spike at real topic
    changes (pinned in tests/test_inference.py); the reference's BERT
    stays behind the env-gated seam (main path emits the disabled-
    default empty array — narrative17.topic_transitions_disabled).
    Returns per-doc shift count + max score.  ORACLE-CHECKED since r5
    (was rows-only): the md5-prefix embedder hash is portable, so
    DuckDB replays the whole model path — sentence splitting (the
    lookbehind split becomes capture-replace + split, RE2 has no
    lookbehind), per-sentence signed bucket sums, and the cosine from
    exact integer dot products over sqrt of integer norms (the
    engine's f64 normalize-then-dot differs by ~1e-15, nine orders
    below the 6-dp rounding grid and the 0.5 threshold margin)."""
    from ..operators.inference import (default_embedding_backend,
                                       topic_shift_scores)
    docs = _docs(spark, sf_dir)
    out = topic_shift_scores(docs.select("doc_id", "text"), "text",
                             "shifts",
                             lambda: default_embedding_backend(dim=64),
                             threshold=0.5)
    return (out.select(
        "doc_id",
        F.size("shifts").alias("n_shifts"),
        F.round(F.coalesce(
            F.array_max(F.transform("shifts", lambda s: s["score"])),
            F.lit(0.0)), 6).alias("max_shift"))
        .orderBy("doc_id"))

"""B7/B8 sampling contracts + P4 surrogate normalization."""

import os

from pyspark.sql import functions as F

from social_media_ai_engineering_etl_spark.functions import cleaning


def _binomial_band(n: int, p: float, z: float = 5.0) -> tuple[float, float]:
    """±z-sigma band around the binomial mean — the same tolerance
    class the B1 reservoir-size pin uses.  z=5 keeps the flake
    probability below ~6e-7 per assertion even if the sampler were
    freshly random; with a fixed seed it is deterministic anyway."""
    mu = n * p
    sd = (n * p * (1.0 - p)) ** 0.5
    return mu - z * sd, mu + z * sd


import pytest  # noqa: E402


@pytest.mark.parametrize("seed,frac", [(42, 0.2), (7, 0.2), (3407, 0.35)])
def test_random_split_binomial_contract(spark, sf_dir, seed, frac):
    """B7 seeded randomSplit (VERDICT r5 ask #7): determinism,
    partition of the input, and test-fraction within the binomial
    ±5σ band — a quantitative pin, not just execution."""
    from social_media_ai_engineering_etl_spark.operators.sampling import (
        train_test_split)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    total = docs.count()
    a_train, a_test = train_test_split(docs, test_frac=frac, seed=seed)
    b_train, b_test = train_test_split(docs, test_frac=frac, seed=seed)
    n_test, n_train = a_test.count(), a_train.count()
    assert (n_train, n_test) == (b_train.count(), b_test.count())
    assert n_train + n_test == total
    lo, hi = _binomial_band(total, frac)
    assert lo <= n_test <= hi, (n_test, lo, hi)


@pytest.mark.parametrize("seed,pct", [(42, 25.0), (7, 25.0), (99, 60.0)])
def test_percent_gate_binomial_contract(spark, sf_dir, seed, pct):
    """B8 seeded percent gate: determinism + binomial ±5σ size pin on
    the df.sample path (the hash-gate twin is exactly pinned in
    test_percent_gate_hash_deterministic_and_reshard_stable)."""
    from social_media_ai_engineering_etl_spark.operators.sampling import (
        percent_gate)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    total = docs.count()
    a = percent_gate(docs, pct, seed=seed).count()
    b = percent_gate(docs, pct, seed=seed).count()
    assert a == b
    lo, hi = _binomial_band(total, pct / 100.0)
    assert lo <= a <= hi, (a, lo, hi)


def test_surrogate_normalization(spark):
    fix = cleaning.normalize_surrogates_udf()
    # a lone surrogate pair encoded via surrogatepass round-trips to
    # the astral character; clean text passes through unchanged
    astral = "post \U0001F600 text"
    df = spark.createDataFrame([("plain",), (astral,), (None,)],
                               "t string")
    out = [r.fixed for r in df.select(fix(F.col("t")).alias("fixed")).collect()]
    assert out[0] == "plain"
    assert out[1] == astral
    assert out[2] is None


def test_prefer_downsample_balance_clamps_to_band(spark):
    """B4: skewed groups land inside [min_c, max_c]; in-band groups
    are untouched."""
    import pyspark.sql.functions as F
    from social_media_ai_engineering_etl_spark.operators import sampling
    rows = ([("big", i) for i in range(100)]
            + [("mid", i) for i in range(40)]
            + [("tiny", i) for i in range(2)])
    df = spark.createDataFrame(rows, "grp string, v long")
    out = (sampling.prefer_downsample_balance(df, ["grp"])
           .groupBy("grp").agg(F.count(F.lit(1)).alias("n"))
           .collect())
    got = {r.grp: r.n for r in out}
    # avg = 142/3 = 47.33 -> min_c = floor(44.97) = 44, max_c = 49
    assert got["big"] == 49      # downsampled to max_c
    assert got["mid"] == 44      # upsampled to min_c
    assert got["tiny"] == 44     # upsampled to min_c


def test_topic_transitions_disabled_is_empty(spark):
    """T12: the main-path value is the typed empty array."""
    from social_media_ai_engineering_etl_spark.functions import narrative17
    df = spark.createDataFrame([("x",)], "text string")
    row = df.select(narrative17.topic_transitions_disabled()
                    .alias("t")).collect()[0]
    assert row["t"] == []


def test_hash_split_reshard_and_append_stable(spark):
    """B7 hash split: assignment is a pure function of the key —
    identical under repartition, and appending new rows never moves
    an existing row's split (the anti-leak property randomSplit
    lacks)."""
    from social_media_ai_engineering_etl_spark.operators import sampling
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id bigint")
    base = {r.doc_id: r.split
            for r in sampling.hash_split(df, F.col("doc_id")).collect()}
    resharded = {r.doc_id: r.split
                 for r in sampling.hash_split(
                     df.repartition(13), F.col("doc_id")).collect()}
    assert base == resharded
    appended = spark.createDataFrame(
        [(i,) for i in range(700)], "doc_id bigint")
    after = {r.doc_id: r.split
             for r in sampling.hash_split(
                 appended, F.col("doc_id")).collect()}
    assert all(after[k] == v for k, v in base.items())
    # both classes present at sane proportions
    n_test = sum(1 for v in base.values() if v == "test")
    assert 50 <= n_test <= 150


def test_validation_check_and_gate_null_semantics(spark):
    """Value rules fail NULLs (no NULL-propagating ~predicate slip);
    gate() keeps exactly the all-rules-pass rows; unique reports every
    row of a duplicated key."""
    from social_media_ai_engineering_etl_spark.operators import validation
    df = spark.createDataFrame(
        [(1, 10.0, "O"), (2, None, "O"), (3, -5.0, "X"),
         (4, 20.0, None), (1, 30.0, "F")],
        "k long, price double, status string")
    rules = [
        {"rule": "in_range", "col": "price", "min": 0, "max": 100},
        {"rule": "in_set", "col": "status", "values": ["O", "F"]},
        {"rule": "unique", "cols": ["k"]},
    ]
    rep = {r.rule: (r.n_violations, r.n_rows)
           for r in validation.check(df, rules).collect()}
    assert rep["in_range(price)"] == (2, 5)    # NULL + negative
    assert rep["in_set(status)"] == (2, 5)     # NULL + 'X'
    assert rep["unique(k)"] == (2, 5)          # both k=1 rows
    kept = {r.k for r in validation.gate(df, rules).collect()}
    assert kept == {1}                         # rows 1 and 5 share k=1...
    n_kept = validation.gate(df, rules).count()
    assert n_kept == 2                         # ...and both pass scalar rules


def test_epoch_shards_are_balanced_and_decorrelated(spark, sf_dir):
    """Each epoch's shard assignment is near-uniform, and consecutive
    epochs agree on a doc's shard only at the chance rate (~1/8) —
    i.e. every epoch is an independent permutation, the property a
    naive shard = hash(doc) % k loses (identical order each epoch)."""
    import os
    from pyspark.sql import functions as F
    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")).select("doc_id")
    n = docs.count()

    def shard(epoch):
        key = F.concat(F.col("doc_id").cast("string"),
                       F.lit(f":{epoch}"))
        return (F.conv(F.substring(F.md5(key), 1, 8), 16, 10)
                .cast("long") % 8)
    d = docs.select("doc_id", shard(0).alias("s0"), shard(1).alias("s1"))
    counts = [r["c"] for r in
              d.groupBy("s0").agg(F.count(F.lit(1)).alias("c")).collect()]
    assert len(counts) == 8
    assert max(counts) - min(counts) < 0.5 * n / 8 + 10
    same = d.filter(F.col("s0") == F.col("s1")).count()
    assert abs(same - n / 8) < 0.6 * n / 8 + 10, same


def test_priority_sample_weight_proportional_and_stable(spark):
    """Across many salts, a row with 10x the weight must be sampled
    roughly 10x as often (priority sampling's inclusion contract);
    the sample for a FIXED salt is bit-stable under repartition; and
    the top-k plans as TakeOrderedAndProject, never a global sort."""
    from collections import Counter

    from social_media_ai_engineering_etl_spark.operators.sampling import (
        priority_sample,
    )
    rows = [(i, 100 if i < 10 else 10) for i in range(210)]
    df = spark.createDataFrame(rows, "id long, w long")

    seen: Counter = Counter()
    for s in range(40):
        got = priority_sample(df, F.col("id"), F.col("w"), 21,
                              salt=f"s{s}").collect()
        for r in got:
            seen[r["id"]] += 1
    heavy = sum(seen[i] for i in range(10)) / 10
    light = sum(seen[i] for i in range(10, 210)) / 200
    assert light > 0
    # heavy rows weigh 10x; allow a generous band around the ratio
    assert 4.0 < heavy / light < 25.0, (heavy, light)

    a = priority_sample(df, F.col("id"), F.col("w"), 21).collect()
    b = priority_sample(df.repartition(7), F.col("id"),
                        F.col("w"), 21).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    plan = priority_sample(df, F.col("id"), F.col("w"), 21) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_percent_gate_hash_deterministic_and_reshard_stable(spark, sf_dir):
    """B8 hash-gate (r5): kept set is a pure function of the key —
    identical across re-runs AND repartitions (where seeded Bernoulli
    sample shifts), rate within a generous band of the target."""
    import os as _os
    from social_media_ai_engineering_etl_spark.operators import sampling
    docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
    kept = sampling.percent_gate_hash(docs, F.col("doc_id"), 25.0)
    ids_a = {r.doc_id for r in kept.select("doc_id").collect()}
    ids_b = {r.doc_id for r in sampling.percent_gate_hash(
        docs.repartition(7), F.col("doc_id"), 25.0)
        .select("doc_id").collect()}
    assert ids_a == ids_b, "reshard must not change the kept set"
    total = docs.count()
    assert 0.1 <= len(ids_a) / total <= 0.4
    # 100% is a no-op
    assert sampling.percent_gate_hash(
        docs, F.col("doc_id"), 100.0).count() == total

"""Scale-utility tests: salted aggregation equivalence, shuffle-free
bucketed joins, IVF recall vs the exact baseline."""

import os
import uuid

import pytest
from pyspark.sql import functions as F

from social_media_ai_engineering_etl_spark.operators import scale, similarity


def test_salted_aggregate_matches_direct(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    direct = {(r.lang,): (r.n, r.total, r.lo)
              for r in docs.groupBy("lang").agg(
                  F.count("doc_id").alias("n"),
                  F.sum(F.length("text")).alias("total"),
                  F.min("doc_id").alias("lo")).collect()}
    salted = {(r.lang,): (r.n, r.total, r.lo)
              for r in scale.salted_aggregate(
                  docs.withColumn("tl", F.length("text")), ["lang"],
                  {"n": ("doc_id", "count"),
                   "total": ("tl", "sum"),
                   "lo": ("doc_id", "min")},
                  salt_buckets=8).collect()}
    assert direct == salted


def test_salted_join_row_identical_and_spreads_hot_key(spark):
    """salted_join must return exactly the plain join's rows (salting
    only moves where rows meet) — on a frame with one planted whale
    key holding 60% of the fact — and must actually spread that key:
    the whale's fact rows land in >1 salt bucket, while cold dim rows
    are not replicated."""
    fact = spark.createDataFrame(
        [(1, i) for i in range(600)] + [(k, 0) for k in range(2, 42)],
        "k long, v long")
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(1, 42)], "k long, name string")

    plain = sorted(map(tuple, fact.join(dim, "k").collect()))
    # explicit hot list and detected hot list must both be row-exact
    for hot in ([1], None):
        got = sorted(map(tuple, scale.salted_join(
            fact, dim, "k", hot_keys=hot, salt_buckets=8).collect()))
        assert got == plain, hot

    # the whale's rows occupy multiple salt buckets pre-join
    f = fact.withColumn(
        "__salt",
        F.when(F.col("k").isin([1]),
               (F.rand(42) * 8).cast("int")).otherwise(F.lit(0)))
    n_buckets = (f.filter(F.col("k") == 1)
                 .select("__salt").distinct().count())
    assert n_buckets > 1
    # dim inflation is bounded: hot keys * buckets + cold keys
    d = dim.withColumn(
        "__salt",
        F.explode(F.when(F.col("k").isin([1]),
                         F.sequence(F.lit(0), F.lit(7)))
                  .otherwise(F.array(F.lit(0)))))
    assert d.count() == 8 + 40


def test_salted_aggregate_rejects_non_algebraic(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    with pytest.raises(ValueError):
        scale.salted_aggregate(docs, ["lang"], {"m": ("doc_id", "median")})


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    import contextlib
    import io
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    suffix = uuid.uuid4().hex[:8]
    lt, rt = f"bl_{suffix}", f"br_{suffix}"
    scale.write_bucketed(docs.select("doc_id", "lang"), lt,
                         ["doc_id"], num_buckets=4, sort_keys=["doc_id"])
    scale.write_bucketed(docs.select("doc_id", "source"), rt,
                         ["doc_id"], num_buckets=4, sort_keys=["doc_id"])
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = scale.bucketed_join(spark, lt, rt, ["doc_id"])
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan      # co-located: no shuffle
        assert joined.count() == docs.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {rt}")


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    brute = similarity.cosine_topk_bruteforce(emb, queries, "vec_id",
                                              "embedding", k=5).collect()
    ivf = similarity.cosine_topk_ivf(emb, queries, "vec_id", "embedding",
                                     k=5, n_centroids=16, n_probe=6).collect()
    brute_best = {r.query_id: r.cosine_sim for r in brute if r.rank == 1}
    ivf_best = {r.query_id: r.cosine_sim for r in ivf if r.rank == 1}
    assert ivf_best
    for qid, s in ivf_best.items():
        assert s <= brute_best[qid] + 1e-9     # can never beat exact
    hits = sum(1 for qid, s in ivf_best.items()
               if abs(s - brute_best[qid]) < 1e-9)
    assert hits >= len(ivf_best) // 3           # non-trivial recall@1


def test_hll_mergeable_error_bound_and_union(spark, sf_dir):
    """Per-source sketch estimates within 5% of exact; the global row
    (union of per-source sketches, no rescan) also within 5% — the
    mergeability property that makes sketches reusable pre-aggregates."""
    import social_media_ai_engineering_etl_spark.queries  # noqa: F401
    from social_media_ai_engineering_etl_spark.registry import QUERIES

    rows = QUERIES["qx_hll_mergeable"](spark, sf_dir).collect()
    total = [r for r in rows if r.source == "__ALL__"]
    assert len(total) == 1 and total[0].exact_distinct > 0
    for r in rows:
        assert abs(r.est_distinct - r.exact_distinct) \
            <= max(1, 0.05 * r.exact_distinct), r


def test_merge_rollups_equals_full_recompute_nontrivially(spark, sf_dir):
    """The incremental refresh must combine two NON-empty partials
    (otherwise the query degenerates to a full recompute and proves
    nothing) and match the direct aggregate exactly."""
    import os
    from pyspark.sql import functions as F
    from social_media_ai_engineering_etl_spark.operators import scale

    ev = (spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
          .select("event_type",
                  F.date_format(F.date_trunc("day", "ts"),
                                "yyyy-MM-dd").alias("day"),
                  F.round(F.col("value") * 100).cast("long").alias("cents")))
    days = sorted(r["day"] for r in ev.select("day").distinct().collect())
    cutoff = days[len(days) * 4 // 5]

    def rollup(part):
        return part.groupBy("event_type", "day").agg(
            F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"),
            F.min("cents").alias("mn"), F.max("cents").alias("mx"))

    old_part = ev.filter(F.col("day") < cutoff)
    new_part = ev.filter(F.col("day") >= cutoff)
    assert old_part.count() > 0 and new_part.count() > 0
    merged = scale.merge_rollups(
        rollup(old_part), rollup(new_part), ["event_type", "day"],
        {"n": "count", "s": "sum", "mn": "min", "mx": "max"})
    got = sorted(map(tuple, merged.collect()))
    want = sorted(map(tuple, rollup(ev).collect()))
    assert got == want


def test_erase_users_leaves_no_trace(spark, sf_dir):
    import os
    from pyspark.sql import functions as F
    from social_media_ai_engineering_etl_spark.operators import scale
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts = ev.filter(F.col("user_id") % 97 == 0).select("user_id").distinct()
    n_ts = ts.count()
    assert n_ts > 0  # the tombstone list must be non-trivial
    erased = scale.erase_users(ev, ts, "user_id")
    assert erased.join(ts, "user_id", "left_semi").count() == 0
    assert erased.count() + ev.join(
        ts, "user_id", "left_semi").count() == ev.count()


def test_snapshot_diff_classifies_planted_changes(spark):
    from pyspark.sql import functions as F
    from social_media_ai_engineering_etl_spark.operators import scale
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, fp string")
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "k long, fp string")
    got = {r["k"]: r["change_type"]
           for r in scale.snapshot_diff(old, new, "k", "fp").collect()}
    assert got == {2: "update", 3: "delete", 4: "insert"}


def test_twenty_query_session_leaks_no_cached_blocks(spark, sf_dir):
    """Cache-ownership contract (session.py docstring): a harness-style
    session running many registered queries with clearCache at each
    query boundary must end with zero cached RDD blocks — catches any
    operator whose persist() escapes both its own unpersist and the
    boundary clear (r1/r2 ADVICE persist-leak class)."""
    import social_media_ai_engineering_etl_spark.queries  # noqa: F401
    from social_media_ai_engineering_etl_spark.registry import QUERIES

    # mix of persist-using families: dedup, similarity, graph, ntile,
    # sampling, curation, continuous aggregate — 23 distinct queries
    names = [
        "q01_tier_counts", "q05_balance_counts", "q17_author_words",
        "q23_split_counts", "qb4_prefer_downsample", "qe2e_training_mix",
        "qx_rfm_segments", "qx_incremental_rollup", "qx_gopher_quality",
        "qx_pack_sequences", "qx_dedup_exact", "qx_dedup_ngram_jaccard",
        "qx_dedup_minhash", "qx_dedup_winnow_fast", "qx_similarity_topk_gemm",
        "qx_embedding_dedup_pairs", "qx_copurchase_pairs",
        "qx_pagerank_fixed", "qx_corpus_stats", "qx_heavy_hitters",
        "qx_hierarchical_rollup", "qx_asof_last_click",
        "qx_key_skew_profile",
        # r3d persisting additions: scalar-subquery + semi/anti reports,
        # and the phash near-dup (persists inside phash_neardup_pairs)
        "qg_top_supplier", "qg_important_supply", "qg_small_qty_revenue",
        "qg_min_cost_supplier", "qg_waiting_suppliers",
        "qg_sales_opportunity", "qmm_media_neardup",
    ]
    assert len(names) == 30 and all(n in QUERIES for n in names)
    for n in names:
        spark.catalog.clearCache()
        QUERIES[n](spark, sf_dir).limit(5).collect()
    spark.catalog.clearCache()
    sc = spark.sparkContext
    # getPersistentRDDs is the authoritative leak census
    leaked = dict(sc._jsc.getPersistentRDDs())
    assert not leaked, f"leaked cached RDDs: {list(leaked)[:5]}"


def test_zorder_prunes_minor_dimension_linear_sort_cannot(spark):
    """The point of the z-layout: a box predicate on the NON-leading
    dimension overlaps few z-cells (each cell bounds both dims) but
    every file of a leading-column sort (each spans the full minor
    range). Files touched = files whose min/max span overlaps the
    predicate — exactly parquet row-group pruning."""
    import numpy as np
    from social_media_ai_engineering_etl_spark.operators.layout import (
        zorder_cell_stats)
    rng = np.random.default_rng(3)
    pdf = [(int(u), int(v)) for u, v in
           zip(rng.integers(0, 256, 50_000), rng.integers(0, 256, 50_000))]
    df = spark.createDataFrame(pdf, ["u", "v"])
    lo, hi = 40, 47  # v-only box: 8/256 of the minor dimension

    zcells = zorder_cell_stats(df, ["u", "v"], bits=8, cell_shift=11) \
        .toPandas()
    z_touched = ((zcells["min_v"] <= hi) & (zcells["max_v"] >= lo)).sum()

    lin = (df.groupBy(F.expr("u DIV 8").alias("file"))
           .agg(F.min("v").alias("min_v"), F.max("v").alias("max_v"))
           .toPandas())
    lin_touched = ((lin["min_v"] <= hi) & (lin["max_v"] >= lo)).sum()

    assert lin_touched == len(lin)          # linear sort: full scan
    assert z_touched <= len(zcells) // 2, (z_touched, len(zcells))


def test_zorder_key_spark_equals_sql_twin(spark):
    """zorder_key (native shifts) and zorder_key_sql (the oracle's
    unrolled // % arithmetic) must agree bit-for-bit on random buckets
    including the 0 and 2^bits-1 boundaries."""
    import numpy as np
    from social_media_ai_engineering_etl_spark.operators.layout import (
        zorder_key, zorder_key_sql)
    rng = np.random.default_rng(23)
    rows = [(0, 0), (255, 255), (0, 255), (255, 0)] + \
        [(int(a), int(b)) for a, b in
         zip(rng.integers(0, 256, 500), rng.integers(0, 256, 500))]
    import duckdb
    import pandas as pd
    df = spark.createDataFrame(rows, ["a", "b"])
    got = (df.select("a", "b",
                     zorder_key([F.col("a"), F.col("b")], bits=8)
                     .alias("zk"))
           .toPandas().sort_values(["a", "b"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["a", "b"]))
    want = con.execute(
        f"SELECT a, b, {zorder_key_sql(['a', 'b'], bits=8)} AS zk "
        "FROM t ORDER BY a, b").fetchdf().reset_index(drop=True)
    assert (got["zk"].astype("int64").values
            == want["zk"].astype("int64").values).all()


def test_results_invariant_to_input_file_layout(spark, sf_dir, tmp_path):
    """Identical results whether the fact arrives as one parquet file
    or 16 splits — the invariance a 1000-executor scan rests on
    (hash/sort shuffles must erase input partitioning; any operator
    leaking partition order would fail here)."""
    import os
    import shutil as sh
    import social_media_ai_engineering_etl_spark.queries  # noqa: F401
    from social_media_ai_engineering_etl_spark.registry import QUERIES

    alt = tmp_path / "sf_alt"
    alt.mkdir()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        src = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(src):
            sh.copy(src, alt / f"{t}.parquet")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ev.repartition(16).write.mode("overwrite").parquet(
        str(alt / "events.parquet"))

    for name in ("qx_hierarchical_rollup", "qx_asof_last_click",
                 "qx_incremental_rollup", "qx_key_skew_profile"):
        spark.catalog.clearCache()
        a = [tuple(r) for r in QUERIES[name](spark, sf_dir).collect()]
        spark.catalog.clearCache()
        b = [tuple(r) for r in QUERIES[name](spark, str(alt)).collect()]
        assert a == b, name


def test_zorder_write_produces_prunable_parquet_stats(spark, tmp_path):
    """Write-side proof: physically writing z-ordered vs leading-column
    sorted parquet, the per-FILE min/max stats (what predicate pushdown
    actually consults) bound BOTH dimensions under z-order — a v-only
    predicate can skip most z-files but no u-sorted file."""
    import numpy as np
    import pyarrow.parquet as pq
    import os
    from social_media_ai_engineering_etl_spark.operators.layout import (
        zorder_key)
    rng = np.random.default_rng(9)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(rng.integers(0, 256, 40_000),
                                          rng.integers(0, 256, 40_000))],
        ["u", "v"])

    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "l")
    zk = zorder_key([F.col("u"), F.col("v")], bits=8).alias("zk")
    (df.select("u", "v", zk).repartitionByRange(16, "zk")
       .sortWithinPartitions("zk").drop("zk")
       .write.mode("overwrite").parquet(zdir))
    (df.repartitionByRange(16, "u").sortWithinPartitions("u", "v")
       .write.mode("overwrite").parquet(ldir))

    def file_spans(d, col):
        spans = []
        for f in os.listdir(d):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(d, f)).metadata
            lo, hi = 256, -1
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics:
                        lo = min(lo, c.statistics.min)
                        hi = max(hi, c.statistics.max)
            spans.append((lo, hi))
        return spans

    lo, hi = 40, 47  # v-only box predicate
    z_touch = sum(1 for a, b in file_spans(zdir, "v")
                  if a <= hi and b >= lo)
    z_total = len(file_spans(zdir, "v"))
    l_spans = file_spans(ldir, "v")
    l_touch = sum(1 for a, b in l_spans if a <= hi and b >= lo)
    assert l_touch == len(l_spans)       # u-sort: every file matches
    assert z_touch <= z_total // 2, (z_touch, z_total)


def test_maintain_join_equals_full_recompute(spark):
    """Δ(L⋈R) identity on disjoint splits with churn in every term:
    delta-left rows matching old-right, old-left matching delta-right,
    and delta-delta matches — refreshed view == from-scratch join."""
    L = spark.createDataFrame(
        [(k, f"l{i}") for i, k in enumerate([1, 1, 2, 3, 4, 5, 5])],
        "k long, lv string")
    R = spark.createDataFrame(
        [(k, f"r{i}") for i, k in enumerate([1, 4, 2, 2, 5, 6])],
        "k long, rv string")
    l_old, l_new = L.filter("lv < 'l4'"), L.filter("lv >= 'l4'")
    r_old, r_new = R.filter("rv < 'r3'"), R.filter("rv >= 'r3'")
    mat = l_old.join(r_old, ["k"])
    refreshed = scale.maintain_join(mat, l_old, l_new, r_old, r_new,
                                    ["k"])
    full = L.join(R, ["k"])
    assert sorted(map(tuple, refreshed.collect())) == \
        sorted(map(tuple, full.collect()))
    # each maintenance term is genuinely exercised by the fixture
    assert l_new.join(r_old, ["k"]).count() > 0
    assert l_old.join(r_new, ["k"]).count() > 0
    assert l_new.join(r_new, ["k"]).count() > 0


def test_compaction_plan_and_execute(spark, sf_dir, tmp_path):
    """A directory fragmented into ~40 small files plans into far
    fewer target-sized bins (every file assigned exactly once), and
    executing the compaction preserves row data exactly while cutting
    the file count to the bin count."""
    import os as _os

    from social_media_ai_engineering_etl_spark.operators.layout import (
        compact,
        compaction_plan,
    )
    docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
    frag = str(tmp_path / "frag")
    docs.repartition(40).write.parquet(frag)
    n_small = sum(1 for f in _os.listdir(frag) if f.endswith(".parquet"))
    assert n_small >= 30

    total_bytes = sum(
        _os.path.getsize(_os.path.join(frag, f))
        for f in _os.listdir(frag) if f.endswith(".parquet"))
    plan = compaction_plan(spark, frag, target_bytes=total_bytes // 3)
    rows = plan.collect()
    assert 2 <= len(rows) <= 6
    planned = [f for r in rows for f in r["files"]]
    assert len(planned) == n_small == len(set(planned))
    assert sum(r["total_bytes"] for r in rows) == total_bytes

    out = str(tmp_path / "compact")
    n_out = compact(spark, frag, out, target_bytes=total_bytes // 3)
    assert n_out == len(rows)
    a = sorted(map(tuple, spark.read.parquet(out).collect()))
    b = sorted(map(tuple, docs.collect()))
    assert a == b


def test_ri_audit_null_count_scheme_survives_dirty_parents(spark, tmp_path):
    """qx_referential_integrity counts orphans via left-join null
    counts — NOT EXISTS semantics, which a duplicated parent key
    would silently break by fanning the child out. Plant a dirty
    parent (duplicate nationkey) + one true orphan and check both
    totals stay exact."""
    import os

    import social_media_ai_engineering_etl_spark.queries  # noqa: F401
    from social_media_ai_engineering_etl_spark.registry import QUERIES

    sf = str(tmp_path)
    # minimal star: every table the query reads
    spark.createDataFrame(
        [(0, "R0")], ["r_regionkey", "r_name"]).write.parquet(
        os.path.join(sf, "region.parquet"))
    # nation 7 is DUPLICATED (dirty parent); nation 9 missing
    spark.createDataFrame(
        [(7, "N7", 0), (7, "N7-dup", 0), (8, "N8", 0)],
        ["n_nationkey", "n_name", "n_regionkey"]).write.parquet(
        os.path.join(sf, "nation.parquet"))
    # customers: two under the dup nation (must count ONCE each, not
    # fan out), one orphan under missing nation 9
    spark.createDataFrame(
        [(1, "c1", 7, 0.0, "M"), (2, "c2", 7, 0.0, "M"),
         (3, "c3", 9, 0.0, "M")],
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
         "c_mktsegment"]).write.parquet(
        os.path.join(sf, "customer.parquet"))
    spark.createDataFrame(
        [(1, "s1", 7, 0.0)],
        ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]
    ).write.parquet(os.path.join(sf, "supplier.parquet"))
    spark.createDataFrame(
        [(1, "p", "B", "T", 1, 1.0)],
        ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
         "p_retailprice"]).write.parquet(os.path.join(sf, "part.parquet"))
    spark.createDataFrame(
        [(10, 1, "O", 1.0, "1995-01-01", "1-URGENT")],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"]).write.parquet(
        os.path.join(sf, "orders.parquet"))
    spark.createDataFrame(
        [(10, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1995-01-02")],
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
         "l_quantity", "l_extendedprice", "l_discount", "l_tax",
         "l_returnflag", "l_linestatus", "l_shipdate"]).write.parquet(
        os.path.join(sf, "lineitem.parquet"))

    rows = {r["fk"]: (r["n_rows"], r["n_orphans"])
            for r in QUERIES["qx_referential_integrity"](
                spark, sf).collect()}
    # 3 customers total (no fan-out from the dup parent), 1 orphan
    assert rows["customer.c_nationkey->nation"] == (3, 1)
    assert rows["lineitem.l_orderkey->orders"] == (1, 0)
    assert rows["supplier.s_nationkey->nation"] == (1, 0)


def test_sharded_author_topk_equals_plain(spark, sf_dir):
    """r5 hot-author knob: author_texts/author_uncommon_words with
    shards=k must return EXACTLY the plain window's rows (two-phase
    top-k is lossless: every global top-N row is in its shard's
    top-N)."""
    import os as _os

    from social_media_ai_engineering_etl_spark.operators import phrases
    docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
    plain = sorted(map(tuple, phrases.author_uncommon_words(
        docs, "source", "text", "doc_id").collect()))
    sharded = sorted(map(tuple, phrases.author_uncommon_words(
        docs, "source", "text", "doc_id", shards=8).collect()))
    assert plain == sharded
    a = sorted(map(tuple, phrases.author_texts(
        docs, "source", "text", "doc_id", max_posts=7)
        .select("doc_id", "__rn").collect()))
    b = sorted(map(tuple, phrases.author_texts(
        docs, "source", "text", "doc_id", max_posts=7, shards=8)
        .select("doc_id", "__rn").collect()))
    assert a == b


def test_minhash_max_bucket_guard_caps_hot_cluster(spark):
    """r5 hot-bucket knob: a 40-doc near-identical cluster pairs fully
    without the guard; with max_bucket below the cluster width the
    pathological bucket is dropped from pair generation while pairs
    in ordinary buckets survive."""
    from social_media_ai_engineering_etl_spark.operators import dedup
    template = " ".join(f"tok{i}" for i in range(60))
    rows = ([(i, f"{template} variant {i}") for i in range(40)]
            + [(100, "a completely different document about spark joins "
                     "and shuffle behavior under load today"),
               (101, "a completely different document about spark joins "
                     "and shuffle behavior under load tomorrow")])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = dedup.minhash_dedup_pairs(df, "doc_id", "text",
                                     threshold=0.5).collect()
    full_pairs = {(r.id1, r.id2) for r in full}
    assert (100, 101) in full_pairs
    assert sum(1 for a, b in full_pairs if a < 40 and b < 40) \
        == 40 * 39 // 2, "cluster pairs fully without the guard"
    capped = dedup.minhash_dedup_pairs(df, "doc_id", "text",
                                       threshold=0.5,
                                       max_bucket=8).collect()
    capped_pairs = {(r.id1, r.id2) for r in capped}
    assert (100, 101) in capped_pairs, \
        "ordinary-bucket pairs survive the cap"
    assert not any(a < 40 and b < 40 for a, b in capped_pairs), \
        "the pathological cluster's buckets are dropped in every band"


def test_lsh_guard_auto_selects_from_measured_profile(spark):
    """r8 structural guard: the in-plan width filter must equal the
    old measure->decide semantics in BOTH regimes — on the hot-cluster
    shape it equals the hand-set knob (buckets wider than the
    crossover dropped), on the uniform corpus it equals the PLAIN
    path (the filter is vacuous below the crossover).  Policy +
    crossover recorded in the result schema metadata; no profile
    action runs."""
    from social_media_ai_engineering_etl_spark.operators import dedup

    template = " ".join(f"tok{i}" for i in range(60))
    hot_rows = ([(i, f"{template} variant {i}") for i in range(300)]
                + [(1000, "a completely different document about spark "
                          "joins and shuffle behavior under load today"),
                   (1001, "a completely different document about spark "
                          "joins and shuffle behavior under load tomorrow")])
    hot = spark.createDataFrame(hot_rows, "doc_id long, text string")
    # crossover lowered to keep the fixture small; the guard algebra
    # is identical at the production value of 256
    auto = dedup.minhash_dedup_pairs_auto(hot, "doc_id", "text",
                                          threshold=0.5, crossover=64)
    meta = auto.schema["id1"].metadata["lsh_guard"]
    assert meta["max_bucket"] == 64, meta
    assert meta["policy"] == "structural-width-filter", meta
    got = {(r.id1, r.id2) for r in auto.collect()}
    want = {(r.id1, r.id2)
            for r in dedup.minhash_dedup_pairs(
                hot, "doc_id", "text", threshold=0.5,
                max_bucket=64).collect()}
    assert got == want, "structural guard must equal the hand-set guard"
    assert (1000, 1001) in got

    uni_rows = [(i, f"doc {i} " + " ".join(
        f"u{i}w{j}" for j in range(25))) for i in range(80)]
    uni = spark.createDataFrame(uni_rows, "doc_id long, text string")
    auto_u = dedup.minhash_dedup_pairs_auto(uni, "doc_id", "text",
                                            threshold=0.5, crossover=64)
    meta_u = auto_u.schema["id1"].metadata["lsh_guard"]
    assert meta_u["max_bucket"] == 64, meta_u   # always stamped; vacuous here
    got_u = {(r.id1, r.id2) for r in auto_u.collect()}
    want_u = {(r.id1, r.id2)
              for r in dedup.minhash_dedup_pairs(
                  uni, "doc_id", "text", threshold=0.5).collect()}
    assert got_u == want_u, \
        "below the crossover the width filter must be vacuous"


def test_author_shards_auto_policy_and_equivalence(spark):
    """Window flavor of diagnose-then-enable: the measured profile
    drives the shard knob; the uniform corpus keeps the plain window;
    a forced-low crossover enables sharding and the rowset is
    IDENTICAL (lossless two-phase top-k)."""
    from social_media_ai_engineering_etl_spark.operators import phrases

    rows = [(f"a{i % 7}", f"text {'x' * (i % 40)} {i}", i)
            for i in range(200)]
    df = spark.createDataFrame(rows, "author string, text string, id long")
    plain = {(r.author, r.id)
             for r in phrases.author_texts(
                 df, "author", "text", "id", max_posts=5).collect()}

    auto = phrases.author_texts_auto(df, "author", "text", "id",
                                     max_posts=5)
    meta = auto.schema["author"].metadata["window_shards"]
    assert meta["shards"] == -1, meta          # below crossover -> off
    assert {(r.author, r.id) for r in auto.collect()} == plain

    forced = phrases.author_texts_auto(df, "author", "text", "id",
                                       max_posts=5, crossover=10)
    meta_f = forced.schema["author"].metadata["window_shards"]
    assert meta_f["shards"] == 32, meta_f      # hottest key ~29 > 10
    assert {(r.author, r.id) for r in forced.collect()} == plain

    # pure policy at the production crossover
    on = phrases.choose_window_shards({"top_key_rows": 10**9,
                                       "n_keys": 5})
    off = phrases.choose_window_shards({"top_key_rows": 10**6,
                                        "n_keys": 5})
    assert on["shards"] == 32 and off["shards"] is None


def test_bounded_key_profile_zero_job_decision(spark, sf_dir):
    """r8: the total-row-count bound (parquet footer, re-read per
    invocation — no cross-run memo anywhere) proves the shard guard
    OFF with zero Spark jobs, and the resulting rows equal the plain
    path; a bound ABOVE the crossover must fall back to the measured
    profile (the bound can only prove the off direction)."""
    import os

    from social_media_ai_engineering_etl_spark.operators import phrases
    from social_media_ai_engineering_etl_spark.session import \
        parquet_num_rows

    path = os.path.join(sf_dir, "documents.parquet")
    n = parquet_num_rows(path)
    assert n is not None and n > 0
    # the footer count matches the engine's own count
    assert n == spark.read.parquet(path).count()

    df = spark.createDataFrame(
        [(f"a{i % 7}", f"text {'x' * (i % 40)} {i}", i)
         for i in range(200)], "author string, text string, id long")
    plain = {(r.author, r.id)
             for r in phrases.author_texts(
                 df, "author", "text", "id", max_posts=5).collect()}
    auto = phrases.author_texts_auto(df, "author", "text", "id",
                                     max_posts=5, total_rows_bound=200)
    meta = auto.schema["author"].metadata["window_shards"]
    assert meta["shards"] == -1, meta
    assert "total-row bound" in meta["reason"], meta
    assert {(r.author, r.id) for r in auto.collect()} == plain

    # bound above the crossover: falls back to the measured profile
    forced = phrases.author_texts_auto(df, "author", "text", "id",
                                       max_posts=5, crossover=10,
                                       total_rows_bound=200)
    meta_f = forced.schema["author"].metadata["window_shards"]
    assert meta_f["shards"] == 32, meta_f      # hottest key ~29 > 10
    assert "total-row bound" not in meta_f["reason"], meta_f
    assert {(r.author, r.id) for r in forced.collect()} == plain

    # pure policy: the bound profile refuses the on-direction
    import pytest
    with pytest.raises(AssertionError):
        phrases.choose_window_shards(
            phrases.bounded_key_profile(10**9), crossover=100)


def test_graded_paths_route_through_auto_guards(spark, sf_dir):
    """VERDICT r6 ask #3: the GRADED/benched registrations themselves
    must run the measure->decide machinery — qx_dedup_minhash rides
    minhash_dedup_pairs_auto and q17_author_words rides
    author_uncommon_words_auto.  On the uniform testdata corpus both
    guards must choose OFF (evidence in the schema metadata) and the
    rows must equal the plain paths."""
    import social_media_ai_engineering_etl_spark.queries  # noqa: F401
    from social_media_ai_engineering_etl_spark.operators import (dedup,
                                                                 phrases)
    from social_media_ai_engineering_etl_spark.registry import QUERIES

    mh = QUERIES["qx_dedup_minhash"](spark, sf_dir)
    meta = mh.schema["id1"].metadata["lsh_guard"]
    # r8: the guard is structural (in-plan width filter, vacuous on
    # this uniform corpus) — the crossover is always stamped
    assert meta["max_bucket"] == meta["crossover"] > 0, meta
    assert meta["policy"] == "structural-width-filter", meta
    import os
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    plain = dedup.minhash_dedup_pairs(docs, "doc_id", "text",
                                      threshold=0.5)
    assert ({(r.id1, r.id2, r.jaccard_sim) for r in mh.collect()}
            == {(r.id1, r.id2, r.jaccard_sim) for r in plain.collect()})

    aw = QUERIES["q17_author_words"](spark, sf_dir)
    wmeta = aw.schema["source"].metadata["window_shards"]
    assert wmeta["shards"] == -1, wmeta            # plain window kept
    assert wmeta["top_key_rows"] <= wmeta["crossover"]
    plain_w = phrases.author_uncommon_words(docs, "source", "text",
                                            "doc_id")
    assert ({(r.source, r.word, r.freq) for r in aw.collect()}
            == {(r.source, r.word, r.freq) for r in plain_w.collect()})

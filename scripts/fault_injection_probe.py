"""Fault-injection determinism probe (VERDICT r6 ask #4).

A 1000-executor cluster loses tasks routinely; the one guarantee that
matters is that RETRIES AND SPECULATIVE COPIES don't change answers.
This probe runs the five heaviest query shapes twice each — a clean
pass and a fault pass — and asserts the sorted-rowset hash is
byte-identical:

  * mode=retry: a schema-preserving ``mapInPandas`` wrapper raises on
    the FIRST attempt of every partitionId % 3 == 0 task (stage-0
    retries re-read the scan; an output-side wrapper forces
    result-stage retries that re-fetch shuffle blocks).  Needs
    ``local[N, 4]`` (the ``SPARK_GRAFT_MASTER`` env) — plain local
    mode has maxFailures=1 and the first failure kills the job.
  * mode=speculation: the wrapper instead SLEEPS on attempt 0 of one
    partition with ``spark.speculation=true`` (quantile .25,
    interval 100ms), so duplicate attempts race and exactly-once
    result commit is what keeps the rowset stable.

Each run re-wraps the SAME plan (the wrapper is always present; only
the injection flag differs), so the comparison isolates the retry
machinery, not plan shape.  Injections are counted via marker files —
a pass with zero injections is reported as INVALID, not a pass.

The parent spawns one child process per mode (a second SparkContext
with a different master can't share the JVM).

Usage: python scripts/fault_injection_probe.py [sf_dir]
       (child: --child <mode> <sf_dir> <marker_dir>)
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SHAPES = ("ngram_prefix", "ngram_jaccard", "minhash", "topk_gemm",
          "author_words")


def _flaky(df, key: str, marker_dir: str, inject: str | None):
    """Schema-preserving mapInPandas wrapper; ``inject`` is None
    (pass-through), 'raise' (fail attempt 0 of pid%3==0) or 'sleep'
    (stall attempt 0 of pid 0 so speculation races a copy)."""
    schema = df.schema

    def gen(it):
        from pyspark import TaskContext
        tc = TaskContext.get()
        pid, att = tc.partitionId(), tc.attemptNumber()
        if inject == "raise" and att == 0 and pid % 3 == 0:
            open(os.path.join(marker_dir,
                              f"raise-{key}-{pid}"), "w").close()
            raise RuntimeError(f"injected task failure {key}:{pid}")
        if inject == "sleep" and att == 0 and pid == 0:
            open(os.path.join(marker_dir,
                              f"sleep-{key}-{pid}"), "w").close()
            time.sleep(2.0)
        yield from it

    return df.mapInPandas(gen, schema)


def _rowset_hash(df) -> tuple[str, int]:
    """Floats hash by their raw BIT PATTERN (float.hex), not a rounded
    rendering — this probe certifies byte-identical results under
    retry/speculation, so sub-1e-9 partial-sum-order drift must fail,
    not slip under a 9-decimal format (ADVICE r7)."""
    rows = df.collect()
    lines = sorted(
        "|".join(v.hex() if isinstance(v, float) else repr(v)
                 for v in row) for row in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    return h, len(rows)


def _build(shape: str, spark, sf_dir: str, marker_dir: str,
           inject: str | None):
    from pyspark.sql import functions as F

    from social_media_ai_engineering_etl_spark.operators import (dedup,
                                                                 phrases,
                                                                 similarity)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # round-robin repartition is the classic retry-nondeterminism trap
    # (pre-SPARK-23207 a retried round-robin task could deal rows to
    # different partitions); widening here both spreads the injected
    # failures across 12 task ids AND exercises that fix under them
    docs = _flaky(docs.repartition(12), f"{shape}-in", marker_dir, inject)
    if shape == "ngram_prefix":
        out = dedup.ngram_jaccard_pairs_prefix(docs, "doc_id", "text",
                                               threshold=0.5)
    elif shape == "ngram_jaccard":
        out = dedup.ngram_jaccard_pairs_inverted(docs, "doc_id", "text",
                                                 threshold=0.5)
    elif shape == "minhash":
        out = dedup.minhash_dedup_pairs(docs, "doc_id", "text",
                                        threshold=0.5)
    elif shape == "topk_gemm":
        emb = spark.read.parquet(os.path.join(sf_dir,
                                              "embeddings.parquet"))
        emb = _flaky(emb.repartition(12), f"{shape}-in", marker_dir,
                     inject)
        queries = emb.filter(F.col("vec_id") % 25 == 0)
        out = similarity.cosine_topk_gemm(emb, queries, "vec_id",
                                          "embedding", k=5)
    elif shape == "author_words":
        out = phrases.author_uncommon_words(docs, "source", "text",
                                            "doc_id")
    else:
        raise ValueError(shape)
    # output-side wrapper: retries here re-fetch shuffle outputs
    return _flaky(out, f"{shape}-out", marker_dir, inject)


STREAM_SHAPES = ("session_windows", "neardup_ingest")


def _canon_state_rows(shape: str, rows) -> list:
    """Canonical, order-insensitive rendering of state-store rows.
    The neardup value packs (ids, sig-matrix blob) whose MEMBER order
    follows arrival order within the bucket — identical across runs
    here, but canonicalized anyway so the comparison asserts state
    CONTENTS, not incidental member order."""
    import numpy as np
    out = []
    for r in rows:
        if shape == "neardup_ingest":
            gs = r.value.groupState   # applyInPandasWithState nests it
            ids = list(gs.ids)
            sigs = np.frombuffer(bytes(gs.sigs),
                                 dtype="<i8").reshape(len(ids), -1)
            members = sorted(
                (int(i), sigs[j].tobytes().hex())
                for j, i in enumerate(ids))
            out.append((repr(tuple(r.key)), repr(members)))
        else:
            out.append(repr(sorted(r.asDict(recursive=True).items())))
    return sorted(out)


def _run_stream_shape(spark, sf_dir: str, shape: str, marker_dir: str,
                      workdir: str, inject: str | None):
    """Drive one stateful streaming query (3-file staged source, one
    micro-batch per file) to completion with task failures injected
    BOTH pre-state (in-pipeline mapInPandas on the source) and in the
    state-commit stage (the foreachBatch job's result stage).  Returns
    (sink_hash, n_rows, state_hash, n_state_rows)."""
    import shutil

    from pyspark.sql import functions as F

    from social_media_ai_engineering_etl_spark.streaming import (neardup,
                                                                 windows)
    from social_media_ai_engineering_etl_spark.streaming.state_inspect import (
        read_state)

    tag = f"{shape}-{'fault' if inject else 'clean'}"
    src = os.path.join(workdir, f"{shape}-src")   # shared: staged once
    ckpt = os.path.join(workdir, f"{tag}-ckpt")
    shutil.rmtree(ckpt, ignore_errors=True)

    if not os.path.isdir(src):
        if shape == "session_windows":
            base = windows.load_events(
                spark, os.path.join(sf_dir, "events.parquet"))
            split_key = F.col("event_id")
        else:
            base = spark.read.parquet(
                os.path.join(sf_dir, "documents.parquet"))
            split_key = F.col("doc_id")
        for i in range(3):
            (base.filter(F.pmod(split_key, F.lit(3)) == i).coalesce(1)
             .write.mode("append").parquet(src))

    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    stream = _flaky(stream, f"{tag}-in", marker_dir, inject)
    if shape == "session_windows":
        out = windows.sessionized_activity(stream, gap="30 minutes",
                                           watermark="30 minutes")
    else:
        out = neardup.stream_neardup_pairs(stream, threshold=0.5)

    sunk: list = []

    def sink(bdf, bid):
        # state-commit-stage injection: the wrapper stays in the same
        # stage as the stateful operator (no shuffle between), so a
        # raise here kills the task AFTER state updates were staged —
        # the retry must observe the aborted store, not partial state
        wrapped = _flaky(bdf, f"{tag}-fb{bid}", marker_dir, inject)
        sunk.extend(wrapped.collect())

    q = (out.writeStream.foreachBatch(sink)
         .outputMode("append" if shape == "session_windows" else "update")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()

    lines = sorted(
        "|".join(v.hex() if isinstance(v, float) else repr(v)
                 for v in row) for row in sunk)
    sink_h = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    st = _canon_state_rows(shape,
                           read_state(spark, ckpt).collect())
    state_h = hashlib.sha256(repr(st).encode()).hexdigest()
    return sink_h, len(sunk), state_h, len(st)


def stream_child(sf_dir: str, marker_dir: str,
                 shapes: tuple = STREAM_SHAPES) -> None:
    """VERDICT r7 ask #4: mid-batch task failures inside stateful
    streaming queries — final state store contents AND sink rowset
    must hash-match the clean run."""
    from social_media_ai_engineering_etl_spark.session import get_spark
    spark = get_spark("fault-injection-streaming")
    workdir = tempfile.mkdtemp(prefix="fault-stream-")
    results = []
    for shape in shapes:
        clean = _run_stream_shape(spark, sf_dir, shape, marker_dir,
                                  workdir, None)
        fault = _run_stream_shape(spark, sf_dir, shape, marker_dir,
                                  workdir, "raise")
        injected = len([f for f in os.listdir(marker_dir)
                        if f.startswith(f"raise-{shape}-fault")])
        results.append({
            "mode": "streaming", "shape": shape, "rows": clean[1],
            "match": (clean[0] == fault[0] and clean[1] == fault[1]
                      and clean[2] == fault[2] and clean[3] == fault[3]),
            "state_rows": clean[3], "injections": injected})
    print("CHILD_RESULT " + json.dumps(results))


def child(mode: str, sf_dir: str, marker_dir: str,
          shapes: tuple = SHAPES) -> None:
    from social_media_ai_engineering_etl_spark.session import get_spark
    extra = {}
    if mode == "speculation":
        extra = {"spark.speculation": "true",
                 "spark.speculation.interval": "100ms",
                 "spark.speculation.quantile": "0.25",
                 "spark.speculation.multiplier": "1.2"}
    spark = get_spark(f"fault-injection-{mode}", extra_conf=extra)
    inject = "raise" if mode == "retry" else "sleep"
    results = []
    for shape in shapes:
        spark.catalog.clearCache()
        clean_h, n = _rowset_hash(
            _build(shape, spark, sf_dir, marker_dir, None))
        spark.catalog.clearCache()
        fault_h, n2 = _rowset_hash(
            _build(shape, spark, sf_dir, marker_dir, inject))
        injected = len([f for f in os.listdir(marker_dir)
                        if f.startswith(f"{inject}-{shape}")])
        results.append({"mode": mode, "shape": shape, "rows": n,
                        "match": clean_h == fault_h and n == n2,
                        "injections": injected})
    print("CHILD_RESULT " + json.dumps(results))


def main() -> int:
    argv = [a for a in sys.argv[1:]]
    shapes = SHAPES
    modes = ("retry", "speculation")
    if "--shapes" in argv:
        i = argv.index("--shapes")
        shapes = tuple(argv[i + 1].split(","))
        del argv[i:i + 2]
    if "--modes" in argv:
        i = argv.index("--modes")
        modes = tuple(argv[i + 1].split(","))
        del argv[i:i + 2]
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    all_results = []
    for mode in modes:
        marker_dir = tempfile.mkdtemp(prefix=f"fault-{mode}-")
        env = os.environ.copy()
        # task retries require local[N, maxFailures>1]
        n = env.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
        env["SPARK_GRAFT_MASTER"] = f"local[{n},4]"
        mode_shapes = shapes
        if mode == "streaming" and shapes == SHAPES:
            mode_shapes = STREAM_SHAPES
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", mode,
             sf, marker_dir, ",".join(mode_shapes)],
            capture_output=True, text=True, timeout=1200, env=env,
            cwd=ROOT)
        if r.returncode != 0:
            print(f"{mode}: CHILD FAILED\n{r.stderr[-3000:]}")
            return 1
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("CHILD_RESULT ")][0]
        all_results.extend(json.loads(line[len("CHILD_RESULT "):]))
    ok = True
    print(f"{'mode':<12} {'shape':<14} {'rows':>6} {'inj':>4}  verdict")
    for res in all_results:
        valid = res["match"] and res["injections"] > 0
        ok &= valid
        verdict = ("MATCH" if res["match"] else "HASH-DIFF")
        if res["injections"] == 0:
            verdict += " (NO INJECTIONS — invalid)"
        print(f"{res['mode']:<12} {res['shape']:<14} {res['rows']:>6} "
              f"{res['injections']:>4}  {verdict}")
    print("fault-injection determinism:", "ALL MATCH" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        if sys.argv[2] == "streaming":
            stream_child(sys.argv[3], sys.argv[4],
                         tuple(sys.argv[5].split(","))
                         if len(sys.argv) > 5 else STREAM_SHAPES)
        else:
            child(sys.argv[2], sys.argv[3], sys.argv[4],
                  tuple(sys.argv[5].split(",")) if len(sys.argv) > 5
                  else SHAPES)
    else:
        raise SystemExit(main())

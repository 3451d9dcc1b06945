"""Streaming near-duplicate detection: stateful MinHash/LSH over a
document stream (SURVEY §2.12/§2.13 green-field — the reference has no
streaming at all; this extends the batch dedup family, operators/
dedup.py, to Structured Streaming).

Shape: the same signature + banding front half as the batch path
(minhash_signature_arrow -> banded_rows), then ``applyInPandasWithState``
keyed by (band, bucket): state is the set of (doc_id, signature) seen
in that bucket so far, new arrivals are compared against it by
signature agreement (the unbiased MinHash estimate of Jaccard), and
matches are emitted as (id1, id2, est_sim) pairs. Cross-batch pairs —
the reason this must be stateful — come out the same as within-batch
pairs; checkpointed state survives restarts (tested with two
availableNow runs).

Scale/state accounting:
  * state is per (band, bucket); a doc appears in ``bands`` buckets,
    so total state is bands * n_docs * num_hashes longs, sharded
    across the shuffle partitions of the (band, bucket) key — the
    same key the batch join shuffles on.
  * ``max_per_bucket`` FIFO-caps each bucket's member list (hot
    buckets = boilerplate band slices, the same skew the batch path
    guards with max_df); a capped bucket still detects dups against
    its most recent members, which is the usual production tradeoff
    for unbounded streams.
  * the same pair can surface from multiple agreeing bands; consumers
    that need set semantics drop duplicates downstream (the tests
    collect into a set; a production sink would
    ``dropDuplicates(["id1","id2"])`` under a watermark).

Signatures cross the state boundary as ONE binary blob per bucket
(an int64 little-endian (n_members, num_hashes) matrix) — state
schemas support binary; a list-of-arrays row would be re-encoded
per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import (banded_rows, minhash_signature_arrow,
                               word_shingles)

PAIR_SCHEMA = "id1 bigint, id2 bigint, est_sim double"
STATE_SCHEMA = "ids array<bigint>, sigs binary"


def _make_update(num_hashes: int, threshold: float, max_per_bucket: int):
    def update(key: tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, blob = state.get
            ids = list(ids)
            seen = np.frombuffer(blob, dtype="<i8").reshape(
                len(ids), num_hashes)
        else:
            ids = []
            seen = np.empty((0, num_hashes), dtype="<i8")
        out_id1, out_id2, out_sim = [], [], []
        for pdf in pdfs:
            # deterministic arrival order within the micro-batch
            pdf = pdf.sort_values("id")
            for doc_id, sig in zip(pdf["id"], pdf["sig"]):
                v = np.asarray(sig, dtype="<i8")
                if len(ids):
                    sims = (seen == v).mean(axis=1)
                    for j in np.nonzero(sims >= threshold)[0]:
                        a, b = sorted((int(ids[j]), int(doc_id)))
                        out_id1.append(a)
                        out_id2.append(b)
                        out_sim.append(round(float(sims[j]), 6))
                ids.append(int(doc_id))
                seen = np.vstack([seen, v[None, :]])
        if len(ids) > max_per_bucket:      # FIFO skew guard
            ids = ids[-max_per_bucket:]
            seen = seen[-max_per_bucket:]
        state.update((ids, seen.astype("<i8").tobytes()))
        if out_id1:
            yield pd.DataFrame({"id1": out_id1, "id2": out_id2,
                                "est_sim": out_sim})

    return update


def stream_neardup_pairs(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", n: int = 3,
                         num_hashes: int = 64, bands: int = 16,
                         threshold: float = 0.5,
                         max_per_bucket: int = 256,
                         base_hash=None) -> DataFrame:
    """Near-dup pairs over a streaming document frame (file/Kafka
    source; batch frames can't host group state — the batch twin is
    ``operators.dedup.minhash_dedup_pairs``). ``threshold`` applies to
    the signature-agreement fraction — the MinHash estimate of
    Jaccard, so E[est_sim] equals the exact-Jaccard threshold the
    batch verify uses."""
    sig = docs.select(F.col(id_col).alias("id"),
                      minhash_signature_arrow(
                          word_shingles(F.col(text_col), n),
                          num_hashes, base_hash=base_hash).alias("sig"))
    banded = banded_rows(sig, num_hashes, bands, keep_sig=True)
    return (banded.groupBy("band", "bucket")
            .applyInPandasWithState(
                _make_update(num_hashes, threshold, max_per_bucket),
                PAIR_SCHEMA, STATE_SCHEMA, "update",
                GroupStateTimeout.NoTimeout))

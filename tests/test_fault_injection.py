"""Fault-injection determinism pins (VERDICT r6 ask #4).

scripts/fault_injection_probe.py is the full probe (5 heaviest shapes
x retry+speculation modes); this pin keeps the mechanism from
regressing by driving a representative subset through the same
subprocess (a second SparkContext with master ``local[N,4]`` cannot
share the test session's JVM).  A pass requires BOTH the sorted-rowset
hash to match the clean run AND at least one injection to have fired
(marker-file counted) — a silently-not-injecting probe fails.
"""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE = os.path.join(ROOT, "scripts", "fault_injection_probe.py")


def test_retry_determinism_on_heavy_shapes():
    """Injected first-attempt task failures (maxFailures=4) must not
    change the minhash-LSH or GEMM-topk rowsets — retries re-read the
    scan, re-deal a round-robin repartition (the SPARK-23207 shape)
    and re-fetch shuffle blocks."""
    r = subprocess.run(
        [sys.executable, PROBE, "/root/testdata/sf0.01",
         "--shapes", "minhash,topk_gemm", "--modes", "retry"],
        capture_output=True, text=True, timeout=900, cwd=ROOT)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "ALL MATCH" in r.stdout


def test_streaming_retry_determinism():
    """VERDICT r7 ask #4: mid-batch task failures inside the stateful
    streaming queries (session windows; MinHash/LSH near-dup ingest),
    injected both pre-state and in the state-commit stage of every
    micro-batch's foreachBatch job — the sink rowset AND the final
    state-store contents (statestore reader, canonicalized) must
    hash-match the clean run, with injections marker-counted."""
    r = subprocess.run(
        [sys.executable, PROBE, "/root/testdata/sf0.001",
         "--modes", "streaming"],
        capture_output=True, text=True, timeout=900, cwd=ROOT)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "ALL MATCH" in r.stdout
    assert "session_windows" in r.stdout
    assert "neardup_ingest" in r.stdout

"""Cross-parallelism equivalence pinned as a pytest (H10; the
``TestMultithreadedCuVSGPUSearch.java:91-133`` transplant at the Spark
level): the SAME build + frozen 128-query batch at local[2] and local[8]
must produce bit-identical results. Each level runs in its own JVM via
the tools/scaling.py worker (a SparkSession's master can't change
in-process)."""

from __future__ import annotations

from tools.scaling import run_level

N_DOCS = 3000  # small corpus — this pins correctness, not throughput


def test_results_identical_across_parallelism():
    low = run_level(2, N_DOCS)
    high = run_level(8, N_DOCS)
    assert low["n_results"] == high["n_results"] > 0
    assert low["result_hash"] == high["result_hash"]

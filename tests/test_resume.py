"""Checkpoint/resume (north rule: resumable from checkpoint with
per-partition lineage): a build killed between stages resumes without
redoing completed stages and yields a byte-identical index; reruns are
no-ops."""

import json

import pytest

from cuvs_lucene_spark.config import IndexConfig
from cuvs_lucene_spark.operators.bm25 import bm25_topk
from cuvs_lucene_spark.operators.segments import build_index
from cuvs_lucene_spark.sources.catalog import IndexCatalog

from tests.conftest import SF_DIR

CFG = IndexConfig(rows_per_segment=100, block_size=16, term_buckets=8)


def test_resume_after_partial_build(spark, tmp_path, monkeypatch):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    root = str(tmp_path / "idx")

    # simulate a crash right after the norms stage commits
    import cuvs_lucene_spark.operators.segments as S

    orig_mark = IndexCatalog.mark_stage
    calls = []

    def crashing_mark(self, stage, status="done", **kw):
        orig_mark(self, stage, status, **kw)
        calls.append(stage)
        if stage == "segdata":
            raise RuntimeError("simulated crash after segdata commit")

    monkeypatch.setattr(IndexCatalog, "mark_stage", crashing_mark)
    with pytest.raises(RuntimeError, match="simulated crash"):
        build_index(spark, docs, root, CFG, content_col="text", id_col="doc_id")
    monkeypatch.setattr(IndexCatalog, "mark_stage", orig_mark)

    cat = IndexCatalog(root)
    m = cat.read_manifest()
    assert m["stages"]["segdata"]["status"] == "done"
    assert "finalize" not in m["stages"]

    # resume completes only the missing stages
    snap_before = m["tables"]["segdata"]["snapshot"]
    cat = build_index(spark, docs, root, CFG, content_col="text", id_col="doc_id")
    m2 = cat.read_manifest()
    assert m2["tables"]["segdata"]["snapshot"] == snap_before  # not rebuilt
    assert cat.stage_done("finalize")

    # per-partition lineage recorded
    lineage = m2["stages"]["finalize"]["lineage"]
    assert len(lineage) == 5  # 500 docs / 100 per segment
    assert sum(v["n_docs"] for v in lineage.values()) == 500

    # rerun is a pure no-op on completed stages
    snaps = {t: e["snapshot"] for t, e in m2["tables"].items()}
    build_index(spark, docs, root, CFG, content_col="text", id_col="doc_id")
    m3 = cat.read_manifest()
    assert {t: e["snapshot"] for t, e in m3["tables"].items()} == snaps

    # and the resumed index answers correctly
    res = bm25_topk(spark, cat, ["join", "vector"], k=5, cfg=CFG).collect()
    assert len(res) == 5


def test_atomic_snapshot_visibility(spark, tmp_path):
    """A failed write never becomes visible: manifest points at the old
    snapshot until the new one is fully committed."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    root = str(tmp_path / "idx2")
    cat = build_index(spark, docs, root, CFG, content_col="text", id_col="doc_id")
    before = cat.read_manifest()["tables"]["postings"]["snapshot"]
    bad = docs.selectExpr("doc_id AS x", "assert_true(doc_id < 0) AS y")
    with pytest.raises(Exception):
        cat.write(bad, "postings")
    assert cat.read_manifest()["tables"]["postings"]["snapshot"] == before
    assert cat.read(spark, "postings").count() > 0

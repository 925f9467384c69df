"""Commit-point (point-in-time) readers — the Lucene IndexCommit /
DirectoryReader.open(commit) semantics: a reader pinned to a past commit
sees the index exactly as it was; later deletes/writes are invisible.
Retention mirrors an IndexDeletionPolicy (last N commits kept)."""

import numpy as np
import pytest

from cuvs_lucene_spark.config import IndexConfig
from cuvs_lucene_spark.operators.ann import ann_topk, build_ann, delete_ann
from cuvs_lucene_spark.operators.bm25 import bm25_topk
from cuvs_lucene_spark.operators.deletes import delete_by_term
from cuvs_lucene_spark.operators.segments import build_index

from tests.conftest import SF_DIR

CFG = IndexConfig(rows_per_segment=200, block_size=32, term_buckets=8)


def test_commit_point_reader_sees_predelete_state(spark, docs_df, tmp_path):
    cat = build_index(
        spark, docs_df, str(tmp_path / "idx"), CFG,
        content_col="text", id_col="doc_id",
    )
    c_before = cat.commit_points()[-1]
    live_before = [r["ext_id"] for r in
                   bm25_topk(spark, cat, ["join", "vector"], k=10, cfg=CFG).collect()]
    delete_by_term(spark, cat, "join", CFG)
    live_after = [r["ext_id"] for r in
                  bm25_topk(spark, cat, ["join", "vector"], k=10, cfg=CFG).collect()]
    assert live_after != live_before  # deletes took effect on the live view
    pinned = cat.reader_at(c_before)
    pinned_res = [r["ext_id"] for r in
                  bm25_topk(spark, pinned, ["join", "vector"], k=10, cfg=CFG).collect()]
    assert pinned_res == live_before  # point-in-time: pre-delete results


def test_commit_point_reader_ann(spark, tmp_path):
    rng = np.random.default_rng(5)
    x = rng.normal(size=(120, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, x[i].tolist()) for i in range(120)], "vec_id long, embedding array<float>"
    )
    cat = build_ann(spark, df, str(tmp_path / "ann"), CFG,
                    id_col="vec_id", vector_col="embedding", rows_per_segment=60)
    c0 = cat.commit_points()[-1]
    delete_ann(spark, cat, [7])
    live = [r["ext_id"] for r in
            ann_topk(spark, cat, x[7], k=3, cfg=CFG, mode="exact").collect()]
    assert 7 not in live
    pinned = cat.reader_at(c0)
    old = [r["ext_id"] for r in
           ann_topk(spark, pinned, x[7], k=3, cfg=CFG, mode="exact").collect()]
    assert old[0] == 7  # the deleted vector is visible at the old commit


def test_commit_point_reader_is_read_only_and_bounded(spark, docs_df, tmp_path):
    cat = build_index(
        spark, docs_df.limit(50), str(tmp_path / "ro"), CFG,
        content_col="text", id_col="doc_id",
    )
    pts = cat.commit_points()
    assert pts and len(pts) <= cat.COMMIT_RETENTION  # retention policy holds
    pinned = cat.reader_at(pts[-1])
    with pytest.raises(PermissionError):
        pinned.write(docs_df, "anything")
    with pytest.raises(PermissionError):
        pinned.mark_stage("x")
    with pytest.raises(FileNotFoundError):
        cat.reader_at(999_999)


def test_searcher_manager_analogue_concurrent(spark, docs_df, tmp_path):
    """SearcherManager semantics: a reader pinned BEFORE a writer's commits
    returns bit-identical results from concurrent threads while the live
    index keeps changing underneath it."""
    import threading

    cat = build_index(
        spark, docs_df, str(tmp_path / "sm"), CFG,
        content_col="text", id_col="doc_id",
    )
    pinned = cat.reader_at(cat.commit_points()[-1])
    baseline = [tuple(r) for r in
                bm25_topk(spark, pinned, ["join", "vector"], k=10, cfg=CFG).collect()]

    results, errors = {}, []

    def searcher(tid):
        try:
            for _ in range(3):
                got = [tuple(r) for r in
                       bm25_topk(spark, pinned, ["join", "vector"], k=10, cfg=CFG).collect()]
                assert got == baseline
            results[tid] = True
        except Exception as e:  # pragma: no cover
            errors.append((tid, e))

    threads = [threading.Thread(target=searcher, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    # writer keeps committing while searchers run (deletes mutate the live view)
    delete_by_term(spark, cat, "join", CFG)
    delete_by_term(spark, cat, "vector", CFG)
    for t in threads:
        t.join()
    assert not errors and len(results) == 3
    # live view did change; the pinned view did not
    live = [tuple(r) for r in
            bm25_topk(spark, cat, ["join", "vector"], k=10, cfg=CFG).collect()]
    assert live != baseline
    again = [tuple(r) for r in
             bm25_topk(spark, pinned, ["join", "vector"], k=10, cfg=CFG).collect()]
    assert again == baseline


def test_pinned_reader_derives_filter_map_without_persisting(spark, tmp_path):
    """A commit-point reader pinned BEFORE the ann_ids map existed must
    still answer DataFrame-filtered queries: _ann_ids derives the map per
    query (read-only — the PermissionError branch) and never writes."""
    import json
    import os

    from pyspark.sql import functions as F

    from cuvs_lucene_spark.operators.ann import build_ann
    from cuvs_lucene_spark.sources.catalog import CommitPointReader

    rng = np.random.default_rng(8)
    x = rng.normal(size=(120, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, x[i].tolist()) for i in range(120)], "vec_id long, embedding array<float>"
    )
    cat = build_ann(
        spark, df, str(tmp_path / "pin"), CFG,
        id_col="vec_id", vector_col="embedding", rows_per_segment=60,
    )
    # simulate a pre-v3 commit: pin the current manifest minus ann_ids
    m = json.loads(json.dumps(cat.read_manifest()))
    m["tables"].pop("ann_ids")
    pinned = CommitPointReader(cat.root, m)
    assert not pinned.exists("ann_ids")
    fdf = spark.createDataFrame([(i,) for i in range(0, 120, 2)], "ext_id long")
    got = [r["ext_id"] for r in ann_topk(
        spark, pinned, x[7], k=5, cfg=CFG, mode="exact",
        filter_ext_ids=fdf, filter_mode="df").collect()]
    want = [r["ext_id"] for r in ann_topk(
        spark, cat, x[7], k=5, cfg=CFG, mode="exact",
        filter_ext_ids={i for i in range(0, 120, 2)}).collect()]
    assert got == want
    # nothing was persisted through the read-only reader
    assert not pinned.exists("ann_ids")
    snaps = os.listdir(os.path.join(cat.root, "ann_ids"))
    assert len([s for s in snaps if s.startswith("snap-")]) == 1  # build's own

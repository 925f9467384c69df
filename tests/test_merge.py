"""Merge invariants (SURVEY.md §5.4, mirroring TestMerge /
TestCuVSDeletedDocuments): merge preserves counts/searchability, deletes
drop out physically, merged index ≡ fresh rebuild from live docs (the
reference's merge-as-rebuild semantics M2), queries rank-identical
before/after merge."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from cuvs_lucene_spark.config import IndexConfig
from cuvs_lucene_spark.functions.varint import varint_decode
from cuvs_lucene_spark.operators.bm25 import bm25_topk
from cuvs_lucene_spark.operators.deletes import delete_by_term, delete_docs, live_doc_map
from cuvs_lucene_spark.operators.merge import force_merge, merge_segments
from cuvs_lucene_spark.operators.segments import build_index
from cuvs_lucene_spark.oracle import bm25_sql

from tests.conftest import SF_DIR

CFG = IndexConfig(
    rows_per_segment=50, block_size=16, prune_range=64, term_buckets=8,
    merge_fanin=4, salt_factor=3,
)


def _duck(sql):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    return con.sql(sql).fetchall()


def _topk(spark, cat, terms, k=10):
    return [
        (r["ext_id"], round(r["score"], 6))
        for r in bm25_topk(spark, cat, terms, k=k, cfg=CFG).collect()
    ]


def _decoded_postings(spark, cat):
    """{term: [(ext_id, tf), ...] sorted} across all segments — the
    segment-independent observable content of the index."""
    norms = {
        r["segment_id"]: np.frombuffer(r["ext_ids"], dtype=np.int64)
        for r in cat.read(spark, "norms").collect()
    }
    out = {}
    for r in cat.read(spark, "postings").collect():
        docs = np.cumsum(varint_decode(r["doc_deltas"]))
        tfs = varint_decode(r["tfs"])
        ext = norms[r["segment_id"]][docs]
        out.setdefault(r["term"], []).extend(zip(ext.tolist(), tfs.tolist()))
    return {t: sorted(v) for t, v in out.items()}


@pytest.fixture()
def built(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cat = build_index(
        spark, docs, str(tmp_path / "idx"), CFG, content_col="text", id_col="doc_id"
    )
    return docs, cat


def test_merge_preserves_queries_and_equals_rebuild(spark, built, tmp_path):
    docs, cat = built
    n_seg_before = cat.read(spark, "segment_stats").count()
    assert n_seg_before == 10

    # tombstone a slice: all docs of lang 'fr' + every doc containing 'dup'
    fr_ids = docs.filter(F.col("lang") == "fr").select(F.col("doc_id").alias("ext_id"))
    delete_docs(spark, cat, fr_ids)
    delete_by_term(spark, cat, "dup", CFG)

    delete_pred = "lang = 'fr' OR list_contains(regexp_extract_all(lower(text),'[a-z0-9_]+'), 'dup')"
    exp = [(i, round(s, 6)) for i, s in _duck(bm25_sql(["join", "vector"], k=10, delete_pred=delete_pred))]
    pre = _topk(spark, cat, ["join", "vector"])
    assert pre == exp

    live_before = {r["ext_id"] for r in live_doc_map(spark, cat).select("ext_id").collect()}

    force_merge(spark, cat, CFG)  # hierarchical: 10 → 3 → 1
    assert cat.read(spark, "segment_stats").count() == 1

    # searchability + rank-identity preserved across merge
    post = _topk(spark, cat, ["join", "vector"])
    assert post == exp

    # physical drop: doc_map now contains exactly the live docs; tombstones cleared
    dm_after = cat.read(spark, "doc_map")
    assert {r["ext_id"] for r in dm_after.select("ext_id").collect()} == live_before
    assert cat.read(spark, "tombstones").count() == 0

    # merged index ≡ fresh rebuild from live docs (M2 semantics)
    live_docs = docs.join(
        spark.createDataFrame([(int(i),) for i in live_before], "doc_id long"),
        "doc_id",
        "left_semi",
    )
    rebuilt = build_index(
        spark, live_docs, str(tmp_path / "rebuild"), CFG, content_col="text", id_col="doc_id"
    )
    assert _decoded_postings(spark, cat) == _decoded_postings(spark, rebuilt)

    # doc ordering (ext_id asc) and norms identical
    a = cat.read(spark, "norms").collect()[0]
    # rebuilt has multiple segments; concatenate in segment order
    rb = sorted(rebuilt.read(spark, "norms").collect(), key=lambda r: r["segment_id"])
    rb_ext = np.concatenate([np.frombuffer(r["ext_ids"], dtype=np.int64) for r in rb])
    rb_dls = np.concatenate([np.frombuffer(r["dls"], dtype=np.uint32) for r in rb])
    assert np.array_equal(np.frombuffer(a["ext_ids"], dtype=np.int64), rb_ext)
    assert np.array_equal(np.frombuffer(a["dls"], dtype=np.uint32), rb_dls)


def test_deleted_never_returned_and_all_deleted_zero_hits(spark, built):
    docs, cat = built
    # delete every doc that contains 'join'
    delete_by_term(spark, cat, "join", CFG)
    res = _topk(spark, cat, ["join"])
    assert res == []  # all matches deleted → 0 hits (TestCuVSDeletedDocuments:205-248)
    # other queries never return tombstoned docs
    deleted = {r["ext_id"] for r in cat.read(spark, "tombstones").collect()}
    res2 = _topk(spark, cat, ["vector", "scan"], k=50)
    assert all(i not in deleted for i, _ in res2)


def test_partial_merge_group(spark, built):
    """Merging a subset of segments leaves others untouched and queries
    exact. Merged segments get FRESH ids (append + logical drop — ids are
    never reused because dropped ids stay excluded at read time)."""
    from cuvs_lucene_spark.operators.merge import MERGE_BASE

    docs, cat = built
    newseg = merge_segments(spark, cat, CFG, groups=[[0, 1, 2], [3, 4]])
    assert len(newseg) == 2
    assert all(s >= MERGE_BASE for s in newseg.values())
    live_segs = {r["segment_id"] for r in cat.read(spark, "segment_stats").collect()}
    assert len(live_segs) == 10 - 5 + 2
    assert set(newseg.values()) <= live_segs
    assert not ({0, 1, 2, 3, 4} & live_segs)  # merged-away ids are gone
    exp = [(i, round(s, 6)) for i, s in _duck(bm25_sql(["join", "vector"], k=10))]
    assert _topk(spark, cat, ["join", "vector"]) == exp


def test_tiered_merge_policy(spark, built):
    """pick_merge_groups: smallest segments first, fan-in groups, segments
    at/above the size cap untouched, no single-segment groups; a policy-
    driven merge keeps queries exact."""
    from cuvs_lucene_spark.operators.merge import pick_merge_groups

    docs, cat = built  # 10 segments of 50 docs each
    groups = pick_merge_groups(spark, cat, CFG, max_segment_docs=51)
    assert groups and all(2 <= len(g) <= CFG.merge_fanin for g in groups)
    assert sum(len(g) for g in groups) == 10
    merge_segments(spark, cat, CFG, groups=groups)
    # merged segments now hold ~200 docs ≥ cap → policy finds nothing more
    assert pick_merge_groups(spark, cat, CFG, max_segment_docs=51) == []
    exp = [(i, round(s, 6)) for i, s in _duck(bm25_sql(["join", "vector"], k=10))]
    assert _topk(spark, cat, ["join", "vector"]) == exp


def test_merge_crash_before_commit_is_invisible_and_retryable(spark, built):
    """Atomicity: the merge's single manifest commit is the flip point. A
    crash before it leaves the pre-merge index fully intact; a retry
    completes normally (the orphan increment directory is overwritten)."""
    docs, cat = built
    pre = _topk(spark, cat, ["join", "vector"])
    orig = cat._write_manifest

    def crash(_m):
        raise RuntimeError("injected crash before manifest commit")

    cat._write_manifest = crash
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            merge_segments(spark, cat, CFG)
    finally:
        cat._write_manifest = orig
    # pre-merge state fully visible: same segments, same results
    assert cat.read(spark, "segment_stats").count() == 10
    assert _topk(spark, cat, ["join", "vector"]) == pre
    # retry succeeds and preserves results
    merge_segments(spark, cat, CFG)
    assert _topk(spark, cat, ["join", "vector"]) == pre


def test_rewrite_segdata_compaction(spark, built):
    """Compaction folds appends + drops into one snapshot with identical
    observable content and an empty drop list."""
    from cuvs_lucene_spark.operators.merge import rewrite_segdata

    docs, cat = built
    delete_by_term(spark, cat, "dup", CFG)
    force_merge(spark, cat, CFG)
    before = _topk(spark, cat, ["join", "vector"])
    post_before = _decoded_postings(spark, cat)
    rewrite_segdata(spark, cat)
    ent = cat.read_manifest()["tables"]["segdata"]
    assert not ent.get("dropped_segments")
    assert not ent.get("appends")
    assert _topk(spark, cat, ["join", "vector"]) == before
    assert _decoded_postings(spark, cat) == post_before
    # sha256 integrity holds across merge + compaction (S11 invariant)
    from cuvs_lucene_spark.operators.segments import verify_integrity

    live = docs.join(
        cat.read(spark, "doc_map").select(F.col("ext_id").alias("doc_id")),
        "doc_id", "left_semi",
    )
    assert verify_integrity(spark, cat, live, "text", "doc_id").count() == 0

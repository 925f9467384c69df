"""Physical-plan assertions: the engine must produce the plans it was
designed for — pushed filters on the postings scan, pruned read schemas,
broadcast joins for small sides. Guard against silent plan regressions."""

import pytest
from pyspark.sql import functions as F

from cuvs_lucene_spark.config import IndexConfig
from cuvs_lucene_spark.operators.bm25 import _query_postings, fetch_stored
from cuvs_lucene_spark.operators.segments import build_index

from tests.conftest import SF_DIR

CFG = IndexConfig(rows_per_segment=100, block_size=16, term_buckets=8)


@pytest.fixture(scope="module")
def cat(spark, tmp_path_factory):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return build_index(
        spark, docs, str(tmp_path_factory.mktemp("planidx")), CFG,
        content_col="text", id_col="doc_id",
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_postings_scan_pushes_filters(spark, cat):
    df = _query_postings(spark, cat, ["join", "vector"], CFG)
    plan = _plan(df)
    assert "PushedFilters" in plan
    # both the bucket and the term predicate reach the parquet scan
    assert "term_bucket" in plan.split("PushedFilters")[1][:400]
    assert "In(term" in plan or "term," in plan.split("PushedFilters")[1][:400]


def test_postings_scan_prunes_columns(spark, cat):
    df = _query_postings(spark, cat, ["join"], CFG).select("segment_id", "term", "n")
    plan = _plan(df)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # the fat binary columns must NOT be read for a count-style projection
    assert "doc_deltas" not in read_schema
    assert "tfs" not in read_schema


def test_stored_fetch_broadcasts_topk(spark, cat):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumnRenamed(
        "doc_id", "ext_id"
    )
    topk = spark.createDataFrame([(1, 0.5), (2, 0.4)], "ext_id long, score double")
    plan = _plan(fetch_stored(spark, cat, topk, docs))
    assert "BroadcastHashJoin" in plan


def test_embedding_near_dup_no_nested_loop_join(spark):
    """The exact near-dup join must distribute through block-grid
    EQUI-joins — a BroadcastNestedLoopJoin means the O(N²) pairs flow
    through one nested-loop operator with the whole table broadcast."""
    from cuvs_lucene_spark.operators.dedup import embedding_near_dup

    vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = _plan(embedding_near_dup(vecs, threshold=0.4))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_grouped_dense_rank_no_window_no_single_partition(spark):
    """The merge doc-id assignment path: no Window operator and no
    Exchange SinglePartition anywhere (a forceMerge(1) would otherwise
    serialize the whole doc_map through one task)."""
    from cuvs_lucene_spark.operators.segments import grouped_dense_rank

    df = spark.range(0, 10_000).selectExpr("id % 3 AS g", "id AS v")
    ranked, unpersist = grouped_dense_rank(df, ["g"], ["v"], "rk", n_partitions=5)
    plan = _plan(ranked)
    unpersist()
    assert "Window" not in plan
    assert "SinglePartition" not in plan


def test_ivf_probe_pushes_list_filter(spark, tmp_path):
    """IVF search job 2 scans ann_ivf with a pushed list_id filter — the
    probe prunes at the parquet scan, not inside a pandas pass."""
    from cuvs_lucene_spark.operators.ann import ann_topk, build_ann

    rows = [(i, [float(i), float(i % 7)] * 4) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cat = build_ann(
        spark, df, str(tmp_path / "annplan"), CFG,
        id_col="vec_id", vector_col="embedding", rows_per_segment=20,
    )
    plan = _plan(ann_topk(spark, cat, [1.0] * 8, k=3, metric="l2", cfg=CFG, mode="ivf"))
    pushed = [seg for seg in plan.split("PushedFilters: ")[1:]]
    assert any("list_id" in p[:300] for p in pushed), plan[:2000]


def test_fast_query_path_single_shuffle_no_cogroup(spark, cat):
    """The no-deletes broadcast-norms query path: ONE hash exchange on
    segment_id, no FlatMapCoGroupsInPandas (the aux union + cogroup only
    appear when tombstones or large filters force the blob path)."""
    from cuvs_lucene_spark.operators.bm25 import bm25_topk

    df = bm25_topk(spark, cat, ["join", "vector"], k=10, cfg=CFG)
    plan = _plan(df)
    assert "FlatMapCoGroupsInPandas" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_whole_stage_codegen_on_text_ops(spark):
    from cuvs_lucene_spark.functions.textstats import quality_score

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(quality_score(docs))
    # pure Catalyst expressions: no Python eval nodes anywhere in the plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Project" in plan


def test_ivf_distributed_probe_no_driver_collect(spark, tmp_path, monkeypatch):
    """probe_mode='distributed' must never materialize centroid state on
    the driver (the 10⁶-segment path): poison the driver-pack helpers and
    assert the distributed result matches the driver-ranked one."""
    import cuvs_lucene_spark.operators.ann as A

    rows = [(i, [float(i % 13), float(i % 7), float(i % 5), 1.0] * 2) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cat = A.build_ann(
        spark, df, str(tmp_path / "annprobe"), CFG,
        id_col="vec_id", vector_col="embedding", rows_per_segment=20,
    )
    q = [1.0] * 8
    want = [(r["ext_id"], round(r["score"], 9)) for r in A.ann_topk(
        spark, cat, q, k=5, cfg=CFG, mode="ivf", probe_mode="driver").collect()]

    def _boom(*a, **k):
        raise AssertionError("driver-side centroid collect on the distributed path")

    monkeypatch.setattr(A, "_centroid_pack", _boom)
    monkeypatch.setattr(A, "_centroid_rows", _boom)
    got = [(r["ext_id"], round(r["score"], 9)) for r in A.ann_topk(
        spark, cat, q, k=5, cfg=CFG, mode="ivf", probe_mode="distributed").collect()]
    assert got == want


def test_ivfpq_probe_pushes_list_filter_and_no_cartesian(spark, tmp_path):
    """The IVF-PQ search scans its compressed lists with the probe's
    list_id filter pushed to parquet, and never a nested-loop join."""
    from cuvs_lucene_spark.operators.ann import (
        ann_topk_ivfpq,
        build_ann,
        build_ann_ivfpq,
    )

    rows = [(i, [float(i), float(i % 7)] * 4) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cat = build_ann(
        spark, df, str(tmp_path / "ivfpqplan"), CFG,
        id_col="vec_id", vector_col="embedding", rows_per_segment=20,
    )
    build_ann_ivfpq(spark, cat, CFG)
    plan = _plan(ann_topk_ivfpq(spark, cat, [1.0] * 8, k=3, cfg=CFG))
    pushed = [seg for seg in plan.split("PushedFilters: ")[1:]]
    assert any("list_id" in p[:300] for p in pushed), plan[:2000]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_knn_join_ivf_distributed_probe_no_driver_collect(spark, tmp_path, monkeypatch):
    """knn_join_ivf's distributed probe: NO collect whose size grows with
    segment count (the centroid pack must never land in the driver /
    closure) — poison the driver-pack helpers and assert the distributed
    result matches the driver-ranked one, bf-fallback segment included."""
    import cuvs_lucene_spark.operators.ann as A

    n = 301  # segments of 150/150/1 — the last is a bf-fallback pseudo-list
    rows = [(i, [float(i % 13), float(i % 7), float(i % 5), 1.0] * 2) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cat = A.build_ann(
        spark, df, str(tmp_path / "joinprobe"), CFG,
        id_col="vec_id", vector_col="embedding", rows_per_segment=150,
    )
    qdf = df.filter(F.col("vec_id").isin([0, 17, 300])).selectExpr(
        "vec_id AS q_id", "embedding AS q_vec"
    )
    want = sorted(
        (r["q_id"], r["rank"], r["vec_id"], r["score"])
        for r in A.knn_join_ivf(spark, cat, qdf, k=3, probe_mode="driver").collect()
    )
    monkeypatch.setattr(
        A, "_centroid_rows",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("driver centroid collect on the distributed join path")
        ),
    )
    monkeypatch.setattr(
        A, "_centroid_pack",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("driver centroid pack on the distributed join path")
        ),
    )
    got = sorted(
        (r["q_id"], r["rank"], r["vec_id"], r["score"])
        for r in A.knn_join_ivf(spark, cat, qdf, k=3, probe_mode="distributed").collect()
    )
    assert got == want


def test_knn_join_ivf_shuffle_tier_no_broadcast_no_collect(spark, tmp_path, monkeypatch):
    """The many-segments × many-queries cell: probe_mode='shuffle' must
    neither collect centroid state on the driver NOR broadcast a
    DataFrame whose size grows with the query count. Poison both the
    driver-pack helpers and F.broadcast itself, pin the plan (no
    BroadcastExchange with auto-broadcast off), and assert the results
    match the driver-ranked tier — bf-fallback pseudo-list included."""
    import cuvs_lucene_spark.operators.ann as A

    n = 301  # segments of 150/150/1 — the last is a bf-fallback pseudo-list
    rows = [(i, [float(i % 13), float(i % 7), float(i % 5), 1.0] * 2) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cat = A.build_ann(
        spark, df, str(tmp_path / "joinshuffle"), CFG,
        id_col="vec_id", vector_col="embedding", rows_per_segment=150,
    )
    qdf = df.filter(F.col("vec_id").isin([0, 17, 300])).selectExpr(
        "vec_id AS q_id", "embedding AS q_vec"
    )
    want = sorted(
        (r["q_id"], r["rank"], r["vec_id"], r["score"])
        for r in A.knn_join_ivf(spark, cat, qdf, k=3, probe_mode="driver").collect()
    )
    boom = lambda *a, **k: (_ for _ in ()).throw(  # noqa: E731
        AssertionError("driver/broadcast state on the shuffle join tier")
    )
    monkeypatch.setattr(A, "_centroid_rows", boom)
    monkeypatch.setattr(A, "_centroid_pack", boom)
    monkeypatch.setattr(A.F, "broadcast", boom)
    got_df = A.knn_join_ivf(spark, cat, qdf, k=3, probe_mode="shuffle")
    got = sorted(
        (r["q_id"], r["rank"], r["vec_id"], r["score"]) for r in got_df.collect()
    )
    assert got == want
    # with auto-broadcast disabled the shuffle tier's plan must hold no
    # broadcast exchange at all — both probe joins are shuffled
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(A.knn_join_ivf(spark, cat, qdf, k=3, probe_mode="shuffle"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastExchange" not in plan
    assert "CartesianProduct" not in plan


def test_probe_ladder_auto_switches_to_distributed(spark, tmp_path, monkeypatch):
    """Scale-shape regression: above PROBE_DRIVER_MAX_SEGMENTS the auto
    probe mode must leave the driver — for BOTH ann_topk and knn_join_ivf —
    and return results identical to the driver-ranked mode."""
    import cuvs_lucene_spark.operators.ann as A

    rows = [(i, [float(i % 11), float(i % 3), 2.0, 1.0] * 2) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cat = A.build_ann(
        spark, df, str(tmp_path / "ladder"), CFG,
        id_col="vec_id", vector_col="embedding", rows_per_segment=20,
    )
    assert cat.read_manifest()["stages"]["ann_ivf"]["n_ivf_segments"] == 5
    q = [1.0] * 8
    qdf = df.filter(F.col("vec_id") < 3).selectExpr("vec_id AS q_id", "embedding AS q_vec")
    want_topk = [(r["ext_id"], round(r["score"], 9)) for r in A.ann_topk(
        spark, cat, q, k=5, cfg=CFG, mode="ivf", probe_mode="driver").collect()]
    want_join = sorted(
        (r["q_id"], r["rank"], r["vec_id"]) for r in
        A.knn_join_ivf(spark, cat, qdf, k=3, probe_mode="driver").collect()
    )
    # 5 segments > a ladder threshold of 2 → auto must pick distributed
    monkeypatch.setattr(A, "PROBE_DRIVER_MAX_SEGMENTS", 2)
    boom = lambda *a, **k: (_ for _ in ()).throw(  # noqa: E731
        AssertionError("auto mode stayed on the driver above the ladder threshold")
    )
    monkeypatch.setattr(A, "_centroid_pack", boom)
    monkeypatch.setattr(A, "_centroid_rows", boom)
    got_topk = [(r["ext_id"], round(r["score"], 9)) for r in A.ann_topk(
        spark, cat, q, k=5, cfg=CFG, mode="ivf", probe_mode="auto").collect()]
    got_join = sorted(
        (r["q_id"], r["rank"], r["vec_id"]) for r in
        A.knn_join_ivf(spark, cat, qdf, k=3, probe_mode="auto").collect()
    )
    assert got_topk == want_topk
    assert got_join == want_join


def test_cosine_ivf_plan_shape(spark, tmp_path):
    """The cosine IVF probe keeps the scale-correct physical shape the L2
    path is pinned to: list_id filter pushed to the parquet scan, a
    broadcast hash join for the probe-pair semi-join, and never a
    nested-loop join."""
    import dataclasses

    import numpy as np

    from cuvs_lucene_spark.operators.ann import ann_topk, build_ann

    ccfg = dataclasses.replace(
        CFG, ann=dataclasses.replace(CFG.ann, metric="cosine")
    )
    rng = np.random.default_rng(21)
    x = rng.normal(size=(300, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, x[i].tolist()) for i in range(300)], "vec_id long, embedding array<float>"
    )
    acat = build_ann(spark, df, str(tmp_path / "cosplan"), ccfg,
                     id_col="vec_id", vector_col="embedding", rows_per_segment=100)
    plan = _plan(ann_topk(spark, acat, x[0], k=5, metric="cosine",
                          cfg=ccfg, mode="ivf"))
    assert "list_id" in plan  # probe filter reaches the scan
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_fuzzy_dictionary_scan_pushes_prefix_and_length(spark, cat):
    """The fuzzy rewrite's pruning must reach the parquet dictionary scan:
    kind=term, the non-fuzzy StartsWith prefix, and the ±maxEdits length
    window all as data filters — never a full-dictionary pandas pass."""
    terms = cat.read(spark, "terms").select("term")
    pruned = (
        terms.filter(F.col("term").startswith("pa"))
        .filter(F.length("term").between(2, 6))
        .filter(F.levenshtein(F.col("term"), F.lit("part"), 2) >= 0)
    )
    plan = _plan(pruned)
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "StringStartsWith(term,pa)" in pushed
    assert "EqualTo(kind,term)" in pushed
    # the length window runs against the scan output (same stage, before
    # any exchange — DataFilters truncates in toString, so match the plan)
    assert "length(term" in plan
    assert "Exchange" not in plan.split("FileScan")[0]


def test_decontamination_plan_semi_join_no_cartesian(spark):
    """ngram_contamination must meet train and eval grams in ONE equi-join
    (semi), never a nested-loop/cartesian pairing of docs."""
    from cuvs_lucene_spark.operators.dedup import ngram_contamination

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = ngram_contamination(
        train=docs.filter(F.col("doc_id") % 17 != 0),
        evals=docs.filter(F.col("doc_id") % 17 == 0),
        n=5,
    )
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan


def test_facet_plan_semi_join_and_hash_agg(spark, cat):
    """facet_counts = one semi-join + a hash aggregate with map-side
    partials (partial_count before the exchange) — no nested loops."""
    from cuvs_lucene_spark.operators.bm25 import term_docs
    from cuvs_lucene_spark.operators.facets import facet_counts

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = facet_counts(docs, term_docs(spark, cat, "data", CFG), "lang", top_n=3)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan
    assert "partial_count" in plan  # map-side combine before the shuffle


def test_range_facet_single_pass_no_per_range_joins(spark, cat):
    """range_facet_counts computes EVERY range in one conditional
    aggregation: exactly the one semi-join, no union of per-range scans."""
    from cuvs_lucene_spark.operators.bm25 import term_docs
    from cuvs_lucene_spark.operators.facets import range_facet_counts

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = range_facet_counts(
        docs, term_docs(spark, cat, "data", CFG), "n_chars",
        [("a", 0, 200), ("b", 201, 400), ("c", 0, 10**9)],
    )
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # ONE doc-table scan feeds all three ranges (no per-range re-scan
    # union): exactly one FileScan reads the n_chars column. The match
    # side contributes its own (index-table) scans — not counted.
    doc_scans = [
        ln for ln in plan.splitlines()
        if "Scan parquet" in ln and "n_chars" in ln
    ]
    assert len(doc_scans) == 1, plan[:2000]


def test_span_near_scan_pushes_span_terms(spark, cat):
    """span_near's sidecar scan is pruned to the queried terms (pushed
    In(term,...)), like the phrase scan it shares _phrase_rows with."""
    from cuvs_lucene_spark.operators.positions import _phrase_rows, build_positions

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    build_positions(spark, cat, docs, CFG)
    rows = _phrase_rows(spark, cat, ["data", "scan"])
    plan = _plan(rows)
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters")[1][:400]
    assert "term" in pushed and "In(" in pushed


def test_group_topk_plan_shape(spark, cat):
    """Grouping: the exhaustive scored collection executes EXACTLY once
    (one pandas scorer node — a branched heads aggregate would re-run
    the whole BM25 pass for its second consumer), the scored-matches
    scan keeps its pushed term filter, and the group window shuffles on
    the group key."""
    from cuvs_lucene_spark.operators.grouping import group_topk

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = group_topk(spark, cat, docs, ["data", "merge"], "lang",
                    k_groups=3, per_group=3, cfg=CFG)
    plan = _plan(df)
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert "PushedFilters" in plan and "In(" in plan.split("PushedFilters")[1][:400]
    # the group window shuffles on the group key
    assert "hashpartitioning(group_value" in plan


def test_highlight_scan_pruned_and_text_joined(spark, cat):
    """Highlight: the sidecar scan is pruned to the query terms; the
    stored-field join reads only (id, text) from the source."""
    from cuvs_lucene_spark.operators.highlight import highlight
    from cuvs_lucene_spark.operators.positions import build_positions

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    build_positions(spark, cat, docs, CFG)
    plan = _plan(highlight(spark, cat, docs, ["data", "scan"], window=3, cfg=CFG))
    pushed = plan.split("PushedFilters")[1][:400]
    assert "term" in pushed and "In(" in pushed
    # source read schema pruned to the id + text columns
    seg = plan[plan.index("documents.parquet"):][:700]
    assert "lang" not in seg.split("ReadSchema")[1][:200]


def test_match_all_never_scans_postings(spark, cat):
    from cuvs_lucene_spark.operators.bm25 import match_all_docs

    plan = _plan(match_all_docs(spark, cat, CFG))
    assert "postings" not in plan, "MatchAllDocs must read only the doc map"

"""Filtered search + deletes across EVERY ANN format, visit budgets, and
the brute-force fallback ladders.

Reference contract: acceptDocs (filters + liveDocs) apply inside every
reader's search — all formats share the filtered query path
(``CuVS2510GPUVectorsReader.java:418-434``, ``TestCuVSGaps.java:146-170``);
deleted documents are never returned by any mode (the
TestCuVSDeletedDocuments methodology); the per-leaf collector honors a
visit budget (``GPUPerLeafCuVSKnnCollector.java:26-38``)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuvs_lucene_spark.config import IndexConfig
from cuvs_lucene_spark.operators.ann import (
    ann_topk,
    ann_topk_bq,
    ann_topk_pq,
    ann_topk_sq,
    build_ann,
    build_ann_pq,
    delete_ann,
    knn_join_ivf,
    merge_ann,
)
from cuvs_lucene_spark.operators.ann_graph import ann_topk_graph, build_ann_graph

CFG = IndexConfig()
N, DIM = 600, 16


@pytest.fixture(scope="module")
def xdata():
    rng = np.random.default_rng(31)
    return rng.normal(size=(N, DIM)).astype(np.float32)


@pytest.fixture(scope="module")
def acat(spark, tmp_path_factory, xdata):
    df = spark.createDataFrame(
        [(i, xdata[i].tolist()) for i in range(N)],
        "vec_id long, embedding array<float>",
    )
    cat = build_ann(
        spark, df, str(tmp_path_factory.mktemp("annf")), CFG,
        id_col="vec_id", vector_col="embedding", rows_per_segment=150,
    )
    build_ann_graph(spark, cat, CFG)
    build_ann_pq(spark, cat, CFG)
    return cat


def _exact_ids(x, q, k, subset=None):
    idx = np.arange(x.shape[0]) if subset is None else np.asarray(sorted(subset))
    d = ((x[idx].astype(np.float64) - np.asarray(q, np.float64)) ** 2).sum(1)
    return [int(idx[i]) for i in np.lexsort((idx, d))[:k]]


def _all_modes(spark, cat, q, k, flt=None):
    """Every search mode → {mode: [ext_id, ...]}."""
    fset = None if flt is None else set(flt)
    return {
        "exact": [r["ext_id"] for r in ann_topk(
            spark, cat, q, k=k, cfg=CFG, mode="exact", filter_ext_ids=fset).collect()],
        "ivf": [r["ext_id"] for r in ann_topk(
            spark, cat, q, k=k, cfg=CFG, mode="ivf", filter_ext_ids=fset).collect()],
        "sq": [r["ext_id"] for r in ann_topk_sq(
            spark, cat, q, k=k, cfg=CFG, filter_ext_ids=fset).collect()],
        "pq": [r["ext_id"] for r in ann_topk_pq(
            spark, cat, q, k=k, cfg=CFG, filter_ext_ids=fset).collect()],
        "bq": [r["ext_id"] for r in ann_topk_bq(
            spark, cat, q, k=k, cfg=CFG, filter_ext_ids=fset).collect()],
        "graph": [r["ext_id"] for r in ann_topk_graph(
            spark, cat, q, k=k, cfg=CFG, filter_ext_ids=fset).collect()],
    }


def test_filter_applies_to_every_mode(spark, acat, xdata):
    """Pre-filter semantics on ALL formats: results ⊆ filter, and the
    exact modes return exactly the filtered true top-k."""
    q = xdata[7]
    flt = list(range(0, N, 2))  # even ids only
    res = _all_modes(spark, acat, q, 5, flt=flt)
    for mode, ids in res.items():
        assert set(ids) <= set(flt), f"{mode} leaked a filtered-out id"
        assert len(ids) == 5, f"{mode} returned {len(ids)} rows"
    assert res["exact"] == _exact_ids(xdata, q, 5, subset=flt)


def test_dataframe_filter_tier_equals_driver_set_every_mode(spark, acat, xdata):
    """The large-filter tier: a filter arriving as a DataFrame and FORCED
    through the per-segment packed-blob path (filter_mode='df' — no driver
    set anywhere) must reproduce the closure-set result on EVERY format,
    and the auto tier must pick the closure path for small filters."""
    q = xdata[7]
    flt = list(range(0, N, 2))
    fdf = spark.createDataFrame([(i,) for i in flt], "ext_id long")
    want = _all_modes(spark, acat, q, 5, flt=flt)
    got = {
        "exact": ann_topk(spark, acat, q, k=5, cfg=CFG, mode="exact",
                          filter_ext_ids=fdf, filter_mode="df"),
        "ivf": ann_topk(spark, acat, q, k=5, cfg=CFG, mode="ivf",
                        filter_ext_ids=fdf, filter_mode="df"),
        "sq": ann_topk_sq(spark, acat, q, k=5, cfg=CFG,
                          filter_ext_ids=fdf, filter_mode="df"),
        "pq": ann_topk_pq(spark, acat, q, k=5, cfg=CFG,
                          filter_ext_ids=fdf, filter_mode="df"),
        "bq": ann_topk_bq(spark, acat, q, k=5, cfg=CFG,
                          filter_ext_ids=fdf, filter_mode="df"),
        "graph": ann_topk_graph(spark, acat, q, k=5, cfg=CFG,
                                filter_ext_ids=fdf, filter_mode="df"),
    }
    for mode, df in got.items():
        ids = [r[0] for r in df.collect()]
        assert ids == want[mode], f"{mode}: blob tier diverged from driver set"
    # auto tier on a small DataFrame filter: same result (closure path)
    auto = [r["ext_id"] for r in ann_topk(
        spark, acat, q, k=5, cfg=CFG, mode="exact", filter_ext_ids=fdf).collect()]
    assert auto == want["exact"]


def test_filter_auto_escalates_to_blob_tier(spark, acat, xdata, monkeypatch):
    """Above FILTER_BROADCAST_MAX the AUTO tier must leave the driver (the
    bm25 two-tier contract on the ANN paths): drop the threshold, verify
    the blob path is taken, and the result still equals the closure tier."""
    import cuvs_lucene_spark.operators.ann as A

    flt = list(range(0, N, 2))
    q = xdata[7]
    want = [r["ext_id"] for r in ann_topk(
        spark, acat, q, k=5, cfg=CFG, mode="exact",
        filter_ext_ids=set(flt)).collect()]
    monkeypatch.setattr(A, "FILTER_BROADCAST_MAX", 10)
    used = {}
    orig = A._filter_blobs

    def spy(s, c, f):
        used["blob"] = True
        return orig(s, c, f)

    monkeypatch.setattr(A, "_filter_blobs", spy)
    fdf = spark.createDataFrame([(i,) for i in flt], "ext_id long")
    got = [r["ext_id"] for r in ann_topk(
        spark, acat, q, k=5, cfg=CFG, mode="exact",
        filter_ext_ids=fdf).collect()]
    assert used.get("blob"), "auto tier stayed on the driver above the cap"
    assert got == want


def test_knn_join_ivf_filtered(spark, acat, xdata):
    """Filtered batch inference: knn_join_ivf with a pre-filter returns
    only allowed ids, identically through the closure tier (set) and the
    blob tier (DataFrame, filter_mode='df')."""
    flt = set(range(0, N, 2))
    qdf = spark.createDataFrame(
        [(i, xdata[i].tolist()) for i in (7, 42, 301)],
        "q_id long, q_vec array<float>",
    )
    want = sorted(
        (r["q_id"], r["rank"], r["vec_id"]) for r in
        knn_join_ivf(spark, acat, qdf, k=3, filter_ext_ids=flt).collect()
    )
    assert len(want) == 9 and all(v % 2 == 0 for _, _, v in want)
    fdf = spark.createDataFrame([(i,) for i in sorted(flt)], "ext_id long")
    got = sorted(
        (r["q_id"], r["rank"], r["vec_id"]) for r in
        knn_join_ivf(spark, acat, qdf, k=3, filter_ext_ids=fdf,
                     filter_mode="df").collect()
    )
    assert got == want
    # each query's hits lie inside the exact filtered top-3k (containment)
    for qi in (7, 42, 301):
        exact = set(_exact_ids(xdata, xdata[qi], 9, subset=flt))
        hits = {v for q, _, v in want if q == qi}
        assert hits <= exact


def test_deleted_never_returned_by_any_mode(spark, acat, xdata):
    """TestCuVSDeletedDocuments analogue: tombstone the TRUE top-3 of a
    query, then no mode may return any of them — on every format."""
    q = xdata[7]
    doomed = _exact_ids(xdata, q, 3)
    assert 7 in doomed
    n = delete_ann(spark, acat, doomed)
    assert n == 3
    try:
        res = _all_modes(spark, acat, q, 5)
        for mode, ids in res.items():
            assert not (set(ids) & set(doomed)), f"{mode} returned a deleted id"
            assert len(ids) == 5
        # exact mode returns the true top-k among the survivors
        alive = [i for i in range(N) if i not in set(doomed)]
        assert res["exact"] == _exact_ids(xdata, q, 5, subset=alive)
        # kNN join honors tombstones too
        qdf = spark.createDataFrame([(0, xdata[7].tolist())], "q_id long, q_vec array<float>")
        jids = {r["vec_id"] for r in knn_join_ivf(spark, acat, qdf, k=5).collect()}
        assert not (jids & set(doomed))
    finally:
        # merge_ann consumes + clears the tombstones (M5) — restores the
        # module-scoped index for later tests, and asserts the clearing
        merge_ann(spark, acat, CFG, rows_per_segment=150)
        assert acat.table_lineage("ann_tombstones").get("n") == 0
    # physically removed: exact search never sees them again
    post = [r["ext_id"] for r in ann_topk(spark, acat, q, k=5, cfg=CFG, mode="exact").collect()]
    assert not (set(post) & set(doomed))


def test_visited_limit_degrades_never_errors(spark, acat, xdata):
    q = xdata[42]
    full = [r["ext_id"] for r in ann_topk_graph(spark, acat, q, k=5, cfg=CFG).collect()]
    assert len(full) == 5
    # a tiny per-leaf budget still returns rows (≤k) without erroring
    tiny = [r["ext_id"] for r in ann_topk_graph(
        spark, acat, q, k=5, cfg=CFG, visited_limit=4).collect()]
    assert 0 < len(tiny) <= 5
    # a generous budget reproduces the unbudgeted result
    big = [r["ext_id"] for r in ann_topk_graph(
        spark, acat, q, k=5, cfg=CFG, visited_limit=10**9).collect()]
    assert big == full


def test_graph_bf_fallback_for_graphless_segment(spark, acat, xdata):
    """A segment with no graph row (the >NN_DESCENT_THRESHOLD shape) is
    brute-forced from ann_flat — its vectors stay reachable in graph mode."""
    q = xdata[442]
    # ground truth from the engine's own exact path (reflects any deletes
    # applied by earlier tests); its top hit lives in segment 442//150 = 2
    top1 = ann_topk(spark, acat, q, k=1, cfg=CFG, mode="exact").collect()[0]["ext_id"]
    seg = int(top1) // 150
    pruned = acat.read(spark, "ann_graph").filter(F.col("segment_id") != seg)
    acat.write(pruned, "ann_graph")
    try:
        got = [r["ext_id"] for r in ann_topk_graph(spark, acat, q, k=3, cfg=CFG).collect()]
        assert got[0] == top1  # nearest lives in the graph-less segment
    finally:
        build_ann_graph(spark, acat, CFG)  # restore for other tests


def test_knn_join_ivf_bf_fallback(spark, tmp_path, xdata):
    """A segment below min_ann_index_size has no IVF lists; knn_join_ivf
    must still reach its vectors (the -2 pseudo-list branch)."""
    n = 301  # segments of 150/150/1 — the last is below min_ann_index_size
    df = spark.createDataFrame(
        [(i, xdata[i % N].tolist()) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    cat = build_ann(
        spark, df, str(tmp_path / "bf"), CFG,
        id_col="vec_id", vector_col="embedding", rows_per_segment=150,
    )
    assert cat.read_manifest()["stages"]["ann_ivf"]["bf_fallback_segments"] == [2]
    qdf = spark.createDataFrame(
        [(0, xdata[300 % N].tolist())], "q_id long, q_vec array<float>"
    )
    got = [r["vec_id"] for r in knn_join_ivf(spark, cat, qdf, k=3).collect()]
    assert 300 in got  # the fallback segment's vector is reachable


def test_visit_budget_scan_formats(spark, acat):
    """visitedLimit on the scan formats (SQ/PQ/BQ): at most `budget`
    vectors are scored per leaf — a tiny budget degrades recall but never
    errors; the contract of the reference's per-leaf collector applied
    through the shared query path to every format."""
    from cuvs_lucene_spark.operators.ann import ann_topk_bq, ann_topk_pq, ann_topk_sq

    q = [0.1] * DIM
    for fn, kw in [
        (ann_topk_sq, {}),
        (ann_topk_pq, {}),
        (ann_topk_bq, {"rerank_factor": 2}),
    ]:
        tiny = fn(spark, acat, q, k=5, cfg=CFG, visited_limit=2, **kw).collect()
        assert len(tiny) == 5  # enough segments to fill k even at budget 2
        full = fn(spark, acat, q, k=5, cfg=CFG, **kw).collect()
        assert len(full) == 5
        # with budget >= segment size the result equals the unbudgeted one
        same = fn(spark, acat, q, k=5, cfg=CFG, visited_limit=10**9, **kw).collect()
        assert [tuple(r) for r in same] == [tuple(r) for r in full]


def test_merge_ann_unions_registered_and_explicit_tombstones(spark, tmp_path):
    """merge_ann with an EXPLICIT tombstone set must still apply the
    catalog's registered deletes (liveDocs always drop at merge) — a
    previously deleted vector must not be resurrected by the rebuild."""
    from cuvs_lucene_spark.operators.ann import (
        ann_topk,
        build_ann,
        delete_ann,
        merge_ann,
    )

    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(20)], "vec_id long, embedding array<float>"
    )
    cat = build_ann(spark, df, str(tmp_path / "tb"), CFG,
                    id_col="vec_id", vector_col="embedding", rows_per_segment=10)
    delete_ann(spark, cat, [3])          # registered delete
    merge_ann(spark, cat, CFG, tombstone_ext_ids={12})  # explicit EXTRA set
    got = {r["ext_id"] for r in
           ann_topk(spark, cat, [3.0, 0.0], k=20, cfg=CFG, mode="exact").collect()}
    assert 3 not in got    # registered delete survived the merge
    assert 12 not in got   # explicit delete applied
    assert len(got) == 18  # everything else still present

"""ANN sidecar tests mirroring the reference's methodology (SURVEY.md §5):
exact path checked rank-identically vs numpy/DuckDB oracles; IVF checked
with the containment criterion (returned ids ⊆ exact top 3k,
``TestCuVSRandomizedVectorSearch.java:140-143,170``); quantization kernels
property-tested."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from cuvs_lucene_spark.config import IndexConfig, choose_build_algo, ivf_pq_params
from cuvs_lucene_spark.functions.quantize import (
    binary_quantize,
    scalar_dequantize,
    scalar_quantize,
    widen_unsigned,
)
from cuvs_lucene_spark.operators.ann import ann_topk, build_ann, exact_knn_expr

from tests.conftest import SF_DIR

CFG = IndexConfig()


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def np_vecs(vecs):
    rows = sorted(vecs.collect(), key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    x = np.array([r["embedding"] for r in rows], dtype=np.float32)
    return ids, x


@pytest.fixture(scope="module")
def acat(spark, vecs, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ann"))
    return build_ann(
        spark, vecs, root, CFG, id_col="vec_id", vector_col="embedding",
        rows_per_segment=100,
    )


def _exact_oracle(ids, x, q, k, metric="l2"):
    q = np.asarray(q, dtype=np.float32)
    if metric == "l2":
        s = 1.0 / (1.0 + ((x - q) ** 2).sum(1, dtype=np.float64))
    elif metric == "cosine":
        s = (x @ q) / (np.linalg.norm(x, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -s))[:k]
    return [(int(ids[i]), float(s[i])) for i in order]


def test_exact_l2_rank_identical(spark, acat, np_vecs):
    ids, x = np_vecs
    q = x[7]
    got = [(r["ext_id"], r["score"]) for r in ann_topk(spark, acat, q, k=10, metric="l2", cfg=CFG, mode="exact").collect()]
    exp = _exact_oracle(ids, x, q, 10, "l2")
    assert [i for i, _ in got] == [i for i, _ in exp]
    assert np.allclose([s for _, s in got], [s for _, s in exp], rtol=1e-6)
    assert got[0][0] == int(ids[7])  # self is nearest, score 1/(1+0)=1
    assert abs(got[0][1] - 1.0) < 1e-9


def test_exact_cosine(spark, acat, np_vecs):
    ids, x = np_vecs
    q = x[3]
    got = [r["ext_id"] for r in ann_topk(spark, acat, q, k=5, metric="cosine", cfg=CFG, mode="exact").collect()]
    exp = [i for i, _ in _exact_oracle(ids, x, q, 5, "cosine")]
    assert got == exp


def test_ivf_containment(spark, acat, np_vecs):
    """Reference recall criterion: IVF top-k ⊆ exact top-3k."""
    ids, x = np_vecs
    for qi in [0, 11, 42]:
        q = x[qi]
        got = [r["ext_id"] for r in ann_topk(spark, acat, q, k=5, metric="l2", cfg=CFG, mode="ivf").collect()]
        exact = {i for i, _ in _exact_oracle(ids, x, q, 15, "l2")}
        assert len(got) == 5
        assert set(got) <= exact


def test_filtered_prefilter_and_widening(spark, acat, np_vecs):
    """Filter restricts candidates BEFORE top-k (TestCuVSGaps.java:146-170:
    filter to one doc → exactly that doc returned)."""
    ids, x = np_vecs
    q = x[0]
    only = {int(ids[250])}
    got = [r["ext_id"] for r in ann_topk(spark, acat, q, k=5, cfg=CFG, mode="exact", filter_ext_ids=only).collect()]
    assert got == [int(ids[250])]
    allowed = {int(i) for i in ids if i % 3 == 0}
    got2 = [r["ext_id"] for r in ann_topk(spark, acat, q, k=10, cfg=CFG, mode="exact", filter_ext_ids=allowed).collect()]
    assert all(g in allowed for g in got2)
    mask = np.array([int(i) in allowed for i in ids])
    exp = _exact_oracle(ids[mask], x[mask], q, 10, "l2")
    assert got2 == [i for i, _ in exp]


def test_k_boundaries(spark, acat):
    assert ann_topk(spark, acat, [0.0] * 64, k=0, cfg=CFG).count() == 0
    assert ann_topk(spark, acat, [0.0] * 64, k=10_000, cfg=CFG, mode="exact").count() == 500


def test_exact_knn_expr_vs_duckdb(spark, vecs, np_vecs):
    """The pure-Catalyst brute-force path vs DuckDB list_cosine_similarity."""
    ids, x = np_vecs
    q = [float(v) for v in x[0]]
    got = [
        (r["vec_id"], round(r["score"], 6))
        for r in exact_knn_expr(vecs, q, 10).collect()
    ]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'")
    qlit = "[" + ",".join(f"{v!r}" for v in q) + "]"
    exp = con.sql(
        f"""SELECT vec_id, round(list_cosine_similarity(embedding, {qlit}::FLOAT[]), 6) AS score
            FROM embeddings ORDER BY list_cosine_similarity(embedding, {qlit}::FLOAT[]) DESC, vec_id LIMIT 10"""
    ).fetchall()
    assert [i for i, _ in got] == [i for i, _ in exp]
    assert np.allclose([s for _, s in got], [s for _, s in exp], atol=2e-6)


def test_bq_hamming_containment(spark, acat, np_vecs):
    """Binary-quantized hamming search: approximate, checked by containment
    vs exact top-3k (the reference's quantized-format criterion)."""
    from cuvs_lucene_spark.operators.ann import ann_topk_bq

    ids, x = np_vecs
    q = x[11]
    got = [r["ext_id"] for r in ann_topk_bq(spark, acat, q, k=5, cfg=CFG).collect()]
    assert len(got) == 5
    exact = {i for i, _ in _exact_oracle(ids, x, q, 50, "cosine")}
    assert len(set(got) & exact) >= 3  # coarse 1-bit codes: majority overlap


def test_bq_rerank_exact_scores(spark, acat, np_vecs):
    """BQ with rescoring (the reference's quantized formats rescore
    candidates from raw vectors): hamming-coarse pool, exact rerank —
    containment vs exact top-k and TRUE metric scores."""
    from cuvs_lucene_spark.operators.ann import ann_topk_bq

    ids, x = np_vecs
    q = x[11]
    got = [(r["ext_id"], r["score"]) for r in
           ann_topk_bq(spark, acat, q, k=5, cfg=CFG, rerank_factor=6).collect()]
    assert len(got) == 5
    x64 = x.astype(np.float64)
    d2 = ((x64 - q.astype(np.float64)) ** 2).sum(1)
    s_exact = 1.0 / (1.0 + d2)
    for i, sc in got:
        assert sc == pytest.approx(float(s_exact[np.flatnonzero(ids == i)[0]]), abs=1e-9)
    assert [s for _, s in got] == sorted((s for _, s in got), reverse=True)
    exact_top = {int(ids[j]) for j in np.argsort(-s_exact, kind="stable")[:30]}
    assert set(i for i, _ in got) <= exact_top


def test_merge_ann_equals_rebuild(spark, vecs, np_vecs, tmp_path):
    """ANN merge = rebuild from flat storage (M2), tombstones dropped (M5)."""
    from cuvs_lucene_spark.operators.ann import merge_ann

    ids, x = np_vecs
    cat = build_ann(
        spark, vecs, str(tmp_path / "annm"), CFG, id_col="vec_id",
        vector_col="embedding", rows_per_segment=100,
    )
    assert cat.read(spark, "ann_flat").count() == 5
    dead = {int(ids[3]), int(ids[250])}
    merge_ann(spark, cat, CFG, tombstone_ext_ids=dead)
    assert cat.read(spark, "ann_flat").count() == 1  # single merged segment
    q = x[7]
    got = [r["ext_id"] for r in ann_topk(spark, cat, q, k=10, cfg=CFG, mode="exact").collect()]
    mask = np.array([int(i) not in dead for i in ids])
    exp = [i for i, _ in _exact_oracle(ids[mask], x[mask], q, 10, "l2")]
    assert got == exp
    assert not (set(got) & dead)


def test_knn_join_matches_pairwise(spark, vecs, np_vecs):
    from cuvs_lucene_spark.operators.ann import knn_join

    ids, x = np_vecs
    qdf = vecs.filter(vecs.vec_id < 5).selectExpr("vec_id AS q_id", "embedding AS q_vec")
    rows = knn_join(qdf, vecs, k=3).collect()
    assert len(rows) == 15
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append((r["rank"], r["vec_id"]))
    for qi in range(5):
        got = [v for _, v in sorted(by_q[qi])]
        exp = [i for i, _ in _exact_oracle(ids, x, x[qi], 3, "cosine")]
        assert got == exp
        assert got[0] == qi  # self is its own nearest neighbor


def test_verify_integrity(spark, tmp_path):
    from cuvs_lucene_spark.config import IndexConfig
    from cuvs_lucene_spark.operators.segments import build_index, verify_integrity
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cfg = IndexConfig(rows_per_segment=100, block_size=16, term_buckets=8)
    cat = build_index(spark, docs, str(tmp_path / "iidx"), cfg, content_col="text", id_col="doc_id")
    assert verify_integrity(spark, cat, docs, "text", "doc_id").count() == 0
    # a tampered source row must surface as a violation
    tampered = docs.selectExpr("doc_id", "CASE WHEN doc_id = 7 THEN 'EVIL' ELSE text END AS text")
    bad = verify_integrity(spark, cat, tampered, "text", "doc_id").collect()
    assert len(bad) == 1 and bad[0]["ext_id"] == 7


def test_quantize_kernels():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(200, 64)).astype(np.float32)
    q, mins, maxs = scalar_quantize(x)
    assert q.dtype == np.int8 and q.min() >= -64 and q.max() <= 63
    err = np.abs(scalar_dequantize(q, mins, maxs) - x).max()
    assert err <= float((maxs - mins).max()) / 127.0  # one quantization step
    u = widen_unsigned(q)
    assert u.dtype == np.uint8 and u.min() >= 0 and u.max() <= 127
    packed, cent = binary_quantize(x)
    assert packed.shape == (200, 8)
    bits = np.unpackbits(packed, axis=1)
    assert np.array_equal(bits.astype(bool), x > cent)


def test_param_heuristics():
    """Formulas replicate CagraIndexParamsFactory (SURVEY.md O1/O2)."""
    assert choose_build_algo(4_999_999) == "NN_DESCENT"
    assert choose_build_algo(5_000_000) == "IVF_PQ"
    p = ivf_pq_params(2_000_000, 128)
    assert p["n_lists"] == 1000
    assert p["n_probes"] == round(np.sqrt(1000) / 20 + 4)
    assert p["pq_bits"] == 4 and p["pq_dim"] == 64
    p2 = ivf_pq_params(10_000, 32)
    assert p2["pq_bits"] == 8 and p2["pq_dim"] == 32
    assert 0 < p2["kmeans_trainset_fraction"] <= 1


def test_validation_rejects(spark):
    bad = spark.createDataFrame(
        [(1, [0.0] * 8), (1, [1.0] * 8)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="multiple vectors"):
        build_ann(spark, bad, "/tmp/should_not_exist_ann", CFG, id_col="vec_id", vector_col="embedding")
    ragged = spark.createDataFrame(
        [(1, [0.0] * 8), (2, [1.0] * 4)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="ragged"):
        build_ann(spark, ragged, "/tmp/should_not_exist_ann2", CFG, id_col="vec_id", vector_col="embedding")


def test_missing_derived_rows_fall_back_to_exact(spark, tmp_path, np_vecs, vecs):
    """Crash-state robustness: a segment whose SQ/PQ/BQ sidecar row is
    missing (e.g. a failure between a merge's flat append and its derived
    appends) must stay REACHABLE — the cogroup kernels fall back to the
    exact flat scan (SQ/PQ) or recompute the deterministic codes on the
    fly (BQ rerank), mirroring the graph path's bf branch."""
    from cuvs_lucene_spark.operators.ann import (
        ann_topk_bq,
        ann_topk_pq,
        ann_topk_sq,
        build_ann_pq,
    )

    ids, x = np_vecs
    cat = build_ann(
        spark, vecs, str(tmp_path / "crash"), CFG, id_col="vec_id",
        vector_col="embedding", rows_per_segment=100,
    )
    build_ann_pq(spark, cat, CFG)
    q = x[7]
    # ground truth: segment of the true top hit
    top1 = int(ann_topk(spark, cat, q, k=1, cfg=CFG, mode="exact").collect()[0]["ext_id"])
    seg = top1 // 100
    for table in ("ann_sq", "ann_pq", "ann_bq"):
        pruned = cat.read(spark, table).filter(F.col("segment_id") != seg)
        cat.write(pruned, table)
    got_sq = [r["ext_id"] for r in ann_topk_sq(spark, cat, q, k=3, cfg=CFG).collect()]
    got_pq = [r["ext_id"] for r in ann_topk_pq(spark, cat, q, k=3, cfg=CFG).collect()]
    got_bq = [r["ext_id"] for r in ann_topk_bq(
        spark, cat, q, k=3, cfg=CFG, rerank_factor=4).collect()]
    assert got_sq[0] == top1
    assert got_pq[0] == top1
    assert top1 in got_bq  # hamming-coarse, rerank exact

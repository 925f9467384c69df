"""Hybrid BM25 ∪ kNN retrieval with Reciprocal Rank Fusion.

The reference serves text and vector queries from ONE index with a shared
doc id space (``GPUKnnFloatVectorQuery.java`` is a Lucene Query run by the
same searcher as the host's term queries); ``hybrid_rrf_topk`` fuses the
two ranked lists with RRF (Cormack et al., SIGIR'09). These tests pin the
fusion math, the absent-from-one-list semantics, the deterministic
tie-break, and end-to-end parity with a numpy re-implementation over real
text + ANN indexes."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuvs_lucene_spark.config import IndexConfig
from cuvs_lucene_spark.functions.tokenize import tokenize_py
from cuvs_lucene_spark.operators.ann import build_ann
from cuvs_lucene_spark.operators.hybrid import hybrid_rrf_topk, rrf_fuse
from cuvs_lucene_spark.operators.segments import build_index

CFG = IndexConfig(rows_per_segment=40, block_size=16)
N, DIM = 120, 8

WORDS = ["alpha", "beta", "gamma", "delta", "join", "vector", "spark", "index"]


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(77)
    texts = [
        " ".join(rng.choice(WORDS, size=rng.integers(5, 30)))
        for _ in range(N)
    ]
    vecs = rng.normal(size=(N, DIM)).astype(np.float32)
    return texts, vecs


@pytest.fixture(scope="module")
def cats(spark, tmp_path_factory, corpus):
    texts, vecs = corpus
    docs = spark.createDataFrame(
        [(i, texts[i]) for i in range(N)], "doc_id long, text string"
    )
    tcat = build_index(
        spark, docs, str(tmp_path_factory.mktemp("hyb_text")), CFG,
        content_col="text", id_col="doc_id",
    )
    embs = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(N)],
        "vec_id long, embedding array<float>",
    )
    acat = build_ann(
        spark, embs, str(tmp_path_factory.mktemp("hyb_ann")), CFG,
        id_col="vec_id", vector_col="embedding", rows_per_segment=40,
    )
    return tcat, acat


def test_rrf_fuse_math(spark):
    """Hand-checkable fusion: doc 1 in both lists, docs 2/3 in one each."""
    a = spark.createDataFrame([(1, 1), (2, 2)], "ext_id long, r_a int")
    b = spark.createDataFrame([(1, 2), (3, 1)], "ext_id long, r_b int")
    out = {r["ext_id"]: r for r in rrf_fuse([a, b], k=10).collect()}
    assert out[1]["rrf"] == round(1 / 61 + 1 / 62, 6)
    assert out[2]["rrf"] == round(1 / 62, 6)
    assert out[3]["rrf"] == round(1 / 61, 6)
    # absent list → rank reported as 0
    assert out[2]["r_b"] == 0 and out[3]["r_a"] == 0
    # both-lists doc outranks single-list docs; 1/61 ties broken by id
    rows = rrf_fuse([a, b], k=10).collect()
    assert [r["ext_id"] for r in rows][0] == 1


def test_rrf_fuse_k_and_tiebreak(spark):
    """Equal-rrf docs order by ext_id asc; k truncates after fusion."""
    a = spark.createDataFrame([(5, 1), (3, 2)], "ext_id long, r_a int")
    b = spark.createDataFrame([(9, 1), (7, 2)], "ext_id long, r_b int")
    rows = rrf_fuse([a, b], k=3).collect()
    assert [r["ext_id"] for r in rows] == [5, 9, 3]  # 1/61: 5<9; then 1/62: 3<7
    assert len(rows) == 3


def _numpy_hybrid(texts, vecs, terms, qvec, depth, k, allowed=None):
    """Independent reference: exact BM25 + exact L2, RRF in pure python."""
    toks = tokenize_py(__import__("pandas").Series(texts))
    dls = np.array([len(t) for t in toks])
    n, avgdl = len(texts), dls.mean()
    ids = np.arange(n)
    mask = np.ones(n, bool) if allowed is None else np.isin(ids, allowed)
    # bm25
    scores = np.zeros(n)
    hit = np.zeros(n, bool)
    for term in dict.fromkeys(terms):
        tf = np.array([t.count(term) for t in toks])
        df = int((tf > 0).sum())
        if df == 0:
            continue
        idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))
        s = idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dls / avgdl))
        scores += np.where(tf > 0, s, 0.0)
        hit |= tf > 0
    cand = ids[hit & mask]
    order = sorted(cand, key=lambda i: (-round(scores[i], 6), i))[:depth]
    trank = {i: r + 1 for r, i in enumerate(order)}
    # knn (1/(1+d^2) monotone in d)
    d2 = ((vecs - np.asarray(qvec, np.float32)) ** 2).sum(axis=1)
    vorder = sorted(ids[mask], key=lambda i: (round(d2[i], 12), i))[:depth]
    vrank = {i: r + 1 for r, i in enumerate(vorder)}
    fused = {}
    for i in set(trank) | set(vrank):
        fused[i] = (1 / (60 + trank[i]) if i in trank else 0.0) + (
            1 / (60 + vrank[i]) if i in vrank else 0.0
        )
    top = sorted(fused, key=lambda i: (-round(fused[i], 6), i))[:k]
    return [(i, round(fused[i], 6)) for i in top]


def test_hybrid_end_to_end_matches_numpy(spark, cats, corpus):
    texts, vecs = corpus
    tcat, acat = cats
    qvec = vecs[3]
    got = hybrid_rrf_topk(
        spark, tcat, acat, ["join", "vector"], qvec, k=10, depth=20,
        cfg=CFG,
    ).collect()
    want = _numpy_hybrid(texts, vecs, ["join", "vector"], qvec, 20, 10)
    assert [(r["ext_id"], r["rrf"]) for r in got] == want
    # returned ranks are consistent with the fused score
    for r in got:
        rr = (1 / (60 + r["bm25_rank"]) if r["bm25_rank"] else 0) + (
            1 / (60 + r["ann_rank"]) if r["ann_rank"] else 0
        )
        assert abs(rr - r["rrf"]) < 1e-6


def test_hybrid_filtered_applies_to_both_lists(spark, cats, corpus):
    texts, vecs = corpus
    tcat, acat = cats
    qvec = vecs[3]
    allowed = np.arange(0, N, 3)
    flt = spark.createDataFrame([(int(i),) for i in allowed], "ext_id long")
    got = hybrid_rrf_topk(
        spark, tcat, acat, ["join", "vector"], qvec, k=10, depth=20,
        cfg=CFG, filter_ext_ids=flt,
    ).collect()
    assert got and all(r["ext_id"] % 3 == 0 for r in got)
    want = _numpy_hybrid(
        texts, vecs, ["join", "vector"], qvec, 20, 10, allowed=allowed
    )
    assert [(r["ext_id"], r["rrf"]) for r in got] == want

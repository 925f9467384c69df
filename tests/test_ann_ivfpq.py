"""Combined IVF-PQ lists — the reference's namesake GPU structure
(CagraIndexParamsFactory derives nLists/nProbes and pqDim/pqBits as one
unit; cuVS IVF_PQ stores pq codes per inverted list): probed compressed
lists + exact refinement from flat storage."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuvs_lucene_spark.config import IndexConfig
from cuvs_lucene_spark.operators.ann import (
    ann_topk,
    ann_topk_ivfpq,
    build_ann,
    build_ann_ivfpq,
    delete_ann,
    merge_ann,
)

CFG = IndexConfig()
N, DIM = 600, 16


@pytest.fixture(scope="module")
def xdata():
    rng = np.random.default_rng(13)
    return rng.normal(size=(N, DIM)).astype(np.float32)


@pytest.fixture(scope="module")
def cat(spark, tmp_path_factory, xdata):
    df = spark.createDataFrame(
        [(i, xdata[i].tolist()) for i in range(N)],
        "vec_id long, embedding array<float>",
    )
    c = build_ann(
        spark, df, str(tmp_path_factory.mktemp("ivfpq")), CFG,
        id_col="vec_id", vector_col="embedding", rows_per_segment=150,
    )
    build_ann_ivfpq(spark, c, CFG)
    return c


def _exact_ids(x, q, k, subset=None):
    idx = np.arange(x.shape[0]) if subset is None else np.asarray(sorted(subset))
    d = ((x[idx].astype(np.float64) - np.asarray(q, np.float64)) ** 2).sum(1)
    return [int(idx[i]) for i in np.lexsort((idx, d))[:k]]


def test_ivfpq_containment_and_exact_scores(spark, cat, xdata):
    q = xdata[7]
    rows = ann_topk_ivfpq(spark, cat, q, k=5, cfg=CFG, nprobe=2).collect()
    assert len(rows) == 5
    exact30 = set(_exact_ids(xdata, q, 30))
    got = [r["ext_id"] for r in rows]
    assert set(got) <= exact30  # containment (reference criterion)
    # returned scores are EXACT 1/(1+d²), not ADC approximations
    for r in rows:
        d2 = float(((xdata[r["ext_id"]].astype(np.float64) - q.astype(np.float64)) ** 2).sum())
        assert r["score"] == pytest.approx(1.0 / (1.0 + d2), abs=1e-9)
    # deterministic
    again = [r["ext_id"] for r in ann_topk_ivfpq(spark, cat, q, k=5, cfg=CFG, nprobe=2).collect()]
    assert again == got


def test_ivfpq_filtered_and_budget(spark, cat, xdata):
    flt = set(range(0, N, 2))
    got = [r["ext_id"] for r in ann_topk_ivfpq(
        spark, cat, xdata[7], k=5, cfg=CFG, filter_ext_ids=flt).collect()]
    assert len(got) == 5 and all(i % 2 == 0 for i in got)
    # DataFrame blob tier agrees with the closure tier
    fdf = spark.createDataFrame([(i,) for i in sorted(flt)], "ext_id long")
    blob = [r["ext_id"] for r in ann_topk_ivfpq(
        spark, cat, xdata[7], k=5, cfg=CFG,
        filter_ext_ids=fdf, filter_mode="df").collect()]
    assert blob == got
    # visit budget degrades, never errors
    tiny = ann_topk_ivfpq(spark, cat, xdata[7], k=5, cfg=CFG, visited_limit=3).collect()
    assert 0 < len(tiny) <= 5
    assert ann_topk_ivfpq(spark, cat, xdata[7], k=0, cfg=CFG).count() == 0


def test_ivfpq_bf_fallback_and_merge_follow(spark, tmp_path, xdata):
    """A sub-min-size segment stays reachable (B2 ladder), and a group-wise
    merge_ann rebuilds the ivfpq lists for the merged segments."""
    n = 301  # 150/150/1 — last segment below min_ann_index_size
    df = spark.createDataFrame(
        [(i, xdata[i % N].tolist()) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    cat = build_ann(
        spark, df, str(tmp_path / "bf"), CFG,
        id_col="vec_id", vector_col="embedding", rows_per_segment=150,
    )
    build_ann_ivfpq(spark, cat, CFG)
    q = xdata[300 % N]
    got = [r["ext_id"] for r in ann_topk_ivfpq(spark, cat, q, k=3, cfg=CFG).collect()]
    assert 300 in got or (300 % N) in got  # the bf segment's vector reachable
    # delete + group-wise merge of the first two segments; ivfpq follows
    delete_ann(spark, cat, [3], CFG)
    merge_ann(spark, cat, CFG, groups=[[0, 1]], rows_per_segment=150)
    pq_lists = cat.read(spark, "ann_ivfpq").select("segment_id").distinct()
    segs = {int(r["segment_id"]) for r in pq_lists.collect()}
    assert 0 not in segs and 1 not in segs  # merged-away lists dropped
    assert any(s >= (1 << 42) for s in segs)  # new-generation lists present
    got2 = [r["ext_id"] for r in ann_topk_ivfpq(spark, cat, q, k=5, cfg=CFG).collect()]
    assert len(got2) == 5 and 3 not in got2
    # exact path agrees on the survivors
    exact = [r["ext_id"] for r in ann_topk(
        spark, cat, q, k=20, cfg=CFG, mode="exact").collect()]
    assert set(got2) <= set(exact)

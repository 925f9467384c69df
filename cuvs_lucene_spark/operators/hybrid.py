"""Hybrid fulltext + vector retrieval (BM25 ∪ kNN with rank fusion).

The reference's whole point is serving BOTH retrieval modes from one
index: ``GPUKnnFloatVectorQuery`` is a ``org.apache.lucene.search.Query``
(GPUKnnFloatVectorQuery.java:21-58) answered by the SAME ``IndexSearcher``
that answers the host's text queries (e.g. TestCuVSDeletedDocuments.java
runs term deletes and vector queries over one index; the doc id space is
shared). The canonical way applications combine the two result lists is
Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR'09):

    rrf(d) = Σ_lists 1 / (k_rrf + rank_list(d)),   k_rrf = 60

RRF needs only ranks — it is score-scale-free, which is exactly why it is
the standard fusion for BM25 (unbounded log-scale) × cosine ([-1, 1]).

Spark shape (100 TB reading): each retriever is already a distributed
top-``depth`` (pruned postings scan / pruned ANN scan with per-segment
partial heaps); fusion touches only the two ≤depth-row results — a
broadcast full-outer join, no extra scan, no shuffle that grows with
corpus size. Ranks are assigned over 6-dp-rounded scores with (score
desc, id asc) tie-break so engine and oracle rank identically.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import IndexConfig
from .ann import ann_topk
from .bm25 import bm25_topk

RRF_K = 60  # Cormack et al.'s constant; also Elasticsearch/OpenSearch default
ROUND = 6


def _ranked(df: DataFrame, rank_name: str) -> DataFrame:
    """(ext_id, score) → (ext_id, rank) with the frozen deterministic
    ordering: 6-dp-rounded score desc, ext_id asc. The input is already a
    top-``depth`` result (≤ depth rows), so the single-partition window is
    O(depth), independent of corpus size."""
    w = Window.orderBy(F.desc(F.round("score", ROUND)), F.asc("ext_id"))
    return df.select("ext_id", F.row_number().over(w).alias(rank_name))


def rrf_fuse(
    ranked: list[DataFrame],
    k: int = 10,
    k_rrf: int = RRF_K,
) -> DataFrame:
    """Fuse ranked lists [(ext_id, <rank_col>), ...] → top-k by RRF.

    Absent-from-a-list contributes 0 (the SIGIR'09 formulation); the
    returned rank columns report 0 for "not retrieved by this list".
    Output: (ext_id, rrf, <rank cols...>), rrf desc / ext_id asc, k rows.
    """
    fused = ranked[0]
    for nxt in ranked[1:]:
        fused = fused.join(nxt, on="ext_id", how="full_outer")
    rank_cols = [c for c in fused.columns if c != "ext_id"]
    contrib = [
        F.coalesce(1.0 / (F.lit(float(k_rrf)) + F.col(c)), F.lit(0.0))
        for c in rank_cols
    ]
    rrf = contrib[0]
    for c in contrib[1:]:
        rrf = rrf + c
    return (
        fused.select(
            "ext_id",
            F.round(rrf, ROUND).alias("rrf"),
            *[F.coalesce(F.col(c), F.lit(0)).cast("int").alias(c) for c in rank_cols],
        )
        .orderBy(F.desc("rrf"), F.asc("ext_id"))
        .limit(k)
    )


def hybrid_rrf_topk(
    spark: SparkSession,
    text_cat,
    ann_cat,
    query_terms: list[str],
    query_vec: list[float] | np.ndarray,
    k: int = 10,
    depth: int = 50,
    k_rrf: int = RRF_K,
    metric: str = "l2",
    ann_mode: str = "exact",
    mode: str = "or",
    cfg: IndexConfig | None = None,
    filter_ext_ids=None,
) -> DataFrame:
    """Hybrid top-k: BM25 over the text index ∪ kNN over the ANN sidecar,
    RRF-fused on the shared doc id (the reference's one-index-two-queries
    model, GPUKnnFloatVectorQuery.java + host text queries).

    ``depth`` is the per-retriever candidate depth (Lucene's rewritten
    kNN ``k``); ``ann_mode='exact'`` keeps the vector list deterministic
    for oracle comparison, ``'auto'``/``'ivf'`` trade recall for speed.
    ``filter_ext_ids`` applies the SAME pre-filter to both retrievers
    (acceptDocs semantics — filtered hybrid search).

    → DataFrame(ext_id, rrf, bm25_rank, ann_rank), rrf desc, k rows.
    """
    cfg = cfg or IndexConfig()
    t = bm25_topk(
        spark, text_cat, query_terms, k=depth, mode=mode, cfg=cfg,
        filter_ext_ids=filter_ext_ids,
    )
    v = ann_topk(
        spark, ann_cat, query_vec, k=depth, metric=metric, mode=ann_mode,
        cfg=cfg, filter_ext_ids=filter_ext_ids,
    )
    return rrf_fuse(
        [_ranked(t, "bm25_rank"), _ranked(v, "ann_rank")], k=k, k_rrf=k_rrf
    )

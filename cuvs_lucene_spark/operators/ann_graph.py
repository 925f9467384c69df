"""Graph-based ANN sidecar — the CAGRA→HNSW conversion analogue (B12,
the reference's single biggest component:
``AcceleratedHNSWUtils.createMultiLayerHnswGraph``
``/root/reference — src/main/java/com/nvidia/cuvs/lucene/AcceleratedHNSWUtils.java:81-171``).

Spark-first restatement:

- **Build** (per segment, from the committed flat storage — merge/build
  never read query-side structures, M4): an exact kNN graph of degree G
  over the segment's vectors. The reference builds the adjacency on the
  GPU (CAGRA) and converts to Lucene HNSW; a dense exact kNN graph is the
  CPU-exact equivalent at per-segment scale (the O1 heuristic's
  NN_DESCENT/IVF_PQ switch is where an approximate graph builder slots in
  for 5M+-row segments).
- **Serialization**: per node, neighbor ids **sorted → deduped →
  delta-encoded → varint**, with a cumulative byte-offset directory —
  exactly the graph compression recipe of
  ``AcceleratedHNSWUtils.writeGraph:239-289`` + ``writeMeta:350-366``
  (DirectMonotonicWriter offsets), the same codec this engine uses for
  posting lists (B14/B15).
- **Search** (per leaf, S1): greedy best-first beam over the graph with
  an ``ef ≥ k`` frontier (the iTopK ≥ topK widening, O5,
  ``GPUPerLeafCuVSKnnCollector.java:28``). The multi-layer entry descent
  (reference samples 1/M nodes per upper layer,
  ``createMultiLayerHnswGraph:101-117``) is mirrored by a deterministic
  √n-stride entry sweep: scan the stride subset exactly like a coarse
  layer, start the beam at its argmin. Scores normalize ``1/(1+d)`` (S5).

Approximate → validated by containment against the exact top-3k
(``TestCuVSRandomizedVectorSearch.java:140-143``) plus a fixed-seed golden
set (``TestCagraToHnswSerializationAndSearch.java:125-145`` methodology).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuvs_lucene_spark.config import IndexConfig, choose_build_algo
from cuvs_lucene_spark.functions.varint import varint_decode, varint_encode
from cuvs_lucene_spark.sources.catalog import IndexCatalog

GRAPH_SCHEMA = (
    "segment_id long, n_nodes int, degree int, offsets binary, graph binary"
)
TOPK_SCHEMA = "segment_id long, ext_id long, score double"


def _knn_graph(x: np.ndarray, degree: int) -> list[np.ndarray]:
    """Exact kNN adjacency (neighbors of each node, self excluded),
    blocked so the distance matrix never exceeds ~64MB."""
    n = x.shape[0]
    g = min(degree, n - 1)
    x64 = x.astype(np.float64)
    sq = (x64**2).sum(1)
    out: list[np.ndarray] = []
    block = max(1, int(8_000_000 // max(n, 1)))
    for lo in range(0, n, block):
        hi = min(lo + block, n)
        d = sq[lo:hi, None] - 2.0 * (x64[lo:hi] @ x64.T) + sq[None, :]
        d[np.arange(lo, hi) - lo, np.arange(lo, hi)] = np.inf  # no self edge
        nbr = np.argpartition(d, g - 1, axis=1)[:, :g]
        out.extend(np.sort(nbr[i]).astype(np.int64) for i in range(hi - lo))
    return out


def _graph_rows(flat_df, cfg: IndexConfig, degree: int | None = None):
    """Per-segment graph rows from flat blobs (shared by the batch build
    and the streaming epoch append)."""
    deg = degree or cfg.ann.graph_degree

    def build(it):
        for pdf in it:
            for r in pdf.itertuples():
                x = np.frombuffer(r.vectors, np.float32).reshape(r.n_vecs, r.dim)
                n = x.shape[0]
                # O1 size-based algorithm switch (CagraIndexParamsFactory
                # heuristic): below the threshold the dense exact kNN graph
                # is the NN_DESCENT stand-in; at/above it the reference
                # routes the build through IVF_PQ — served here by the
                # ann_ivf/ann_pq sidecars, so oversized segments simply
                # skip the graph (search falls back per-leaf)
                if choose_build_algo(n) != "NN_DESCENT":
                    continue
                if n < 2:
                    # single-node graph (B13 single-vector fallback)
                    yield pd.DataFrame(
                        {
                            "segment_id": [r.segment_id],
                            "n_nodes": [np.int32(n)],
                            "degree": [np.int32(0)],
                            "offsets": [np.zeros(n + 1, "<u8").tobytes()],
                            "graph": [b""],
                        }
                    )
                    continue
                nbrs = _knn_graph(x, deg)
                blobs = []
                for ns in nbrs:
                    deltas = np.empty(ns.size, np.int64)
                    deltas[0] = ns[0]
                    np.subtract(ns[1:], ns[:-1], out=deltas[1:])
                    blobs.append(varint_encode(deltas))
                offs = np.zeros(len(blobs) + 1, "<u8")
                offs[1:] = np.cumsum([len(b) for b in blobs])
                yield pd.DataFrame(
                    {
                        "segment_id": [r.segment_id],
                        "n_nodes": [np.int32(n)],
                        "degree": [np.int32(min(deg, n - 1))],
                        "offsets": [offs.tobytes()],
                        "graph": [b"".join(blobs)],
                    }
                )

    return flat_df.mapInPandas(build, GRAPH_SCHEMA)


def build_ann_graph(
    spark: SparkSession,
    cat: IndexCatalog,
    cfg: IndexConfig | None = None,
    degree: int | None = None,
) -> None:
    """Build the per-segment graph sidecar from ``ann_flat``.

    Blob layout per segment: ``offsets`` = little-endian uint64 cumulative
    byte offsets (n_nodes + 1 entries — the monotonic offset directory),
    ``graph`` = concatenated per-node varint blocks, each node's sorted
    neighbor ids delta-encoded (first value absolute)."""
    cfg = cfg or IndexConfig()
    cat.write(_graph_rows(cat.read(spark, "ann_flat"), cfg, degree), "ann_graph")
    cat.mark_stage("ann_graph")


def _greedy_search(
    x: np.ndarray,
    q: np.ndarray,
    offsets: np.ndarray,
    graph: bytes,
    k: int,
    ef: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Best-first beam over one segment's graph → (node ids, squared L2)."""
    import heapq

    n = x.shape[0]
    x64 = x.astype(np.float64)
    q64 = q.astype(np.float64)

    def dist(nodes: np.ndarray) -> np.ndarray:
        diff = x64[nodes] - q64[None, :]
        return (diff * diff).sum(1)

    # coarse-layer analogue: deterministic sqrt-stride entry sweep
    stride = max(1, int(n / max(np.sqrt(n), 1.0)))
    entry_nodes = np.arange(0, n, stride, dtype=np.int64)
    ed = dist(entry_nodes)
    entry = int(entry_nodes[ed.argmin()])

    visited = np.zeros(n, dtype=bool)
    visited[entry] = True
    d0 = float(dist(np.array([entry]))[0])
    cand: list[tuple[float, int]] = [(d0, entry)]  # min-heap by distance
    best: list[tuple[float, int]] = [(-d0, entry)]  # max-heap (neg) of top-ef
    while cand:
        d, node = heapq.heappop(cand)
        if len(best) >= ef and d > -best[0][0]:
            break  # closest frontier node is worse than the ef-th best
        lo, hi = int(offsets[node]), int(offsets[node + 1])
        if hi <= lo:
            continue
        nbr = np.cumsum(varint_decode(graph[lo:hi]), dtype=np.int64)
        nbr = nbr[~visited[nbr]]
        if nbr.size == 0:
            continue
        visited[nbr] = True
        nd = dist(nbr)
        for dd, nn in zip(nd, nbr):
            if len(best) < ef or dd < -best[0][0]:
                heapq.heappush(cand, (float(dd), int(nn)))
                heapq.heappush(best, (-float(dd), int(nn)))
                if len(best) > ef:
                    heapq.heappop(best)
    out = sorted(((-nd, node) for nd, node in best))[:k]
    return (
        np.array([node for _, node in out], dtype=np.int64),
        np.array([d for d, _ in out], dtype=np.float64),
    )


def ann_topk_graph(
    spark: SparkSession,
    cat: IndexCatalog,
    query: list[float] | np.ndarray,
    k: int = 10,
    cfg: IndexConfig | None = None,
    ef: int | None = None,
) -> DataFrame:
    """Graph top-k (L2): per-segment greedy beam → global top-k.
    ``ef`` defaults to ``max(k + overfetch, 64)`` (iTopK ≥ topK, O5)."""
    cfg = cfg or IndexConfig()
    from cuvs_lucene_spark.operators.ann import _validate_metric

    _validate_metric(cat, "l2")
    q = np.asarray(query, dtype=np.float32)
    if k <= 0:
        return spark.createDataFrame([], "ext_id long, score double")
    eff = ef or max(k + cfg.overfetch, 64)

    def scan(key, gp: pd.DataFrame, fp: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"segment_id": [], "ext_id": [], "score": []}).astype(
            {"segment_id": "int64", "ext_id": "int64", "score": "float64"}
        )
        if gp.empty or fp.empty:
            return empty
        g = gp.iloc[0]
        fr = fp.iloc[0]
        n = int(g["n_nodes"])
        if n == 0:
            return empty
        x = np.frombuffer(fr["vectors"], np.float32).reshape(n, -1)
        ids = np.frombuffer(fr["ext_ids"], np.int64)
        if n == 1:
            d = float(((x[0].astype(np.float64) - q.astype(np.float64)) ** 2).sum())
            return pd.DataFrame(
                {"segment_id": [int(g["segment_id"])], "ext_id": [int(ids[0])],
                 "score": [1.0 / (1.0 + d)]}
            )
        offsets = np.frombuffer(g["offsets"], "<u8")
        nodes, d2 = _greedy_search(x, q, offsets, bytes(g["graph"]), k, eff)
        return pd.DataFrame(
            {
                "segment_id": int(g["segment_id"]),
                "ext_id": ids[nodes],
                "score": 1.0 / (1.0 + d2),  # S5 normalization
            }
        )

    partials = (
        cat.read(spark, "ann_graph")
        .groupby("segment_id")
        .cogroup(cat.read(spark, "ann_flat").groupby("segment_id"))
        .applyInPandas(scan, TOPK_SCHEMA)
    )
    return (
        partials.orderBy(F.desc("score"), F.asc("ext_id"))
        .limit(k)
        .select("ext_id", "score")
    )

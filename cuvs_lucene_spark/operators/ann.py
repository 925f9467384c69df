"""ANN sidecar index — the reference codec's own role re-expressed
Spark-first (SURVEY.md Layer B: §2.2 B2-B5/B9-B11, §2.4 S1-S6).

Per-segment build via ``groupBy(segment).applyInPandas`` mirrors the flush
path (``CuVS2510GPUVectorsWriter.writeFieldInternal:181-234``): the whole
segment's vectors become one dense numpy matrix (the
``Utils.createFloatMatrix:56-72`` analogue), from which we emit

- ``ann_flat``  — raw float32 row-major matrix + ext_id map (flat vector
  storage, the delegated ``FlatVectorsFormat`` I3; source of truth for
  merge-as-rebuild)
- ``ann_sq``    — per-segment scalar-quantized codes + min/max stats (B10)
- ``ann_ivf``   — IVF lists (deterministic Lloyd k-means) with parameters
  from the reference's heuristic formulas
  (``CagraIndexParamsFactory.java:31-93,149-178`` — O1/O2); segments with
  fewer than ``min_ann_index_size`` vectors fall back to brute force, the
  B2 CAGRA→BF degradation ladder

Search (S1-S6): per-segment scorer → global top-k. Routing mirrors S1:
``k > max_k_ann`` or no IVF index → brute force. L2 scores are normalized
``1/(1 + dist)`` exactly as ``getScoreNormalizationFunc:390-393`` (dist =
squared L2, cuVS L2Expanded). Filters are PRE-semantics with top-k widened
to ``min(k + 10, |mask|)`` (``CuVS2510GPUVectorsReader.java:418-434``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuvs_lucene_spark.config import (
    AnnParams,
    IndexConfig,
    ivf_pq_params,
    shuffle_partitions,
)
from cuvs_lucene_spark.functions.quantize import scalar_dequantize, scalar_quantize, widen_unsigned
from cuvs_lucene_spark.sources.catalog import IndexCatalog

ANN_FORMAT_VERSION = 3  # v2: centroid rows carry n_total; bf-fallback list in
                        # manifest. v3: thin ann_ids map (DataFrame filter tier);
                        # pre-v3 indexes self-heal the map on first large filter

FLAT_SCHEMA = "segment_id long, n_vecs int, dim int, ext_ids binary, vectors binary"
PQ_SCHEMA = (
    "segment_id long, n_vecs int, dim int, pq_dim int, pq_bits int, "
    "codebook binary, codes binary"
)
SQ_SCHEMA = "segment_id long, n_vecs int, dim int, mins binary, maxs binary, codes binary"
BQ_SCHEMA = "segment_id long, n_vecs int, dim int, centroid binary, codes binary"
IVF_SCHEMA = (
    "segment_id long, list_id int, n int, ext_ids binary, vectors binary"
)
CENTROIDS_SCHEMA = "segment_id long, n_lists int, dim int, centroids binary"
TOPK_SCHEMA = "segment_id long, ext_id long, score double"


def _unit_rows(x: np.ndarray) -> np.ndarray:
    """Row-normalize to unit L2 (float64 math, float32 out). Zero rows
    pass through unchanged."""
    n = np.linalg.norm(x.astype(np.float64), axis=1, keepdims=True)
    n[n == 0] = 1.0
    return (x / n).astype(np.float32)


def _nav_vectors(x: np.ndarray, metric: str) -> np.ndarray:
    """Vectors in NAVIGATION space: the derived structures (SQ/IVF/PQ/graph)
    of a COSINE index are built over unit-normalized vectors, so their L2
    geometry ranks identically to cosine (d² = 2 - 2·cos on unit vectors) —
    the same normalize-then-L2 treatment Lucene applies for
    VectorSimilarityFunction.COSINE. L2 indexes pass through raw. The flat
    storage always keeps RAW vectors (source of truth for merge-as-rebuild),
    and cosine itself is scale-invariant, so exact rerank from flat is
    metric-correct either way."""
    return _unit_rows(x) if metric == "cosine" else x


def _nav_query(q: np.ndarray, metric: str) -> np.ndarray:
    """Query vector in navigation space (see :func:`_nav_vectors`)."""
    if metric != "cosine":
        return q
    n = float(np.linalg.norm(q.astype(np.float64)))
    return q if n == 0 else (q / n).astype(q.dtype)


def _kmeans(x: np.ndarray, n_lists: int, iters: int, seed: int, trainset_fraction: float) -> np.ndarray:
    """Deterministic Lloyd k-means (the IVF coarse quantizer)."""
    rng = np.random.default_rng(seed)
    n = x.shape[0]
    n_train = max(n_lists, int(n * trainset_fraction))
    train = x[rng.choice(n, size=min(n, n_train), replace=False)]
    cents = train[rng.choice(train.shape[0], size=n_lists, replace=False)].copy()
    for _ in range(iters):
        d = ((train[:, None, :] - cents[None, :, :]) ** 2).sum(-1) if train.shape[0] * n_lists * x.shape[1] < 5e7 else None
        if d is None:
            # blocked distance computation for larger trainsets
            d = -2.0 * train @ cents.T
            d += (cents**2).sum(1)[None, :]
        assign = d.argmin(1)
        for c in range(n_lists):
            m = assign == c
            if m.any():
                cents[c] = train[m].mean(0)
    return cents


def _sq_rows(flat_df: DataFrame, metric: str = "l2") -> DataFrame:
    """Per-segment scalar-quantized codes (B10) from flat blobs (codes are
    in navigation space — unit-normalized for cosine indexes)."""

    def build_sq(it):
        for pdf in it:
            for r in pdf.itertuples():
                x = np.frombuffer(r.vectors, np.float32).reshape(r.n_vecs, r.dim)
                q, mins, maxs = scalar_quantize(_nav_vectors(x, metric))
                yield pd.DataFrame(
                    {
                        "segment_id": [r.segment_id],
                        "n_vecs": [r.n_vecs],
                        "dim": [r.dim],
                        "mins": [mins.astype(np.float32).tobytes()],
                        "maxs": [maxs.astype(np.float32).tobytes()],
                        "codes": [q.tobytes()],
                    }
                )

    return flat_df.mapInPandas(build_sq, SQ_SCHEMA)


def _bq_rows(flat_df: DataFrame, metric: str = "l2") -> DataFrame:
    """Per-segment binary-quantized codes (B9): mean-centroid sign bits
    packed 8/byte — the LuceneAcceleratedHNSWBinaryQuantized analogue.
    Cosine indexes quantize in navigation space (unit-normalized — the
    Lucene normalize-before-quantize COSINE treatment), so the hamming
    order tracks angular structure, not raw magnitudes."""

    def build_bq(it):
        from cuvs_lucene_spark.functions.quantize import binary_quantize

        for pdf in it:
            for r in pdf.itertuples():
                x = np.frombuffer(r.vectors, np.float32).reshape(r.n_vecs, r.dim)
                packed, centroid = binary_quantize(_nav_vectors(x, metric))
                yield pd.DataFrame(
                    {
                        "segment_id": [r.segment_id],
                        "n_vecs": [r.n_vecs],
                        "dim": [r.dim],
                        # float64 so query-side bits reproduce build-side bits
                        "centroid": [centroid.astype(np.float64).tobytes()],
                        "codes": [packed.tobytes()],
                    }
                )

    return flat_df.mapInPandas(build_bq, BQ_SCHEMA)


def _ivf_rows(flat_df: DataFrame, ann: AnnParams, metric: str = "l2") -> DataFrame:
    """Per-segment IVF lists (deterministic k-means, O2 parameter
    heuristics); segments below min_ann_index_size emit nothing (B2).
    For cosine indexes, k-means and list ASSIGNMENT run in unit space
    (spherical k-means; centroids are probed against the normalized
    query), but the lists store the RAW vectors — cosine scoring is
    scale-invariant, so stored-copy scores stay bit-equal to flat."""
    seed = ann.seed
    kmeans_iters = ann.kmeans_iters
    min_sz = ann.min_ann_index_size

    def build_ivf(it):
        for pdf in it:
            for r in pdf.itertuples():
                x = np.frombuffer(r.vectors, np.float32).reshape(r.n_vecs, r.dim)
                xn = _nav_vectors(x, metric)
                ids = np.frombuffer(r.ext_ids, np.int64)
                n = x.shape[0]
                if n < min_sz:
                    continue  # B2 fallback: brute force only for tiny segments
                p = ivf_pq_params(n, x.shape[1])
                n_lists = min(p["n_lists"], n)
                cents = _kmeans(xn, n_lists, kmeans_iters, seed, p["kmeans_trainset_fraction"])
                d = -2.0 * xn @ cents.T + (cents**2).sum(1)[None, :]
                assign = d.argmin(1)
                rows = []
                for c in range(n_lists):
                    m = np.flatnonzero(assign == c)
                    if m.size == 0:
                        continue
                    rows.append(
                        (
                            r.segment_id, c, m.size,
                            ids[m].tobytes(), x[m].tobytes(),
                        )
                    )
                yield pd.DataFrame(
                    rows, columns=["segment_id", "list_id", "n", "ext_ids", "vectors"]
                )
                # centroid row: list_id = -1; ext_ids carries the segment's
                # total vector count (int64) so the query-side probe can
                # resolve n_probes without scanning the list rows
                yield pd.DataFrame(
                    {
                        "segment_id": [r.segment_id],
                        "list_id": [-1],
                        "n": [n_lists],
                        "ext_ids": [np.asarray([n], np.int64).tobytes()],
                        "vectors": [cents.astype(np.float32).tobytes()],
                    }
                )

    return flat_df.mapInPandas(build_ivf, IVF_SCHEMA)


def build_flat_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (segment_id, ext_id, vector) group → one packed flat-storage row
    (the Utils.createFloatMatrix dense-matrix analogue) — shared by the
    batch build and the group-wise ANN merge."""
    pdf = pdf.sort_values("ext_id")
    x = np.stack(pdf["vector"].to_numpy()).astype(np.float32)
    return pd.DataFrame(
        {
            "segment_id": [int(pdf["segment_id"].iloc[0])],
            "n_vecs": [np.int32(x.shape[0])],
            "dim": [np.int32(x.shape[1])],
            "ext_ids": [pdf["ext_id"].to_numpy(np.int64).tobytes()],
            "vectors": [x.tobytes()],
        }
    )


def validate_vectors(df: DataFrame, vector_col: str, id_col: str, ann: AnnParams) -> None:
    """I1/I2 analogues: reject >max_dims and duplicate vectors per doc."""
    row = df.select(
        F.max(F.size(vector_col)).alias("maxd"),
        F.min(F.size(vector_col)).alias("mind"),
        (F.count("*") - F.countDistinct(id_col)).alias("dups"),
    ).collect()[0]
    if row["maxd"] is not None and row["maxd"] > ann.max_dims:
        raise ValueError(f"vector dim {row['maxd']} exceeds max {ann.max_dims}")
    if row["maxd"] != row["mind"]:
        raise ValueError("ragged vector dimensions")
    if row["dups"]:
        raise ValueError("multiple vectors per doc id (GPUFieldWriter.addValue guard)")


def build_ann(
    spark: SparkSession,
    vectors: DataFrame,
    index_root: str,
    cfg: IndexConfig | None = None,
    id_col: str = "ext_id",
    vector_col: str = "vector",
    rows_per_segment: int | None = None,
) -> IndexCatalog:
    """Build the ANN sidecar tables from (id, array<float>) rows."""
    cfg = cfg or IndexConfig()
    ann = cfg.ann
    if ann.metric == "dot":
        # MIP has no normalize-to-L2 reduction; derived structures (IVF/SQ/
        # PQ/graph) would rank wrong-metric. Exact scans (ann_topk
        # mode="exact", knn_join, exact_knn_expr) support dot directly.
        raise ValueError(
            "metric 'dot' is supported on exact scans only; build the "
            "index with 'l2' or 'cosine'"
        )
    cat = IndexCatalog(index_root)
    validate_vectors(vectors, vector_col, id_col, ann)
    rps = rows_per_segment or cfg.rows_per_segment
    cat.set_config(
        {
            "ann_metric": ann.metric,
            "ann_format": ANN_FORMAT_VERSION,
            "rows_per_segment": rps,
            # merge-pressure knobs are INDEX state (delete_ann reads them
            # from here, not from the deleting caller's cfg)
            "delete_merge_fraction": ann.delete_merge_fraction,
            "delete_merge_max_count": ann.delete_merge_max_count,
        }
    )
    base = vectors.select(
        F.col(id_col).cast("long").alias("ext_id"),
        F.col(vector_col).alias("vector"),
    ).withColumn("segment_id", (F.col("ext_id") / F.lit(rps)).cast("long"))

    flat = base.groupBy("segment_id").applyInPandas(build_flat_pdf, FLAT_SCHEMA)
    cat.write(flat, "ann_flat")
    cat.mark_stage("ann_flat")

    # derived stages read the committed flat blobs (merge reads flat only, M4)
    flat_df = cat.read(spark, "ann_flat")

    # the four remaining tables are mutually independent (ids derives
    # from the input, sq/bq/ivf from the committed flat) — write them
    # from a small driver thread pool so their Spark jobs overlap
    # (guide §2.6): the build commit pays the SLOWEST write instead of
    # the sum of four. Manifest commits serialize under the catalog's
    # lock; each thread writes a distinct table.
    def _w_ids():
        # thin row-level (segment_id, ext_id) map — the DataFrame-filter
        # tier's join target (and the merge policy's id→segment resolver)
        cat.write(
            base.select("segment_id", "ext_id"),
            "ann_ids",
            sort_within_partitions=["segment_id", "ext_id"],
        )
        cat.mark_stage("ann_ids")

    def _w_sq():
        cat.write(_sq_rows(flat_df, ann.metric), "ann_sq")
        cat.mark_stage("ann_sq")

    def _w_bq():
        cat.write(_bq_rows(flat_df, ann.metric), "ann_bq")
        cat.mark_stage("ann_bq")

    def _w_ivf():
        cat.write(
            _ivf_rows(flat_df, ann, ann.metric),
            "ann_ivf",
            sort_within_partitions=["segment_id", "list_id"],
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        for f in [pool.submit(fn) for fn in (_w_ids, _w_sq, _w_bq, _w_ivf)]:
            f.result()
    # segments below min_ann_index_size emit no IVF rows; record them so the
    # IVF search path can brute-force exactly those (B2 per-leaf fallback)
    # without re-deriving the set per query
    ivf_segs = {
        r["segment_id"]
        for r in cat.read(spark, "ann_ivf")
        .filter(F.col("list_id") == -1)
        .select("segment_id")
        .collect()
    }
    flat_segs = {
        r["segment_id"] for r in flat_df.select("segment_id").collect()
    }
    cat.mark_stage(
        "ann_ivf",
        bf_fallback_segments=sorted(int(s) for s in flat_segs - ivf_segs),
        n_ivf_segments=len(ivf_segs),
    )
    cat.mark_stage("ann_build")
    return cat


# ---------------------------------------------------------------------------
# Search
# ---------------------------------------------------------------------------


def _sorted_ids(ids) -> np.ndarray | None:
    """Normalize a filter id collection to a sorted int64 array (or None)."""
    if ids is None:
        return None
    if isinstance(ids, np.ndarray):
        return np.sort(ids.astype(np.int64))
    return np.array(sorted(int(i) for i in ids), dtype=np.int64)


FILTER_BROADCAST_MAX = 200_000  # DataFrame filters above this resolve to
                                # per-segment packed blobs, never a driver set


def _derived_in_sync(cat: IndexCatalog, table: str) -> bool:
    """Manifest-level (zero-job) consistency check of a derived ANN table
    against ``ann_flat``: every append tag the flat table carries must be
    covered by the derived table's own appends (merge generations and
    streaming epochs commit BOTH sides under ONE shared tag) or by a
    recorded ``covers_tags`` heal marker. A crash between merge_ann's
    per-table appends leaves the derived table missing the new tag — this
    detects that staleness from metadata alone, so the healthy path pays
    nothing and a crashed state is healed (ann_ids) or routed through the
    exact-from-flat fallback (bq/ivfpq) instead of silently dropping the
    new segments' vectors."""
    m = cat.read_manifest()
    fe = m["tables"].get("ann_flat", {})
    de = m["tables"].get(table, {})
    if not de or de.get("snapshot") is None:
        return False
    flat_tags = set(fe.get("append_tags", {}))
    covered = set(de.get("append_tags", {})) | set(de.get("covers_tags", []))
    return not (flat_tags - covered)


def _covered_tags(cat: IndexCatalog, table: str) -> set:
    """Append tags a table's committed state covers (its own appends plus
    any recorded ``covers_tags`` heal/rebuild marker)."""
    de = cat.read_manifest()["tables"].get(table, {})
    return set(de.get("append_tags", {})) | set(de.get("covers_tags", []))


def _ann_ids(spark: SparkSession, cat: IndexCatalog) -> DataFrame:
    """Thin (segment_id, ext_id) map of the ANN sidecar — the row-level
    ord→doc table (S6) that lets a DataFrame filter resolve to per-segment
    masks with one equi-join (the role doc_map plays for the bm25 filter
    tier). Written at build; lazily derived + committed once for pre-v4
    indexes (commit-point readers derive without persisting).

    STALENESS guard: a crash between merge_ann's ann_flat append and its
    ann_ids append would otherwise leave the map permanently missing the
    merged segments — and the blob-tier inner join would silently exclude
    every merged vector from filtered queries. ``_derived_in_sync``
    detects the gap from the manifest's append tags (no Spark job) and
    re-derives + rewrites the whole map once, recording ``covers_tags`` so
    the heal is itself a consistent commit."""
    if cat.exists("ann_ids") and _derived_in_sync(cat, "ann_ids"):
        return cat.read(spark, "ann_ids")

    def explode(it):
        for pdf in it:
            for r in pdf.itertuples():
                yield pd.DataFrame(
                    {
                        "segment_id": int(r.segment_id),
                        "ext_id": np.frombuffer(r.ext_ids, np.int64),
                    }
                )

    ids = (
        cat.read(spark, "ann_flat")
        .select("segment_id", "ext_ids")
        .mapInPandas(explode, "segment_id long, ext_id long")
    )
    flat_tags = sorted(
        cat.read_manifest()["tables"].get("ann_flat", {}).get("append_tags", {})
    )
    try:
        cat.write(
            ids, "ann_ids", sort_within_partitions=["segment_id", "ext_id"],
            extra_entry={"covers_tags": flat_tags},
        )
        return cat.read(spark, "ann_ids")
    except PermissionError:  # pinned commit-point reader: derive per query
        return ids


def _filter_blobs(spark: SparkSession, cat: IndexCatalog, fdf: DataFrame) -> DataFrame:
    """Per-segment packed allowed-set blobs (sorted int64 ext_ids) resolved
    EXECUTOR-side from the ann_ids map — the bm25 large-filter tier
    (bm25._aux_df) applied to the ANN paths. Matches the reference's
    acceptDocs contract: the filter bits derive from the index per leaf,
    they are never shipped from the caller
    (``GPUKnnFloatVectorQuery.java:43-51``). Segments with no allowed id
    produce no blob row, so an inner join prunes them from the scan."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "segment_id": [int(pdf["segment_id"].iloc[0])],
                "allowed": [np.sort(pdf["ext_id"].to_numpy(np.int64)).tobytes()],
            }
        )

    return (
        _ann_ids(spark, cat)
        .join(fdf, "ext_id", "left_semi")
        .groupBy("segment_id")
        .applyInPandas(pack, "segment_id long, allowed binary")
    )


def _resolve_filter(
    spark: SparkSession,
    cat: IndexCatalog,
    filter_ext_ids,
    filter_mode: str = "auto",
) -> tuple[np.ndarray | None, DataFrame | None]:
    """Two-tier filter resolution shared by every ANN search path →
    (sorted driver-side array | None, per-segment blob DataFrame | None).

    Small sets/arrays keep the closure fast path; a DataFrame filter stays
    a DataFrame above ``FILTER_BROADCAST_MAX`` ids (``filter_mode``:
    ``auto`` probes the size with one limit(N+1) collect, ``broadcast`` /
    ``df`` force a tier)."""
    if filter_ext_ids is None:
        return None, None
    if not isinstance(filter_ext_ids, DataFrame):
        return _sorted_ids(filter_ext_ids), None
    fdf = filter_ext_ids.select(
        F.col(filter_ext_ids.columns[0]).cast("long").alias("ext_id")
    )
    if filter_mode == "df":
        return None, _filter_blobs(spark, cat, fdf)
    if filter_mode == "broadcast":
        # forced closure tier: the caller vouches the set fits the driver
        head = fdf.collect()
        return np.sort(np.array([r[0] for r in head], dtype=np.int64)), None
    head = fdf.limit(FILTER_BROADCAST_MAX + 1).collect()
    if len(head) > FILTER_BROADCAST_MAX:
        return None, _filter_blobs(spark, cat, fdf)
    return np.sort(np.array([r[0] for r in head], dtype=np.int64)), None


def _blob_allowed(frame: pd.DataFrame, row) -> np.ndarray | None:
    """Per-segment allowed ids from the joined blob column (if the blob
    tier is active for this query), else None."""
    if "allowed" not in frame.columns:
        return None
    blob = row["allowed"] if isinstance(row, pd.Series) else row.allowed
    return None if blob is None else np.frombuffer(blob, np.int64)


def _member_mask(ids: np.ndarray, sorted_set: np.ndarray) -> np.ndarray:
    """Bool membership of ``ids`` in a sorted set (searchsorted, no hashing)."""
    if sorted_set.size == 0:
        return np.zeros(ids.size, dtype=bool)
    pos = np.minimum(np.searchsorted(sorted_set, ids), sorted_set.size - 1)
    return sorted_set[pos] == ids


def _accept_mask(
    ids: np.ndarray,
    allowed: np.ndarray | None,
    tomb: np.ndarray | None,
) -> np.ndarray | None:
    """acceptDocs analogue: bool mask over ``ids`` combining the query
    pre-filter and the tombstone set; None when everything is accepted
    (``CuVS2510GPUVectorsReader.java:418-434`` applies acceptDocs inside
    EVERY reader's search — all formats, not just the exact path)."""
    m = None
    if allowed is not None:
        m = _member_mask(ids, allowed)
    if tomb is not None and tomb.size:
        t = ~_member_mask(ids, tomb)
        m = t if m is None else (m & t)
    return m


def _blob_tomb(frame: pd.DataFrame, row) -> np.ndarray | None:
    """Per-segment tombstone ids from the joined ``tomb`` blob column (if
    the blob tombstone tier is active), else None."""
    if "tomb" not in frame.columns:
        return None
    blob = row["tomb"] if isinstance(row, pd.Series) else row.tomb
    return None if blob is None else np.frombuffer(blob, np.int64)


def _row_accept(frame: pd.DataFrame, row, ids: np.ndarray,
                allowed: np.ndarray | None, tomb: np.ndarray | None):
    """acceptDocs for one segment row under BOTH two-tier transports:
    closure arrays when small, per-segment packed blobs (``allowed`` /
    ``tomb`` columns joined onto the scan) when large."""
    return _accept_mask(
        ids,
        allowed if allowed is not None else _blob_allowed(frame, row),
        tomb if tomb is not None else _blob_tomb(frame, row),
    )


def _attach_aux(df: DataFrame, fblobs: DataFrame | None,
                tblobs: DataFrame | None) -> DataFrame:
    """Ride the per-segment aux blobs on a segment-keyed scan: the filter
    blob INNER-joins (a segment with no allowed id is pruned entirely);
    the tombstone blob LEFT-joins (a segment with no tombstones must still
    be scanned in full)."""
    if fblobs is not None:
        df = df.join(fblobs, "segment_id")
    if tblobs is not None:
        df = df.join(tblobs, "segment_id", "left")
    return df


def delete_ann(
    spark: SparkSession,
    cat: IndexCatalog,
    ext_ids,
    cfg: IndexConfig | None = None,
    auto_merge: bool = True,
) -> int:
    """Tombstone vectors by ext_id — the liveDocs analogue for the ANN
    sidecar. Deleted ids are excluded by EVERY search mode at query time
    (exact, IVF, SQ, PQ, BQ, graph, kNN join) and physically removed at the
    next :func:`merge_ann` (M5). Returns the live tombstone count; the
    count rides the manifest so the no-deletes path costs zero jobs.

    ``ext_ids`` accepts a set / sequence of ids (small deletes) or a
    DataFrame of ids (parity with ``delete_docs``): a DataFrame delete is
    registered with ONE distributed union+distinct — no driver-side id
    array anywhere, the mass-delete shape for 10⁹-row retention sweeps.

    Envelope policy: once the tombstone count exceeds
    ``cfg.ann.delete_merge_fraction`` of the indexed vectors OR the
    absolute ``delete_merge_max_count`` (a fraction is not a size — at
    10¹¹ vectors a fraction alone would let the tombstone set grow
    unboundedly in bytes), a GROUP-WISE :func:`merge_ann` of only the
    AFFECTED segments fires automatically (resolved via the thin
    ``ann_ids`` map), physically dropping the deleted rows and clearing
    their tombstones — so the query-time tombstone set is provably
    bounded (Lucene's deletesPctAllowed merge pressure, applied
    per-segment). Both thresholds read from the catalog's PERSISTED
    config first (merge pressure is index state, not caller state),
    falling back to the passed cfg."""
    cfg = cfg or IndexConfig()
    if isinstance(ext_ids, DataFrame):
        # delete_docs parity: a named ext_id column is required unless the
        # frame is single-column — columns[0] of a (segment_id, ext_id)
        # slice would silently tombstone segment ids as ext ids
        if "ext_id" in ext_ids.columns:
            id_col = "ext_id"
        elif len(ext_ids.columns) == 1:
            id_col = ext_ids.columns[0]
        else:
            raise ValueError(
                "delete_ann: DataFrame input must have an 'ext_id' column "
                f"(or exactly one column); got {ext_ids.columns}"
            )
        new = ext_ids.select(
            F.col(id_col).cast("long").alias("ext_id")
        ).distinct()
    else:
        new = spark.createDataFrame([(int(i),) for i in set(ext_ids)], "ext_id long")
    if cat.exists("ann_tombstones"):
        new = cat.read(spark, "ann_tombstones").unionByName(new).distinct()
    new = new.cache()
    n = new.count()
    cat.write(new, "ann_tombstones", lineage={"n": n})
    new.unpersist()
    if auto_merge and n:
        pcfg = cat.read_manifest().get("config", {})
        frac = float(
            pcfg.get("delete_merge_fraction", cfg.ann.delete_merge_fraction)
        )
        max_n = int(
            pcfg.get("delete_merge_max_count", cfg.ann.delete_merge_max_count)
        )
        total = cat.read(spark, "ann_flat").agg(
            F.sum("n_vecs").alias("t")
        ).collect()[0]["t"] or 0
        if total and (n > frac * total or n >= max_n):
            affected = sorted(
                int(r["segment_id"])
                for r in _ann_ids(spark, cat)
                .join(cat.read(spark, "ann_tombstones"), "ext_id", "left_semi")
                .select("segment_id").distinct().collect()
            )
            if affected:
                fanin = cfg.merge_fanin
                groups = [
                    affected[i : i + fanin] for i in range(0, len(affected), fanin)
                ]
                # segment layout is INDEX state: rebuild at the catalog's
                # persisted rows_per_segment, never the caller cfg's default
                # (a bare delete must not restructure the index)
                idx_rps = cat.read_manifest().get("config", {}).get(
                    "rows_per_segment"
                ) or cfg.rows_per_segment
                merge_ann(
                    spark, cat, cfg, groups=groups, rows_per_segment=idx_rps
                )
                n = int(cat.table_lineage("ann_tombstones").get("n", 0))
    return n


def _tombstone_array(spark: SparkSession, cat: IndexCatalog) -> np.ndarray | None:
    """Sorted tombstoned ext_ids (None when empty), memoized per manifest
    version — the CLOSURE tier, used only when the registered count is at
    most ``FILTER_BROADCAST_MAX`` (``_resolve_tombstones`` routes bigger
    sets through per-segment blobs; this array never grows with them)."""
    if not cat.exists("ann_tombstones"):
        return None
    if cat.table_lineage("ann_tombstones").get("n") == 0:
        return None
    m = cat.read_manifest()
    ver = max((e.get("committed_at", 0) for e in m["tables"].values()), default=0)
    memo = getattr(cat, "_ann_tomb_memo", None)
    if memo is not None and memo["ver"] == ver:
        return memo["arr"]
    arr = np.array(
        sorted(r["ext_id"] for r in cat.read(spark, "ann_tombstones").collect()),
        dtype=np.int64,
    )
    arr = arr if arr.size else None
    cat._ann_tomb_memo = {"ver": ver, "arr": arr}
    return arr


def _tombstone_blobs(spark: SparkSession, cat: IndexCatalog) -> DataFrame:
    """Per-segment packed tombstone blobs (sorted int64), resolved
    EXECUTOR-side through the thin ``ann_ids`` map — the same large-set
    transport as ``_filter_blobs``, mirroring the per-segment liveDocs
    model (``TestCuVSDeletedDocuments.java:83``: deletes are leaf-local
    bits, never a global driver array). Segments with no tombstoned id
    produce no row; callers LEFT-join so untombed segments still scan."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "segment_id": [int(pdf["segment_id"].iloc[0])],
                "tomb": [np.sort(pdf["ext_id"].to_numpy(np.int64)).tobytes()],
            }
        )

    return (
        _ann_ids(spark, cat)
        .join(cat.read(spark, "ann_tombstones"), "ext_id", "left_semi")
        .groupBy("segment_id")
        .applyInPandas(pack, "segment_id long, tomb binary")
    )


def _resolve_tombstones(
    spark: SparkSession, cat: IndexCatalog
) -> tuple[np.ndarray | None, DataFrame | None]:
    """Two-tier tombstone resolution shared by every ANN search path →
    (sorted closure array | None, per-segment blob DataFrame | None).
    The tier switch reads the count from the manifest lineage (no job):
    at most ``FILTER_BROADCAST_MAX`` registered deletes keep the memoized
    closure array; above it the set stays a DataFrame end-to-end."""
    if not cat.exists("ann_tombstones"):
        return None, None
    n = cat.table_lineage("ann_tombstones").get("n")
    if n == 0:
        return None, None
    if n is not None and n > FILTER_BROADCAST_MAX:
        return None, _tombstone_blobs(spark, cat)
    return _tombstone_array(spark, cat), None


# back-compat alias (closure tier only) for external callers/tests
_ann_tombstones = _tombstone_array


def _scores(x: np.ndarray, q: np.ndarray, metric: str) -> np.ndarray:
    # float64 throughout: float32 inputs, double math — bit-compatible with
    # the DuckDB oracle's DOUBLE[] arithmetic (scores rounded to 6 dp on
    # both sides for comparison).
    x64 = x.astype(np.float64)
    q64 = q.astype(np.float64)
    if metric == "l2":
        d = ((x64 - q64[None, :]) ** 2).sum(1)  # L2Expanded = squared L2
        return 1.0 / (1.0 + d)  # reference normalization (S5)
    if metric == "cosine":
        num = x64 @ q64
        den = np.linalg.norm(x64, axis=1) * np.linalg.norm(q64)
        den[den == 0] = 1.0
        return num / den
    if metric == "dot":
        return x64 @ q64
    raise ValueError(metric)


def ann_topk(
    spark: SparkSession,
    cat: IndexCatalog,
    query: list[float] | np.ndarray,
    k: int = 10,
    metric: str = "l2",
    cfg: IndexConfig | None = None,
    mode: str = "auto",
    nprobe: int | None = None,
    filter_ext_ids=None,
    probe_mode: str = "auto",
    filter_mode: str = "auto",
) -> DataFrame:
    """Top-k nearest vectors → DataFrame(ext_id, score), score desc.

    ``filter_ext_ids`` accepts a set / array (closure fast path) or a
    DataFrame of ids — large DataFrame filters resolve to per-segment
    packed blobs executor-side (``_resolve_filter``), never a driver set.

    ``mode``: ``exact`` (brute force, S4), ``ivf`` (coarse probe, S3), or
    ``auto`` (S1 routing: IVF when available and k ≤ max_k_ann).

    IVF probing is two small jobs, not one full-table pass: (1) scan ONLY
    the centroid rows (``list_id = -1`` — pushed to the parquet scan, the
    blob column of list rows is never read) and rank lists per segment;
    (2) scan ``ann_ivf`` restricted to the probed (segment_id, list_id)
    pairs, scoring each selected list row independently (no shuffle).
    Segments too small to have an IVF index (B2 fallback) are brute-forced
    from ``ann_flat`` via the build-time ``bf_fallback_segments`` manifest
    list and unioned in — every vector is reachable in every mode, like
    the reference's per-leaf routing.

    ``probe_mode`` picks where step (1) ranks lists:

    - ``driver`` — centroid rows are collected ONCE (memoized per manifest
      version) into a flat numpy pack; per query the ranking is ONE
      vectorized pass over the concatenated centroid matrix (no Python
      loop over segments), and the probed pairs reach the list scan as a
      pushed ``list_id IN`` filter + broadcast semi-join. Latency-optimal;
      driver memory ∝ total centroids.
    - ``distributed`` — the ranking runs inside a ``mapInPandas`` over the
      pruned centroid scan and the pairs join the list rows as a
      left-semi (AQE picks broadcast vs shuffled hash by pair count). NO
      driver-side state grows with segment count — the 10⁶-segment path.
    - ``auto`` — ``driver`` while the build-time segment count is at most
      ``PROBE_DRIVER_MAX_SEGMENTS``, else ``distributed``.
    """
    cfg = cfg or IndexConfig()
    ann = cfg.ann
    q = np.asarray(query, dtype=np.float32)
    qn = _nav_query(q, metric)  # navigation-space query (unit for cosine)
    if k <= 0:
        return spark.createDataFrame([], "ext_id long, score double")  # S9
    use_ivf = mode == "ivf" or (mode == "auto" and k <= ann.max_k_ann and cat.exists("ann_ivf"))
    if mode == "exact":
        use_ivf = False
    if use_ivf:
        # similarity-function mismatch guard for derived structures
        # (CuVS2510GPUVectorsReader.java:247-255): IVF lists are clustered
        # under the build metric; probing them under another is an error.
        # Exact mode scores raw flat vectors, which support any metric.
        _validate_metric(cat, metric)
    eff_k = k
    allowed, fblobs = _resolve_filter(spark, cat, filter_ext_ids, filter_mode)
    tomb, tblobs = _resolve_tombstones(spark, cat)
    if allowed is not None:
        eff_k = min(k + cfg.overfetch, allowed.size)  # S2 widening
    elif fblobs is not None:
        eff_k = k + cfg.overfetch  # blob tier: widen without a global count

    def _apply_filter(frame, row, ids: np.ndarray, s: np.ndarray):
        m = _row_accept(frame, row, ids, allowed, tomb)
        if m is None:
            return ids, s
        return ids[m], s[m]

    def scan(it):
        # brute-force per-segment scan over the flat storage (S4)
        for pdf in it:
            for r in pdf.itertuples():
                x = np.frombuffer(r.vectors, np.float32).reshape(r.n_vecs, r.dim)
                ids = np.frombuffer(r.ext_ids, np.int64)
                ids, s = _apply_filter(pdf, r, ids, _scores(x, q, metric))
                if ids.size == 0:
                    continue
                top = np.argsort(-s, kind="stable")[:eff_k]
                yield pd.DataFrame(
                    {"segment_id": r.segment_id, "ext_id": ids[top], "score": s[top]}
                )

    if use_ivf and not cat.exists("ann_ivf"):
        use_ivf = False
    if use_ivf:
        dim = q.size
        sel = _probe_select(
            spark, cat,
            cat.read(spark, "ann_ivf").filter(F.col("list_id") >= 0),
            qn, nprobe, probe_mode,
        )
        if sel is not None and not _derived_in_sync(cat, "ann_ivf"):
            # stale ann_ivf (crash between merge appends) may still carry
            # the merged-AWAY segments' lists — anchoring on live flat
            # segments prevents those from emitting duplicate results
            # (the cogrouped formats are flat-anchored by construction)
            sel = sel.join(
                cat.read(spark, "ann_flat").select("segment_id"),
                "segment_id", "left_semi",
            )
        if sel is None:
            use_ivf = False
    if use_ivf and sel is not None:

        def score_lists(it):
            for pdf in it:
                for r in pdf.itertuples():
                    x = np.frombuffer(r.vectors, np.float32).reshape(r.n, dim)
                    ids = np.frombuffer(r.ext_ids, np.int64)
                    ids, s = _apply_filter(pdf, r, ids, _scores(x, q, metric))
                    if ids.size == 0:
                        continue
                    top = np.argsort(-s, kind="stable")[:eff_k]
                    yield pd.DataFrame(
                        {"segment_id": r.segment_id, "ext_id": ids[top], "score": s[top]}
                    )

        # blob tiers ride the list rows (filter inner-joins — segments with
        # zero allowed ids are pruned before scoring; tombstones left-join)
        sel = _attach_aux(sel, fblobs, tblobs)
        partials = sel.mapInPandas(score_lists, TOPK_SCHEMA)
        # B2 degradation ladder: segments with no IVF index are brute-forced
        bf_segs = cat.read_manifest()["stages"].get("ann_ivf", {}).get(
            "bf_fallback_segments"
        )
        if not _derived_in_sync(cat, "ann_ivf"):
            # a crash between the flat append and the ann_ivf append (or
            # its stage recompute) leaves the manifest list stale — fall
            # through to the anti-join derivation so the new segments'
            # vectors stay reachable (same contract as bq/ivfpq healing)
            bf_segs = None
        flat = _attach_aux(cat.read(spark, "ann_flat"), fblobs, tblobs)
        if bf_segs is None:
            # pre-v2 index without the manifest list: derive it with an anti-join
            ivf_seg_df = (
                cat.read(spark, "ann_ivf")
                .filter(F.col("list_id") == -1)
                .select("segment_id")
            )
            missing = flat.join(ivf_seg_df, "segment_id", "left_anti")
            partials = partials.unionByName(missing.mapInPandas(scan, TOPK_SCHEMA))
        elif bf_segs:
            missing = flat.filter(F.col("segment_id").isin(list(bf_segs)))
            partials = partials.unionByName(missing.mapInPandas(scan, TOPK_SCHEMA))
    else:
        flat = _attach_aux(cat.read(spark, "ann_flat"), fblobs, tblobs)
        partials = flat.mapInPandas(scan, TOPK_SCHEMA)

    return (
        partials.orderBy(F.desc("score"), F.asc("ext_id"))
        .limit(k)
        .select("ext_id", "score")
    )


PROBE_DRIVER_MAX_SEGMENTS = 4096  # above this, probe ranking leaves the driver


def _probe_select(
    spark: SparkSession,
    cat: IndexCatalog,
    scan_df: DataFrame,
    qn: np.ndarray,
    nprobe: int | None = None,
    probe_mode: str = "auto",
) -> DataFrame | None:
    """Restrict ``scan_df`` (rows keyed by (segment_id, list_id) — raw IVF
    lists or IVF-PQ code lists) to the single-query probe's chosen lists.
    Probe ranking follows ``probe_mode`` (see :func:`ann_topk`): ``driver``
    ranks one memoized centroid pack vectorized; ``distributed`` ranks in
    a ``mapInPandas`` beside the pruned ``list_id = -1`` centroid scan
    (zero driver state ∝ segment count); ``auto`` switches on
    ``PROBE_DRIVER_MAX_SEGMENTS``. Returns None when no segment has an
    IVF index (caller falls back to brute force)."""
    dim = int(qn.size)
    if probe_mode not in ("auto", "driver", "distributed", "shuffle"):
        raise ValueError(f"unknown probe_mode {probe_mode!r}")
    n_segs = cat.read_manifest()["stages"].get("ann_ivf", {}).get(
        "n_ivf_segments"
    )
    # single-query search has no query side to fragment — 'shuffle' (the
    # knn_join_ivf tier) degrades to the distributed probe here, which
    # already holds zero driver state ∝ segment count; silently treating
    # it as 'driver' would be the exact memory profile the caller opted
    # out of
    distributed = probe_mode in ("distributed", "shuffle") or (
        probe_mode == "auto"
        and n_segs is not None
        and n_segs > PROBE_DRIVER_MAX_SEGMENTS
    )
    if distributed:
        fixed_npb = nprobe

        def probe(it):
            for pdf in it:
                for r in pdf.itertuples():
                    n_lists = int(r.n)
                    cents = np.frombuffer(r.vectors, np.float32).reshape(n_lists, dim)
                    raw = r.ext_ids
                    n_total = (
                        int(np.frombuffer(raw, np.int64)[0])
                        if raw else n_lists * 2000
                    )
                    npb = fixed_npb or max(
                        1, min(n_lists, ivf_pq_params(n_total, dim)["n_probes"])
                    )
                    cd = (
                        (cents.astype(np.float64) - qn.astype(np.float64)[None, :]) ** 2
                    ).sum(1)
                    take = np.argsort(cd, kind="stable")[:npb]
                    yield pd.DataFrame(
                        {"segment_id": r.segment_id,
                         "list_id": take.astype(np.int32)}
                    )

        pairs_df = (
            cat.read(spark, "ann_ivf")
            .filter(F.col("list_id") == -1)
            .select("segment_id", "n", "ext_ids", "vectors")
            .mapInPandas(probe, "segment_id long, list_id int")
        )
        return scan_df.join(pairs_df, ["segment_id", "list_id"], "left_semi")
    # centroid pack collected once (memoized); ranking is ONE vectorized
    # pass over the concatenated centroid matrix — no per-segment Python
    # loop on the query path
    pack = _centroid_pack(spark, cat)
    if pack is None:
        return None
    cd = ((pack["C"].astype(np.float64) - qn.astype(np.float64)[None, :]) ** 2).sum(1)
    npb_row = (
        np.minimum(pack["n_lists_row"], int(nprobe))
        if nprobe else pack["npb_row"]
    )
    o = np.lexsort((cd, pack["seg_row"]))
    seg_s = pack["seg_row"][o]
    starts = np.r_[0, np.flatnonzero(seg_s[1:] != seg_s[:-1]) + 1]
    counts = np.diff(np.r_[starts, seg_s.size])
    grp = np.repeat(np.arange(starts.size), counts)
    rank = np.arange(seg_s.size) - starts[grp]
    keep = rank < npb_row[o]
    segs_keep = seg_s[keep]
    lists_keep = pack["lst_row"][o][keep]
    probe_lists = sorted(set(int(x) for x in lists_keep))
    pairs_df = spark.createDataFrame(
        list(zip(segs_keep.tolist(), lists_keep.tolist())),
        "segment_id long, list_id int",
    )
    # pushed list_id IN (...) prunes row groups at the scan; the broadcast
    # semi-join restricts to the exact pairs
    return scan_df.filter(F.col("list_id").isin(probe_lists)).join(
        F.broadcast(pairs_df), ["segment_id", "list_id"], "left_semi"
    )


def _centroid_pack(spark: SparkSession, cat: IndexCatalog) -> dict | None:
    """Flat numpy pack of every segment's centroids for the vectorized
    driver-side probe: C (ΣL, dim) float32, row-aligned seg_row / lst_row /
    n_lists_row / npb_row (default n_probes per the reference heuristic).
    Memoized per manifest version. None when no segment has an IVF index."""
    m = cat.read_manifest()
    ver = max((e.get("committed_at", 0) for e in m["tables"].values()), default=0)
    memo = getattr(cat, "_centroid_pack_memo", None)
    if memo is not None and memo["ver"] == ver:
        return memo["pack"]
    # collect WITHOUT the _centroid_rows memo: the pack copies the blobs
    # into its own contiguous matrix, so also retaining the raw Row list
    # would double the driver's centroid residency (the driver-mode
    # memory budget is 'one pack ∝ total centroids', not two)
    rows = (
        cat.read(spark, "ann_ivf")
        .filter(F.col("list_id") == -1)
        .select("segment_id", "n", "ext_ids", "vectors")
        .collect()
    )
    pack = None
    if rows:
        mats, segs, lsts, nls, npbs = [], [], [], [], []
        for r in rows:
            n_lists = int(r["n"])
            cents = np.frombuffer(r["vectors"], np.float32).reshape(n_lists, -1)
            raw = r["ext_ids"]
            n_total = (
                int(np.frombuffer(raw, np.int64)[0]) if raw else n_lists * 2000
            )
            npb = max(
                1, min(n_lists, ivf_pq_params(n_total, cents.shape[1])["n_probes"])
            )
            mats.append(cents)
            segs.append(np.full(n_lists, int(r["segment_id"]), np.int64))
            lsts.append(np.arange(n_lists, dtype=np.int32))
            nls.append(np.full(n_lists, n_lists, np.int32))
            npbs.append(np.full(n_lists, npb, np.int32))
        pack = {
            "C": np.concatenate(mats),
            "seg_row": np.concatenate(segs),
            "lst_row": np.concatenate(lsts),
            "n_lists_row": np.concatenate(nls),
            "npb_row": np.concatenate(npbs),
        }
    cat._centroid_pack_memo = {"ver": ver, "pack": pack}
    return pack


def _centroid_rows(spark: SparkSession, cat: IndexCatalog) -> list:
    """Collected IVF centroid rows, memoized on the catalog keyed by the
    manifest commit time (same pattern as the norms broadcast)."""
    m = cat.read_manifest()
    ver = max((e.get("committed_at", 0) for e in m["tables"].values()), default=0)
    memo = getattr(cat, "_centroid_memo", None)
    if memo is not None and memo["ver"] == ver:
        return memo["rows"]
    rows = (
        cat.read(spark, "ann_ivf")
        .filter(F.col("list_id") == -1)
        .select("segment_id", "n", "ext_ids", "vectors")
        .collect()
    )
    cat._centroid_memo = {"ver": ver, "rows": rows}
    return rows


def _exact_segment_scan(fp, fr, q, metric, allowed, tomb, k):
    """Exact per-segment scan from the flat row — the B2 fallback a derived
    search path takes when its sidecar row is MISSING for a segment (a
    crash between a merge's flat append and its derived appends, or any
    partially-rebuilt state): the segment's vectors stay reachable, like
    the graph path's bf branch, instead of silently dropping from results.
    Returns None when nothing is accepted."""
    n, dim = int(fr["n_vecs"]), int(fr["dim"])
    x = np.frombuffer(fr["vectors"], np.float32).reshape(n, dim)
    ids = np.frombuffer(fr["ext_ids"], np.int64)
    m = _row_accept(fp, fr, ids, allowed, tomb)
    if m is not None:
        ids, x = ids[m], x[m]
    if ids.size == 0:
        return None
    s = _scores(x, q, metric)
    top = np.argsort(-s, kind="stable")[:k]
    return pd.DataFrame(
        {"segment_id": int(fr["segment_id"]), "ext_id": ids[top], "score": s[top]}
    )


def _validate_metric(cat: IndexCatalog, metric: str) -> None:
    built = cat.read_manifest().get("config", {}).get("ann_metric")
    if built is not None and metric != built:
        raise ValueError(
            f"query metric {metric!r} does not match index build metric "
            f"{built!r} (similarity-function mismatch, "
            "CuVS2510GPUVectorsReader.java:247-255)"
        )


def ann_topk_sq(
    spark: SparkSession,
    cat: IndexCatalog,
    query: list[float] | np.ndarray,
    k: int = 10,
    cfg: IndexConfig | None = None,
    rerank_factor: int = 3,
    filter_ext_ids=None,
    visited_limit: int | None = None,
    filter_mode: str = "auto",
) -> DataFrame:
    """Scalar-quantized search path (B10/B11 read side, mirroring
    ``LuceneAcceleratedHNSWScalarQuantizedVectorsWriter.java:149-159`` /
    ``TestQuantizedVectorsFormats.java:38-66``): coarse L2 scan over the
    dequantized 7-bit codes (signed→unsigned widened, B11, exactly as the
    device consumes them) selects ``k * rerank_factor`` candidates per
    segment; candidates are re-scored EXACTLY from the flat storage in the
    same cogrouped pass. Approximate overall (a true neighbor can fall
    outside the coarse cut), validated by containment like the reference's
    quantized-format tests. Returns (ext_id, score) with exact 1/(1+d) L2
    scores.

    ``filter_ext_ids`` + ANN tombstones apply as a PRE-filter at the coarse
    stage (candidates are drawn from accepted vectors only — stricter than
    the reference's k+10 widening, same filtered-search contract on the
    quantized formats, ``TestCuVSGaps.java:146-170``).

    Searches under the INDEX's build metric (l2 or cosine): cosine indexes
    store unit-normalized codes (see :func:`_nav_vectors`), coarse ranking
    scores them directly with the metric (scale-invariant), and the exact
    rerank from raw flat storage is metric-correct by construction."""
    cfg = cfg or IndexConfig()
    metric = cat.read_manifest().get("config", {}).get("ann_metric", "l2")
    q = np.asarray(query, dtype=np.float32)
    if k <= 0:
        return spark.createDataFrame([], "ext_id long, score double")
    m_coarse = k * max(1, rerank_factor)
    allowed, fblobs = _resolve_filter(spark, cat, filter_ext_ids, filter_mode)
    tomb, tblobs = _resolve_tombstones(spark, cat)
    budget = None if visited_limit is None else max(1, int(visited_limit))

    def scan(key, sqp: pd.DataFrame, fp: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"segment_id": [], "ext_id": [], "score": []}).astype(
            {"segment_id": "int64", "ext_id": "int64", "score": "float64"}
        )
        if fp.empty:
            return empty
        if sqp.empty:  # missing SQ row: exact fallback keeps it reachable
            out = _exact_segment_scan(
                fp, fp.iloc[0], q, metric, allowed, tomb, k
            )
            return empty if out is None else out
        r = sqp.iloc[0]
        n, dim = int(r["n_vecs"]), int(r["dim"])
        codes = np.frombuffer(r["codes"], np.int8).reshape(n, dim)
        mins = np.frombuffer(r["mins"], np.float32)
        maxs = np.frombuffer(r["maxs"], np.float32)
        # B11 round-trip: unsigned widening is the wire format the device
        # sees; shift back before dequantizing
        codes_u = widen_unsigned(codes)
        codes_i = (codes_u.astype(np.int16) - 64).astype(np.int8)
        x_deq = scalar_dequantize(codes_i, mins, maxs)
        coarse = _scores(x_deq, q, metric)
        fr = fp.iloc[0]
        x = np.frombuffer(fr["vectors"], np.float32).reshape(n, dim)
        ids = np.frombuffer(fr["ext_ids"], np.int64)
        mask = _row_accept(fp, fr, ids, allowed, tomb)
        ok = np.arange(n) if mask is None else np.flatnonzero(mask)
        if budget is not None:
            # visitedLimit contract (GPUPerLeafCuVSKnnCollector.java:26-38):
            # at most `budget` vectors scored per leaf; a tiny budget
            # degrades recall, never errors
            ok = ok[:budget]
        if ok.size == 0:
            return empty
        cand = ok[np.argsort(-coarse[ok], kind="stable")[:m_coarse]]
        s = _scores(x[cand], q, metric)
        top = np.argsort(-s, kind="stable")[:k]
        return pd.DataFrame(
            {"segment_id": int(r["segment_id"]), "ext_id": ids[cand][top], "score": s[top]}
        )

    flat = _attach_aux(cat.read(spark, "ann_flat"), fblobs, tblobs)
    partials = (
        cat.read(spark, "ann_sq")
        .groupby("segment_id")
        .cogroup(flat.groupby("segment_id"))
        .applyInPandas(scan, TOPK_SCHEMA)
    )
    return (
        partials.orderBy(F.desc("score"), F.asc("ext_id"))
        .limit(k)
        .select("ext_id", "score")
    )


def ann_topk_bq(
    spark: SparkSession,
    cat: IndexCatalog,
    query: list[float] | np.ndarray,
    k: int = 10,
    cfg: IndexConfig | None = None,
    filter_ext_ids=None,
    rerank_factor: int | None = None,
    visited_limit: int | None = None,
    filter_mode: str = "auto",
) -> DataFrame:
    """Top-k over binary-quantized codes by Hamming distance (the
    coarse/compressed search path of the BQ format). Approximate —
    validated by containment against the exact oracle, like the
    reference's quantized-format tests (TestQuantizedVectorsFormats).
    Pre-filter + tombstones restrict candidates BEFORE the top-k cut.

    ``rerank_factor=None`` (default): pure compressed-domain search →
    (ext_id, hamming), the fully-SQL-oracled path. With an int: the
    reference's quantized formats RESCORE candidates against raw vectors
    (Lucene's quantized readers delegate exact rescoring to the flat
    storage) — take the ``k·rerank_factor`` hamming-closest per segment,
    rescore them exactly from ``ann_flat`` under the index metric →
    (ext_id, score)."""
    cfg = cfg or IndexConfig()
    metric = cat.read_manifest().get("config", {}).get("ann_metric", "l2")
    q = np.asarray(query, dtype=np.float32)
    rerank = rerank_factor is not None
    out_schema = "ext_id long, score double" if rerank else "ext_id long, hamming int"
    if k <= 0:
        return spark.createDataFrame([], out_schema)
    m_coarse = k * max(1, rerank_factor or 1)
    bq = cat.read(spark, "ann_bq")
    # the pure-hamming projection normally carries only ids (the fat blob
    # column is never read); when the manifest says ann_bq is OUT OF SYNC
    # with ann_flat (a crash between merge appends), project 'vectors' too
    # so the in-scan recompute branch keeps every segment reachable
    need_vecs = rerank or not _derived_in_sync(cat, "ann_bq")
    flat_cols = ["segment_id", "n_vecs", "ext_ids"] + (
        ["vectors"] if need_vecs else []
    )
    flat = cat.read(spark, "ann_flat").select(*flat_cols)
    allowed, fblobs = _resolve_filter(spark, cat, filter_ext_ids, filter_mode)
    tomb, tblobs = _resolve_tombstones(spark, cat)
    flat = _attach_aux(flat, fblobs, tblobs)
    budget = None if visited_limit is None else max(1, int(visited_limit))
    from pyspark.sql import functions as F2

    part_schema = (
        "segment_id long, ext_id long, score double" if rerank
        else "segment_id long, ext_id long, hamming int"
    )

    def scan(key, bqp: pd.DataFrame, fp: pd.DataFrame) -> pd.DataFrame:
        val = "score" if rerank else "hamming"
        empty = pd.DataFrame({"segment_id": [], "ext_id": [], val: []}).astype(
            {"segment_id": "int64", "ext_id": "int64",
             val: "float64" if rerank else "int32"}
        )
        if fp.empty:
            return empty
        fr = fp.iloc[0]
        if bqp.empty:
            # missing BQ row: recompute codes + centroid from the flat blob
            # on the fly — binary quantization is a deterministic function
            # of the stored vectors, so the segment stays reachable with
            # bit-identical hamming semantics (requires the rerank path's
            # flat 'vectors' column; the pure-hamming projection carries
            # only ids, so fall back exactly when we can)
            from cuvs_lucene_spark.functions.quantize import binary_quantize

            if "vectors" not in fp.columns:
                return empty
            nv = int(fr["n_vecs"])
            x_all = np.frombuffer(fr["vectors"], np.float32).reshape(nv, -1)
            codes, cent64 = binary_quantize(_nav_vectors(x_all, metric))
            dim = x_all.shape[1]
            centroid = cent64.astype(np.float64)
        else:
            r = bqp.iloc[0]
            codes = np.frombuffer(r["codes"], np.uint8).reshape(r["n_vecs"], -1)
            # v2 writes the centroid as float64; v1 indexes wrote float32 —
            # gate on blob length (dim*8 vs dim*4) so pre-v2 indexes open
            dim = int(r["dim"])
            raw = bytes(r["centroid"])
            if len(raw) == dim * 8:
                centroid = np.frombuffer(raw, np.float64)
            else:
                centroid = np.frombuffer(raw, np.float32).astype(np.float64)
        ids = np.frombuffer(fr["ext_ids"], np.int64)
        # query bits in the same (navigation) space the codes were built in
        qbits = np.packbits(_nav_query(q, metric).astype(np.float64) > centroid)
        ham = np.unpackbits(codes ^ qbits[None, :], axis=1).sum(1)
        mask = _row_accept(fp, fr, ids, allowed, tomb)
        idx = np.arange(ids.size)
        if mask is not None:
            idx = idx[mask]
        if budget is not None:
            idx = idx[:budget]  # visitedLimit: cap vectors scored per leaf
        if idx.size == 0:
            return empty
        top = idx[np.lexsort((ids[idx], ham[idx]))[:m_coarse]]
        seg = int(fr["segment_id"])
        if not rerank:
            return pd.DataFrame(
                {"segment_id": seg, "ext_id": ids[top],
                 "hamming": ham[top].astype(np.int32)}
            )
        x = np.frombuffer(fr["vectors"], np.float32).reshape(int(fr["n_vecs"]), dim)
        s = _scores(x[top], q, metric)
        best = np.argsort(-s, kind="stable")[:k]
        return pd.DataFrame(
            {"segment_id": seg, "ext_id": ids[top][best],
             "score": s[best]}
        )

    partials = (
        bq.groupby("segment_id")
        .cogroup(flat.groupby("segment_id"))
        .applyInPandas(scan, part_schema)
    )
    if rerank:
        return (
            partials.orderBy(F2.desc("score"), F2.asc("ext_id"))
            .limit(k)
            .select("ext_id", "score")
        )
    return (
        partials.orderBy(F2.asc("hamming"), F2.asc("ext_id"))
        .limit(k)
        .select("ext_id", "hamming")
    )


def _pq_rows(flat_df: DataFrame, cfg: IndexConfig, metric: str = "l2") -> DataFrame:
    """Per-segment PQ codebooks + codes from flat blobs (shared by the
    batch build and the streaming epoch append). Codebooks/codes live in
    navigation space (unit-normalized for cosine indexes)."""
    seed = cfg.ann.seed
    iters = cfg.ann.kmeans_iters

    def build(it):
        for pdf in it:
            for r in pdf.itertuples():
                x = np.frombuffer(r.vectors, np.float32).reshape(r.n_vecs, r.dim)
                x = _nav_vectors(x, metric)
                n, dim = x.shape
                p = ivf_pq_params(n, dim)
                pq_dim, bits = p["pq_dim"], p["pq_bits"]
                if dim % pq_dim:
                    pq_dim = dim  # fall back to 1-dim subspaces
                sub = dim // pq_dim
                k_cb = min(1 << bits, n)
                books = np.empty((pq_dim, 1 << bits, sub), np.float32)
                codes = np.empty((n, pq_dim), np.uint8)
                for s in range(pq_dim):
                    xs = x[:, s * sub : (s + 1) * sub]
                    cents = _kmeans(xs, k_cb, iters, seed + s, 1.0)
                    d = (
                        -2.0 * xs @ cents.T
                        + (cents**2).sum(1)[None, :]
                    )
                    codes[:, s] = d.argmin(1).astype(np.uint8)
                    books[s, :k_cb] = cents
                    if k_cb < (1 << bits):
                        books[s, k_cb:] = cents[0]  # pad unused slots
                yield pd.DataFrame(
                    {
                        "segment_id": [r.segment_id],
                        "n_vecs": [np.int32(n)],
                        "dim": [np.int32(dim)],
                        "pq_dim": [np.int32(pq_dim)],
                        "pq_bits": [np.int32(bits)],
                        "codebook": [books.tobytes()],
                        "codes": [codes.tobytes()],
                    }
                )

    return flat_df.mapInPandas(build, PQ_SCHEMA)


def build_ann_pq(
    spark: SparkSession,
    cat: IndexCatalog,
    cfg: IndexConfig | None = None,
) -> None:
    """Product-quantization codes — the structure the reference's derived
    IVF-PQ parameters describe (``CagraIndexParamsFactory.java:31-93``:
    pqDim bucketed by dim, pqBits 8 for dim≤32 else 4; consumed on the GPU
    inside cuVS, re-expressed here as explicit per-segment codebooks).

    Per segment (from the committed flat storage, M4): the vector space is
    split into ``pq_dim`` contiguous subspaces; each subspace gets its own
    deterministic k-means codebook of 2^pq_bits centroids; every vector is
    stored as pq_dim uint8 centroid ids. Search (:func:`ann_topk_pq`) is
    the classic ADC scan: one (pq_dim × 2^bits) lookup table per query,
    approximate distance = sum of per-subspace LUT entries."""
    cfg = cfg or IndexConfig()
    metric = cat.read_manifest().get("config", {}).get("ann_metric", "l2")
    # a full rebuild derives from the CURRENT flat (epoch/merge appends
    # included) — record that as covers_tags, else _derived_in_sync would
    # read the tagless fresh entry as permanently stale
    cat.write(
        _pq_rows(cat.read(spark, "ann_flat"), cfg, metric), "ann_pq",
        extra_entry={"covers_tags": sorted(_covered_tags(cat, "ann_flat"))},
    )
    cat.mark_stage("ann_pq")


def ann_topk_pq(
    spark: SparkSession,
    cat: IndexCatalog,
    query: list[float] | np.ndarray,
    k: int = 10,
    cfg: IndexConfig | None = None,
    rerank_factor: int = 3,
    filter_ext_ids=None,
    visited_limit: int | None = None,
    filter_mode: str = "auto",
) -> DataFrame:
    """PQ ADC search: per segment, build the (pq_dim × 2^bits) query LUT,
    score all codes with one fancy-index sum, take the coarse top
    ``k·rerank_factor``, rescore those EXACTLY from the flat storage in
    the same cogrouped pass. Approximate → containment-validated; returned
    scores are exact under the index's build metric (1/(1+d) for L2,
    cosine similarity for cosine indexes — codebooks live in navigation
    space, the ADC LUT uses the unit query, rerank reads raw flat).
    Pre-filter + tombstones restrict the coarse candidate pool
    (filtered-search contract on every format)."""
    cfg = cfg or IndexConfig()
    metric = cat.read_manifest().get("config", {}).get("ann_metric", "l2")
    q = np.asarray(query, dtype=np.float32)
    q_nav = _nav_query(q, metric)
    if k <= 0:
        return spark.createDataFrame([], "ext_id long, score double")
    m_coarse = k * max(1, rerank_factor)
    allowed, fblobs = _resolve_filter(spark, cat, filter_ext_ids, filter_mode)
    tomb, tblobs = _resolve_tombstones(spark, cat)
    budget = None if visited_limit is None else max(1, int(visited_limit))

    def scan(key, pqp: pd.DataFrame, fp: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"segment_id": [], "ext_id": [], "score": []}).astype(
            {"segment_id": "int64", "ext_id": "int64", "score": "float64"}
        )
        if fp.empty:
            return empty
        if pqp.empty:  # missing PQ row: exact fallback keeps it reachable
            out = _exact_segment_scan(
                fp, fp.iloc[0], q, metric, allowed, tomb, k
            )
            return empty if out is None else out
        r = pqp.iloc[0]
        n, dim = int(r["n_vecs"]), int(r["dim"])
        pq_dim, bits = int(r["pq_dim"]), int(r["pq_bits"])
        sub = dim // pq_dim
        books = np.frombuffer(r["codebook"], np.float32).reshape(pq_dim, 1 << bits, sub)
        codes = np.frombuffer(r["codes"], np.uint8).reshape(n, pq_dim)
        q64 = q_nav.astype(np.float64)
        # ADC lookup table: squared L2 from each query subvector to every
        # centroid of its subspace (navigation space — L2 on unit vectors
        # ranks as cosine for cosine indexes)
        qsub = q64.reshape(pq_dim, sub)
        lut = ((books.astype(np.float64) - qsub[:, None, :]) ** 2).sum(2)  # (pq_dim, K)
        approx = lut[np.arange(pq_dim)[None, :], codes].sum(1)  # (n,)
        fr = fp.iloc[0]
        x = np.frombuffer(fr["vectors"], np.float32).reshape(n, dim)
        ids = np.frombuffer(fr["ext_ids"], np.int64)
        mask = _row_accept(fp, fr, ids, allowed, tomb)
        ok = np.arange(n) if mask is None else np.flatnonzero(mask)
        if budget is not None:
            ok = ok[:budget]  # visitedLimit: cap vectors scored per leaf
        if ok.size == 0:
            return empty
        cand = ok[np.argsort(approx[ok], kind="stable")[:m_coarse]]
        s = _scores(x[cand], q, metric)
        top = np.argsort(-s, kind="stable")[:k]
        return pd.DataFrame(
            {"segment_id": int(r["segment_id"]), "ext_id": ids[cand][top], "score": s[top]}
        )

    flat = _attach_aux(cat.read(spark, "ann_flat"), fblobs, tblobs)
    partials = (
        cat.read(spark, "ann_pq")
        .groupby("segment_id")
        .cogroup(flat.groupby("segment_id"))
        .applyInPandas(scan, TOPK_SCHEMA)
    )
    return (
        partials.orderBy(F.desc("score"), F.asc("ext_id"))
        .limit(k)
        .select("ext_id", "score")
    )


IVFPQ_SCHEMA = "segment_id long, list_id int, n int, ext_ids binary, codes binary"


def _ivfpq_rows(ivf_df: DataFrame, pq_df: DataFrame, metric: str = "l2") -> DataFrame:
    """Per-list PQ codes — the combined IVF-PQ structure the reference's
    parameter factory derives as ONE unit (``CagraIndexParamsFactory.java:
    31-93`` sets nLists/nProbes AND pqDim/pqBits together; cuVS's IVF_PQ
    index stores pq-encoded residualless codes per inverted list). Each
    segment's IVF lists are re-encoded against the segment's existing PQ
    codebook (navigation space), so a probed list costs ``n·pq_dim`` bytes
    instead of ``n·4·dim`` — the read-volume shape that works at 100 TB."""

    def enc(key, lists: pd.DataFrame, pqp: pd.DataFrame) -> pd.DataFrame:
        cols = ["segment_id", "list_id", "n", "ext_ids", "codes"]
        empty = pd.DataFrame({c: [] for c in cols}).astype(
            {"segment_id": "int64", "list_id": "int32", "n": "int32",
             "ext_ids": "object", "codes": "object"}
        )
        if lists.empty or pqp.empty:
            return empty
        r = pqp.iloc[0]
        pq_dim, bits = int(r["pq_dim"]), int(r["pq_bits"])
        dim = int(r["dim"])
        sub = dim // pq_dim
        books = np.frombuffer(r["codebook"], np.float32).reshape(
            pq_dim, 1 << bits, sub
        )
        out = []
        for lr in lists.itertuples():
            x = np.frombuffer(lr.vectors, np.float32).reshape(int(lr.n), dim)
            xn = _nav_vectors(x, metric)
            codes = np.empty((int(lr.n), pq_dim), np.uint8)
            for s_ in range(pq_dim):
                xs = xn[:, s_ * sub : (s_ + 1) * sub].astype(np.float64)
                cb = books[s_].astype(np.float64)
                d = -2.0 * xs @ cb.T + (cb**2).sum(1)[None, :]
                codes[:, s_] = d.argmin(1).astype(np.uint8)
            out.append(
                (int(lr.segment_id), int(lr.list_id), int(lr.n),
                 lr.ext_ids, codes.tobytes())
            )
        if not out:
            return empty
        return pd.DataFrame(out, columns=cols)

    return (
        ivf_df.filter(F.col("list_id") >= 0)
        .groupby("segment_id")
        .cogroup(pq_df.groupby("segment_id"))
        .applyInPandas(enc, IVFPQ_SCHEMA)
    )


def build_ann_ivfpq(
    spark: SparkSession, cat: IndexCatalog, cfg: IndexConfig | None = None
) -> None:
    """Build the combined IVF-PQ lists (probed, compressed — see
    :func:`_ivfpq_rows`). Requires the PQ codebooks; builds them first if
    absent. Centroid rows are shared with ``ann_ivf`` (one coarse
    quantizer per segment, two list payloads)."""
    cfg = cfg or IndexConfig()
    if not cat.exists("ann_pq"):
        build_ann_pq(spark, cat, cfg)
    metric = cat.read_manifest().get("config", {}).get("ann_metric", "l2")
    cat.write(
        _ivfpq_rows(
            cat.read(spark, "ann_ivf"), cat.read(spark, "ann_pq"), metric
        ),
        "ann_ivfpq",
        sort_within_partitions=["segment_id", "list_id"],
        # derived from ann_ivf ∩ ann_pq: the rebuild covers exactly the
        # tags BOTH inputs cover (see build_ann_pq's covers_tags note)
        extra_entry={
            "covers_tags": sorted(
                _covered_tags(cat, "ann_ivf") & _covered_tags(cat, "ann_pq")
            )
        },
    )
    cat.mark_stage("ann_ivfpq")


def ann_topk_ivfpq(
    spark: SparkSession,
    cat: IndexCatalog,
    query: list[float] | np.ndarray,
    k: int = 10,
    cfg: IndexConfig | None = None,
    nprobe: int | None = None,
    rerank_factor: int = 3,
    filter_ext_ids=None,
    visited_limit: int | None = None,
    filter_mode: str = "auto",
    probe_mode: str = "auto",
) -> DataFrame:
    """IVF-PQ search — probe ``nprobe`` lists per segment (same two probe
    modes as :func:`ann_topk`), ADC-score ONLY the probed lists' pq codes
    (one LUT per segment), take ``k·rerank_factor`` coarse candidates per
    list, rescore them EXACTLY from the flat storage in a per-segment
    cogroup → global top-k. This is the cuVS IVF_PQ search contract
    (coarse ADC + refinement), and the IO shape that survives 100 TB:
    probed bytes are ``nprobe · list_len · pq_dim`` vs the raw path's
    ``nprobe · list_len · 4·dim``. Approximate (probe + ADC recall),
    containment-validated; returned scores are exact under the index's
    build metric. Pre-filter + tombstones restrict candidates BEFORE the
    coarse cut (acceptDocs on every format); ``visited_limit`` caps
    ADC-scored vectors per list."""
    cfg = cfg or IndexConfig()
    metric = cat.read_manifest().get("config", {}).get("ann_metric", "l2")
    q = np.asarray(query, dtype=np.float32)
    qn = _nav_query(q, metric)
    if k <= 0:
        return spark.createDataFrame([], "ext_id long, score double")
    m_coarse = k * max(1, rerank_factor)
    allowed, fblobs = _resolve_filter(spark, cat, filter_ext_ids, filter_mode)
    tomb, tblobs = _resolve_tombstones(spark, cat)
    budget = None if visited_limit is None else max(1, int(visited_limit))

    sel = _probe_select(
        spark, cat, cat.read(spark, "ann_ivfpq"), qn, nprobe, probe_mode
    )
    flat = _attach_aux(cat.read(spark, "ann_flat"), fblobs, tblobs)
    if sel is None:
        sel = spark.createDataFrame([], IVFPQ_SCHEMA)  # bf-only catalog
    else:
        # per-segment codebook meta rides the selected list rows (small:
        # one codebook per segment, dim·2^bits floats)
        pqmeta = cat.read(spark, "ann_pq").select(
            "segment_id", "dim", "pq_dim", "pq_bits", "codebook"
        )
        sel = sel.join(pqmeta, "segment_id")
        sel = _attach_aux(sel, fblobs, tblobs)

    def adc(it):
        q64 = qn.astype(np.float64)
        for pdf in it:
            for r in pdf.itertuples():
                pq_dim, bits = int(r.pq_dim), int(r.pq_bits)
                dim = int(r.dim)
                sub = dim // pq_dim
                books = np.frombuffer(r.codebook, np.float32).reshape(
                    pq_dim, 1 << bits, sub
                )
                codes = np.frombuffer(r.codes, np.uint8).reshape(int(r.n), pq_dim)
                ids = np.frombuffer(r.ext_ids, np.int64)
                qsub = q64.reshape(pq_dim, sub)
                lut = ((books.astype(np.float64) - qsub[:, None, :]) ** 2).sum(2)
                approx = lut[np.arange(pq_dim)[None, :], codes].sum(1)
                acc = _row_accept(pdf, r, ids, allowed, tomb)
                ok = np.arange(ids.size) if acc is None else np.flatnonzero(acc)
                if budget is not None:
                    ok = ok[:budget]  # visitedLimit per leaf
                if ok.size == 0:
                    continue
                take = ok[np.argsort(approx[ok], kind="stable")[:m_coarse]]
                yield pd.DataFrame(
                    {"segment_id": int(r.segment_id), "ext_id": ids[take],
                     "approx": approx[take]}
                )

    cands = sel.mapInPandas(adc, "segment_id long, ext_id long, approx double")

    def rerank(key, cp: pd.DataFrame, fp: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"segment_id": [], "ext_id": [], "score": []}).astype(
            {"segment_id": "int64", "ext_id": "int64", "score": "float64"}
        )
        if cp.empty or fp.empty:
            return empty
        fr = fp.iloc[0]
        n, dim = int(fr["n_vecs"]), int(fr["dim"])
        x = np.frombuffer(fr["vectors"], np.float32).reshape(n, dim)
        ids = np.frombuffer(fr["ext_ids"], np.int64)
        want = np.unique(cp["ext_id"].to_numpy(np.int64))
        hit = np.flatnonzero(_member_mask(ids, want))
        if hit.size == 0:
            return empty
        s = _scores(x[hit], q, metric)
        top = np.argsort(-s, kind="stable")[:k]
        return pd.DataFrame(
            {"segment_id": int(fr["segment_id"]), "ext_id": ids[hit][top],
             "score": s[top]}
        )

    partials = (
        cands.groupby("segment_id")
        .cogroup(flat.groupby("segment_id"))
        .applyInPandas(rerank, TOPK_SCHEMA)
    )
    # B2 degradation ladder: index-less segments are brute-forced from flat
    if not (_derived_in_sync(cat, "ann_ivfpq") and _derived_in_sync(cat, "ann_pq")):
        # a crash between the group-wise merge's per-table appends can leave
        # a segment in ann_flat/ann_ivf with no ann_ivfpq (or ann_pq) rows —
        # neither ADC-scanned nor in bf_fallback_segments. Derive the TRUE
        # covered set with an anti-join so those segments are brute-forced
        # (reachability contract: every vector reachable in every mode).
        covered = (
            cat.read(spark, "ann_ivfpq").select("segment_id")
            .join(
                cat.read(spark, "ann_pq").select("segment_id").distinct(),
                "segment_id", "left_semi",
            )
            .distinct()
        )
        bf_missing = flat.join(covered, "segment_id", "left_anti")
    else:
        bf_segs = cat.read_manifest()["stages"].get("ann_ivf", {}).get(
            "bf_fallback_segments"
        )
        if bf_segs is None:
            # pre-v2 index without the manifest list: derive with an anti-join
            # (same fallback derivation as ann_topk — never silently empty)
            ivf_seg_df = (
                cat.read(spark, "ann_ivf")
                .filter(F.col("list_id") == -1)
                .select("segment_id")
            )
            bf_missing = flat.join(ivf_seg_df, "segment_id", "left_anti")
        elif bf_segs:
            bf_missing = flat.filter(
                F.col("segment_id").isin([int(s) for s in bf_segs])
            )
        else:
            bf_missing = None
    if bf_missing is not None:

        def scan_bf(it):
            for pdf in it:
                for r in pdf.itertuples():
                    x = np.frombuffer(r.vectors, np.float32).reshape(r.n_vecs, r.dim)
                    ids = np.frombuffer(r.ext_ids, np.int64)
                    acc = _row_accept(pdf, r, ids, allowed, tomb)
                    if acc is not None:
                        ids, x = ids[acc], x[acc]
                    if ids.size == 0:
                        continue
                    s = _scores(x, q, metric)
                    top = np.argsort(-s, kind="stable")[:k]
                    yield pd.DataFrame(
                        {"segment_id": r.segment_id, "ext_id": ids[top],
                         "score": s[top]}
                    )

        partials = partials.unionByName(bf_missing.mapInPandas(scan_bf, TOPK_SCHEMA))
    return (
        partials.orderBy(F.desc("score"), F.asc("ext_id"))
        .limit(k)
        .select("ext_id", "score")
    )


def build_ann_fields(
    spark: SparkSession,
    df: DataFrame,
    index_root: str,
    cfg: IndexConfig | None = None,
    id_col: str = "ext_id",
    fields: dict[str, str] | list[str] | None = None,
    rows_per_segment: int | None = None,
) -> IndexCatalog:
    """Multi-vector-field build — the reference indexes several
    ``KnnFloatVectorField``s per document with one writer per field
    (``CuVS2510GPUVectorsWriter.java:69`` per-field writer list, exercised
    by ``TestCuVSVectorsFormat.java:82-119``). Spark-first restatement:
    one ANN sidecar catalog per field under ``root/field=<name>``, each
    built by the same flush kernel; a parent manifest records the field
    list and per-field metric.

    ``fields``: list of vector column names, or {column: metric} for
    per-field similarity functions. Rows where a field is NULL are skipped
    for that field only (the ``DocsWithFieldSet`` gap semantics,
    ``TestCuVSGaps.java:83-94``)."""
    import dataclasses
    import os

    cfg = cfg or IndexConfig()
    if fields is None:
        raise ValueError("fields is required")
    metric_of = (
        dict(fields) if isinstance(fields, dict) else {f: cfg.ann.metric for f in fields}
    )
    cat = IndexCatalog(index_root)
    for name, metric in metric_of.items():
        fcfg = dataclasses.replace(cfg, ann=dataclasses.replace(cfg.ann, metric=metric))
        sub_root = os.path.join(index_root, f"field={name}")
        build_ann(
            spark,
            df.filter(F.col(name).isNotNull()).select(id_col, name),
            sub_root,
            fcfg,
            id_col=id_col,
            vector_col=name,
            rows_per_segment=rows_per_segment,
        )
    cat.set_config({"ann_fields": metric_of, "ann_format": ANN_FORMAT_VERSION})
    cat.mark_stage("ann_build_fields")
    return cat


def field_catalog(cat: IndexCatalog, field: str) -> IndexCatalog:
    """Resolve the per-field sub-catalog of a multi-field ANN index."""
    import os

    fields = cat.read_manifest().get("config", {}).get("ann_fields", {})
    if field not in fields:
        raise ValueError(f"unknown vector field {field!r}; have {sorted(fields)}")
    return IndexCatalog(os.path.join(cat.root, f"field={field}"))


def ann_topk_field(
    spark: SparkSession,
    cat: IndexCatalog,
    field: str,
    query: list[float] | np.ndarray,
    **kwargs,
) -> DataFrame:
    """Per-field search over a multi-field index (the reader resolves the
    field entry first — ``CuVS2510GPUVectorsReader.java:401-410``)."""
    return ann_topk(spark, field_catalog(cat, field), query, **kwargs)


ANN_MERGE_BASE = 1 << 42  # merged-ann segment namespace: base + (gen << 32)
                          # + seq — disjoint from build ids (ext_id // rps)
                          # and streaming epoch ids ([2^41, ~2^42)); ids are
                          # never reused (merged-away segments drop logically)


def merge_ann(
    spark: SparkSession,
    cat: IndexCatalog,
    cfg: IndexConfig | None = None,
    tombstone_ext_ids: set[int] | None = None,
    rows_per_segment: int | None = None,
    groups: list[list[int]] | None = None,
) -> dict[int, list[int]]:
    """GROUP-WISE incremental ANN merge: read ONLY the merging segments'
    flat blobs (never the derived indexes — M4), drop tombstoned ids (M5),
    rebuild the derived structures for the NEW segments only, and commit as
    one tagged append + logical drop of the merged-away segment ids (the
    segdata scheme of ``merge_segments``). Untouched segments are never
    read or rewritten — merge cost ∝ merged segments, exactly the
    reference's ``mergeOneField`` scope (``CuVS2510GPUVectorsWriter.java:
    479-497``: MergedVectorValues spans just the MergeState's readers,
    rebuild via the flush path = M2 merge-as-rebuild, per group).

    ``groups``: lists of ANN segment ids to merge (one output id range per
    group); default = ALL current segments in one group (forceMerge-style
    full compaction, the previous behavior). Returns {gkey: [new ids]}.

    ``tombstone_ext_ids`` ADDS to the catalog's own ``ann_tombstones``
    table (registered by :func:`delete_ann`) — registered deletes always
    apply (the liveDocs state ``MergedVectorValues`` skips); tombstones
    whose rows were physically dropped here are cleared, tombstones in
    untouched segments remain (M5, per-segment liveDocs envelope).

    A dropped-fraction compaction trigger (``cfg.compact_dropped_fraction``)
    rewrites the ann tables once logically-dropped rows dominate."""
    import dataclasses

    cfg = cfg or IndexConfig()
    # merge must rebuild under the INDEX's metric, not the passed cfg's
    # default — a cosine index merged with a default cfg must stay cosine
    # (similarity function is per-field index state, never per-call:
    # CuVS2510GPUVectorsWriter.java:360-367 persists it in meta)
    built = cat.read_manifest().get("config", {}).get("ann_metric")
    if built and built != cfg.ann.metric:
        cfg = dataclasses.replace(
            cfg, ann=dataclasses.replace(cfg.ann, metric=built)
        )
    metric = cfg.ann.metric
    rps = rows_per_segment or cfg.rows_per_segment
    if tombstone_ext_ids:
        # registered + explicit UNION; auto_merge off — we ARE the merge
        delete_ann(spark, cat, tombstone_ext_ids, cfg, auto_merge=False)
    tomb, tblobs = _resolve_tombstones(spark, cat)

    # segment-level metadata (∝ segment count, same scale budget as the
    # text merge's segment_stats collect — never the blobs)
    meta = cat.read(spark, "ann_flat").select("segment_id", "n_vecs").collect()
    nvecs_of = {int(r["segment_id"]): int(r["n_vecs"]) for r in meta}
    if groups is None:
        groups = [sorted(nvecs_of)]
    groups = [
        [int(s) for s in g if int(s) in nvecs_of] for g in groups
    ]
    groups = [g for g in groups if g]
    if not groups:
        return {}
    # groups must partition their segments: a segment in two groups would
    # silently land in the LATER group (dict overwrite) while the recorded
    # merged_from lineage claimed both — corrupt bookkeeping, so refuse
    seen: set[int] = set()
    for g in groups:
        if len(set(g)) != len(g) or seen.intersection(g):
            dup = sorted(
                {s for s in g if g.count(s) > 1} | (seen.intersection(g))
            )
            raise ValueError(
                f"merge_ann groups overlap on segment ids {dup}: groups "
                "must be disjoint (one output range per segment)"
            )
        seen.update(g)
    gkey_of = {s: gi for gi, g in enumerate(groups) for s in g}
    merged_segs = sorted(gkey_of)
    gmap = spark.createDataFrame(
        [(int(s), int(gi)) for s, gi in gkey_of.items()], "segment_id long, gkey long"
    )

    def explode_flat(it):
        # distributed un-packing of the merging segments' flat blobs — the
        # MergedVectorValues concatenation, delete-filtered (M2/M5; the
        # tombstone set arrives as a closure array when small or as the
        # per-segment 'tomb' blob column when large — never a driver array
        # whose size grows with the delete count)
        for pdf in it:
            for r in pdf.itertuples():
                ids = np.frombuffer(r.ext_ids, np.int64)
                x = np.frombuffer(r.vectors, np.float32).reshape(r.n_vecs, r.dim)
                t = tomb if tomb is not None else _blob_tomb(pdf, r)
                if t is not None and t.size:
                    keep = ~_member_mask(ids, t)
                    ids, x = ids[keep], x[keep]
                if ids.size == 0:
                    continue  # fully-deleted segment: nothing to carry over
                yield pd.DataFrame(
                    {"gkey": int(r.gkey), "ext_id": ids, "vector": list(map(list, x))}
                )

    # pushed isin prunes untouched segments at the parquet scan; the
    # broadcast join only attaches the gkey
    merging = (
        cat.read(spark, "ann_flat")
        .filter(F.col("segment_id").isin(merged_segs))
        .join(F.broadcast(gmap), "segment_id")
    )
    if tblobs is not None:
        merging = merging.join(tblobs, "segment_id", "left")
    rows = merging.mapInPandas(
        explode_flat, "gkey long, ext_id long, vector array<float>"
    )
    # new doc order: ext_id asc per group (the frozen index sort), dense
    # ids via the range-partitioned rank — no single-partition window
    from cuvs_lucene_spark.operators.segments import grouped_dense_rank

    ranked, release = grouped_dense_rank(rows, ["gkey"], ["ext_id"], "rk")
    counts = {
        int(r["gkey"]): int(r["c"])
        for r in ranked.groupBy("gkey").agg(F.max("rk").alias("m"))
        .select("gkey", (F.col("m") + 1).alias("c")).collect()
    }
    flat_ent = cat.read_manifest()["tables"].get("ann_flat", {})
    gen = int(flat_ent.get("ann_merge_gen", 0)) + 1
    gen_base = ANN_MERGE_BASE + (gen << 32)
    base_of: dict[int, int] = {}
    new_ids: dict[int, list[int]] = {}
    seq = 0
    for gi in range(len(groups)):
        c = counts.get(gi, 0)
        n_chunks = -(-c // rps) if c else 0
        base_of[gi] = gen_base + seq
        new_ids[gi] = [gen_base + seq + j for j in range(n_chunks)]
        seq += n_chunks
    base_df = spark.createDataFrame(
        [(int(g), int(b)) for g, b in base_of.items()], "gkey long, seg_base long"
    )
    assigned = ranked.join(F.broadcast(base_df), "gkey").select(
        (F.col("seg_base") + F.floor(F.col("rk") / F.lit(rps))).cast("long")
        .alias("segment_id"),
        "ext_id",
        "vector",
    )
    new_flat = assigned.groupBy("segment_id").applyInPandas(
        build_flat_pdf, FLAT_SCHEMA
    )

    def _dropped_for(table: str) -> list[int]:
        prev = set(
            cat.read_manifest()["tables"].get(table, {}).get("dropped_segments", [])
        )
        return sorted(prev | set(merged_segs))

    tag = f"ann_merge_gen_{gen}"
    dropped_vecs = int(flat_ent.get("dropped_vecs", 0)) + sum(
        nvecs_of[s] for s in merged_segs
    )
    cat.append(
        new_flat,
        "ann_flat",
        tag=tag,
        extra_entry={
            "dropped_segments": _dropped_for("ann_flat"),
            "dropped_vecs": dropped_vecs,
            "ann_merge_gen": gen,
        },
    )
    if cat.exists("ann_ids"):
        cat.append(
            assigned.select("segment_id", "ext_id"),
            "ann_ids",
            tag=tag,
            extra_entry={"dropped_segments": _dropped_for("ann_ids")},
        )
    else:
        _ann_ids(spark, cat)  # pre-v3 self-heal: derive from post-merge flat
    release()

    # derived structures for the NEW segments only (read back from the
    # committed flat — M4 discipline; the gen range filter is a pushed
    # parquet predicate, untouched segments' blobs are never read)
    new_flat_df = cat.read(spark, "ann_flat").filter(
        (F.col("segment_id") >= gen_base)
        & (F.col("segment_id") < ANN_MERGE_BASE + ((gen + 1) << 32))
    )
    derived = [
        ("ann_sq", lambda: _sq_rows(new_flat_df, metric)),
        ("ann_bq", lambda: _bq_rows(new_flat_df, metric)),
        ("ann_ivf", lambda: _ivf_rows(new_flat_df, cfg.ann, metric)),
    ]
    if cat.exists("ann_graph"):
        from cuvs_lucene_spark.operators.ann_graph import _graph_rows

        derived.append(
            ("ann_graph", lambda: _graph_rows(new_flat_df, cfg, metric=metric))
        )
    if cat.exists("ann_pq"):
        derived.append(("ann_pq", lambda: _pq_rows(new_flat_df, cfg, metric)))

    # the derived-table appends are mutually independent (each reads the
    # committed flat only) — run their Spark jobs concurrently from a
    # driver thread pool (guide §2.6); manifest commits serialize under
    # the catalog lock. Crash-consistency is unchanged: _derived_in_sync
    # already detects ANY subset of missing tags (the appends were never
    # atomic as a group).
    def _append_one(table, mk):
        cat.append(
            mk(), table, tag=tag,
            extra_entry={"dropped_segments": _dropped_for(table)},
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(derived)) as pool:
        for f in [pool.submit(_append_one, t, mk) for t, mk in derived]:
            f.result()
    if cat.exists("ann_ivfpq") and cat.exists("ann_pq"):
        gen_hi = ANN_MERGE_BASE + ((gen + 1) << 32)
        in_gen = (F.col("segment_id") >= gen_base) & (F.col("segment_id") < gen_hi)
        cat.append(
            _ivfpq_rows(
                cat.read(spark, "ann_ivf").filter(in_gen),
                cat.read(spark, "ann_pq").filter(in_gen),
                metric,
            ),
            "ann_ivfpq", tag=tag,
            extra_entry={"dropped_segments": _dropped_for("ann_ivfpq")},
        )

    # B2 fallback bookkeeping: recompute from post-merge metadata (both
    # collects are segment-count-sized manifest upkeep, like streaming's)
    flat_segs = {
        int(r["segment_id"])
        for r in cat.read(spark, "ann_flat").select("segment_id").collect()
    }
    ivf_segs = {
        int(r["segment_id"])
        for r in cat.read(spark, "ann_ivf")
        .filter(F.col("list_id") == -1).select("segment_id").distinct().collect()
    }
    prev_stage = cat.read_manifest()["stages"].get("ann_ivf", {})
    carried = {k: v for k, v in prev_stage.items() if k not in ("status", "at")}
    carried["bf_fallback_segments"] = sorted(flat_segs - ivf_segs)
    carried["n_ivf_segments"] = len(ivf_segs)
    cat.mark_stage("ann_ivf", **carried)

    # tombstones whose rows were physically dropped here clear out; those
    # referencing untouched segments stay live (per-segment liveDocs)
    if (tomb is not None or tblobs is not None) and cat.exists("ann_tombstones"):
        live_ids = _ann_ids(spark, cat)
        remaining = (
            cat.read(spark, "ann_tombstones")
            .join(live_ids, "ext_id", "left_semi")
            .cache()
        )
        n_rem = remaining.count()
        cat.write(remaining, "ann_tombstones", lineage={"n": n_rem})
        remaining.unpersist()

    if rps != cat.read_manifest().get("config", {}).get("rows_per_segment"):
        cat.set_config(
            {**cat.read_manifest().get("config", {}), "rows_per_segment": rps}
        )

    # auto-compaction: once logically-dropped rows dominate the physical
    # tables, every read scans mostly dead data — rewrite to one compact
    # snapshot (Lucene file deletion / Iceberg rewrite_data_files)
    live_total = sum(
        n for s, n in nvecs_of.items() if s not in gkey_of
    ) + sum(counts.values())
    if dropped_vecs > cfg.compact_dropped_fraction * (dropped_vecs + live_total):
        compact_ann(spark, cat)
    cat.mark_stage(
        f"merge_ann_gen_{gen}",
        lineage={
            str(gi): {"merged_from": groups[gi], "new_segments": new_ids[gi]}
            for gi in range(len(groups))
        },
    )
    return new_ids


def compact_ann(spark: SparkSession, cat: IndexCatalog) -> None:
    """Compaction: materialize each ANN table's current logical state
    (appends folded in, dropped segments physically removed) into one
    fresh snapshot — reclaims merged-away bytes and resets the drop lists,
    like Iceberg's rewrite_data_files / Lucene's eventual file deletion.
    The merge generation stays monotone so later merges never mint an id a
    still-live earlier-generation segment holds."""
    gen = int(
        cat.read_manifest()["tables"].get("ann_flat", {}).get("ann_merge_gen", 0)
    )
    for table in ("ann_flat", "ann_ids", "ann_sq", "ann_bq", "ann_ivf",
                  "ann_graph", "ann_pq", "ann_ivfpq"):
        if not cat.exists(table):
            continue
        extra = {"ann_merge_gen": gen} if table == "ann_flat" else None
        cat.write(
            # merge_schema: pre-upgrade graph snapshots may lack layer/stride
            cat.read(spark, table, merge_schema=(table == "ann_graph")),
            table,
            sort_within_partitions=["segment_id"], extra_entry=extra,
        )


QPACK_SCHEMA = "qn int, q_ids binary, q_mat binary"
QPACK_CHUNK = 1024  # queries per packed row (bounds probe-pair row size)
PAIR_SCHEMA = "segment_id long, list_id int, q_id long, q_vec array<double>"


def _pack_query_batches(q: DataFrame) -> DataFrame:
    """Query rows → packed batch rows (ids blob + float64 matrix blob).
    The pack is the distributed-probe transport: small enough to broadcast
    to the centroid scan, so per-query probe ranking runs executor-side
    with ZERO driver state — the query side is never collected."""

    def pack(it):
        for pdf in it:
            for lo in range(0, len(pdf), QPACK_CHUNK):
                sub = pdf.iloc[lo : lo + QPACK_CHUNK]
                qm = np.stack(
                    [np.asarray(v, np.float64) for v in sub["q_vec"].to_numpy()]
                )
                yield pd.DataFrame(
                    {
                        "qn": [len(sub)],
                        "q_ids": [sub["q_id"].to_numpy(np.int64).tobytes()],
                        "q_mat": [qm.tobytes()],
                    }
                )

    return q.mapInPandas(pack, QPACK_SCHEMA)


def knn_join_ivf(
    spark: SparkSession,
    cat: IndexCatalog,
    queries: DataFrame,
    k: int = 3,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    nprobe: int | None = None,
    probe_mode: str = "auto",
    filter_ext_ids=None,
    filter_mode: str = "auto",
) -> DataFrame:
    """Scalable kNN join through the IVF sidecar (the bucketed composition
    ``knn_join``'s docstring promises): for every query row, its k nearest
    indexed vectors by the index metric → (q_id, vec_id, score, rank).

    ``filter_ext_ids`` restricts the INDEXED side for every query (the
    batch-inference "join against the lang=en subset" shape) — pre-
    semantics, same acceptDocs contract and two-tier transport as
    :func:`ann_topk` (set → closure; DataFrame → per-segment blobs joined
    onto the list rows, no driver set).

    Shape at scale — never an all-pairs crossJoin:
    1. one tiny centroids scan (pushed ``list_id = -1`` filter);
    2. every query picks its ``nprobe`` closest lists per segment;
    3. probe pairs are aggregated to ONE row per (segment_id, list_id)
       carrying the bundle of querying vectors, then broadcast-hash-joined
       to ``ann_ivf`` on the bucket key — each list blob crosses the wire
       exactly once regardless of how many queries probe it;
    4. per-list exact scoring (vectorized q-bundle × list matrix), then a
       windowed global top-k per query.

    ``probe_mode`` picks where step (2) runs, mirroring :func:`ann_topk`:

    - ``driver`` — centroid rows are collected ONCE (memoized) and probe
      ranking runs inside the query-side ``mapInPandas`` closure.
      Latency-optimal; driver/closure memory ∝ total centroids.
    - ``distributed`` — the query side is packed into batch rows
      (:func:`_pack_query_batches`) and broadcast against the pruned
      ``list_id = -1`` centroid scan; ranking runs next to the scan. NO
      state anywhere grows with segment count, but the packed query
      matrix must fit one broadcast — the many-segments × FEW-queries
      cell.
    - ``shuffle`` — fragment-and-replicate: centroid rows are hashed into
      ``R = spark.sql.shuffle.partitions`` buckets, each packed query
      chunk is replicated once per bucket, and the two sides meet in a
      shuffled equi-join on the bucket key. Per-task memory is one
      centroid fragment (∝ centroids / R) plus a streamed query chunk —
      NEITHER all-centroids NOR all-queries ever sits on one node, and
      nothing is broadcast or collected. The 10⁸-queries × 10⁶-segments
      batch-inference cell (the reference's per-leaf search state never
      lives on one node, ``CuVS2510GPUVectorsReader.search:398-523`` is
      per-segment; the probe work is inherently queries × segments, this
      tier just transports it without a global materialization).
    - ``auto`` — ``driver`` while the build-time segment count is at most
      ``PROBE_DRIVER_MAX_SEGMENTS``, else ``shuffle`` (safe on both axes).

    Approximate (probe recall), validated by containment against the exact
    oracle like the reference's randomized search tests."""
    metric = cat.read_manifest().get("config", {}).get("ann_metric", "l2")
    ivf = cat.read(spark, "ann_ivf") if cat.exists("ann_ivf") else None
    stage = cat.read_manifest()["stages"].get("ann_ivf", {})
    n_segs = stage.get("n_ivf_segments")
    if probe_mode not in ("auto", "driver", "distributed", "shuffle"):
        raise ValueError(f"unknown probe_mode {probe_mode!r}")
    shuffle = probe_mode == "shuffle" or (
        probe_mode == "auto"
        and n_segs is not None
        and n_segs > PROBE_DRIVER_MAX_SEGMENTS
    )
    distributed = probe_mode == "distributed" or shuffle
    # B2 degradation ladder: segments too small for an IVF index are
    # brute-forced — every query probes them as one pseudo-list (-2), so
    # their vectors are reachable exactly like ann_topk's bf fallback.
    # A stale manifest list (crash before the ann_ivf append) forces the
    # anti-join derivation, same reachability healing as ann_topk.
    bf_segs = stage.get("bf_fallback_segments")
    if not _derived_in_sync(cat, "ann_ivf"):
        bf_segs = None
    if bf_segs is None:
        flat_seg = {
            r["segment_id"]
            for r in cat.read(spark, "ann_flat").select("segment_id").collect()
        }
        if ivf is not None:
            ivf_seg = {
                int(r["segment_id"])
                for r in ivf.filter(F.col("list_id") == -1)
                .select("segment_id").collect()
            }
        else:
            ivf_seg = set()
        bf_segs = sorted(flat_seg - ivf_seg)
    bf_segs = [int(s) for s in bf_segs]
    tomb, tblobs = _resolve_tombstones(spark, cat)
    allowed, fblobs = _resolve_filter(spark, cat, filter_ext_ids, filter_mode)
    fixed_nprobe = nprobe

    q = queries.select(F.col(q_id).alias("q_id"), F.col(q_vec).alias("q_vec"))

    def _norm_qb(qb: np.ndarray) -> np.ndarray:
        if metric != "cosine":
            return qb
        # centroids/lists live in unit space; cosine is scale-invariant
        # in q, so the normalized bundle is also score-exact downstream
        nr = np.linalg.norm(qb, axis=1, keepdims=True)
        nr[nr == 0] = 1.0
        return qb / nr

    def _rank_lists(qb: np.ndarray, cents: np.ndarray, n_total: int) -> np.ndarray:
        npb = fixed_nprobe or max(
            1, min(cents.shape[0], ivf_pq_params(n_total, qb.shape[1])["n_probes"])
        )
        d = -2.0 * qb @ cents.T + (cents**2).sum(1)[None, :]
        return np.argsort(d, axis=1, kind="stable")[:, :npb]

    if distributed and ivf is not None:
        # probe ranking runs NEXT TO the pruned centroid scan; the query
        # pack is never collected to the driver — it arrives either as a
        # broadcast (distributed tier) or through the bucketed
        # fragment-and-replicate join (shuffle tier)
        qpack = _pack_query_batches(q)
        if shuffle:
            n_bkt = shuffle_partitions(spark)
            salt = F.array(*[F.lit(i) for i in range(n_bkt)])
            qpack = qpack.withColumn("rbkt", F.explode(salt))

        def _meet_queries(scan_df: DataFrame) -> DataFrame:
            """Pair every scan row with every query chunk. Shuffle tier:
            equi-join on the salt bucket — the scan side fragments by
            hash(segment_id), the chunk side is replicated per bucket, a
            shuffled hash join streams the chunks past each fragment
            (build side = the bounded fragment, hinted). Distributed
            tier: one executor-side broadcast of the whole pack."""
            if shuffle:
                frag = scan_df.withColumn(
                    "rbkt", F.pmod(F.hash("segment_id"), F.lit(n_bkt))
                )
                return frag.hint("shuffle_hash").join(qpack, "rbkt")
            return scan_df.crossJoin(F.broadcast(qpack))

        def probe_dist(it):
            for pdf in it:
                for r in pdf.itertuples():
                    qb = _norm_qb(
                        np.frombuffer(r.q_mat, np.float64).reshape(int(r.qn), -1)
                    )
                    qi_ids = np.frombuffer(r.q_ids, np.int64)
                    n_lists = int(r.n)
                    cents = (
                        np.frombuffer(r.vectors, np.float32)
                        .reshape(n_lists, qb.shape[1]).astype(np.float64)
                    )
                    raw = r.ext_ids
                    n_total = (
                        int(np.frombuffer(raw, np.int64)[0])
                        if raw else n_lists * 2000
                    )
                    probe = _rank_lists(qb, cents, n_total)
                    npb = probe.shape[1]
                    yield pd.DataFrame(
                        {
                            "segment_id": int(r.segment_id),
                            "list_id": probe.ravel().astype(np.int32),
                            "q_id": np.repeat(qi_ids, npb),
                            "q_vec": list(np.repeat(qb, npb, axis=0)),
                        }
                    )

        pairs = _meet_queries(
            ivf.filter(F.col("list_id") == -1)
            .select("segment_id", "n", "ext_ids", "vectors")
        ).mapInPandas(probe_dist, PAIR_SCHEMA)
        if bf_segs:

            def bf_dist(it):
                for pdf in it:
                    for r in pdf.itertuples():
                        qb = _norm_qb(
                            np.frombuffer(r.q_mat, np.float64).reshape(int(r.qn), -1)
                        )
                        qi_ids = np.frombuffer(r.q_ids, np.int64)
                        yield pd.DataFrame(
                            {
                                "segment_id": int(r.segment_id),
                                "list_id": np.int32(-2),
                                "q_id": qi_ids,
                                "q_vec": list(qb),
                            }
                        )

            bf_df = spark.createDataFrame(
                [(int(s),) for s in bf_segs], "segment_id long"
            )
            pairs = pairs.unionByName(
                _meet_queries(bf_df).mapInPandas(bf_dist, PAIR_SCHEMA)
            )
    else:
        crows = _centroid_rows(spark, cat) if ivf is not None else []
        if not crows and not bf_segs:
            return spark.createDataFrame(
                [], "q_id long, vec_id long, score double, rank int"
            )
        # compact centroid pack in the task closure; the query side is
        # still never collected (latency mode — closure ∝ total segments)
        cent_pack = []
        for r in crows:
            raw = r["ext_ids"]
            n_lists = int(r["n"])
            n_total = int(np.frombuffer(raw, np.int64)[0]) if raw else n_lists * 2000
            cent_pack.append(
                (int(r["segment_id"]), n_lists, n_total, bytes(r["vectors"]))
            )

        def probe_fn(it):
            # per query batch: nprobe closest lists in every segment
            # (vectorized (Q, L) distance per segment)
            for pdf in it:
                if not len(pdf):
                    continue
                qb = _norm_qb(
                    np.stack(
                        [np.asarray(v, dtype=np.float64) for v in pdf["q_vec"].to_numpy()]
                    )
                )
                dim = qb.shape[1]
                qi_ids = pdf["q_id"].to_numpy(np.int64)
                for seg, n_lists, n_total, blob in cent_pack:
                    cents = np.frombuffer(blob, np.float32).reshape(n_lists, dim).astype(np.float64)
                    probe = _rank_lists(qb, cents, n_total)
                    npb = probe.shape[1]
                    yield pd.DataFrame(
                        {
                            "segment_id": seg,
                            "list_id": probe.ravel().astype(np.int32),
                            "q_id": np.repeat(qi_ids, npb),
                            "q_vec": list(np.repeat(qb, npb, axis=0)),
                        }
                    )
                for seg in bf_segs:  # every query scans the index-less segments
                    yield pd.DataFrame(
                        {
                            "segment_id": seg,
                            "list_id": np.int32(-2),
                            "q_id": qi_ids,
                            "q_vec": list(qb),
                        }
                    )

        pairs = q.mapInPandas(probe_fn, PAIR_SCHEMA)
    # ONE row per probed bucket carrying its query bundle: the fat list
    # blob joins exactly once however many queries probe it. AQE picks
    # broadcast vs shuffled hash join by bundle size.
    bundle = pairs.groupBy("segment_id", "list_id").agg(
        F.collect_list(F.struct("q_id", "q_vec")).alias("qs")
    )
    lists = ivf.filter(F.col("list_id") >= 0) if ivf is not None else None
    if lists is not None and not _derived_in_sync(cat, "ann_ivf"):
        # stale ann_ivf: drop merged-away segments' lists (see ann_topk)
        lists = lists.join(
            cat.read(spark, "ann_flat").select("segment_id"),
            "segment_id", "left_semi",
        )
    if bf_segs:
        flat_lists = (
            cat.read(spark, "ann_flat")
            .filter(F.col("segment_id").isin(bf_segs))
            .select(
                "segment_id",
                F.lit(-2).cast("int").alias("list_id"),
                F.col("n_vecs").alias("n"),
                "ext_ids",
                "vectors",
            )
        )
        lists = flat_lists if lists is None else lists.unionByName(flat_lists)
    # blob tiers ride the list rows; segments with no allowed id are
    # pruned from the join entirely (inner), tombstones LEFT-join
    lists = _attach_aux(lists, fblobs, tblobs)
    sel = lists.join(bundle, ["segment_id", "list_id"])

    def score(it):
        for pdf in it:
            for r in pdf.itertuples():
                dim = len(r.qs[0]["q_vec"])
                x = np.frombuffer(r.vectors, np.float32).reshape(r.n, dim)
                ids = np.frombuffer(r.ext_ids, np.int64)
                acc = _row_accept(pdf, r, ids, allowed, tomb)
                if acc is not None:
                    if not acc.any():
                        continue
                    if not acc.all():
                        ids, x = ids[acc], x[acc]
                qids_h = np.array([s["q_id"] for s in r.qs], dtype=np.int64)
                qs = np.array([s["q_vec"] for s in r.qs], dtype=np.float64)
                x64 = x.astype(np.float64)
                if metric == "l2":
                    d = -2.0 * qs @ x64.T + (x64**2).sum(1)[None, :] + (qs**2).sum(1)[:, None]
                    s = 1.0 / (1.0 + np.maximum(d, 0.0))  # (Q_here, n)
                elif metric == "cosine":
                    num = qs @ x64.T
                    den = np.linalg.norm(qs, axis=1)[:, None] * np.linalg.norm(x64, axis=1)[None, :]
                    den[den == 0] = 1.0
                    s = num / den
                else:
                    s = qs @ x64.T
                m = min(k, ids.size)
                for qi in range(qids_h.size):
                    top = np.lexsort((ids, -s[qi]))[:m]
                    yield pd.DataFrame(
                        {"q_id": int(qids_h[qi]), "vec_id": ids[top], "score": s[qi][top]}
                    )

    from pyspark.sql import Window

    partials = sel.mapInPandas(score, "q_id long, vec_id long, score double")
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", F.round("score", 6).alias("score"), "rank")
    )


def knn_join(
    queries: DataFrame,
    vectors: DataFrame,
    k: int = 3,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    v_id: str = "vec_id",
    v_vec: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Exact similarity join: for every query row, its k nearest vectors →
    (q_id, vec_id, score, rank). Query side is broadcast (small); the big
    side streams through a codegen'd projection + windowed top-k.
    This is the EXACT path for small query sets (≤ ~10^3); for large query
    sides use :func:`knn_join_ivf`, which equi-joins through the IVF bucket
    key instead of scanning the full vector side per query batch.
    ``metric``: cosine similarity, or l2 (score = 1/(1+d²), S5)."""
    from pyspark.sql import Window

    q = queries.select(F.col(q_id).alias("q_id"), F.col(q_vec).alias("q_vec"))
    v = vectors.select(F.col(v_id).alias("vec_id"), F.col(v_vec).alias("v_vec"))
    pair = v.crossJoin(F.broadcast(q))
    to64 = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    if metric == "l2":
        d2 = F.aggregate(
            F.zip_with(to64("v_vec"), to64("q_vec"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        scored = pair.select("q_id", "vec_id", (F.lit(1.0) / (F.lit(1.0) + d2)).alias("score"))
    elif metric == "cosine":
        dot = F.aggregate(F.zip_with(to64("v_vec"), to64("q_vec"), lambda a, b: a * b),
                          F.lit(0.0), lambda acc, x: acc + x)
        nv = F.sqrt(F.aggregate(F.transform(to64("v_vec"), lambda a: a * a),
                                F.lit(0.0), lambda acc, x: acc + x))
        nq = F.sqrt(F.aggregate(F.transform(to64("q_vec"), lambda a: a * a),
                                F.lit(0.0), lambda acc, x: acc + x))
        scored = pair.select(
            "q_id", "vec_id", (dot / (nv * nq)).alias("score")
        )
    else:
        raise ValueError(metric)
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", F.round("score", 6).alias("score"), "rank")
    )


def exact_knn_expr(
    vectors: DataFrame,
    query: list[float],
    k: int,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Brute-force top-k as a PURE Catalyst expression (zip_with/aggregate —
    whole-stage codegen, zero Python): the JVM-side baseline path the
    DuckDB oracle checks directly."""
    qcol = F.array(*[F.lit(float(v)) for v in query])
    vec64 = F.transform(F.col(vector_col), lambda a: a.cast("double"))
    dot = F.aggregate(
        F.zip_with(vec64, qcol, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    if metric == "dot":
        score = dot
    elif metric == "cosine":
        nv = F.sqrt(
            F.aggregate(
                F.transform(vec64, lambda a: a * a),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
        nq = float(np.linalg.norm(np.asarray(query, dtype=np.float64)))
        score = dot / (nv * F.lit(nq))
    else:
        raise ValueError(metric)
    return (
        vectors.select(F.col(id_col), score.alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )

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

from cuvs_lucene_spark.config import AnnParams, IndexConfig, choose_build_algo, ivf_pq_params
from cuvs_lucene_spark.functions.quantize import scalar_quantize
from cuvs_lucene_spark.sources.catalog import IndexCatalog

FLAT_SCHEMA = "segment_id long, n_vecs int, dim int, ext_ids binary, vectors binary"
SQ_SCHEMA = "segment_id long, n_vecs int, dim int, mins binary, maxs binary, codes binary"
BQ_SCHEMA = "segment_id long, n_vecs int, dim int, centroid binary, codes binary"
IVF_SCHEMA = (
    "segment_id long, list_id int, n int, ext_ids binary, vectors binary"
)
CENTROIDS_SCHEMA = "segment_id long, n_lists int, dim int, centroids binary"
TOPK_SCHEMA = "segment_id long, ext_id long, score double"


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
    cat = IndexCatalog(index_root)
    validate_vectors(vectors, vector_col, id_col, ann)
    rps = rows_per_segment or cfg.rows_per_segment
    base = vectors.select(
        F.col(id_col).cast("long").alias("ext_id"),
        F.col(vector_col).alias("vector"),
    ).withColumn("segment_id", (F.col("ext_id") / F.lit(rps)).cast("long"))

    def build_flat(pdf: pd.DataFrame) -> pd.DataFrame:
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

    flat = base.groupBy("segment_id").applyInPandas(build_flat, FLAT_SCHEMA)
    cat.write(flat, "ann_flat")
    cat.mark_stage("ann_flat")

    # derived stages read the committed flat blobs (merge reads flat only, M4)
    flat_df = cat.read(spark, "ann_flat")

    def build_sq(it):
        for pdf in it:
            for r in pdf.itertuples():
                x = np.frombuffer(r.vectors, np.float32).reshape(r.n_vecs, r.dim)
                q, mins, maxs = scalar_quantize(x)
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

    cat.write(flat_df.mapInPandas(build_sq, SQ_SCHEMA), "ann_sq")
    cat.mark_stage("ann_sq")

    def build_bq(it):
        # binary-quantized variant (B9): mean-centroid sign bits packed
        # 8/byte — the LuceneAcceleratedHNSWBinaryQuantized analogue
        from cuvs_lucene_spark.functions.quantize import binary_quantize

        for pdf in it:
            for r in pdf.itertuples():
                x = np.frombuffer(r.vectors, np.float32).reshape(r.n_vecs, r.dim)
                packed, centroid = binary_quantize(x)
                yield pd.DataFrame(
                    {
                        "segment_id": [r.segment_id],
                        "n_vecs": [r.n_vecs],
                        "dim": [r.dim],
                        "centroid": [centroid.astype(np.float32).tobytes()],
                        "codes": [packed.tobytes()],
                    }
                )

    cat.write(flat_df.mapInPandas(build_bq, BQ_SCHEMA), "ann_bq")
    cat.mark_stage("ann_bq")

    seed = ann.seed
    kmeans_iters = ann.kmeans_iters
    min_sz = ann.min_ann_index_size

    def build_ivf(it):
        for pdf in it:
            for r in pdf.itertuples():
                x = np.frombuffer(r.vectors, np.float32).reshape(r.n_vecs, r.dim)
                ids = np.frombuffer(r.ext_ids, np.int64)
                n = x.shape[0]
                if n < min_sz:
                    continue  # B2 fallback: brute force only for tiny segments
                p = ivf_pq_params(n, x.shape[1])
                n_lists = min(p["n_lists"], n)
                cents = _kmeans(x, n_lists, kmeans_iters, seed, p["kmeans_trainset_fraction"])
                d = -2.0 * x @ cents.T + (cents**2).sum(1)[None, :]
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
                yield pd.DataFrame(
                    {
                        "segment_id": [r.segment_id],
                        "list_id": [-1],
                        "n": [n_lists],
                        "ext_ids": [b""],
                        "vectors": [cents.astype(np.float32).tobytes()],
                    }
                )

    cat.write(flat_df.mapInPandas(build_ivf, IVF_SCHEMA), "ann_ivf")
    cat.mark_stage("ann_ivf")
    cat.mark_stage("ann_build")
    return cat


# ---------------------------------------------------------------------------
# Search
# ---------------------------------------------------------------------------


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
    filter_ext_ids: set[int] | None = None,
) -> DataFrame:
    """Top-k nearest vectors → DataFrame(ext_id, score), score desc.

    ``mode``: ``exact`` (brute force, S4), ``ivf`` (coarse probe, S3), or
    ``auto`` (S1 routing: IVF when available and k ≤ max_k_ann).
    """
    cfg = cfg or IndexConfig()
    ann = cfg.ann
    q = np.asarray(query, dtype=np.float32)
    if k <= 0:
        return spark.createDataFrame([], "ext_id long, score double")  # S9
    use_ivf = mode == "ivf" or (mode == "auto" and k <= ann.max_k_ann and cat.exists("ann_ivf"))
    eff_k = k
    allowed = None
    if filter_ext_ids is not None:
        allowed = np.array(sorted(filter_ext_ids), dtype=np.int64)
        eff_k = min(k + cfg.overfetch, allowed.size)  # S2 widening

    if use_ivf and cat.exists("ann_ivf") and mode != "exact":
        ivf = cat.read(spark, "ann_ivf")
        if ivf.isEmpty():
            use_ivf = False
    else:
        use_ivf = False

    if not use_ivf:
        flat = cat.read(spark, "ann_flat")

        def scan(it):
            for pdf in it:
                for r in pdf.itertuples():
                    x = np.frombuffer(r.vectors, np.float32).reshape(r.n_vecs, r.dim)
                    ids = np.frombuffer(r.ext_ids, np.int64)
                    s = _scores(x, q, metric)
                    if allowed is not None:
                        pos = np.searchsorted(allowed, ids)
                        pos = np.minimum(pos, allowed.size - 1) if allowed.size else pos
                        m = (allowed[pos] == ids) if allowed.size else np.zeros(ids.size, bool)
                        ids, s = ids[m], s[m]
                    if ids.size == 0:
                        continue
                    top = np.argsort(-s, kind="stable")[:eff_k]
                    yield pd.DataFrame(
                        {"segment_id": r.segment_id, "ext_id": ids[top], "score": s[top]}
                    )

        partials = flat.mapInPandas(scan, TOPK_SCHEMA)
    else:
        npb = nprobe
        if npb is None:
            npb = None  # resolved per segment from its params

        def probe(pdf: pd.DataFrame) -> pd.DataFrame:
            seg = int(pdf["segment_id"].iloc[0])
            cent_row = pdf[pdf["list_id"] == -1]
            lists = pdf[pdf["list_id"] >= 0]
            if cent_row.empty or lists.empty:
                return pd.DataFrame({"segment_id": [], "ext_id": [], "score": []}).astype(
                    {"segment_id": "int64", "ext_id": "int64", "score": "float64"}
                )
            n_lists = int(cent_row["n"].iloc[0])
            dim = q.size
            cents = np.frombuffer(cent_row["vectors"].iloc[0], np.float32).reshape(n_lists, dim)
            n_total = int(lists["n"].sum())
            p = ivf_pq_params(n_total, dim)
            n_probe = npb or max(1, min(n_lists, p["n_probes"]))
            cd = ((cents - q[None, :]) ** 2).sum(1)
            probe_ids = set(np.argsort(cd, kind="stable")[:n_probe].tolist())
            sel = lists[lists["list_id"].isin(probe_ids)]
            xs, idl = [], []
            for r in sel.itertuples():
                xs.append(np.frombuffer(r.vectors, np.float32).reshape(r.n, dim))
                idl.append(np.frombuffer(r.ext_ids, np.int64))
            x = np.concatenate(xs)
            ids = np.concatenate(idl)
            s = _scores(x, q, metric)
            if allowed is not None:
                pos = np.searchsorted(allowed, ids)
                pos = np.minimum(pos, allowed.size - 1) if allowed.size else pos
                m = (allowed[pos] == ids) if allowed.size else np.zeros(ids.size, bool)
                ids, s = ids[m], s[m]
            top = np.argsort(-s, kind="stable")[:eff_k]
            return pd.DataFrame({"segment_id": seg, "ext_id": ids[top], "score": s[top]})

        partials = cat.read(spark, "ann_ivf").groupBy("segment_id").applyInPandas(probe, TOPK_SCHEMA)

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
) -> DataFrame:
    """Top-k over binary-quantized codes by Hamming distance (the
    coarse/compressed search path of the BQ format). Approximate —
    validated by containment against the exact oracle, like the
    reference's quantized-format tests (TestQuantizedVectorsFormats)."""
    cfg = cfg or IndexConfig()
    q = np.asarray(query, dtype=np.float32)
    if k <= 0:
        return spark.createDataFrame([], "ext_id long, hamming int")
    bq = cat.read(spark, "ann_bq")
    flat = cat.read(spark, "ann_flat").select("segment_id", "ext_ids")
    from pyspark.sql import functions as F2

    def scan(key, bqp: pd.DataFrame, fp: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"segment_id": [], "ext_id": [], "hamming": []}).astype(
            {"segment_id": "int64", "ext_id": "int64", "hamming": "int32"}
        )
        if bqp.empty or fp.empty:
            return empty
        r = bqp.iloc[0]
        codes = np.frombuffer(r["codes"], np.uint8).reshape(r["n_vecs"], -1)
        centroid = np.frombuffer(r["centroid"], np.float32)
        ids = np.frombuffer(fp.iloc[0]["ext_ids"], np.int64)
        qbits = np.packbits(q > centroid)
        ham = np.unpackbits(codes ^ qbits[None, :], axis=1).sum(1)
        top = np.lexsort((ids, ham))[:k]
        return pd.DataFrame(
            {"segment_id": int(r["segment_id"]), "ext_id": ids[top],
             "hamming": ham[top].astype(np.int32)}
        )

    partials = (
        bq.groupby("segment_id")
        .cogroup(flat.groupby("segment_id"))
        .applyInPandas(scan, "segment_id long, ext_id long, hamming int")
    )
    return (
        partials.orderBy(F2.asc("hamming"), F2.asc("ext_id"))
        .limit(k)
        .select("ext_id", "hamming")
    )


def merge_ann(
    spark: SparkSession,
    cat: IndexCatalog,
    cfg: IndexConfig | None = None,
    tombstone_ext_ids: set[int] | None = None,
) -> None:
    """Merge all ANN segments into one: read the flat vector storage
    (never the derived indexes — M4), drop tombstoned ids (M5), rebuild
    every derived structure from the merged raw vectors — exactly the
    reference's merge-as-rebuild (``vectorBasedMerge``, M2: flat-merge
    then full rebuild via the flush path)."""
    cfg = cfg or IndexConfig()
    tomb = (
        np.array(sorted(tombstone_ext_ids), dtype=np.int64)
        if tombstone_ext_ids
        else None
    )

    def explode_flat(it):
        # distributed un-packing of the flat blobs back into rows — the
        # MergedVectorValues concatenation, delete-filtered (M2/M5)
        for pdf in it:
            for r in pdf.itertuples():
                ids = np.frombuffer(r.ext_ids, np.int64)
                x = np.frombuffer(r.vectors, np.float32).reshape(r.n_vecs, r.dim)
                if tomb is not None and tomb.size:
                    keep = ~np.isin(ids, tomb)
                    ids, x = ids[keep], x[keep]
                yield pd.DataFrame({"ext_id": ids, "vector": list(map(list, x))})

    merged = cat.read(spark, "ann_flat").mapInPandas(
        explode_flat, "ext_id long, vector array<float>"
    )
    n_total = int(cat.read(spark, "ann_flat").agg(F.sum("n_vecs")).collect()[0][0] or 0)
    build_ann(
        spark, merged, cat.root, cfg, id_col="ext_id", vector_col="vector",
        rows_per_segment=max(cfg.rows_per_segment, n_total + 1),
    )


def knn_join(
    queries: DataFrame,
    vectors: DataFrame,
    k: int = 3,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    v_id: str = "vec_id",
    v_vec: str = "embedding",
) -> DataFrame:
    """Similarity join: for every query row, its k nearest vectors by
    cosine → (q_id, vec_id, score, rank). Query side is broadcast (small);
    the big side streams through a codegen'd projection + windowed top-k —
    the scalable brute-force kNN-join shape (IVF bucketing composes on top
    for 10^12-row sides)."""
    from pyspark.sql import Window

    q = queries.select(F.col(q_id).alias("q_id"), F.col(q_vec).alias("q_vec"))
    v = vectors.select(F.col(v_id).alias("vec_id"), F.col(v_vec).alias("v_vec"))
    pair = v.crossJoin(F.broadcast(q))
    to64 = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    dot = F.aggregate(F.zip_with(to64("v_vec"), to64("q_vec"), lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    nv = F.sqrt(F.aggregate(F.transform(to64("v_vec"), lambda a: a * a),
                            F.lit(0.0), lambda acc, x: acc + x))
    nq = F.sqrt(F.aggregate(F.transform(to64("q_vec"), lambda a: a * a),
                            F.lit(0.0), lambda acc, x: acc + x))
    scored = pair.select(
        "q_id", "vec_id", (dot / (nv * nq)).alias("score")
    )
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

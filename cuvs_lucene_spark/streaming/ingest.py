"""Incremental / streaming index ingest.

The reference has no streaming — it is batch with incremental segments:
every Lucene commit flushes a NEW immutable segment
(``TestCuVSVectorsFormat.java:50-64`` asserts 2 leaves after 2 commits;
SURVEY.md §1.1). That model maps exactly onto Structured Streaming's
micro-batches: *micro-batch epoch ≙ Lucene commit*. Each epoch builds its
own segments (same per-segment kernel as the batch path) and appends them
to the catalog atomically via ``foreachBatch`` — queries see a consistent
snapshot per manifest commit, and the hierarchical merge (operators.merge)
later compacts the accumulated small segments, exactly like Lucene's
background merges.

Epoch segments are namespaced ``segment_id = STREAM_BASE +
(epoch + 1) * EPOCH_STRIDE + local`` — a range disjoint by construction
from both the batch range segmenter (ids ≪ 2^40 for any sane
ext_id/rows_per_segment) and the zero-shuffle partition segmenter
(``segments.PARTITION_BASE`` = 2^40 ≤ id < 2^41), so mixing a batch-built
index with streaming appends can never alias two different segments onto
one id (which would silently merge their per-segment blobs).

Exactly-once: foreachBatch is AT-LEAST-once, so every epoch append is
tagged ``epoch_N`` and :meth:`IndexCatalog.append` replaces (not
duplicates) the increment on redelivery; a fully committed epoch is
skipped via its manifest stage checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuvs_lucene_spark.config import IndexConfig
from cuvs_lucene_spark.functions.tokenize import doclen_expr
from cuvs_lucene_spark.operators.segments import (
    SEGDATA_SCHEMA,
    SEGDATA_VIEWS,
    build_segment_pdf,
)
from cuvs_lucene_spark.sources.catalog import IndexCatalog

EPOCH_STRIDE = 1 << 20
STREAM_BASE = 1 << 41


def incremental_add(
    spark: SparkSession,
    cat: IndexCatalog,
    docs: DataFrame,
    cfg: IndexConfig,
    epoch: int,
    content_col: str = "content",
    id_col: str = "ext_id",
) -> None:
    """Build one epoch's segments from a (micro-)batch and append them.

    Same kernels as the batch build (B1-B8); only the segment namespace and
    the commit mode (tagged append vs overwrite) differ. Idempotent per
    epoch: a redelivered epoch replaces its own increment (see module
    docstring), so a crash between manifest commit and streaming
    checkpoint commit cannot double postings/norms rows.
    """
    if cat.stage_done(f"epoch_{epoch}"):
        return  # epoch fully committed earlier — redelivery is a no-op
    base = docs.select(
        F.col(id_col).cast("long").alias("ext_id"),
        F.col(content_col).cast("string").alias("content"),
    )
    seg_base = STREAM_BASE + (epoch + 1) * EPOCH_STRIDE
    base = base.withColumn(
        "segment_id",
        F.lit(seg_base)
        + F.pmod(
            (F.col("ext_id") / F.lit(cfg.rows_per_segment)).cast("long"),
            F.lit(EPOCH_STRIDE),
        ),
    )
    enriched = base.select(
        "segment_id",
        "ext_id",
        "content",
        F.sha2(F.col("content"), 256).alias("sha256"),
        doclen_expr("content").cast("int").alias("dl"),
    )
    segdata = enriched.groupBy("segment_id").applyInPandas(
        lambda pdf: build_segment_pdf(pdf, cfg), SEGDATA_SCHEMA
    ).sortWithinPartitions("kind", "term_bucket", "term", "segment_id", "block_id", "doc_id")
    if not cat.exists("segdata"):
        # empty base snapshot + views, so every epoch (including the first)
        # lands as a tagged, replace-on-redelivery increment
        cat.write(spark.createDataFrame([], SEGDATA_SCHEMA), "segdata")
        for name, (where, select) in SEGDATA_VIEWS.items():
            cat.define_view(name, "segdata", where, select)
    cat.append(segdata, "segdata", tag=f"epoch_{epoch}")
    # positions sidecar maintenance: when the index opted into positions
    # (build_positions ran), every epoch appends its segments' position
    # rows too — same idempotent tag discipline, so phrase queries never
    # see a streamed segment the sidecar doesn't cover. A crash between
    # the two appends is healed by redelivery (tag replaces); a permanent
    # gap degrades to PositionsStaleError, never to wrong results.
    if cat.exists("positions"):
        from cuvs_lucene_spark.operators.positions import (
            POS_SCHEMA,
            build_positions_pdf,
        )

        # build only segments the sidecar does not cover yet: a crash
        # between the two appends followed by a manual refresh_positions
        # (untagged rows) must not be doubled by this epoch's redelivery —
        # coverage, not the tag, is the idempotency authority. And when
        # everything is already covered, do NOT re-append: an empty
        # tag-replace would wipe the earlier increment's rows.
        covered = cat.read(spark, "positions").select("segment_id").distinct()
        missing = (
            base.select("segment_id").distinct()
            .join(covered, "segment_id", "left_anti")
        )
        if missing.limit(1).count() > 0:
            pos = (
                base.select("segment_id", "ext_id", F.col("content").alias("text"))
                .join(F.broadcast(missing), "segment_id", "left_semi")
                .groupBy("segment_id")
                .applyInPandas(lambda p: build_positions_pdf(p), POS_SCHEMA)
            )
            cat.append(pos, "positions", tag=f"epoch_{epoch}")
    cat.mark_stage(f"epoch_{epoch}", n_epoch=epoch)


def incremental_add_vectors(
    spark: SparkSession,
    cat: IndexCatalog,
    vectors: DataFrame,
    cfg: IndexConfig,
    epoch: int,
    id_col: str = "ext_id",
    vector_col: str = "vector",
) -> None:
    """Streaming ANN ingest: micro-batch epoch ≙ codec flush. The
    reference's codec builds a fresh per-segment vector index at EVERY
    Lucene commit (SURVEY §3.1); here each epoch's vectors become new ann
    segments — flat + SQ + BQ + IVF rows — appended to the sidecar tables
    with the same idempotent epoch tags as the text path (redelivery
    replaces, committed epochs skip). Per-segment structures are
    independent, so appended segments need no rebuild of earlier ones;
    ``merge_ann`` later compacts, exactly like text segments."""
    from cuvs_lucene_spark.operators.ann import (
        ANN_FORMAT_VERSION,
        BQ_SCHEMA,
        FLAT_SCHEMA,
        IVF_SCHEMA,
        SQ_SCHEMA,
        _bq_rows,
        _ivf_rows,
        _sq_rows,
        build_flat_pdf,
        validate_vectors,
    )

    if cat.stage_done(f"ann_epoch_{epoch}"):
        return
    validate_vectors(vectors, vector_col, id_col, cfg.ann)
    m = cat.read_manifest()
    if "ann_metric" not in m.get("config", {}):
        if cfg.ann.metric == "dot":
            # same guard as build_ann: MIP has no normalize-to-L2
            # reduction, the derived structures would rank wrong-metric
            raise ValueError(
                "metric 'dot' is supported on exact scans only; build the "
                "index with 'l2' or 'cosine'"
            )
        cat.set_config(
            {
                **m.get("config", {}),
                "ann_metric": cfg.ann.metric,
                "ann_format": ANN_FORMAT_VERSION,
                "rows_per_segment": cfg.rows_per_segment,
            }
        )
    seg_base = STREAM_BASE + (epoch + 1) * EPOCH_STRIDE
    base = vectors.select(
        F.col(id_col).cast("long").alias("ext_id"),
        F.col(vector_col).alias("vector"),
    ).withColumn(
        "segment_id",
        F.lit(seg_base)
        + F.pmod(
            (F.col("ext_id") / F.lit(cfg.rows_per_segment)).cast("long"),
            F.lit(EPOCH_STRIDE),
        ),
    )

    flat = base.groupBy("segment_id").applyInPandas(build_flat_pdf, FLAT_SCHEMA).cache()
    if cat.exists("ann_flat") and not cat.exists("ann_ids"):
        # pre-v3 catalog: materialize the FULL map from the existing flat
        # blobs before this epoch appends — seeding an empty table here
        # would disable the self-heal and silently prune the pre-existing
        # segments from every future DataFrame-filtered query
        from cuvs_lucene_spark.operators.ann import _ann_ids

        _ann_ids(spark, cat)
    for table, schema in (
        ("ann_flat", FLAT_SCHEMA),
        ("ann_ids", "segment_id long, ext_id long"),
        ("ann_sq", SQ_SCHEMA),
        ("ann_bq", BQ_SCHEMA),
        ("ann_ivf", IVF_SCHEMA),
    ):
        if not cat.exists(table):
            cat.write(spark.createDataFrame([], schema), table)
    tag = f"ann_epoch_{epoch}"
    # derived structures follow the CATALOG's metric (set at first epoch /
    # batch build), never the per-call cfg — similarity is index state
    metric = cat.read_manifest().get("config", {}).get("ann_metric", "l2")
    cat.append(flat, "ann_flat", tag=tag)
    # the DataFrame-filter tier's row-level map follows every flat append —
    # a stale ann_ids would silently prune the new segments from filtered
    # queries (its blob join is an inner join)
    cat.append(base.select("segment_id", "ext_id"), "ann_ids", tag=tag)
    cat.append(_sq_rows(flat, metric), "ann_sq", tag=tag)
    cat.append(_bq_rows(flat, metric), "ann_bq", tag=tag)
    cat.append(_ivf_rows(flat, cfg.ann, metric), "ann_ivf", tag=tag)
    # derived graph/PQ structures (if built on this catalog) get this
    # epoch's segments too — per-segment independence means we only build
    # over the NEW flat rows and append
    if cat.exists("ann_graph"):
        from cuvs_lucene_spark.operators.ann_graph import _graph_rows

        cat.append(_graph_rows(flat, cfg, metric=metric), "ann_graph", tag=tag)
    if cat.exists("ann_pq"):
        from cuvs_lucene_spark.operators.ann import _pq_rows

        cat.append(_pq_rows(flat, cfg, metric), "ann_pq", tag=tag)
    if cat.exists("ann_ivfpq") and cat.exists("ann_pq"):
        # combined IVF-PQ lists for the NEW segments only: re-read the
        # JUST-COMMITTED ivf lists and pq codebooks filtered to this
        # epoch's segment range — never re-run the k-means clustering that
        # produced them (it is the dominant CPU cost of ingest)
        from cuvs_lucene_spark.operators.ann import _ivfpq_rows

        in_epoch = (F.col("segment_id") >= seg_base) & (
            F.col("segment_id") < seg_base + EPOCH_STRIDE
        )
        cat.append(
            _ivfpq_rows(
                cat.read(spark, "ann_ivf").filter(in_epoch),
                cat.read(spark, "ann_pq").filter(in_epoch),
                metric,
            ),
            "ann_ivfpq",
            tag=tag,
        )
    # maintain the B2 brute-force fallback list for sub-min-size segments
    flat_segs = {int(r["segment_id"]) for r in flat.select("segment_id").collect()}
    ivf_segs = {
        int(r["segment_id"])
        for r in cat.read(spark, "ann_ivf")
        .filter(F.col("list_id") == -1)
        .select("segment_id")
        .distinct()
        .collect()
    }
    prev_stage = cat.read_manifest()["stages"].get("ann_ivf", {})
    prev = set(prev_stage.get("bf_fallback_segments", []))
    # mark_stage REPLACES the stage dict — carry the other metrics forward
    # (n_ivf_segments drives probe_mode=auto's driver→distributed
    # escalation; losing it would pin a streaming-grown catalog to the
    # driver-side probe forever)
    carried = {
        k: v for k, v in prev_stage.items() if k not in ("status", "at")
    }
    carried["bf_fallback_segments"] = sorted(prev | (flat_segs - ivf_segs))
    carried["n_ivf_segments"] = len(ivf_segs)
    cat.mark_stage("ann_ivf", **carried)
    flat.unpersist()
    cat.mark_stage(f"ann_epoch_{epoch}", n_epoch=epoch)


def stream_build(
    spark: SparkSession,
    stream: DataFrame,
    index_root: str,
    cfg: IndexConfig | None = None,
    content_col: str = "content",
    id_col: str = "ext_id",
    checkpoint_dir: str | None = None,
):
    """Attach the incremental ingest to a streaming DataFrame.

    Returns the StreamingQuery; call ``processAllAvailable()`` to drain in
    tests. Exactly-once per epoch: foreachBatch (at-least-once) + the
    catalog's idempotent tagged append — a redelivered epoch replaces its
    own increment or is skipped when already fully committed."""
    cfg = cfg or IndexConfig()
    cat = IndexCatalog(index_root)

    def on_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        incremental_add(spark, cat, batch_df, cfg, int(epoch_id), content_col, id_col)

    writer = stream.writeStream.foreachBatch(on_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start(), cat

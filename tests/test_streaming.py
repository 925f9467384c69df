"""Streaming ingest: micro-batch epochs ≙ Lucene commits. The streamed
index must answer queries identically to a batch build over the same docs
(SURVEY.md §1.1 segment model)."""

import os

import pytest
from pyspark.sql import functions as F

from cuvs_lucene_spark.config import IndexConfig
from cuvs_lucene_spark.operators.bm25 import bm25_topk
from cuvs_lucene_spark.operators.merge import force_merge
from cuvs_lucene_spark.operators.segments import build_index
from cuvs_lucene_spark.streaming.ingest import incremental_add, stream_build
from cuvs_lucene_spark.sources.catalog import IndexCatalog

from tests.conftest import SF_DIR

CFG = IndexConfig(rows_per_segment=100, block_size=16, prune_range=64, term_buckets=8)


def _topk(spark, cat, terms, k=10):
    return [
        (r["ext_id"], round(r["score"], 6))
        for r in bm25_topk(spark, cat, terms, k=k, cfg=CFG).collect()
    ]


def test_incremental_epochs_equal_batch(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cat = IndexCatalog(str(tmp_path / "inc"))
    # three manual epochs (commit-per-batch)
    for epoch, (lo, hi) in enumerate([(0, 170), (170, 340), (340, 10_000)]):
        batch = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        incremental_add(spark, cat, batch, CFG, epoch, content_col="text", id_col="doc_id")
    batch_cat = build_index(
        spark, docs, str(tmp_path / "batch"), CFG, content_col="text", id_col="doc_id"
    )
    for terms in (["join", "vector"], ["dup"], ["spark", "customer", "dup"]):
        assert _topk(spark, cat, terms) == _topk(spark, batch_cat, terms)
    # post-stream compaction (Lucene background merge analogue)
    force_merge(spark, cat, CFG)
    assert _topk(spark, cat, ["join", "vector"]) == _topk(spark, batch_cat, ["join", "vector"])


def test_structured_streaming_ingest(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    src = str(tmp_path / "src")
    docs.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumnRenamed("doc_id", "ext_id")
        .withColumnRenamed("text", "content")
    )
    q, cat = stream_build(
        spark, stream, str(tmp_path / "sidx"), CFG,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert os.path.exists(str(tmp_path / "sidx/manifest.json"))
    batch_cat = build_index(
        spark, docs, str(tmp_path / "batch2"), CFG, content_col="text", id_col="doc_id"
    )
    assert _topk(spark, cat, ["join", "vector"]) == _topk(spark, batch_cat, ["join", "vector"])
    # every epoch became its own segment namespace
    segs = {r["segment_id"] for r in cat.read(spark, "segment_stats").collect()}
    assert len(segs) >= 3

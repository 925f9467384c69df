"""Physical-plan assertions: the engine must produce the plans it was
designed for — pushed filters on the postings scan, pruned read schemas,
broadcast joins for small sides. Guard against silent plan regressions."""

import pytest
from pyspark.sql import functions as F

from cuvs_lucene_spark.config import IndexConfig
from cuvs_lucene_spark.operators.bm25 import _query_postings, fetch_stored
from cuvs_lucene_spark.operators.segments import build_index

from tests.conftest import SF_DIR

CFG = IndexConfig(rows_per_segment=100, block_size=16, term_buckets=8)


@pytest.fixture(scope="module")
def cat(spark, tmp_path_factory):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return build_index(
        spark, docs, str(tmp_path_factory.mktemp("planidx")), CFG,
        content_col="text", id_col="doc_id",
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_postings_scan_pushes_filters(spark, cat):
    df = _query_postings(spark, cat, ["join", "vector"], CFG)
    plan = _plan(df)
    assert "PushedFilters" in plan
    # both the bucket and the term predicate reach the parquet scan
    assert "term_bucket" in plan.split("PushedFilters")[1][:400]
    assert "In(term" in plan or "term," in plan.split("PushedFilters")[1][:400]


def test_postings_scan_prunes_columns(spark, cat):
    df = _query_postings(spark, cat, ["join"], CFG).select("segment_id", "term", "n")
    plan = _plan(df)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # the fat binary columns must NOT be read for a count-style projection
    assert "doc_deltas" not in read_schema
    assert "tfs" not in read_schema


def test_stored_fetch_broadcasts_topk(spark, cat):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumnRenamed(
        "doc_id", "ext_id"
    )
    topk = spark.createDataFrame([(1, 0.5), (2, 0.4)], "ext_id long, score double")
    plan = _plan(fetch_stored(spark, cat, topk, docs))
    assert "BroadcastHashJoin" in plan


def test_whole_stage_codegen_on_text_ops(spark):
    from cuvs_lucene_spark.functions.textstats import quality_score

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(quality_score(docs))
    # pure Catalyst expressions: no Python eval nodes anywhere in the plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Project" in plan

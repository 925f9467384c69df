"""Param validation (SURVEY.md §5.6, TestGPUSearchParams analogue),
manifest version gate (O12), and index sort (H8/B6/M6)."""

import dataclasses
import json

import pytest

from cuvs_lucene_spark.config import BM25Params, IndexConfig
from cuvs_lucene_spark.sources.catalog import IndexCatalog


def test_config_validation_ranges():
    IndexConfig()  # defaults valid
    with pytest.raises(ValueError, match="rows_per_segment"):
        IndexConfig(rows_per_segment=0)
    with pytest.raises(ValueError, match="block_size"):
        IndexConfig(block_size=-1)
    with pytest.raises(ValueError, match="merge_fanin"):
        IndexConfig(merge_fanin=1)
    with pytest.raises(ValueError, match="k1"):
        IndexConfig(bm25=BM25Params(k1=0.0))
    with pytest.raises(ValueError, match="b="):
        IndexConfig(bm25=BM25Params(b=1.5))
    with pytest.raises(ValueError, match="metric"):
        IndexConfig(ann=dataclasses.replace(IndexConfig().ann, metric="manhattan"))


def test_manifest_version_gate(tmp_path):
    cat = IndexCatalog(str(tmp_path))
    cat.mark_stage("x")
    with open(f"{tmp_path}/manifest.json") as f:
        m = json.load(f)
    m["version"] = 99
    with open(f"{tmp_path}/manifest.json", "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="version 99 unsupported"):
        IndexCatalog(str(tmp_path)).read_manifest()


def test_index_sort(spark, tmp_path):
    """Docs re-keyed by a sort field build segments physically ordered by
    that field; queries still work (setIndexSort analogue)."""
    import numpy as np
    from pyspark.sql import functions as F

    from cuvs_lucene_spark.operators.bm25 import bm25_topk
    from cuvs_lucene_spark.operators.segments import build_index, with_index_sort
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sorted_docs = with_index_sort(docs, ["n_chars", "doc_id"], n_partitions=4)
    rows = sorted_docs.select("doc_id", "n_chars", "sort_ext_id").collect()
    by_rank = sorted(rows, key=lambda r: r["sort_ext_id"])
    # rank is a dense permutation ordered by the sort key
    assert [r["sort_ext_id"] for r in by_rank] == list(range(len(rows)))
    keys = [(r["n_chars"], r["doc_id"]) for r in by_rank]
    assert keys == sorted(keys)

    cfg = IndexConfig(rows_per_segment=100, block_size=16, term_buckets=8)
    cat = build_index(
        spark, sorted_docs, str(tmp_path / "sorted_idx"), cfg,
        content_col="text", id_col="sort_ext_id",
    )
    # norms ext_ids (= sort ranks) ascending per segment → index is sorted
    for r in cat.read(spark, "norms").collect():
        ext = np.frombuffer(r["ext_ids"], dtype=np.int64)
        assert np.all(np.diff(ext) > 0)
    res = bm25_topk(spark, cat, ["join"], k=5, cfg=cfg).collect()
    assert len(res) == 5

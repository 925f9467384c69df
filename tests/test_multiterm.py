"""PrefixQuery / WildcardQuery: dictionary-rewrite semantics.

Lucene contract mirrored (the host searcher's multi-term queries —
rewrite enumerates the term dictionary, expansion bounded by
maxClauseCount, exceeding RAISES TooManyClauses, scoring rewrite feeds
the expanded disjunction into the standard BM25 scorer)."""

import pytest
from pyspark.sql import functions as F

from cuvs_lucene_spark.config import IndexConfig
from cuvs_lucene_spark.operators.bm25 import bm25_topk
from cuvs_lucene_spark.operators.deletes import delete_by_term
from cuvs_lucene_spark.operators.multiterm import (
    TooManyClauses,
    _wildcard_to_regex,
    expand_terms,
    prefix_docs,
    prefix_topk,
    wildcard_docs,
)
from cuvs_lucene_spark.operators.segments import build_index

CFG = IndexConfig(rows_per_segment=8, block_size=8)

DOCS = [
    (0, "apple apricot banana"),
    (1, "apple apple cherry"),
    (2, "banana cherry date"),
    (3, "apricot date elder"),
    (4, "fig grape apple"),
    (5, "grape grape grape"),
    (6, "zap zip zoom"),
    (7, "doomed unique_term"),
]


@pytest.fixture(scope="module")
def tcat(spark, tmp_path_factory):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return build_index(
        spark, docs, str(tmp_path_factory.mktemp("mt")), CFG,
        content_col="text", id_col="doc_id",
    )


def test_expand_terms_sorted_and_bounded(spark, tcat):
    assert expand_terms(spark, tcat, prefix="ap") == ["apple", "apricot"]
    assert expand_terms(spark, tcat, prefix="z") == ["zap", "zip", "zoom"]
    assert expand_terms(spark, tcat, prefix="nope") == []
    with pytest.raises(TooManyClauses):
        expand_terms(spark, tcat, prefix="", max_expansions=3)


def test_wildcard_regex_translation():
    rx, pre = _wildcard_to_regex("gr?pe*")
    assert pre == "gr"
    assert rx == "^gr.pe.*$"
    # regex metacharacters in the literal part are escaped
    rx2, _ = _wildcard_to_regex("a.b*")
    assert rx2 == "^a\\.b.*$"


def test_prefix_docs_constant_score_match_set(spark, tcat):
    got = sorted(r["ext_id"] for r in prefix_docs(spark, tcat, "ap", CFG).collect())
    # docs containing apple or apricot
    assert got == [0, 1, 3, 4]
    assert prefix_docs(spark, tcat, "nope", CFG).count() == 0


def test_wildcard_docs(spark, tcat):
    # z?p → zap, zip (not zoom)
    got = sorted(r["ext_id"] for r in wildcard_docs(spark, tcat, "z?p", CFG).collect())
    assert got == [6]
    # *ape → grape
    got2 = sorted(r["ext_id"] for r in wildcard_docs(spark, tcat, "*ape", CFG).collect())
    assert got2 == [4, 5]


def test_prefix_topk_equals_expanded_bm25(spark, tcat):
    """SCORING_BOOLEAN_REWRITE ≡ BM25 disjunction over expanded terms."""
    got = prefix_topk(spark, tcat, "ap", k=8, cfg=CFG).collect()
    want = bm25_topk(spark, tcat, ["apple", "apricot"], k=8, mode="or", cfg=CFG).collect()
    assert [(r["ext_id"], r["score"]) for r in got] == [
        (r["ext_id"], r["score"]) for r in want
    ]


def test_prefix_after_delete_drops_dead_terms(spark, tcat):
    """A term surviving only in deleted docs contributes nothing (stats
    recomputed over live docs — fresh-reader semantics)."""
    delete_by_term(spark, tcat, "doomed", CFG)
    got = prefix_docs(spark, tcat, "uniq", CFG).collect()
    assert got == []
    # and the scored path returns no hits either
    assert prefix_topk(spark, tcat, "uniq", k=5, cfg=CFG).count() == 0

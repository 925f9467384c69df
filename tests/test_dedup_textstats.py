"""Dedup + text-analysis operators against planted fixtures and DuckDB.
(The driver-facing parity is covered by tools/check_oracles.py; these
tests pin semantics on the synthetic corpus with planted duplicates.)"""

import duckdb
import pytest
from pyspark.sql import functions as F

from cuvs_lucene_spark.fixtures import generate_documents_pdf
from cuvs_lucene_spark.functions.textstats import lang_id, quality_score
from cuvs_lucene_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
)


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = generate_documents_pdf(300)
    return spark.createDataFrame(pdf).withColumnRenamed("content", "text").withColumnRenamed(
        "ext_id", "doc_id"
    )


def test_exact_dedup_finds_planted_pair(spark, corpus):
    groups = exact_dedup(corpus).collect()
    dup_sets = [set(r["dup_ids"]) for r in groups]
    assert {5, 7} in dup_sets  # fixtures plant texts[7] = texts[5]
    for r in groups:
        assert r["keep_id"] == min(r["dup_ids"])
        assert r["n_dups"] == len(r["dup_ids"])


def test_minhash_finds_exact_dup_pair(spark, corpus):
    cands = {(r["id_a"], r["id_b"]) for r in minhash_lsh_candidates(corpus, n_perm=8, bands=4).collect()}
    assert (5, 7) in cands  # identical docs always collide in every band


def test_jaccard_exact_on_planted_pair(spark, corpus):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(corpus, threshold=0.99).collect()
    }
    assert pairs.get((5, 7)) == 1.0


def test_simhash_identical_docs_same_hash(spark, corpus):
    h = {r["id"]: r["simhash"] for r in simhash(corpus).collect()}
    assert h[5] == h[7]
    assert 0 <= h[5] < 2**32


def test_empty_doc_handling(spark, corpus):
    # fixtures plant texts[3] = "" — must flow through every op without error
    q = {r["id"]: r for r in quality_score(corpus).collect()}
    assert q[3]["n_tokens"] == 0 and q[3]["quality"] == 0.0
    lid = {r["id"]: r["pred_lang"] for r in lang_id(corpus).collect()}
    assert lid[3] == "und"


def test_quality_monotone_sanity(spark, corpus):
    rows = quality_score(corpus).collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in rows)
    long_docs = [r for r in rows if r["n_tokens"] >= 10]
    assert all(r["quality"] >= 0.25 for r in long_docs)  # len_ok component


def test_winnow_guarantee_and_subwords(spark):
    """Winnowing guarantee (MOSS): two docs sharing a run of ≥ w+k-1
    tokens select at least one common fingerprint; disjoint docs share
    none. Subword counts follow the frozen BPE-ish segmentation."""
    from cuvs_lucene_spark.functions.textstats import (
        SUBWORD_PATTERN,
        subword_count_expr,
        winnow_fingerprints,
    )
    import re

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november"
    rows = [
        (0, "prefix one two three " + shared + " suffix red blue"),
        (1, shared + " totally different tail words here now ok"),
        (2, "unrelated text with zero overlap at all whatsoever in any way"),
        (3, "tiny"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {}
    for r in winnow_fingerprints(docs, k=7, w=8).collect():
        fps.setdefault(r["id"], set()).add(r["fp"])
    assert fps[0] & fps[1], "shared >= w+k-1 token run must share a fingerprint"
    assert not (fps[0] & fps[2])
    assert len(fps[3]) == 1  # short-doc fallback: one whole-doc hash
    got = {r["doc_id"]: r["n"] for r in docs.select("doc_id", subword_count_expr("text").alias("n")).collect()}
    for i, txt in rows:
        assert got[i] == len(re.findall(SUBWORD_PATTERN, txt.lower()))

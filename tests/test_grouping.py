"""Result grouping / field collapse (Lucene grouping module) and the
exhaustive scored-collection pass they build on."""

import math
import re
from collections import defaultdict

import duckdb
import pytest
from pyspark.sql import functions as F

from cuvs_lucene_spark.config import IndexConfig
from cuvs_lucene_spark.operators.bm25 import bm25_scored_matches, bm25_topk
from cuvs_lucene_spark.operators.grouping import collapse_topk, group_topk
from cuvs_lucene_spark.operators.segments import build_index

from tests.conftest import SF_DIR

CFG = IndexConfig(rows_per_segment=64, block_size=16, prune_range=64, term_buckets=8)
TERMS = ["data", "merge"]


@pytest.fixture(scope="module")
def cat(spark, tmp_path_factory):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    root = str(tmp_path_factory.mktemp("idx_grp"))
    return build_index(spark, docs, root, CFG, content_col="text", id_col="doc_id")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _toks(text):
    return re.findall(r"[a-z0-9_]+", text.lower())


def _brute_scores():
    """BM25 scores for TERMS over the corpus, rounded to 6 dp, plus the
    doc → (lang, source) map."""
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text, lang, source FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    toks = {i: _toks(t) for i, t, _l, _s in rows}
    n = len(rows)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for term in TERMS:
        df = sum(1 for v in toks.values() if term in v)
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for i, v in toks.items():
            tf = v.count(term)
            if tf:
                scores[i] = scores.get(i, 0.0) + (
                    idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * len(v) / avgdl))
                )
    dims = {i: (l, s) for i, _t, l, s in rows}
    return {i: round(s, 6) for i, s in scores.items()}, dims


def test_scored_matches_is_exhaustive_and_topk_consistent(spark, cat):
    """bm25_scored_matches returns EVERY match with the same scores
    bm25_topk would rank."""
    brute, _ = _brute_scores()
    got = {
        r["ext_id"]: round(r["score"], 6)
        for r in bm25_scored_matches(spark, cat, TERMS, cfg=CFG).collect()
    }
    assert got == brute
    top = bm25_topk(spark, cat, TERMS, k=5, cfg=CFG).collect()
    exp_top = sorted(brute.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["ext_id"], round(r["score"], 6)) for r in top] == exp_top


def test_group_topk_vs_bruteforce(spark, cat, docs):
    brute, dims = _brute_scores()
    by_group = defaultdict(list)
    for i, s in brute.items():
        by_group[dims[i][0]].append((-s, i))
    heads = sorted(
        ((max(-a for a, _ in v), g) for g, v in by_group.items()),
        key=lambda kv: (-kv[0], kv[1]),
    )
    out = group_topk(
        spark, cat, docs, TERMS, "lang", k_groups=2, per_group=3, cfg=CFG
    ).collect()
    got = sorted(
        (r["group_rank"], r["position"], r["group_value"], r["ext_id"],
         round(r["score"], 6))
        for r in out
    )
    exp = []
    for rank, (_hs, g) in enumerate(heads[:2], start=1):
        docs_in_g = sorted(by_group[g])[:3]
        exp += [
            (rank, pos, g, i, round(-negs, 6))
            for pos, (negs, i) in enumerate(docs_in_g, start=1)
        ]
    assert got == sorted(exp)


def test_collapse_one_head_per_group(spark, cat, docs):
    brute, dims = _brute_scores()
    out = collapse_topk(spark, cat, docs, TERMS, "source", k=8, cfg=CFG).collect()
    groups = [r["group_value"] for r in out]
    assert len(groups) == len(set(groups)), "collapse must emit one doc per group"
    # each returned doc is its group's best (score desc, id asc)
    best = {}
    for i, s in brute.items():
        g = dims[i][1]
        cur = best.get(g)
        if cur is None or (-s, i) < cur:
            best[g] = (-s, i)
    exp = sorted(best.values())[:8]
    got = sorted((-round(r["score"], 6), r["ext_id"]) for r in out)
    assert [(round(a, 6), b) for a, b in got] == [(round(a, 6), b) for a, b in exp]


def test_group_topk_validation(spark, cat, docs):
    with pytest.raises(ValueError, match="positive"):
        group_topk(spark, cat, docs, TERMS, "lang", k_groups=0, cfg=CFG)
    assert collapse_topk(spark, cat, docs, TERMS, "lang", k=0, cfg=CFG).count() == 0


def test_group_topk_no_matches(spark, cat, docs):
    out = group_topk(spark, cat, docs, ["zzz_not_in_corpus"], "lang", cfg=CFG)
    assert out.count() == 0

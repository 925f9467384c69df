"""Training-pipeline ops added round 5: within-doc repetition stats
(Gopher top-n-gram rule) and the deterministic stratified training mix."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from cuvs_lucene_spark.functions.textstats import repetition_stats
from cuvs_lucene_spark.operators.sampling import training_mix

DOCS = [
    (0, "spam spam spam spam spam spam spam spam spam spam spam", "en"),
    (1, "the quick brown fox jumps over the lazy dog again today", "en"),
    (2, "a b a b a b a b a b a b a b a b a b a b", "fr"),
    (3, "short doc", "zh"),
    (4, "", "en"),
    (5, "one two three four five six seven eight nine ten eleven twelve", None),
    (6, "x", "de"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


def _brute_rep(text, n=2):
    toks = re.findall(r"[a-z0-9_]+", text.lower())
    grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    if not grams:
        return 0, 0.0, 0.0
    c = Counter(grams)
    return len(grams), max(c.values()) / len(grams), len(c) / len(grams)


def test_repetition_stats_vs_bruteforce(spark, docs):
    got = {r["id"]: r for r in repetition_stats(docs, n=2).collect()}
    for did, text, _ in DOCS:
        total, top, dist = _brute_rep(text)
        r = got[did]
        assert r["n_grams"] == total
        assert r["top_gram_frac"] == round(top, 6)
        assert r["distinct_gram_frac"] == round(dist, 6)
        assert r["repetitive"] == (total >= 10 and top > 0.2)
    # the spam doc and the a-b loop are flagged, prose is not
    assert got[0]["repetitive"] and got[2]["repetitive"]
    assert not got[1]["repetitive"] and not got[3]["repetitive"]


def test_repetition_stats_shuffle_free(spark, docs):
    """The 100 TB claim: no Exchange, no Python eval — one codegen'd
    projection."""
    plan = repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_repetition_stats_validation(spark, docs):
    with pytest.raises(ValueError, match="n must be"):
        repetition_stats(docs, n=0)


def test_training_mix_rates_and_determinism(spark, docs):
    rates = {"en": 1.0, "fr": 0.0}
    out1 = {r["id"]: r for r in
            training_mix(docs, rates, default_rate=0.5).collect()}
    out2 = {r["id"]: r for r in
            training_mix(docs, rates, default_rate=0.5).collect()}
    assert {k: tuple(v) for k, v in out1.items()} == {
        k: tuple(v) for k, v in out2.items()
    }, "decision table must be bit-deterministic"
    # rate 1.0 keeps everything, rate 0.0 keeps nothing
    for did, _t, lang in DOCS:
        if lang == "en":
            assert out1[did]["keep"]
        if lang == "fr":
            assert not out1[did]["keep"]
        # NULL stratum takes the default rate
        if lang is None:
            assert out1[did]["keep"] == (out1[did]["u"] < 0.5)
        assert 0.0 <= out1[did]["u"] < 1.0


def test_training_mix_statistical_rate(spark):
    """At 20k ids the empirical keep rate tracks the requested rate."""
    big = spark.range(20000).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    out = training_mix(big, {"en": 0.3}, strat_col="lang")
    kept = out.filter("keep").count()
    assert abs(kept / 20000 - 0.3) < 0.02


def test_training_mix_negative_ids(spark):
    """pmod, not %: negative ids must still hash into [0, 1) — a rate-0.0
    stratum keeps NOTHING and rate 1.0 keeps everything."""
    neg = spark.createDataFrame(
        [(-1, "en"), (-999999, "en"), (-7, "fr"), (0, "fr")],
        "doc_id long, lang string",
    )
    out = {r["id"]: r for r in
           training_mix(neg, {"en": 0.0, "fr": 1.0}).collect()}
    for i, r in out.items():
        assert 0.0 <= r["u"] < 1.0, (i, r["u"])
    assert not out[-1]["keep"] and not out[-999999]["keep"]
    assert out[-7]["keep"] and out[0]["keep"]


def test_training_mix_validation(spark, docs):
    with pytest.raises(ValueError, match="rate"):
        training_mix(docs, {"en": 1.5})
    with pytest.raises(ValueError, match="default_rate"):
        training_mix(docs, {"en": 0.5}, default_rate=-0.1)


def test_training_mix_shuffle_free(spark, docs):
    plan = training_mix(docs, {"en": 0.5})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

"""Positional postings + PhraseQuery (Lucene DOCS_AND_FREQS_AND_POSITIONS
analogue; PhraseWeight scoring: idf = Σ slot idfs, tf = phrase freq)."""

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuvs_lucene_spark.config import IndexConfig
from cuvs_lucene_spark.operators.deletes import delete_docs
from cuvs_lucene_spark.operators.merge import force_merge
from cuvs_lucene_spark.operators.positions import (
    PositionsStaleError,
    build_positions,
    phrase_match,
    phrase_topk,
    refresh_positions,
)
from cuvs_lucene_spark.operators.segments import build_index

CFG = IndexConfig(rows_per_segment=6, block_size=8)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "quick brown quick brown quick brown"),
    (2, "brown quick"),
    (3, "the quick fox"),
    (4, "a b a b a"),
    (5, ""),
    (6, "quick brown fox quick brown fox"),
    (7, "lazy dog lazy dog the end"),
    (8, "quick quick quick brown"),
    (9, "fox"),
    (10, "brown fox the quick brown fox ends"),
    (11, "dog lazy the brown quick"),
    (12, "a b a"),
    (13, "the the the"),
]


def brute_phrase(phrase):
    out = {}
    for did, text in DOCS:
        toks = re.findall(r"[a-z0-9_]+", text.lower())
        tf = sum(
            1
            for i in range(len(toks) - len(phrase) + 1)
            if all(toks[i + j] == phrase[j] for j in range(len(phrase)))
        )
        if tf:
            out[did] = tf
    return out


@pytest.fixture(scope="module")
def pcat(spark, tmp_path_factory):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    cat = build_index(
        spark, docs, str(tmp_path_factory.mktemp("pos")), CFG,
        content_col="text", id_col="doc_id",
    )
    build_positions(spark, cat, docs, CFG)
    return cat, docs


@pytest.mark.parametrize(
    "phrase",
    [
        ["quick", "brown"],
        ["quick", "brown", "fox"],
        ["a", "b", "a"],          # overlapping occurrences + repeated slot
        ["the", "the"],           # same term twice, adjacent
        ["lazy", "dog"],
        ["dog", "quick"],         # never adjacent
        ["quick"],                # single term: phrase_tf == tf
    ],
)
def test_phrase_match_vs_bruteforce(spark, pcat, phrase):
    cat, _ = pcat
    got = {
        r["ext_id"]: r["phrase_tf"]
        for r in phrase_match(spark, cat, phrase, CFG).collect()
    }
    assert got == brute_phrase(phrase)


def test_phrase_never_crosses_docs(spark, pcat):
    cat, _ = pcat
    # "fox" ends doc 9 and "quick" opens docs — adjacency across doc
    # boundaries must not fire beyond true in-doc occurrences
    got = {
        r["ext_id"]: r["phrase_tf"]
        for r in phrase_match(spark, cat, ["fox", "quick"], CFG).collect()
    }
    assert got == brute_phrase(["fox", "quick"])


def test_phrase_topk_lucene_scoring(spark, pcat):
    cat, _ = pcat
    phrase = ["quick", "brown"]
    rows = phrase_topk(spark, cat, phrase, k=10, cfg=CFG).collect()
    # manual PhraseWeight: idf summed over slots, tf = phrase freq
    dls = {d: len(re.findall(r"[a-z0-9_]+", t.lower())) for d, t in DOCS}
    n = len(DOCS)
    avgdl = sum(dls.values()) / n
    tfs = brute_phrase(phrase)
    idf_sum = 0.0
    for t in phrase:
        df = sum(
            1 for _, txt in DOCS if t in re.findall(r"[a-z0-9_]+", txt.lower())
        )
        idf_sum += np.log(1.0 + (n - df + 0.5) / (df + 0.5))
    want = {
        d: idf_sum * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dls[d] / avgdl))
        for d, tf in tfs.items()
    }
    got = {r["ext_id"]: r["score"] for r in rows}
    assert set(got) == set(want)
    for d in got:
        assert abs(got[d] - want[d]) < 1e-9
    # ordering: score desc, id asc
    scores = [(round(-r["score"], 9), r["ext_id"]) for r in rows]
    assert scores == sorted(scores)


def test_phrase_empty_and_k0(spark, pcat):
    cat, _ = pcat
    assert phrase_match(spark, cat, [], CFG).count() == 0
    assert phrase_topk(spark, cat, ["quick", "brown"], k=0, cfg=CFG).count() == 0
    assert phrase_match(spark, cat, ["zzz", "quick"], CFG).count() == 0


def brute_multi(slots):
    out = {}
    for did, text in DOCS:
        toks = re.findall(r"[a-z0-9_]+", text.lower())
        tf = sum(
            1
            for i in range(len(toks) - len(slots) + 1)
            if all(toks[i + j] in slots[j] for j in range(len(slots)))
        )
        if tf:
            out[did] = tf
    return out


def test_multi_phrase_match_vs_bruteforce(spark, pcat):
    """MultiPhraseQuery: a list-valued slot matches ANY of its terms."""
    cat, _ = pcat
    for slots in (
        [["quick"], ["brown", "fox"]],
        [["the", "a"], ["quick", "b"]],
        [["lazy", "the"], ["dog", "end"]],
        [["quick"], ["brown"], ["quick", "fox"]],
    ):
        got = {
            r["ext_id"]: r["phrase_tf"]
            for r in phrase_match(spark, cat, slots, CFG).collect()
        }
        assert got == brute_multi(slots), slots


def test_multi_phrase_singleton_equals_plain(spark, pcat):
    cat, _ = pcat
    plain = {
        r["ext_id"]: r["phrase_tf"]
        for r in phrase_match(spark, cat, ["quick", "brown"], CFG).collect()
    }
    multi = {
        r["ext_id"]: r["phrase_tf"]
        for r in phrase_match(
            spark, cat, [["quick"], ["brown"]], CFG
        ).collect()
    }
    assert plain == multi


def test_multi_phrase_absent_and_df0_slot_members(spark, pcat):
    cat, _ = pcat
    # a slot whose every term is absent matches nothing
    assert phrase_match(spark, cat, [["quick"], ["nope1", "nope2"]], CFG).count() == 0
    # an absent member inside a present slot is ignored
    got = {
        r["ext_id"]: r["phrase_tf"]
        for r in phrase_match(
            spark, cat, [["quick"], ["brown", "nope1"]], CFG
        ).collect()
    }
    assert got == brute_multi([["quick"], ["brown"]])
    # explicitly empty slot is an error
    with pytest.raises(ValueError):
        phrase_match(spark, cat, [["quick"], []], CFG)


def test_multi_phrase_topk_scoring(spark, pcat):
    """idf = Σ over slot members with df > 0; tf = multi-phrase freq."""
    cat, _ = pcat
    import math

    slots = [["quick"], ["brown", "fox"]]
    rows = phrase_topk(spark, cat, slots, k=20, cfg=CFG).collect()
    want_tf = brute_multi(slots)
    assert {r["ext_id"] for r in rows} == set(want_tf)
    # recompute one score by hand
    all_toks = [
        __import__("re").findall(r"[a-z0-9_]+", t.lower()) for _, t in DOCS
    ]
    n = len(DOCS)
    avgdl = sum(len(t) for t in all_toks) / n

    def df(w):
        return sum(1 for t in all_toks if w in t)

    idf_sum = sum(
        math.log(1.0 + (n - df(w) + 0.5) / (df(w) + 0.5))
        for s in slots for w in s if df(w) > 0
    )
    by_id = {r["ext_id"]: r["score"] for r in rows}
    for did, tf in want_tf.items():
        dl = len(all_toks[did])
        want = idf_sum * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        assert abs(by_id[did] - want) < 1e-6, did


def test_phrase_after_delete(spark, tmp_path_factory):
    # dedicated index: delete_docs mutates the catalog, so this test must
    # not share the module-scoped pcat with other tests
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    cat = build_index(
        spark, docs, str(tmp_path_factory.mktemp("posdel")), CFG,
        content_col="text", id_col="doc_id",
    )
    build_positions(spark, cat, docs, CFG)
    tomb = spark.createDataFrame([(1,), (6,)], "ext_id long")
    delete_docs(spark, cat, tomb)
    got = {
        r["ext_id"]: r["phrase_tf"]
        for r in phrase_match(spark, cat, ["quick", "brown"], CFG).collect()
    }
    want = {d: tf for d, tf in brute_phrase(["quick", "brown"]).items()
            if d not in (1, 6)}
    assert got == want
    # scored path: stats over live docs (df/avgdl recomputed)
    rows = phrase_topk(spark, cat, ["quick", "brown"], k=10, cfg=CFG).collect()
    assert {r["ext_id"] for r in rows} == set(want)


def test_merge_staleness_and_refresh(spark, tmp_path_factory):
    docs_rows = [(i, f"alpha beta w{i} alpha beta") for i in range(12)]
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    cat = build_index(
        spark, docs, str(tmp_path_factory.mktemp("posm")), CFG,
        content_col="text", id_col="doc_id",
    )
    build_positions(spark, cat, docs, CFG)
    before = {
        r["ext_id"]: r["phrase_tf"]
        for r in phrase_match(spark, cat, ["alpha", "beta"], CFG).collect()
    }
    assert before == {i: 2 for i in range(12)}
    force_merge(spark, cat, CFG)
    with pytest.raises(PositionsStaleError):
        phrase_match(spark, cat, ["alpha", "beta"], CFG).collect()
    n_built = refresh_positions(spark, cat, docs, CFG)
    assert n_built >= 1
    after = {
        r["ext_id"]: r["phrase_tf"]
        for r in phrase_match(spark, cat, ["alpha", "beta"], CFG).collect()
    }
    assert after == before
    # idempotent: nothing further to build
    assert refresh_positions(spark, cat, docs, CFG) == 0


def test_streamed_epochs_maintain_positions(spark, tmp_path):
    """Streaming ingest appends position rows for every epoch once the
    index opted in — phrase queries stay fresh without refresh, and equal
    a batch-built sidecar over the same docs."""
    from cuvs_lucene_spark.streaming.ingest import incremental_add
    from cuvs_lucene_spark.sources.catalog import IndexCatalog

    rows = [(i, "red fox red fox" if i % 3 == 0 else "red then fox") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cat = IndexCatalog(str(tmp_path / "s"))
    first = docs.filter(F.col("doc_id") < 10)
    incremental_add(spark, cat, first, CFG, 0, content_col="text", id_col="doc_id")
    build_positions(spark, cat, first, CFG, content_col="text", id_col="doc_id")
    # later epochs arrive AFTER the opt-in → sidecar rows ride each epoch
    for epoch, (lo, hi) in enumerate([(10, 20), (20, 30)], start=1):
        batch = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        incremental_add(spark, cat, batch, CFG, epoch, content_col="text", id_col="doc_id")
    got = {
        r["ext_id"]: r["phrase_tf"]
        for r in phrase_match(spark, cat, ["red", "fox"], CFG).collect()
    }
    assert got == {i: 2 for i in range(0, 30, 3)}
    # idempotent redelivery of an epoch must not duplicate position rows
    incremental_add(spark, cat, docs.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 20)),
                    CFG, 1, content_col="text", id_col="doc_id")
    again = {
        r["ext_id"]: r["phrase_tf"]
        for r in phrase_match(spark, cat, ["red", "fox"], CFG).collect()
    }
    assert again == got


# ---------------------------------------------------------------------------
# SpanNearQuery (span_near: ordered chains / unordered windows)
# ---------------------------------------------------------------------------

from itertools import product as _product

from cuvs_lucene_spark.operators.positions import span_near


def _brute_span(terms, slop, in_order):
    w = slop + len(terms) - 1
    out = set()
    for did, text in DOCS:
        toks = re.findall(r"[a-z0-9_]+", text.lower())
        occ = [[i for i, t in enumerate(toks) if t == q] for q in terms]
        if any(not o for o in occ):
            continue
        for combo in _product(*occ):
            if in_order:
                if all(combo[j] < combo[j + 1] for j in range(len(combo) - 1)) \
                        and combo[-1] - combo[0] <= w:
                    out.add(did)
                    break
            else:
                if max(combo) - min(combo) <= w:
                    out.add(did)
                    break
    return out


@pytest.mark.parametrize(
    "terms,slop,in_order",
    [
        (["quick", "brown"], 0, True),    # adjacency == phrase
        (["quick", "fox"], 1, True),      # one intervening token
        (["the", "dog"], 4, True),
        (["brown", "quick"], 0, False),   # unordered adjacency
        (["fox", "lazy"], 3, False),
        (["the", "quick", "fox"], 2, True),   # 3-term chain
        (["dog", "the", "lazy"], 2, False),   # 3-term window
        (["quick", "dog"], 0, True),      # never near
    ],
)
def test_span_near_vs_bruteforce(spark, pcat, terms, slop, in_order):
    cat, _ = pcat
    got = {
        r["ext_id"]
        for r in span_near(spark, cat, terms, slop, in_order, CFG).collect()
    }
    assert got == _brute_span(terms, slop, in_order)


def test_span_near_ordered_slop0_equals_phrase(spark, pcat):
    cat, _ = pcat
    got = {
        r["ext_id"]
        for r in span_near(spark, cat, ["quick", "brown"], 0, True, CFG).collect()
    }
    assert got == set(brute_phrase(["quick", "brown"]))


def test_span_near_never_crosses_docs(spark, pcat):
    cat, _ = pcat
    # "fox" ends doc 9; a wide slop must not leak into the next doc
    got = {
        r["ext_id"]
        for r in span_near(spark, cat, ["fox", "lazy"], 50, True, CFG).collect()
    }
    assert got == _brute_span(["fox", "lazy"], 50, True)


def test_span_near_validation(spark, pcat):
    cat, _ = pcat
    with pytest.raises(ValueError, match=">= 2 terms"):
        span_near(spark, cat, ["quick"], 1, True, CFG)
    with pytest.raises(ValueError, match="distinct"):
        span_near(spark, cat, ["quick", "quick"], 1, True, CFG)
    with pytest.raises(ValueError, match="slop"):
        span_near(spark, cat, ["quick", "brown"], -1, True, CFG)


def test_span_near_respects_deletes(spark, pcat):
    # LAST in the module: it registers a tombstone in the module-scoped
    # index, which later queries in this file would otherwise observe
    cat, docs = pcat
    matches = _brute_span(["quick", "brown"], 2, True)
    victim = sorted(matches)[0]
    delete_docs(spark, cat, docs.filter(F.col("doc_id") == victim)
                .select(F.col("doc_id").alias("ext_id")))
    got = {
        r["ext_id"]
        for r in span_near(spark, cat, ["quick", "brown"], 2, True, CFG).collect()
    }
    assert got == matches - {victim}


# ---------------------------------------------------------------------------
# SpanFirstQuery + highlighter
# ---------------------------------------------------------------------------

def _tombstoned(spark, cat):
    """These tests run AFTER the module's delete test in a full-file run
    (the module-scoped index carries its tombstone) but also standalone —
    subtract whatever is actually tombstoned instead of assuming order."""
    if cat.exists("tombstones"):
        return {r["ext_id"] for r in cat.read(spark, "tombstones").collect()}
    return set()


def _brute_span_first(term, end):
    out = set()
    for did, text in DOCS:
        toks = re.findall(r"[a-z0-9_]+", text.lower())
        if term in toks[:end]:
            out.add(did)
    return out


@pytest.mark.parametrize(
    "term,end",
    [("quick", 1), ("quick", 2), ("the", 1), ("fox", 3), ("dog", 100),
     ("zzz", 5)],
)
def test_span_first_vs_bruteforce(spark, pcat, term, end):
    from cuvs_lucene_spark.operators.positions import span_first

    cat, _ = pcat
    got = {r["ext_id"] for r in span_first(spark, cat, term, end, CFG).collect()}
    assert got == _brute_span_first(term, end) - _tombstoned(spark, cat)


def test_span_first_end_zero_and_validation(spark, pcat):
    from cuvs_lucene_spark.operators.positions import span_first

    cat, _ = pcat
    assert span_first(spark, cat, "quick", 0, CFG).count() == 0
    with pytest.raises(ValueError, match="term"):
        span_first(spark, cat, "", 5, CFG)


def test_highlight_vs_bruteforce(spark, pcat):
    from cuvs_lucene_spark.operators.highlight import highlight

    cat, docs = pcat
    terms, w = ["brown", "dog"], 2
    rows = highlight(spark, cat, docs, terms, window=w, cfg=CFG).collect()
    got = {r["ext_id"]: (r["first_pos"], r["snippet"]) for r in rows}
    dead = _tombstoned(spark, cat)
    exp = {}
    for did, text in DOCS:
        if did in dead:
            continue
        toks = re.findall(r"[a-z0-9_]+", text.lower())
        hits = [i for i, t in enumerate(toks) if t in terms]
        if not hits:
            continue
        p = hits[0]
        seg = toks[max(0, p - w): p + w + 1]
        exp[did] = (
            p,
            " ".join(f"<b>{t}</b>" if t in terms else t for t in seg),
        )
    assert got == exp


def test_highlight_match_restriction(spark, pcat):
    from cuvs_lucene_spark.operators.highlight import highlight

    cat, docs = pcat
    keep = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("ext_id")
    )
    rows = highlight(
        spark, cat, docs, ["brown"], window=1, match=keep, cfg=CFG
    ).collect()
    assert {r["ext_id"] for r in rows} <= {0, 1, 2}
    full = highlight(spark, cat, docs, ["brown"], window=1, cfg=CFG).collect()
    assert {r["ext_id"] for r in full} > {r["ext_id"] for r in rows}

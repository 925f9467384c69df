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
    _osa,
    _regex_literal_prefix,
    _wildcard_to_regex,
    expand_terms,
    fuzzy_docs,
    fuzzy_expand,
    fuzzy_topk,
    prefix_docs,
    prefix_topk,
    range_docs,
    range_expand,
    regexp_docs,
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


def test_osa_distance():
    # adjacent transposition = ONE edit (Lucene transpositions=true)
    assert _osa("ab", "ba", 2) == 1
    assert _osa("grpae", "grape", 2) == 1
    assert _osa("abc", "abc", 2) == 0
    assert _osa("kitten", "sitting", 2) == 3  # capped: cap+1 past cap
    assert _osa("", "ab", 2) == 2
    assert _osa("abcd", "", 2) == 3  # length gap > cap → cap+1


def test_fuzzy_expand_basics(spark, tcat):
    # one insertion away
    assert fuzzy_expand(spark, tcat, "aple", max_edits=1) == ["apple"]
    # zap: itself + zip (1 substitution); zoom is 3 edits away
    assert fuzzy_expand(spark, tcat, "zap", max_edits=1) == ["zap", "zip"]
    # max_edits=0 degenerates to exact dictionary lookup
    assert fuzzy_expand(spark, tcat, "grape", max_edits=0) == ["grape"]
    assert fuzzy_expand(spark, tcat, "grapes", max_edits=0) == []
    with pytest.raises(ValueError):
        fuzzy_expand(spark, tcat, "zap", max_edits=3)
    with pytest.raises(TooManyClauses):
        fuzzy_expand(spark, tcat, "fig", max_edits=2, max_expansions=1)


def test_fuzzy_transpositions_semantics(spark, tcat):
    # grpae = grape with one adjacent swap: 1 OSA edit, 2 plain edits
    assert fuzzy_expand(
        spark, tcat, "grpae", max_edits=1, transpositions=True
    ) == ["grape"]
    assert fuzzy_expand(
        spark, tcat, "grpae", max_edits=1, transpositions=False
    ) == []
    # both reach it at plain distance 2
    assert fuzzy_expand(
        spark, tcat, "grpae", max_edits=2, transpositions=False
    ) == ["grape"]


def test_fuzzy_prefix_length(spark, tcat):
    # non-fuzzy prefix 'z' verbatim, edits on the suffix
    assert fuzzy_expand(
        spark, tcat, "zap", max_edits=1, prefix_length=1
    ) == ["zap", "zip"]
    # prefix 'za' verbatim excludes zip
    assert fuzzy_expand(
        spark, tcat, "zap", max_edits=1, prefix_length=2
    ) == ["zap"]
    # prefix_length past the term length = exact prefix of the whole term
    assert fuzzy_expand(
        spark, tcat, "zap", max_edits=1, prefix_length=99
    ) == ["zap"]


def test_fuzzy_docs_and_topk(spark, tcat):
    got = sorted(
        r["ext_id"] for r in fuzzy_docs(spark, tcat, "zap", 1, cfg=CFG).collect()
    )
    assert got == [6]
    # SCORING_BOOLEAN_REWRITE ≡ BM25 disjunction over the expansion
    got_k = fuzzy_topk(spark, tcat, "aple", k=8, max_edits=2, cfg=CFG).collect()
    want = bm25_topk(spark, tcat, fuzzy_expand(spark, tcat, "aple", 2),
                     k=8, mode="or", cfg=CFG).collect()
    assert [(r["ext_id"], r["score"]) for r in got_k] == [
        (r["ext_id"], r["score"]) for r in want
    ]


def test_range_expand_and_docs(spark, tcat):
    assert range_expand(spark, tcat, "apple", "cherry") == [
        "apple", "apricot", "banana", "cherry"
    ]
    assert range_expand(
        spark, tcat, "apple", "cherry",
        include_lower=False, include_upper=False,
    ) == ["apricot", "banana"]
    # open ends
    assert range_expand(spark, tcat, None, "b") == ["apple", "apricot"]
    assert range_expand(spark, tcat, "zip", None) == ["zip", "zoom"]
    with pytest.raises(TooManyClauses):
        range_expand(spark, tcat, None, None, max_expansions=3)
    got = sorted(
        r["ext_id"]
        for r in range_docs(spark, tcat, "apple", "banana", cfg=CFG).collect()
    )
    # docs containing apple, apricot, or banana
    assert got == [0, 1, 2, 3, 4]


def test_regex_literal_prefix():
    assert _regex_literal_prefix("zap") == "zap"
    assert _regex_literal_prefix("z[ai]p") == "z"
    assert _regex_literal_prefix("gr.pe") == "gr"
    # quantifier unbinds the previous literal
    assert _regex_literal_prefix("ab*c") == "a"
    assert _regex_literal_prefix("a+") == ""


def test_regexp_docs_whole_term_anchoring(spark, tcat):
    got = sorted(
        r["ext_id"] for r in regexp_docs(spark, tcat, "z[ai]p", CFG).collect()
    )
    assert got == [6]
    # pattern must match the ENTIRE term: 'appl' matches nothing
    assert regexp_docs(spark, tcat, "appl", CFG).count() == 0
    got2 = sorted(
        r["ext_id"] for r in regexp_docs(spark, tcat, "appl.*", CFG).collect()
    )
    assert got2 == [0, 1, 4]


def test_prefix_after_delete_drops_dead_terms(spark, tcat):
    """A term surviving only in deleted docs contributes nothing (stats
    recomputed over live docs — fresh-reader semantics)."""
    delete_by_term(spark, tcat, "doomed", CFG)
    got = prefix_docs(spark, tcat, "uniq", CFG).collect()
    assert got == []
    # and the scored path returns no hits either
    assert prefix_topk(spark, tcat, "uniq", k=5, cfg=CFG).count() == 0


# ---------------------------------------------------------------------------
# DirectSpellChecker (suggest/spell)
# ---------------------------------------------------------------------------

def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_spell_suggest_ranking_vs_bruteforce(spark, tcat):
    """Runs after the delete test: doc 7 is tombstoned, so its exclusive
    vocabulary must not be suggested and dfs count live docs only."""
    from cuvs_lucene_spark.operators.multiterm import spell_suggest

    live = [(d, t) for d, t in DOCS if d != 7]
    vocab = {}
    for did, text in live:
        for tok in set(text.split()):
            vocab[tok] = vocab.get(tok, 0) + 1
    for q in ("aple", "dat", "grap"):
        got = [
            (r["suggestion"], r["distance"], r["df"])
            for r in spell_suggest(
                spark, tcat, q, max_edits=2, num_suggestions=5,
                transpositions=False, cfg=CFG,
            ).collect()
        ]
        exp = sorted(
            (
                (t, _lev(t, q), df)
                for t, df in vocab.items()
                if t != q and _lev(t, q) <= 2
            ),
            key=lambda r: (r[1], -r[2], r[0]),
        )[:5]
        assert got == exp, q


def test_spell_suggest_deleted_only_term_not_suggested(spark, tcat):
    from cuvs_lucene_spark.operators.multiterm import spell_suggest

    got = spell_suggest(
        spark, tcat, "unique_trm", max_edits=2, transpositions=False, cfg=CFG
    ).collect()
    assert got == []


def test_spell_suggest_num_zero(spark, tcat):
    from cuvs_lucene_spark.operators.multiterm import spell_suggest

    assert spell_suggest(spark, tcat, "aple", num_suggestions=0, cfg=CFG).count() == 0


def test_complete_prefix_ranked_by_live_df(spark, tcat):
    """Runs after the delete test: doc 7 is tombstoned — its exclusive
    vocabulary must not complete, dfs count live docs only."""
    from cuvs_lucene_spark.operators.multiterm import complete

    live = [(d, t) for d, t in DOCS if d != 7]
    vocab = {}
    for _did, text in live:
        for tok in set(text.split()):
            vocab[tok] = vocab.get(tok, 0) + 1
    got = [
        (r["suggestion"], r["df"])
        for r in complete(spark, tcat, "a", num_suggestions=5, cfg=CFG).collect()
    ]
    exp = sorted(
        ((t, df) for t, df in vocab.items() if t.startswith("a")),
        key=lambda r: (-r[1], r[0]),
    )[:5]
    assert got == exp
    # tombstoned-only vocabulary never completes
    assert complete(spark, tcat, "unique", cfg=CFG).count() == 0
    with pytest.raises(ValueError, match="prefix"):
        complete(spark, tcat, "", cfg=CFG)

"""Multi-term queries: PrefixQuery / WildcardQuery rewritten against the
term dictionary (host-Lucene query surface, §2.5).

The reference answers queries through the host ``IndexSearcher`` (its
vector query IS a ``org.apache.lucene.search.Query``,
GPUKnnFloatVectorQuery.java:21-58), so the full Lucene query zoo runs
against the same index; prefix/wildcard are the multi-term members. Lucene
semantics mirrored here:

- rewrite enumerates the TERM DICTIONARY (never the corpus) for terms
  matching the pattern — our dictionary is the ``terms`` catalog view,
  a kind-pruned parquet scan; for prefixes the match is a pushed
  ``StringStartsWith``, for wildcards the compiled automaton's literal
  prefix is pushed and the regex filters the surviving dictionary rows.
- expansion is bounded by ``max_expansions`` (Lucene
  ``IndexSearcher.getMaxClauseCount``, default 1024) and EXCEEDING IT
  RAISES (``TooManyClauses``) — no silent truncation.
- ``*_docs``: CONSTANT_SCORE_REWRITE — the match set, no ranking.
- ``prefix_topk``: SCORING_BOOLEAN_REWRITE — the expanded terms feed the
  standard BM25 disjunction (same scorer, stats recomputed over live
  docs, so terms surviving only in deleted docs drop out exactly as a
  fresh Lucene reader would see them).

100 TB shape: the dictionary scan is pruned + pushed; the expanded term
list (≤ max_expansions strings) is the only driver-side state; matching
and scoring reuse the pruned-postings paths.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IndexConfig
from .bm25 import bm25_topk, boolean_query

MAX_EXPANSIONS = 1024  # Lucene IndexSearcher.maxClauseCount default


class TooManyClauses(ValueError):
    """Lucene ``IndexSearcher.TooManyClauses`` analogue: the pattern
    matches more dictionary terms than ``max_expansions``."""


def _wildcard_to_regex(pattern: str) -> tuple[str, str]:
    """Lucene WildcardQuery syntax (``*`` = any run, ``?`` = one char) →
    (anchored regex, literal prefix before the first wildcard). The prefix
    is pushed to the parquet dictionary scan like Lucene's automaton
    common-prefix optimization."""
    prefix = re.split(r"[*?]", pattern, maxsplit=1)[0]
    rx = "".join(
        ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
        for ch in pattern
    )
    return f"^{rx}$", prefix


def expand_terms(
    spark: SparkSession,
    cat,
    prefix: str = "",
    regex: str | None = None,
    max_expansions: int = MAX_EXPANSIONS,
) -> list[str]:
    """Enumerate dictionary terms matching (prefix[, regex]) — sorted,
    deduplicated across segments, bounded by ``max_expansions``."""
    terms = cat.read(spark, "terms").select("term")
    if prefix:
        terms = terms.filter(F.col("term").startswith(prefix))
    if regex is not None:
        terms = terms.filter(F.col("term").rlike(regex))
    rows = (
        terms.distinct()
        .orderBy("term")
        .limit(max_expansions + 1)
        .collect()
    )
    if len(rows) > max_expansions:
        raise TooManyClauses(
            f"pattern expands to > {max_expansions} dictionary terms"
        )
    return [r["term"] for r in rows]


def prefix_docs(
    spark: SparkSession,
    cat,
    prefix: str,
    cfg: IndexConfig | None = None,
    max_expansions: int = MAX_EXPANSIONS,
) -> DataFrame:
    """PrefixQuery, CONSTANT_SCORE_REWRITE: live docs containing ≥1
    dictionary term starting with ``prefix`` → DataFrame(ext_id)."""
    terms = expand_terms(spark, cat, prefix=prefix, max_expansions=max_expansions)
    return _match_any(spark, cat, terms, cfg)


def wildcard_docs(
    spark: SparkSession,
    cat,
    pattern: str,
    cfg: IndexConfig | None = None,
    max_expansions: int = MAX_EXPANSIONS,
) -> DataFrame:
    """WildcardQuery (``*``/``?``), CONSTANT_SCORE_REWRITE →
    DataFrame(ext_id)."""
    rx, prefix = _wildcard_to_regex(pattern)
    terms = expand_terms(
        spark, cat, prefix=prefix, regex=rx, max_expansions=max_expansions
    )
    return _match_any(spark, cat, terms, cfg)


def _match_any(spark, cat, terms: list[str], cfg) -> DataFrame:
    if not terms:
        return spark.createDataFrame([], "ext_id long")
    return boolean_query(spark, cat, any_of=terms, cfg=cfg or IndexConfig())


def prefix_topk(
    spark: SparkSession,
    cat,
    prefix: str,
    k: int = 10,
    cfg: IndexConfig | None = None,
    max_expansions: int = MAX_EXPANSIONS,
    filter_ext_ids=None,
) -> DataFrame:
    """PrefixQuery, SCORING_BOOLEAN_REWRITE: BM25 disjunction over the
    expanded terms → DataFrame(ext_id, score), top-k."""
    terms = expand_terms(spark, cat, prefix=prefix, max_expansions=max_expansions)
    if not terms:
        return spark.createDataFrame([], "ext_id long, score double")
    return bm25_topk(
        spark, cat, terms, k=k, mode="or", cfg=cfg or IndexConfig(),
        filter_ext_ids=filter_ext_ids,
    )

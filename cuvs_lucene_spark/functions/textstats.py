"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All are pure Catalyst expressions (codegen'd, no Python in the hot path)
with exact DuckDB-SQL oracle equivalents. Heuristics are deliberately
simple and FROZEN — deterministic outputs matter more than linguistic
sophistication for pipeline correctness testing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuvs_lucene_spark.functions.tokenize import doclen_expr, tokenize_expr

# Frozen per-language marker token lists (top function words). A token
# votes for every language whose list contains it; argmax wins, ties break
# alphabetically, zero votes → 'und'.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "ce"],
}

EN_STOPWORDS = LANG_MARKERS["en"] + ["this", "with", "as", "on", "was", "at", "by", "an", "be", "are"]


def token_count_expr(text_col: str):
    """Regex token count (the BPE-ish proxy: one token per [a-z0-9_]+ run)."""
    return doclen_expr(text_col)


def whitespace_token_count_expr(text_col: str):
    """Whitespace-split token count."""
    c = F.trim(F.col(text_col))
    return F.when(c == "", F.lit(0)).otherwise(
        F.size(F.split(c, r"\s+"))
    )


def lang_votes_expr(text_col: str, lang: str):
    toks = tokenize_expr(text_col)
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, pred_lang): n-gram/function-word language heuristic."""
    langs = sorted(LANG_MARKERS)
    votes = docs.select(
        F.col(id_col).alias("id"),
        *[lang_votes_expr(text_col, lg).alias(f"v_{lg}") for lg in langs],
    )
    best = F.greatest(*[F.col(f"v_{lg}") for lg in langs])
    pred = F.when(best == 0, F.lit("und"))
    for lg in langs:  # alphabetical order → deterministic tie-break
        pred = pred.when(F.col(f"v_{lg}") == best, F.lit(lg))
    return votes.select("id", pred.alias("pred_lang"))


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, mean_token_len, stopword_ratio, alnum_ratio, quality).

    quality ∈ [0,1]: 0.25·len_ok + 0.25·mean_token_len_ok +
    0.25·stopword_presence + 0.25·alnum_ratio — a frozen, deterministic
    document-quality heuristic (length/punctuation/stopword mix).
    """
    toks = tokenize_expr(text_col)
    n_tok = F.size(toks)
    txt_len = F.length(F.col(text_col))
    alnum_chars = F.length(F.array_join(toks, ""))
    stops = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    mean_tok_len = F.when(n_tok > 0, alnum_chars / n_tok).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    alnum_ratio = F.when(txt_len > 0, alnum_chars / txt_len).otherwise(F.lit(0.0))
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100_000), F.lit(1.0)).otherwise(F.lit(0.0))
    tl_ok = F.when((mean_tok_len >= 2.0) & (mean_tok_len <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ok = F.when(stop_ratio > 0.0, F.lit(1.0)).otherwise(F.lit(0.0))
    quality = 0.25 * len_ok + 0.25 * tl_ok + 0.25 * stop_ok + 0.25 * alnum_ratio
    return docs.select(
        F.col(id_col).alias("id"),
        n_tok.alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(alnum_ratio, 6).alias("alnum_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, fingerprint): md5 over the canonical token stream —
    case/punctuation-invariant exact-content fingerprint."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.md5(F.array_join(tokenize_expr(text_col), " ")).alias("fingerprint"),
    )

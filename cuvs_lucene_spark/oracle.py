"""ANSI-SQL (DuckDB-runnable) oracle generators.

Every operator the engine claims is paired with an equivalent SQL statement
over the raw source tables (driver contract: ``__spark_entry__.oracle_sql``).
The BM25 formula and tokenizer here are THE definition the engine must match
rank-identically (SURVEY.md §5 transplant: DuckDB oracle, stricter than the
reference's containment checks).
"""

from __future__ import annotations

K1 = 1.2
B = 0.75
ROUND = 6  # scores rounded to 6 dp on both sides for hash-stable comparison

TOKENS = "regexp_extract_all(lower({col}), '[a-z0-9_]+')"


def _terms_in(terms: list[str]) -> str:
    quoted = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"({quoted})"


def bm25_sql(
    terms: list[str],
    k: int = 10,
    mode: str = "or",
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    filter_pred: str | None = None,
    delete_pred: str | None = None,
    term_pred: str | None = None,
    boosts: dict[str, float] | None = None,
) -> str:
    """BM25 top-k oracle. Stats (N, avgdl, df) over live docs (post-delete);
    the candidate filter is PRE-semantics (restricts candidates, not stats).
    ``term_pred`` (SQL over ``term``) replaces the IN-list — the multi-term
    rewrite oracle (prefix/wildcard SCORING_BOOLEAN_REWRITE scores every
    dictionary term matching the pattern). ``boosts`` multiplies each
    term's contribution (BoostQuery-wrapped clauses — bm25_topk parity).
    Tie-break: score desc, id asc. Scores rounded to 6 dp."""
    terms = list(dict.fromkeys(terms))
    live = f"NOT ({delete_pred})" if delete_pred else "TRUE"
    havg = f"HAVING count(DISTINCT term) = {len(terms)}" if mode == "and" else ""
    tf_pred = term_pred if term_pred else f"term IN {_terms_in(terms)}"
    boost = "1.0"
    if boosts:
        whens = " ".join(
            f"WHEN '{t}' THEN {float(w)!r}" for t, w in sorted(boosts.items())
        )
        boost = f"(CASE term {whens} ELSE 1.0 END)"
    toks = TOKENS.format(col=text_col)
    return f"""
WITH live_docs AS (
  SELECT {id_col} AS id, {text_col} AS txt,
         len({toks}) AS dl,
         ({filter_pred if filter_pred else 'TRUE'}) AS allowed
  FROM {table} WHERE {live}
),
stats AS (
  SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM live_docs
),
toks AS (
  SELECT id, unnest({TOKENS.format(col='txt')}) AS term FROM live_docs
),
tf AS (
  SELECT id, term, count(*) AS tf FROM toks
  WHERE {tf_pred} GROUP BY id, term
),
df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
),
scores AS (
  SELECT tf.id,
         sum( {boost} * ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * ({K1} + 1.0)
              / (tf.tf + {K1} * (1.0 - {B} + {B} * live_docs.dl / stats.avgdl))
            ) AS score
  FROM tf
  JOIN df USING (term)
  JOIN live_docs ON live_docs.id = tf.id
  CROSS JOIN stats
  WHERE live_docs.allowed
  GROUP BY tf.id
  {havg}
)
SELECT id AS {id_col}, round(score, {ROUND}) AS score
FROM scores
ORDER BY score DESC, id ASC
LIMIT {k}
""".strip()


def term_docs_sql(
    term: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    delete_pred: str | None = None,
) -> str:
    """TermQuery oracle (H4): ids of live docs whose token set contains term."""
    return boolean_and_sql([term], table, id_col, text_col, delete_pred)


def boolean_and_sql(
    terms: list[str],
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    delete_pred: str | None = None,
) -> str:
    """Boolean-AND oracle (H5): docs containing ALL terms."""
    terms = list(dict.fromkeys(terms))
    live = f"NOT ({delete_pred})" if delete_pred else "TRUE"
    toks = TOKENS.format(col=text_col)
    return f"""
SELECT {id_col}
FROM {table}
WHERE {live}
  AND {" AND ".join(f"list_contains({toks}, '{t}')" for t in terms)}
ORDER BY {id_col}
""".strip()


def boolean_query_sql(
    must: list[str] = (),
    any_of: list[str] = (),
    exclude: list[str] = (),
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    delete_pred: str | None = None,
    min_should_match: int | None = None,
) -> str:
    """BooleanQuery matching oracle: MUST ∧ (≥m SHOULD) ∧ ¬MUST_NOT
    (m = ``min_should_match``, Lucene's setMinimumNumberShouldMatch;
    None = Builder default — 0 with MUST present, else 1)."""
    live = f"NOT ({delete_pred})" if delete_pred else "TRUE"
    match = _bool_match_pred(must, any_of, exclude, min_should_match, text_col)
    return f"""
SELECT {id_col}
FROM {table}
WHERE {live} AND {match}
ORDER BY {id_col}
""".strip()


def _bool_match_pred(
    must, any_of, exclude, min_should_match: int | None, text_col: str
) -> str:
    """SQL predicate for BooleanQuery matching: MUST ∧ (≥m SHOULD) ∧
    ¬MUST_NOT, with Lucene's msm normalization (None = Builder default:
    0 with MUST present, else 1; an explicit m > #SHOULD matches
    nothing)."""
    toks = TOKENS.format(col=text_col)
    must = list(dict.fromkeys(must))
    any_of = list(dict.fromkeys(any_of))
    exclude = list(dict.fromkeys(exclude))
    preds = [f"list_contains({toks}, '{t}')" for t in must]
    m = 0 if min_should_match is None else int(min_should_match)
    if not must:
        m = max(1, m)
    if m > len(any_of):
        preds.append("FALSE")  # Lucene: mSM > #SHOULD matches nothing
    elif any_of and m == 1:
        preds.append(
            "(" + " OR ".join(
                f"list_contains({toks}, '{t}')" for t in any_of
            ) + ")"
        )
    elif any_of and m > 1:
        counts = " + ".join(
            f"CASE WHEN list_contains({toks}, '{t}') THEN 1 ELSE 0 END"
            for t in any_of
        )
        preds.append(f"(({counts}) >= {m})")
    preds += [f"NOT list_contains({toks}, '{t}')" for t in exclude]
    return "(" + " AND ".join(preds or ["TRUE"]) + ")"


def bm25_boolean_sql(
    must: list[str] = (),
    should: list[str] = (),
    exclude: list[str] = (),
    min_should_match: int = 0,
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    delete_pred: str | None = None,
) -> str:
    """Scored-BooleanQuery oracle: BM25 sum over the matched positive
    (must+should) clauses, restricted to docs matching MUST ∧ (≥m SHOULD)
    ∧ ¬MUST_NOT. msm defaults to 0 with MUST clauses present, else 1 —
    ``BooleanQuery`` semantics. Stats stay global (match restricts
    candidates, not df/avgdl), so this is :func:`bm25_sql` with the
    boolean match as the candidate filter."""
    m = int(min_should_match)
    if not list(must):
        m = max(1, m)
    match = _bool_match_pred(must, should, exclude, m, text_col)
    scoring = list(dict.fromkeys([*must, *should]))
    return bm25_sql(
        scoring, k=k, mode="or", table=table, id_col=id_col,
        text_col=text_col, filter_pred=match, delete_pred=delete_pred,
    )


def synonym_sql(
    terms: list[str],
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    delete_pred: str | None = None,
) -> str:
    """``SynonymQuery`` oracle (operators/bm25.synonym_topk): per-doc tf
    is the SUM across the synonym terms, docFreq is the MAX across them
    (merged TermStatistics), BM25 applied once to the merged tf; stats
    over live docs; tie-break score desc, id asc."""
    terms = list(dict.fromkeys(terms))
    live = f"NOT ({delete_pred})" if delete_pred else "TRUE"
    toks = TOKENS.format(col=text_col)
    return f"""
WITH live_docs AS (
  SELECT {id_col} AS id, {text_col} AS txt, len({toks}) AS dl
  FROM {table} WHERE {live}
),
stats AS (
  SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM live_docs
),
toks AS (
  SELECT id, unnest({TOKENS.format(col='txt')}) AS term FROM live_docs
),
tf AS (
  SELECT id, term, count(*) AS tf FROM toks
  WHERE term IN {_terms_in(terms)} GROUP BY id, term
),
syn_df AS (
  SELECT max(df) AS df FROM (SELECT term, count(*) AS df FROM tf GROUP BY term)
),
merged AS (
  SELECT id, sum(tf) AS tf FROM tf GROUP BY id
),
scores AS (
  SELECT merged.id,
         ln(1.0 + (stats.n - syn_df.df + 0.5) / (syn_df.df + 0.5))
           * merged.tf * ({K1} + 1.0)
           / (merged.tf + {K1} * (1.0 - {B} + {B} * live_docs.dl / stats.avgdl))
           AS score
  FROM merged
  JOIN live_docs ON live_docs.id = merged.id
  CROSS JOIN stats CROSS JOIN syn_df
)
SELECT id AS {id_col}, round(score, {ROUND}) AS score
FROM scores
ORDER BY score DESC, id ASC
LIMIT {k}
""".strip()


def spell_suggest_sql(
    term: str,
    max_edits: int = 2,
    num_suggestions: int = 5,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    delete_pred: str | None = None,
) -> str:
    """``DirectSpellChecker`` oracle (operators/multiterm.spell_suggest,
    transpositions=False so DuckDB's plain ``levenshtein`` is exact):
    dictionary terms ≠ query within max_edits, df = live docFreq > 0,
    ranked (distance asc, df desc, term asc)."""
    live = f"NOT ({delete_pred})" if delete_pred else "TRUE"
    toks = TOKENS.format(col=text_col)
    q = term.replace("'", "''")
    return f"""
WITH t AS (
  SELECT {id_col} AS id, {toks} AS toks FROM {table} WHERE {live}
),
d AS (
  SELECT term, count(DISTINCT id) AS df
  FROM (SELECT id, unnest(toks) AS term FROM t)
  GROUP BY term
)
SELECT term AS suggestion,
       CAST(levenshtein(term, '{q}') AS INT) AS distance,
       CAST(df AS BIGINT) AS df
FROM d
WHERE term != '{q}' AND levenshtein(term, '{q}') <= {int(max_edits)}
ORDER BY distance ASC, df DESC, suggestion ASC
LIMIT {int(num_suggestions)}
""".strip()


def complete_sql(
    prefix: str,
    num_suggestions: int = 5,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    delete_pred: str | None = None,
) -> str:
    """Prefix-completion oracle (operators/multiterm.complete): live
    dictionary terms with the prefix ranked (df desc, term asc)."""
    live = f"NOT ({delete_pred})" if delete_pred else "TRUE"
    toks = TOKENS.format(col=text_col)
    p = prefix.replace("'", "''")
    return f"""
WITH t AS (
  SELECT {id_col} AS id, {toks} AS toks FROM {table} WHERE {live}
),
d AS (
  SELECT term, count(DISTINCT id) AS df
  FROM (SELECT id, unnest(toks) AS term FROM t)
  WHERE starts_with(term, '{p}')
  GROUP BY term
)
SELECT term AS suggestion, CAST(df AS BIGINT) AS df
FROM d
ORDER BY df DESC, suggestion ASC
LIMIT {int(num_suggestions)}
""".strip()


def sorted_topk_sql(
    terms: list[str],
    sort_col: str,
    k: int = 10,
    ascending: bool = True,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    delete_pred: str | None = None,
) -> str:
    """``TopFieldCollector`` oracle (operators/bm25.sorted_topk): the
    disjunction's match set ordered by a stored field, id-asc tie-break,
    NULL sort values excluded."""
    live = f"NOT ({delete_pred})" if delete_pred else "TRUE"
    toks = TOKENS.format(col=text_col)
    anymatch = " OR ".join(
        f"list_contains({toks}, '{t.replace(chr(39), chr(39) * 2)}')"
        for t in dict.fromkeys(terms)
    )
    direction = "ASC" if ascending else "DESC"
    return f"""
SELECT {id_col}, CAST({sort_col} AS DOUBLE) AS sort_value
FROM {table}
WHERE {live} AND ({anymatch}) AND {sort_col} IS NOT NULL
ORDER BY sort_value {direction}, {id_col} ASC
LIMIT {int(k)}
""".strip()


def hit_count_sql(
    must: list[str] = (),
    any_of: list[str] = (),
    exclude: list[str] = (),
    min_should_match: int | None = None,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    delete_pred: str | None = None,
) -> str:
    """``IndexSearcher.count`` oracle (operators/bm25.hit_count): the
    live-doc count of the BooleanQuery match."""
    live = f"NOT ({delete_pred})" if delete_pred else "TRUE"
    match = _bool_match_pred(must, any_of, exclude, min_should_match, text_col)
    return f"""
SELECT count(*) AS n_hits FROM {table} WHERE {live} AND {match}
""".strip()


def hybrid_rrf_sql(
    terms: list[str],
    qvec_sql: str,
    k: int = 10,
    depth: int = 50,
    k_rrf: int = 60,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    filter_pred: str | None = None,
    delete_pred: str | None = None,
    vec_filter_pred: str | None = None,
) -> str:
    """Hybrid BM25 ∪ exact-kNN(l2) RRF oracle (operators/hybrid.py).

    Ranks are row_number over the 6-dp-rounded retriever scores with
    (score desc, id asc) tie-break — the exact ordering the engine's
    ``_ranked`` uses — then rrf = Σ 1/(k_rrf + rank), absent → 0.
    ``vec_filter_pred`` is the SAME pre-filter spelled over ``vec_id``
    (required whenever ``filter_pred`` is given — no fragile column-name
    rewriting); ``delete_pred`` (over the text table) excludes deleted
    docs from BOTH legs, matching the engine's shared tombstones."""
    if filter_pred and not vec_filter_pred:
        raise ValueError("vec_filter_pred required when filter_pred is set")
    bm25 = bm25_sql(
        terms, k=depth, table=table, id_col=id_col, text_col=text_col,
        filter_pred=filter_pred, delete_pred=delete_pred,
    )
    vpreds = []
    if vec_filter_pred:
        vpreds.append(f"({vec_filter_pred})")
    if delete_pred:
        vpreds.append(
            f"vec_id NOT IN (SELECT {id_col} FROM {table} WHERE {delete_pred})"
        )
    vfilter = f"WHERE {' AND '.join(vpreds)}" if vpreds else ""
    return f"""
WITH t AS ({bm25}),
tr AS (
  SELECT {id_col} AS id, row_number() OVER (ORDER BY score DESC, {id_col} ASC) AS r
  FROM t
),
v AS (
  SELECT vec_id AS id,
         round(1.0 / (1.0 + list_distance(embedding::DOUBLE[], {qvec_sql}) ** 2), {ROUND}) AS score
  FROM embeddings {vfilter}
  ORDER BY list_distance(embedding::DOUBLE[], {qvec_sql}) ASC, vec_id ASC
  LIMIT {depth}
),
vr AS (
  SELECT id, row_number() OVER (ORDER BY score DESC, id ASC) AS r FROM v
),
f AS (
  SELECT coalesce(tr.id, vr.id) AS id,
         coalesce(1.0 / ({k_rrf} + tr.r), 0) + coalesce(1.0 / ({k_rrf} + vr.r), 0) AS rrf,
         coalesce(tr.r, 0) AS br, coalesce(vr.r, 0) AS ar
  FROM tr FULL OUTER JOIN vr ON tr.id = vr.id
)
SELECT id AS {id_col}, round(rrf, {ROUND}) AS rrf,
       CAST(br AS INT) AS bm25_rank, CAST(ar AS INT) AS ann_rank
FROM f ORDER BY rrf DESC, id ASC LIMIT {k}
""".strip()


_ALL_K = 1 << 40  # effectively-unbounded LIMIT: the full scored match set


def group_topk_sql(
    terms: list[str],
    group_col: str,
    k_groups: int = 5,
    per_group: int = 3,
    mode: str = "or",
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    delete_pred: str | None = None,
) -> str:
    """Grouped-search oracle (operators/grouping.group_topk): top
    ``k_groups`` groups by head score (best hit, ties group asc), each
    with its top ``per_group`` docs (score desc, id asc); scores rounded
    to 6 dp BEFORE ranking on both sides. NULL group values excluded."""
    base = bm25_sql(
        terms, k=_ALL_K, mode=mode, table=table, id_col=id_col,
        text_col=text_col, delete_pred=delete_pred,
    )
    return f"""
WITH sc AS ({base}),
g AS (
  SELECT sc.{id_col} AS id, sc.score, CAST(d.{group_col} AS VARCHAR) AS group_value
  FROM sc JOIN {table} d ON d.{id_col} = sc.{id_col}
  WHERE d.{group_col} IS NOT NULL
),
pos AS (
  SELECT id, score, group_value,
         row_number() OVER (PARTITION BY group_value
                            ORDER BY score DESC, id ASC) AS position
  FROM g
),
gr AS (
  SELECT group_value,
         row_number() OVER (ORDER BY head_score DESC, group_value ASC) AS group_rank
  FROM (SELECT group_value, max(score) AS head_score FROM g GROUP BY group_value)
)
SELECT pos.group_value, CAST(gr.group_rank AS INT) AS group_rank,
       CAST(pos.position AS INT) AS position, pos.id AS {id_col}, pos.score
FROM pos JOIN gr USING (group_value)
WHERE gr.group_rank <= {int(k_groups)} AND pos.position <= {int(per_group)}
ORDER BY gr.group_rank, pos.position
""".strip()


def collapse_sql(
    terms: list[str],
    group_col: str,
    k: int = 10,
    mode: str = "or",
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    delete_pred: str | None = None,
) -> str:
    """Field-collapse oracle (operators/grouping.collapse_topk): global
    top-k over group heads — one best doc per group value — ranked
    (score desc, id asc) on 6-dp-rounded scores."""
    base = bm25_sql(
        terms, k=_ALL_K, mode=mode, table=table, id_col=id_col,
        text_col=text_col, delete_pred=delete_pred,
    )
    return f"""
WITH sc AS ({base}),
g AS (
  SELECT sc.{id_col} AS id, sc.score, CAST(d.{group_col} AS VARCHAR) AS group_value
  FROM sc JOIN {table} d ON d.{id_col} = sc.{id_col}
  WHERE d.{group_col} IS NOT NULL
),
heads AS (
  SELECT id, group_value, score,
         row_number() OVER (PARTITION BY group_value
                            ORDER BY score DESC, id ASC) AS position
  FROM g
)
SELECT id AS {id_col}, group_value, score
FROM heads WHERE position = 1
ORDER BY score DESC, id ASC
LIMIT {int(k)}
""".strip()


def _slots(phrase) -> list[list[str]]:
    """Phrase spec → per-slot term lists (a str is a 1-term slot; a list
    is a MultiPhraseQuery union slot)."""
    return [[s] if isinstance(s, str) else list(s) for s in phrase]


def _phrase_tf(phrase, toks_expr: str = "toks") -> str:
    """DuckDB phrase-frequency expression over a token-array column:
    anchors i where every slot j has toks[i+j] == phrase[j] (1-based
    list indexing; generate_series(1, n-L+1) is empty when n < L).
    A list-valued slot matches ANY of its terms (MultiPhraseQuery)."""
    slots = _slots(phrase)

    def cond(j: int, terms: list[str]) -> str:
        lhs = f"{toks_expr}[i{'+' + str(j) if j else ''}]"
        if len(terms) == 1:
            return lhs + " = '" + terms[0].replace("'", "''") + "'"
        return lhs + " IN " + _terms_in(terms)

    conds = " AND ".join(cond(j, t) for j, t in enumerate(slots))
    return (
        f"len(list_filter(generate_series(1, len({toks_expr}) - {len(slots) - 1}), "
        f"i -> {conds}))"
    )


def phrase_match_sql(
    phrase: list[str],
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    delete_pred: str | None = None,
) -> str:
    """Exact-phrase match oracle → (id, phrase_tf) for live docs with ≥1
    occurrence (operators/positions.py phrase_match)."""
    live = f"NOT ({delete_pred})" if delete_pred else "TRUE"
    toks = TOKENS.format(col=text_col)
    tf = _phrase_tf(phrase)
    return f"""
WITH t AS (
  SELECT {id_col} AS id, {toks} AS toks FROM {table} WHERE {live}
)
SELECT id AS {id_col}, CAST({tf} AS BIGINT) AS phrase_tf
FROM t WHERE {tf} > 0
ORDER BY id
""".strip()


def phrase_bm25_sql(
    phrase: list[str],
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    delete_pred: str | None = None,
) -> str:
    """Scored Phrase/MultiPhraseQuery oracle (Lucene PhraseWeight ×
    BM25Similarity): idf = Σ over every slot's terms of
    ln(1 + (N - df_t + 0.5)/(df_t + 0.5)) — duplicates counted, df = 0
    terms skipped (``IndexSearcher.termStatistics`` returns null for
    them) — tf = phrase frequency, norm = full doc length; stats over
    live docs. A list-valued slot is a MultiPhraseQuery union slot."""
    live = f"NOT ({delete_pred})" if delete_pred else "TRUE"
    toks = TOKENS.format(col=text_col)
    tf = _phrase_tf(phrase)

    def term_idf(w: str) -> str:
        q = "'" + w.replace("'", "''") + "'"
        df = f"(SELECT count(*) FROM t WHERE list_contains(toks, {q}))"
        return (
            f"(CASE WHEN {df} > 0 THEN "
            f"ln(1.0 + (stats.n - {df} + 0.5) / ({df} + 0.5)) "
            "ELSE 0.0 END)"
        )

    idf_terms = " + ".join(
        term_idf(w) for slot in _slots(phrase) for w in slot
    )
    return f"""
WITH t AS (
  SELECT {id_col} AS id, {toks} AS toks, len({toks}) AS dl
  FROM {table} WHERE {live}
),
stats AS (
  SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM t
),
m AS (
  SELECT id, dl, CAST({tf} AS BIGINT) AS tf FROM t WHERE {tf} > 0
)
SELECT id AS {id_col},
       round(({idf_terms})
             * m.tf * ({K1} + 1.0)
             / (m.tf + {K1} * (1.0 - {B} + {B} * m.dl / stats.avgdl)),
             {ROUND}) AS score
FROM m CROSS JOIN stats
ORDER BY score DESC, id ASC
LIMIT {k}
""".strip()


def dismax_sql(
    terms: list[str],
    tie_breaker: float = 0.0,
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    delete_pred: str | None = None,
) -> str:
    """``DisjunctionMaxQuery`` oracle (operators/bm25.dismax_topk):
    score = max(per-term BM25 contribution) + tie × (sum − max) over the
    matched terms; stats over live docs; tie-break score desc, id asc."""
    terms = list(dict.fromkeys(terms))
    live = f"NOT ({delete_pred})" if delete_pred else "TRUE"
    toks = TOKENS.format(col=text_col)
    tie = float(tie_breaker)
    return f"""
WITH live_docs AS (
  SELECT {id_col} AS id, {text_col} AS txt, len({toks}) AS dl
  FROM {table} WHERE {live}
),
stats AS (
  SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM live_docs
),
toks AS (
  SELECT id, unnest({TOKENS.format(col='txt')}) AS term FROM live_docs
),
tf AS (
  SELECT id, term, count(*) AS tf FROM toks
  WHERE term IN {_terms_in(terms)} GROUP BY id, term
),
df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
),
contrib AS (
  SELECT tf.id,
         ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * live_docs.dl / stats.avgdl))
           AS c
  FROM tf
  JOIN df USING (term)
  JOIN live_docs ON live_docs.id = tf.id
  CROSS JOIN stats
),
scores AS (
  SELECT id, max(c) + {tie!r} * (sum(c) - max(c)) AS score
  FROM contrib GROUP BY id
)
SELECT id AS {id_col}, round(score, {ROUND}) AS score
FROM scores
ORDER BY score DESC, id ASC
LIMIT {k}
""".strip()


def span_near_sql(
    terms: list[str],
    slop: int = 0,
    in_order: bool = True,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    delete_pred: str | None = None,
) -> str:
    """``SpanNearQuery`` oracle (operators/positions.span_near) →
    live-doc ids with a satisfying span, constant-score match set.

    Ordered: positions p_0 < … < p_{L-1} with toks[p_j] = term_j and
    width p_{L-1} − p_0 − (L−1) ≤ slop (nested EXISTS lambdas, each level
    bounded by the window). Unordered: some window of slop + L
    consecutive positions contains every term (terms must be distinct, so
    the one-position-per-term requirement is automatic)."""
    L = len(terms)
    if L < 2:
        raise ValueError("span_near needs >= 2 terms")
    if len(set(terms)) != L:
        raise ValueError("span_near terms must be distinct")
    live = f"NOT ({delete_pred})" if delete_pred else "TRUE"
    toks = TOKENS.format(col=text_col)
    w = int(slop) + L - 1  # max key distance first→last

    def q(t: str) -> str:
        return "'" + t.replace("'", "''") + "'"

    if in_order:
        # innermost → outermost: level j scans positions after level j-1,
        # bounded by i0 + w; the term check sits at each level
        cond = "TRUE"
        for j in range(L - 1, 0, -1):
            prev = f"i{j - 1}"
            cond = (
                f"len(list_filter(generate_series({prev} + 1, least(i0 + {w}, len(toks))), "
                f"i{j} -> toks[i{j}] = {q(terms[j])} AND {cond})) > 0"
            )
        pred = (
            f"len(list_filter(generate_series(1, len(toks)), "
            f"i0 -> toks[i0] = {q(terms[0])} AND {cond})) > 0"
        )
    else:
        per_term = " AND ".join(
            f"len(list_filter(generate_series(w0, least(w0 + {w}, len(toks))), "
            f"i -> toks[i] = {q(t)})) > 0"
            for t in terms
        )
        pred = (
            f"len(list_filter(generate_series(1, len(toks)), "
            f"w0 -> {per_term})) > 0"
        )
    return f"""
WITH t AS (
  SELECT {id_col} AS id, {toks} AS toks FROM {table} WHERE {live}
)
SELECT id AS {id_col} FROM t WHERE {pred} ORDER BY id
""".strip()


def span_first_sql(
    term: str,
    end: int,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    delete_pred: str | None = None,
) -> str:
    """``SpanFirstQuery`` oracle (operators/positions.span_first): live
    docs where ``term`` occurs within the first ``end`` token positions
    (0-based position < end ⇔ one of the first ``end`` tokens)."""
    live = f"NOT ({delete_pred})" if delete_pred else "TRUE"
    toks = TOKENS.format(col=text_col)
    t = term.replace("'", "''")
    return f"""
SELECT {id_col}
FROM {table}
WHERE {live}
  AND list_contains(({toks})[1:{int(end)}], '{t}')
ORDER BY {id_col}
""".strip()


def highlight_sql(
    terms: list[str],
    window: int = 5,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    delete_pred: str | None = None,
    pre_tag: str = "<b>",
    post_tag: str = "</b>",
) -> str:
    """Highlighter oracle (operators/highlight.highlight): for every live
    doc containing ≥1 query term, the 0-based first-occurrence position
    and the ±window analyzed-token passage with query terms tagged.
    DuckDB lists are 1-based (list_position returns 0 when absent), so
    fp = min over terms of list_position and first_pos = fp − 1."""
    terms = list(dict.fromkeys(terms))
    live = f"NOT ({delete_pred})" if delete_pred else "TRUE"
    toks = TOKENS.format(col=text_col)
    big = 1 << 40
    fp = "least(" + ", ".join(
        f"coalesce(nullif(list_position(toks, '{t.replace(chr(39), chr(39) * 2)}'), 0), {big})"
        for t in terms
    ) + ")"
    inlist = _terms_in(terms)
    pre = pre_tag.replace("'", "''")
    post = post_tag.replace("'", "''")
    w = int(window)
    return f"""
WITH t AS (
  SELECT {id_col} AS id, {toks} AS toks FROM {table} WHERE {live}
),
p AS (
  SELECT id, toks, {fp} AS fp FROM t
)
SELECT id AS {id_col},
       CAST(fp - 1 AS BIGINT) AS first_pos,
       array_to_string(
         list_transform(toks[greatest(1, fp - {w}):least(len(toks), fp + {w})],
                        x -> CASE WHEN x IN {inlist}
                             THEN '{pre}' || x || '{post}' ELSE x END),
         ' ') AS snippet
FROM p WHERE fp < {big}
ORDER BY id
""".strip()


def contamination_sql(
    n: int = 8,
    eval_pred: str = "doc_id % 17 = 0",
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Eval-set decontamination oracle (operators/dedup.ngram_contamination):
    for every train doc (NOT eval_pred), the count of DISTINCT token
    n-grams it shares with ANY eval doc, plus the contaminated flag.
    Docs shorter than n tokens contribute no n-grams."""
    toks = TOKENS.format(col=text_col)
    return f"""
WITH t AS (
  SELECT {id_col} AS id, ({eval_pred}) AS is_eval, {toks} AS toks FROM {table}
),
grams AS (
  SELECT id, is_eval,
         unnest(list_transform(generate_series(1, len(toks) - {n - 1}),
                               i -> array_to_string(toks[i:i+{n - 1}], ' '))) AS g
  FROM t
),
eval_grams AS (
  SELECT DISTINCT g FROM grams WHERE is_eval
),
overlap AS (
  SELECT grams.id, count(DISTINCT grams.g) AS o
  FROM grams JOIN eval_grams USING (g)
  WHERE NOT grams.is_eval
  GROUP BY grams.id
)
SELECT t.id AS {id_col},
       CAST(coalesce(overlap.o, 0) AS BIGINT) AS overlap_ngrams,
       coalesce(overlap.o, 0) > 0 AS contaminated
FROM t LEFT JOIN overlap ON overlap.id = t.id
WHERE NOT t.is_eval
ORDER BY t.id
""".strip()


def repetition_sql(
    n: int = 2,
    min_grams: int = 10,
    top_frac_max: float = 0.2,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Within-doc n-gram repetition oracle (functions/textstats.
    repetition_stats — the Gopher top-n-gram-fraction rule). The oracle
    takes the unnest→groupBy route; the engine computes the same counts
    shuffle-free with a sorted-array fold."""
    toks = TOKENS.format(col=text_col)
    return f"""
WITH t AS (
  SELECT {id_col} AS id, {toks} AS toks FROM {table}
),
g AS (
  SELECT id,
         unnest(list_transform(generate_series(1, len(toks) - {n - 1}),
                               i -> array_to_string(toks[i:i+{n - 1}], ' '))) AS gram
  FROM t WHERE len(toks) >= {n}
),
c AS (
  SELECT id, gram, count(*) AS c FROM g GROUP BY id, gram
),
s AS (
  SELECT id, sum(c) AS total, max(c) AS best, count(*) AS dist
  FROM c GROUP BY id
)
SELECT t.id AS {id_col},
       CAST(coalesce(s.total, 0) AS BIGINT) AS n_grams,
       round(coalesce(s.best * 1.0 / s.total, 0.0), {ROUND}) AS top_gram_frac,
       round(coalesce(s.dist * 1.0 / s.total, 0.0), {ROUND}) AS distinct_gram_frac,
       coalesce(s.total >= {int(min_grams)}
                AND s.best * 1.0 / s.total > {float(top_frac_max)!r}, FALSE)
         AS repetitive
FROM t LEFT JOIN s ON s.id = t.id
ORDER BY t.id
""".strip()


def training_mix_sql(
    rates: dict[str, float],
    default_rate: float = 0.0,
    table: str = "documents",
    id_col: str = "doc_id",
    strat_col: str = "lang",
) -> str:
    """Stratified training-mix oracle (operators/sampling.training_mix):
    u = (pmod(id, 1048573) · 31397 mod 1048576) / 1048576 — exact int64
    arithmetic on both sides, non-negative remainder spelled as
    ((id % P + P) % P) so negative ids land in [0, 1) too — kept iff
    u < rate(stratum)."""
    u = f"((({id_col} % 1048573 + 1048573) % 1048573) * 31397 % 1048576) / 1048576.0"
    whens = " ".join(
        f"WHEN '{k.replace(chr(39), chr(39) * 2)}' THEN {float(rates[k])!r}"
        for k in sorted(rates)
    )
    rate = f"(CASE {strat_col} {whens} ELSE {float(default_rate)!r} END)"
    return f"""
SELECT {id_col}, CAST({strat_col} AS VARCHAR) AS stratum,
       {u} AS u, {u} < {rate} AS keep
FROM {table}
ORDER BY {id_col}
""".strip()


def facet_sql(
    term: str,
    facet_col: str,
    top_n: int | None = None,
    table: str = "documents",
    text_col: str = "text",
    delete_pred: str | None = None,
) -> str:
    """Flat facet-counts oracle (operators/facets.facet_counts over a
    TermQuery match set): per facet value, the count of live matching
    docs, (count desc, value asc), optional top-N."""
    live = f"NOT ({delete_pred})" if delete_pred else "TRUE"
    toks = TOKENS.format(col=text_col)
    lim = f"LIMIT {top_n}" if top_n is not None else ""
    t = term.replace("'", "''")
    return f"""
SELECT CAST({facet_col} AS VARCHAR) AS value, count(*) AS count
FROM {table}
WHERE {live} AND list_contains({toks}, '{t}') AND {facet_col} IS NOT NULL
GROUP BY 1
ORDER BY count DESC, value ASC
{lim}
""".strip()


def range_facet_sql(
    term: str,
    value_col: str,
    ranges: list[tuple[str, int, int]],
    table: str = "documents",
    text_col: str = "text",
    delete_pred: str | None = None,
) -> str:
    """Range facet-counts oracle (operators/facets.range_facet_counts over
    a TermQuery match set): one row per requested inclusive range, zero
    counts kept, overlapping ranges each count the doc."""
    live = f"NOT ({delete_pred})" if delete_pred else "TRUE"
    toks = TOKENS.format(col=text_col)
    t = term.replace("'", "''")
    arms = "\nUNION ALL\n".join(
        f"SELECT '{lab.replace(chr(39), chr(39) * 2)}' AS label, "
        f"(SELECT count(*) FROM m WHERE {value_col} BETWEEN {int(lo)} AND {int(hi)}) AS count"
        for lab, lo, hi in ranges
    )
    return f"""
WITH m AS (
  SELECT * FROM {table}
  WHERE {live} AND list_contains({toks}, '{t}')
)
{arms}
""".strip()


def mlt_sql(
    seed_id: int,
    k: int = 10,
    max_query_terms: int = 25,
    min_term_freq: int = 2,
    min_doc_freq: int = 5,
    max_doc_freq: int | None = None,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    delete_pred: str | None = None,
) -> str:
    """MoreLikeThis oracle (operators/mlt.more_like_this_topk): select the
    seed doc's top terms by tf × (1 + ln(N/(df+1))) (ClassicSimilarity
    idf; tf ≥ min_term_freq, df ≥ min_doc_freq, optional df cap; selection
    score rounded to 9 dp, ties term-asc, top max_query_terms), then score
    the corpus with the standard BM25 disjunction over the selected
    terms."""
    live = f"NOT ({delete_pred})" if delete_pred else "TRUE"
    toks = TOKENS.format(col=text_col)
    max_df = f"AND cand_df.df <= {int(max_doc_freq)}" if max_doc_freq is not None else ""
    return f"""
WITH live_docs AS (
  SELECT {id_col} AS id, {text_col} AS txt, len({toks}) AS dl
  FROM {table} WHERE {live}
),
stats AS (
  SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM live_docs
),
alltoks AS (
  SELECT id, unnest({TOKENS.format(col='txt')}) AS term FROM live_docs
),
seed_tf AS (
  SELECT term, count(*) AS tf FROM alltoks WHERE id = {int(seed_id)}
  GROUP BY term HAVING count(*) >= {int(min_term_freq)}
),
cand_df AS (
  SELECT term, count(DISTINCT id) AS df FROM alltoks
  WHERE term IN (SELECT term FROM seed_tf) GROUP BY term
),
sel AS (
  SELECT seed_tf.term
  FROM seed_tf JOIN cand_df USING (term) CROSS JOIN stats
  WHERE cand_df.df >= {max(int(min_doc_freq), 1)} {max_df}
  ORDER BY round(seed_tf.tf * (1.0 + ln(stats.n / (cand_df.df + 1.0))), 9) DESC,
           seed_tf.term ASC
  LIMIT {int(max_query_terms)}
),
tf AS (
  SELECT id, term, count(*) AS tf FROM alltoks
  WHERE term IN (SELECT term FROM sel) GROUP BY id, term
),
df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
),
scores AS (
  SELECT tf.id,
         sum( ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * ({K1} + 1.0)
              / (tf.tf + {K1} * (1.0 - {B} + {B} * live_docs.dl / stats.avgdl))
            ) AS score
  FROM tf
  JOIN df USING (term)
  JOIN live_docs ON live_docs.id = tf.id
  CROSS JOIN stats
  GROUP BY tf.id
)
SELECT id AS {id_col}, round(score, {ROUND}) AS score
FROM scores
ORDER BY score DESC, id ASC
LIMIT {k}
""".strip()

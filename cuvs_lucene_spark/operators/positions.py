"""Positional postings + PhraseQuery (host-Lucene query surface, §2.5).

Lucene stores per-(term, doc) position lists (``IndexOptions
.DOCS_AND_FREQS_AND_POSITIONS``) so ``PhraseQuery`` can verify adjacency
by streaming position intersection; the reference relies on the host for
this whole tier (its vector query composes with arbitrary host queries —
GPUKnnFloatVectorQuery.java:21-58). Spark-first equivalent:

- ``positions`` catalog table, ONE row per (segment, term):
  ``ext_ids`` raw int64 docs (sorted), ``counts`` varint per-doc position
  counts, ``pos_blob`` varint within-doc position deltas (first absolute,
  then gaps — Lucene's position delta encoding). The writer encodes each
  segment's stream ONCE and byte-slices the blobs per term
  (``varint_byte_lengths``) — no vocabulary-sized re-encode loop.
- ``phrase_match``: pruned scan of the L phrase terms' rows (pushed
  ``term IN``), per-segment vectorized anchor intersection
  (key = doc·2²⁰ + shifted position, ``np.intersect1d`` per slot) →
  (ext_id, phrase_tf). No corpus scan, no driver-side doc state.
  A slot may be a LIST of terms (Lucene ``MultiPhraseQuery`` — the slot
  matches any member, e.g. a prefix-expanded position): the slot's key
  sets union before the intersection.
- ``phrase_topk``: Lucene ``PhraseWeight`` scoring — idf is the SUM of
  the constituent terms' BM25 idfs (duplicated slots count twice, as
  ``PhraseQuery.getTerms()`` feeds every slot's termStats into
  ``BM25Similarity``), tf is the phrase frequency, norm is the full doc
  length. Stats come from the live-doc machinery bm25_topk uses.

Positions are an OPT-IN sidecar (like Lucene's per-field IndexOptions):
``build_positions`` derives them from the source docs + the committed
``doc_map``; after a merge/append changes the segment set, phrase queries
raise ``PositionsStaleError`` until ``refresh_positions`` re-derives the
missing segments (group-wise incremental — untouched segments are never
re-read; dead segments' rows are ignored via a live-segment semi-join).
"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IndexConfig
from ..functions.tokenize import tokenize_py
from ..functions.varint import varint_byte_lengths, varint_decode, varint_encode
from .bm25 import _live_stats_and_df, _query_postings, idf

POS_SCHEMA = (
    "segment_id long, term string, ext_ids binary, counts binary, pos_blob binary"
)
POS_SHIFT = 1 << 20  # max tokens per doc; anchor key = ext_id * SHIFT + pos


class PositionsStaleError(RuntimeError):
    """The positions sidecar does not cover every live segment (a merge,
    append, or streamed epoch changed the segment set since
    ``build_positions``). Run ``refresh_positions`` with the source docs."""


def build_positions_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """One segment's (segment_id, ext_id, text) rows → positions rows.

    Same dense-batch shape as the postings flush (factorize + lexsort over
    the whole token stream, boundaries via flatnonzero/reduceat); the
    per-term assembly is pure blob slicing."""
    seg = int(pdf["segment_id"].iloc[0])
    pdf = pdf.sort_values("ext_id", kind="mergesort").reset_index(drop=True)
    ext_doc = pdf["ext_id"].to_numpy(np.int64)
    toks = tokenize_py(pdf["text"])
    counts_per_doc = toks.str.len().to_numpy(np.int64)
    if counts_per_doc.max(initial=0) >= POS_SHIFT:
        raise ValueError(f"doc exceeds {POS_SHIFT} tokens (positions key space)")
    flat = list(itertools.chain.from_iterable(toks))
    empty = pd.DataFrame(
        {
            "segment_id": pd.Series([], dtype="int64"),
            "term": pd.Series([], dtype="object"),
            "ext_ids": pd.Series([], dtype="object"),
            "counts": pd.Series([], dtype="object"),
            "pos_blob": pd.Series([], dtype="object"),
        }
    )
    if not flat:
        return empty
    term_codes, uniq_terms = pd.factorize(pd.array(flat), sort=True)
    term_codes = term_codes.astype(np.int64)
    n_docs = len(pdf)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts_per_doc)
    offs = np.cumsum(counts_per_doc) - counts_per_doc
    pos_in_doc = np.arange(doc_idx.size, dtype=np.int64) - np.repeat(offs, counts_per_doc)
    order = np.lexsort((pos_in_doc, doc_idx, term_codes))
    tc, dx, ps = term_codes[order], doc_idx[order], pos_in_doc[order]
    total = tc.size
    # (term, doc) pair boundaries over the sorted stream
    pair_mask = np.empty(total, dtype=bool)
    pair_mask[0] = True
    pair_mask[1:] = (tc[1:] != tc[:-1]) | (dx[1:] != dx[:-1])
    pair_starts = np.flatnonzero(pair_mask)
    pair_counts = np.diff(np.append(pair_starts, total))
    pair_term = tc[pair_starts]
    pair_ext = ext_doc[dx[pair_starts]]
    # position deltas, reset (absolute) at each pair start
    deltas = ps.copy()
    deltas[1:] -= ps[:-1]
    deltas[pair_starts] = ps[pair_starts]
    # term boundaries over the pair stream
    tmask = np.empty(pair_starts.size, dtype=bool)
    tmask[0] = True
    tmask[1:] = pair_term[1:] != pair_term[:-1]
    t_starts = np.flatnonzero(tmask)
    t_ends = np.append(t_starts[1:], pair_starts.size)
    # whole-segment blobs, sliced per term at value boundaries
    pos_blob = varint_encode(deltas)
    pos_bs = np.concatenate(([0], np.cumsum(varint_byte_lengths(deltas))))
    cnt_blob = varint_encode(pair_counts)
    cnt_bs = np.concatenate(([0], np.cumsum(varint_byte_lengths(pair_counts))))
    ext_raw = pair_ext.tobytes()  # raw int64 (ext ids may exceed 2^32)
    tok_bounds = np.append(pair_starts[t_starts], total)
    return pd.DataFrame(
        {
            "segment_id": np.full(t_starts.size, seg, dtype=np.int64),
            "term": np.asarray(uniq_terms, dtype=object)[pair_term[t_starts]],
            "ext_ids": [
                ext_raw[a * 8 : b * 8] for a, b in zip(t_starts, t_ends)
            ],
            "counts": [
                cnt_blob[cnt_bs[a] : cnt_bs[b]] for a, b in zip(t_starts, t_ends)
            ],
            "pos_blob": [
                pos_blob[pos_bs[a] : pos_bs[b]]
                for a, b in zip(tok_bounds[:-1], tok_bounds[1:])
            ],
        }
    )


def _decode_positions(row) -> np.ndarray:
    """One positions row → keys = ext·SHIFT + absolute position, ascending."""
    ext = np.frombuffer(row.ext_ids, dtype=np.int64)
    counts = varint_decode(row.counts)
    vals = varint_decode(row.pos_blob)
    if vals.size == 0:
        return np.empty(0, np.int64)
    cum = np.cumsum(vals)
    starts = np.cumsum(counts) - counts
    base = cum[starts] - vals[starts]
    absolute = cum - np.repeat(base, counts)
    return np.repeat(ext, counts) * POS_SHIFT + absolute


def _live_segs(spark: SparkSession, cat) -> DataFrame:
    return cat.read(spark, "doc_map").select("segment_id").distinct()


def _missing_segs(spark: SparkSession, cat) -> DataFrame:
    """Live segments the sidecar does not cover (DataFrame — never a
    driver-side set; at 10⁶ segments this stays a metadata-scale
    anti-join)."""
    live = _live_segs(spark, cat)
    if not cat.exists("positions"):
        return live
    pos = cat.read(spark, "positions").select("segment_id").distinct()
    return live.join(pos, "segment_id", "left_anti")


def _build_segments(
    spark: SparkSession, cat, docs: DataFrame, segments: DataFrame | None,
    content_col: str, id_col: str,
) -> DataFrame:
    """Positions rows for the given segment set (None = every live
    segment). The doc_map join restricts the source scan; the segment
    restriction is a broadcast semi-join, never a collected id list."""
    dm = cat.read(spark, "doc_map").select("segment_id", "ext_id")
    if segments is not None:
        dm = dm.join(F.broadcast(segments), "segment_id", "left_semi")
    src = docs.select(
        F.col(id_col).cast("long").alias("ext_id"),
        F.col(content_col).alias("text"),
    )
    joined = src.join(dm, "ext_id")
    # the sidecar must cover every indexed doc of these segments: a source
    # missing docs (or duplicating ext_ids) would otherwise write a silently
    # partial/doubled sidecar that phrase queries trust forever
    exp = dm.groupBy("segment_id").agg(F.count("*").alias("n_exp"))
    got = joined.groupBy("segment_id").agg(F.count("*").alias("n_got"))
    bad = (
        exp.join(got, "segment_id", "left")
        .where(F.coalesce(F.col("n_got"), F.lit(0)) != F.col("n_exp"))
    )
    row = bad.select("segment_id", "n_exp", "n_got").first()
    if row is not None:
        raise ValueError(
            f"positions build: segment {row['segment_id']} has "
            f"{row['n_got'] or 0} source docs for {row['n_exp']} indexed "
            "docs — the docs DataFrame must contain every indexed doc "
            "exactly once"
        )
    return joined.groupBy("segment_id").applyInPandas(
        lambda p: build_positions_pdf(p), POS_SCHEMA
    )


def build_positions(
    spark: SparkSession,
    cat,
    docs: DataFrame,
    cfg: IndexConfig | None = None,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Derive the positions sidecar for every live segment (opt-in, like
    enabling positions in a Lucene field's IndexOptions). Idempotent."""
    if cat.exists("positions") and _missing_segs(spark, cat).limit(1).count() == 0:
        return
    out = _build_segments(spark, cat, docs, None, content_col, id_col)
    cat.write(out, "positions", sort_within_partitions=["term"])


def refresh_positions(
    spark: SparkSession,
    cat,
    docs: DataFrame,
    cfg: IndexConfig | None = None,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> int:
    """Group-wise incremental repair after merge/append: build ONLY live
    segments missing from the sidecar and append their rows; untouched
    segments are never re-read (rows of dead segments are ignored at query
    time by the live-segment semi-join). Returns #segments built."""
    missing = _missing_segs(spark, cat)
    n_missing = missing.count()  # merge-bounded metadata job
    if n_missing == 0:
        return 0
    out = _build_segments(spark, cat, docs, missing, content_col, id_col)
    if cat.exists("positions"):
        cat.append(out, "positions")
    else:
        cat.write(out, "positions", sort_within_partitions=["term"])
    return n_missing


def _sidecar_fresh(spark: SparkSession, cat) -> bool:
    """Memoized coverage check: does the sidecar cover every live
    segment? Keyed on (stats version, positions commit time), so a repeat
    query on an unchanged index pays ZERO staleness jobs — the anti-join
    re-runs only after a commit that could actually change coverage
    (build/merge/delete or a positions rebuild)."""
    from cuvs_lucene_spark.sources.catalog import stats_version

    m = cat.read_manifest()
    key = (
        stats_version(m),
        m["tables"].get("positions", {}).get("committed_at", 0),
    )
    memo = getattr(cat, "_pos_fresh_memo", None)
    if memo is not None and memo["ver"] == key:
        return memo["ok"]
    ok = _missing_segs(spark, cat).limit(1).count() == 0
    cat._pos_fresh_memo = {"ver": key, "ok": ok}
    return ok


def _phrase_rows(spark: SparkSession, cat, terms: list[str]) -> DataFrame:
    if not cat.exists("positions"):
        raise PositionsStaleError(
            "no positions sidecar — run build_positions(spark, cat, docs)"
        )
    if not _sidecar_fresh(spark, cat):
        raise PositionsStaleError(
            "positions sidecar missing live segments — "
            "run refresh_positions(spark, cat, docs)"
        )
    rows = cat.read(spark, "positions").filter(F.col("term").isin(terms))
    # ignore rows of segments dropped by a merge (dead segments)
    return rows.join(F.broadcast(_live_segs(spark, cat)), "segment_id", "left_semi")


def _norm_slots(phrase) -> list[list[str]]:
    """Phrase spec → per-slot term lists: a plain term is a 1-term slot
    (PhraseQuery), a list is a union slot (MultiPhraseQuery). Empty terms
    are dropped; an explicitly empty slot is an error."""
    slots: list[list[str]] = []
    for slot in phrase:
        terms = [slot] if isinstance(slot, str) else list(slot)
        terms = list(dict.fromkeys(t for t in terms if t))
        if not terms and not isinstance(slot, str):
            raise ValueError("multi-phrase slot has no terms")
        if terms:
            slots.append(terms)
    return slots


def phrase_match(
    spark: SparkSession,
    cat,
    phrase,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """Exact-phrase matcher → DataFrame(ext_id, phrase_tf), live docs only.

    Each slot may be one term (Lucene ``PhraseQuery``) or a LIST of terms
    (``MultiPhraseQuery`` — the slot matches ANY of them, e.g. a
    prefix-expanded position). Per segment: decode each distinct term's
    position keys once, union them per slot, then for slot j intersect
    anchor sets keyed ext·SHIFT + (pos − j) — all numpy, no per-doc loop.
    Tombstones apply as a left-anti (set semantics are unchanged by pre-
    vs post-filtering a match set)."""
    slots = _norm_slots(phrase)
    if not slots:
        return spark.createDataFrame([], "ext_id long, phrase_tf long")
    uniq = list(dict.fromkeys(t for s in slots for t in s))
    rows = _phrase_rows(spark, cat, uniq)

    def match(pdf: pd.DataFrame) -> pd.DataFrame:
        by_term: dict[str, np.ndarray] = {}
        for term, grp in pdf.groupby("term"):
            parts = [_decode_positions(r) for r in grp.itertuples()]
            keys = np.concatenate(parts)
            if len(parts) > 1:
                # np.unique (not sort): a duplicated sidecar row — e.g. a
                # crash-repair overlap — must not break assume_unique below
                keys = np.unique(keys)
            by_term[term] = keys
        empty = pd.DataFrame({"ext_id": [], "phrase_tf": []}).astype(
            {"ext_id": "int64", "phrase_tf": "int64"}
        )
        anchors = None
        for j, slot_terms in enumerate(slots):
            present = [by_term[t] for t in slot_terms if t in by_term]
            if not present:
                return empty
            if len(present) == 1:
                keys = present[0]
            else:
                # union slot (MultiPhraseQuery): distinct terms can't share
                # a (doc, position) key, so the union stays duplicate-free
                keys = np.unique(np.concatenate(present))
            if j:
                shifted = keys - j
                # a shifted position must stay inside its own doc's space
                shifted = shifted[(keys % POS_SHIFT) >= j]
                anchors = np.intersect1d(anchors, shifted, assume_unique=True)
            else:
                anchors = keys
            if anchors.size == 0:
                break
        if anchors is None or anchors.size == 0:
            return empty
        docs, tfs = np.unique(anchors // POS_SHIFT, return_counts=True)
        return pd.DataFrame({"ext_id": docs, "phrase_tf": tfs.astype(np.int64)})

    out = rows.groupby("segment_id").applyInPandas(
        lambda p: match(p), "ext_id long, phrase_tf long"
    )
    if cat.exists("tombstones"):
        out = out.join(cat.read(spark, "tombstones"), "ext_id", "left_anti")
    return out


def phrase_topk(
    spark: SparkSession,
    cat,
    phrase,
    k: int = 10,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """Scored Phrase/MultiPhraseQuery → DataFrame(ext_id, score), top-k.

    Lucene ``PhraseWeight`` semantics: idf = Σ idf(term) over every slot's
    terms (``PhraseQuery.getTerms()`` passes every slot's termStats,
    duplicates included; for MultiPhraseQuery every union-slot member
    counts, and terms with df = 0 are skipped — ``IndexSearcher.
    termStatistics`` returns null for them), tf = phrase frequency, norm =
    full doc length; stats over live docs (fresh-reader strictness, as
    bm25_topk)."""
    cfg = cfg or IndexConfig()
    slots = _norm_slots(phrase)
    if k <= 0 or not slots:
        return spark.createDataFrame([], "ext_id long, score double")
    uniq = list(dict.fromkeys(t for s in slots for t in s))
    postings = _query_postings(spark, cat, uniq, cfg)
    n, avgdl, df_by_term = _live_stats_and_df(spark, cat, uniq, cfg, postings, None)
    if n == 0 or any(
        all(df_by_term.get(t, 0) == 0 for t in s) for s in slots
    ):
        return spark.createDataFrame([], "ext_id long, score double")
    idf_sum = float(sum(
        idf(n, df_by_term[t])
        for s in slots for t in s if df_by_term.get(t, 0) > 0
    ))
    matches = phrase_match(spark, cat, slots, cfg)
    dl = cat.read(spark, "doc_map").select("ext_id", "dl")
    k1, b = cfg.bm25.k1, cfg.bm25.b
    scored = matches.join(dl, "ext_id").select(
        "ext_id",
        (
            F.lit(idf_sum)
            * F.col("phrase_tf") * (k1 + 1.0)
            / (F.col("phrase_tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
        ).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc("ext_id")).limit(k)


def span_first(
    spark: SparkSession,
    cat,
    term: str,
    end: int,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """Lucene ``SpanFirstQuery(SpanTermQuery(term), end)`` →
    DataFrame(ext_id): live docs where ``term`` occurs at a position
    < ``end`` (spans ending within the first ``end`` positions; a
    unit-length term span ending at p+1 qualifies iff p+1 ≤ end).

    Same physical shape as the other sidecar queries: a pruned scan of
    ONE term's position rows, per-segment numpy mask — cost ∝ that
    term's postings."""
    if not term:
        raise ValueError("span_first needs a term")
    if end <= 0:
        return spark.createDataFrame([], "ext_id long")
    rows = _phrase_rows(spark, cat, [term])
    end_i = int(end)

    def match(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = np.concatenate([_decode_positions(r) for r in pdf.itertuples()])
        if keys.size and len(pdf) > 1:
            keys = np.unique(keys)
        hits = keys[keys % POS_SHIFT < end_i]
        return pd.DataFrame({"ext_id": np.unique(hits // POS_SHIFT)})

    out = rows.groupby("segment_id").applyInPandas(
        lambda p: match(p), "ext_id long"
    )
    out = out.distinct()
    if cat.exists("tombstones"):
        out = out.join(cat.read(spark, "tombstones"), "ext_id", "left_anti")
    return out


def span_near(
    spark: SparkSession,
    cat,
    terms: list[str],
    slop: int = 0,
    in_order: bool = True,
    cfg: IndexConfig | None = None,
) -> DataFrame:
    """Lucene ``SpanNearQuery`` over single-term clauses →
    DataFrame(ext_id), live docs only (constant-score match set, like the
    multi-term ``*_docs`` queries).

    - ``in_order=True``: positions p_0 < … < p_{L-1} with term_j at p_j
      and span width p_{L-1} − p_0 − (L−1) ≤ slop (``SpanNearQuery``'s
      ordered matcher with unit-length clauses).
    - ``in_order=False``: some window of slop + L consecutive positions
      contains every term. Terms must be distinct (one position per
      clause is then automatic — the tokenizer emits one term per
      position).

    Physical shape is :func:`phrase_match`'s: a PRUNED scan of just the
    span terms' position rows (pushed isin on the sidecar), per-segment
    numpy matching — vectorized searchsorted chains, no per-doc Python
    loop, no corpus scan. Scale: cost ∝ the queried terms' posting sizes
    only, embarrassingly parallel across segments.

    Reference: the host-Lucene proximity surface next to PhraseQuery
    (SURVEY.md §2.5); span width accounting per
    ``SpanNearQuery.SpanNearWeight`` with unit-length term spans.
    """
    L = len(terms)
    if L < 2:
        raise ValueError("span_near needs >= 2 terms")
    if len(set(terms)) != L:
        raise ValueError("span_near terms must be distinct")
    if slop < 0:
        raise ValueError("slop must be >= 0")
    rows = _phrase_rows(spark, cat, list(terms))
    w = int(slop) + L - 1  # max key distance first→last inside one doc
    term_order = list(terms)
    ordered = bool(in_order)

    def match(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"ext_id": pd.Series([], dtype="int64")})
        by_term: dict[str, np.ndarray] = {}
        for term, grp in pdf.groupby("term"):
            parts = [_decode_positions(r) for r in grp.itertuples()]
            keys = np.concatenate(parts)
            if len(parts) > 1:
                keys = np.unique(keys)
            by_term[term] = keys
        if any(t not in by_term for t in term_order):
            return empty  # a clause has no position in this segment
        A = [by_term[t] for t in term_order]
        if ordered:
            # left→right DP: f[i] = MAX chain start over chains ending at
            # A[j][i]. Max start == tightest window; cross-doc starts have
            # strictly smaller keys than same-doc ones, so the end-of-chain
            # same-doc check below never masks a feasible same-doc chain.
            f = A[0]
            prev = A[0]
            for j in range(1, L):
                cm = np.maximum.accumulate(f)
                idx = np.searchsorted(prev, A[j], side="left")  # prev < cur
                g = np.where(idx > 0, cm[np.maximum(idx - 1, 0)], np.int64(-1))
                f, prev = g, A[j]
            last = A[-1]
            ok = (f >= 0) & (last - f <= w) & (last // POS_SHIFT == f // POS_SHIFT)
            hits = last[ok]
        else:
            # for every candidate window start (any term occurrence), the
            # tightest covering window ends at max over terms of the next
            # occurrence ≥ start; a match is a window of width ≤ w
            merged = np.unique(np.concatenate(A))
            sent = np.iinfo(np.int64).max
            wend = np.full(merged.size, np.int64(-1))
            for a in A:
                idx = np.searchsorted(a, merged, side="left")
                nxt = np.where(
                    idx < a.size, a[np.minimum(idx, a.size - 1)], sent
                )
                np.maximum(wend, nxt, out=wend)
            ok = (wend != sent) & (wend - merged <= w) & (
                wend // POS_SHIFT == merged // POS_SHIFT
            )
            hits = merged[ok]
        if hits.size == 0:
            return empty
        return pd.DataFrame({"ext_id": np.unique(hits // POS_SHIFT)})

    out = rows.groupby("segment_id").applyInPandas(
        lambda p: match(p), "ext_id long"
    )
    # distinct across segments is a no-op (a doc lives in one segment) but
    # keeps the contract explicit after future repartitions
    out = out.distinct()
    if cat.exists("tombstones"):
        out = out.join(cat.read(spark, "tombstones"), "ext_id", "left_anti")
    return out

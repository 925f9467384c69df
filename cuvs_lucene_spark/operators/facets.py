"""Faceting over query match sets — the Lucene facets-module surface.

Two shapes, mirroring the two core Lucene facet kinds:

- :func:`facet_counts` — flat string facets (SortedSetDocValues facets /
  ``FastTaxonomyFacetCounts.getTopChildren``): per facet value, the count
  of MATCHING docs, top-N by (count desc, value asc).
- :func:`range_facet_counts` — numeric range facets
  (``LongRangeFacetCounts``): per caller-supplied inclusive [lo, hi]
  range, the count of matching docs whose value falls in the range
  (ranges may overlap, exactly like Lucene's — a doc counts in every
  range containing it).

The facet dimension lives on the SOURCE table (the stored-fields model:
our index keeps postings + doc map and rehydrates columns by joining
back to source, operators/bm25.fetch_stored). A facet count is therefore
one left-semi join of source on the match set followed by a hash
aggregate — both whole-stage-codegen equi-operations:

100 TB shape: the semi-join shuffles on the compact doc id (or
broadcast-converts when the match set is small — AQE decides); the
aggregate does map-side partial counts per value, so the shuffle after
it carries at most (#distinct facet values × partitions) rows. Range
facets never join at all above the semi-join: ONE pass of conditional
aggregation (one sum per range) — a single scan regardless of the number
of ranges, then a constant-size stack. Nothing is ever collected.

Reference surface: the Lucene facets module the host searcher exposes
next to the query API (SURVEY.md §2.5 host-Lucene layer); the reference
itself adds no facet formats, so this follows stock Lucene semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _matched(docs: DataFrame, match: DataFrame, id_col: str) -> DataFrame:
    """Source rows whose id is in the match set (ext_id or single-column)."""
    if "ext_id" in match.columns:
        mcol = "ext_id"
    elif len(match.columns) == 1:
        mcol = match.columns[0]
    else:
        raise ValueError(
            f"match must have an 'ext_id' column (or exactly one column); "
            f"got {match.columns}"
        )
    keys = match.select(F.col(mcol).cast("long").alias(id_col)).distinct()
    return docs.join(keys, id_col, "left_semi")


def facet_counts(
    docs: DataFrame,
    match: DataFrame,
    facet_col: str,
    top_n: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-N facet values over a match set →
    DataFrame(value, count), ordered (count desc, value asc) —
    ``getTopChildren`` with Lucene's count-then-label tie-break.
    ``top_n=None`` returns every value (``getAllChildren``). NULL facet
    values are docs without the dimension — excluded, as Lucene only
    counts docs that indexed the facet field."""
    out = (
        _matched(docs, match, id_col)
        .filter(F.col(facet_col).isNotNull())
        .groupBy(F.col(facet_col).cast("string").alias("value"))
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), F.asc("value"))
    )
    if top_n is not None:
        if top_n <= 0:
            raise ValueError(f"top_n must be positive, got {top_n}")
        out = out.limit(top_n)
    return out


def range_facet_counts(
    docs: DataFrame,
    match: DataFrame,
    value_col: str,
    ranges: list[tuple[str, int, int]],
    id_col: str = "doc_id",
) -> DataFrame:
    """Numeric range facets over a match set →
    DataFrame(label, count), one row per requested range (zero counts
    kept — Lucene reports every requested range). ``ranges`` is
    [(label, lo, hi)] with INCLUSIVE endpoints (``LongRange(label, lo,
    true, hi, true)``); ranges may overlap and a doc counts in every
    range containing its value. Labels must be unique.

    ONE conditional-aggregation pass: a single distributed scan computes
    every range count, then a constant-size stack reshapes the 1-row
    result — no per-range jobs, no non-equi join."""
    if not ranges:
        raise ValueError("ranges must be non-empty")
    labels = [lab for lab, _, _ in ranges]
    if len(set(labels)) != len(labels):
        raise ValueError(f"range labels must be unique, got {labels}")
    for lab, lo, hi in ranges:
        if lo > hi:
            raise ValueError(f"range {lab!r}: lo {lo} > hi {hi}")
    m = _matched(docs, match, id_col)
    aggs = [
        F.sum(
            F.when(F.col(value_col).between(lo, hi), 1).otherwise(0)
        ).cast("long").alias(f"_r{i}")
        for i, (_, lo, hi) in enumerate(ranges)
    ]
    one = m.agg(*aggs)
    stack = ", ".join(
        "'{}', coalesce(_r{}, 0L)".format(lab.replace("'", "\\'"), i)
        for i, (lab, _, _) in enumerate(ranges)
    )
    return one.selectExpr(
        f"stack({len(ranges)}, {stack}) AS (label, count)"
    )

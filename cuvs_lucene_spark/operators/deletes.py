"""Deletes / tombstones (H7, SURVEY.md §2.5; reference evidence:
``writer.deleteDocuments(Term)`` in ``TestMerge.java:700`` and
``TestCuVSDeletedDocuments.java:83``).

Lucene model: deletes are logical (live-docs bitset) until a merge
physically drops them (M5). Spark-first equivalent: a ``tombstones(ext_id)``
table; queries apply it as a pre-filter mask inside the scorer
(never post-filter — S10 semantics); merges drop tombstoned docs and
clear their tombstones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuvs_lucene_spark.sources.catalog import IndexCatalog


def delete_docs(spark: SparkSession, cat: IndexCatalog, ext_ids: DataFrame) -> int:
    """Tombstone the given docs (DataFrame with an ``ext_id`` column).
    Idempotent: re-deleting is a no-op. Returns live doc count after."""
    new = ext_ids.select(F.col("ext_id").cast("long")).distinct()
    if cat.exists("tombstones"):
        new = cat.read(spark, "tombstones").union(new).distinct()
    new = new.cache()
    n_tomb = new.count()
    # the tombstone count rides the manifest lineage so every query can
    # answer "are there deletes?" without an isEmpty Spark job
    cat.write(new, "tombstones", lineage={"n": n_tomb})
    new.unpersist()
    dm = cat.read(spark, "doc_map")
    return dm.join(cat.read(spark, "tombstones"), "ext_id", "left_anti").count()


def delete_by_term(spark: SparkSession, cat: IndexCatalog, term: str, cfg=None) -> int:
    """``deleteDocuments(Term)`` analogue: tombstone every doc containing term."""
    from cuvs_lucene_spark.operators.bm25 import term_docs

    return delete_docs(spark, cat, term_docs(spark, cat, term, cfg))


def live_doc_map(spark: SparkSession, cat: IndexCatalog) -> DataFrame:
    dm = cat.read(spark, "doc_map")
    if cat.exists("tombstones"):
        dm = dm.join(cat.read(spark, "tombstones"), "ext_id", "left_anti")
    return dm

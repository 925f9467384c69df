"""Deduplication operators for large-scale training-data pipelines.

All hot paths are pure Catalyst expressions (md5 / explode / joins —
whole-stage codegen, shuffle only on compact keys), never crossJoin:

- exact        — hash-groupBy on a canonical content fingerprint
- minhash LSH  — shingle → P md5-minhashes → band signatures → bucket
                 self-join (candidates only collide within a band bucket;
                 at 10^12 docs the join key (band, sig) is uniformly
                 distributed, so no skew salting is needed)
- ngram-Jaccard— exact verification via shingle-equi-join (intersection
                 counted per pair; |A∪B| = |A|+|B|−|A∩B|), no pair
                 enumeration outside shared-shingle pairs
- simhash      — 32-bit sign-aggregated token hashes (hex-parse parity
                 with the DuckDB oracle is tested)
- embedding    — cosine-threshold near-dup pairs; exact at test scale,
                 same verification composes with LSH/IVF buckets at scale

Determinism: every hash is md5 of an explicit string — bit-stable across
Spark, DuckDB, and re-runs (resumability).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuvs_lucene_spark.functions.tokenize import tokenize_expr


def _canon_text(text_col: str):
    """Canonical form = tokens joined by single spaces (case/punct-invariant)."""
    return F.array_join(tokenize_expr(text_col), " ")


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups → (fingerprint, n_dups, keep_id, dup_ids).
    keep_id = min id (deterministic representative)."""
    return (
        docs.select(F.col(id_col).alias("id"), F.md5(_canon_text(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count("*").cast("int").alias("n_dups"),
            F.min("id").alias("keep_id"),
            F.sort_array(F.collect_list("id")).alias("dup_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def _shingles(text_col: str, n: int = 3):
    """Distinct n-token shingles as a JVM expression (no UDF)."""
    toks = tokenize_expr(text_col)
    return F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.expr(
                f"transform(sequence(1, size(regexp_extract_all(lower({text_col}), '[a-z0-9_]+', 0)) - {n - 1}), "
                f"i -> concat_ws(' ', slice(regexp_extract_all(lower({text_col}), '[a-z0-9_]+', 0), i, {n})))"
            ),
        ).otherwise(F.array(F.array_join(toks, " ")))
    )


def doc_shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("id"), F.explode(_shingles(text_col, n)).alias("shingle")
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perm: int = 12,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, p, mh): per-doc minhash under P md5 'permutations'
    (mh_p = min over shingles of md5(p || '|' || shingle)).

    All P minhashes are computed as P aggregate columns in ONE pass over
    the shingle rows (single shuffle on id; no row explosion — at 10^12
    docs the shingle stream dominates, so a P× crossJoin would multiply
    shuffle volume by P for nothing)."""
    sh = doc_shingles(docs, id_col, text_col, shingle_n)
    aggs = [
        F.min(F.md5(F.concat_ws("|", F.lit(p), F.col("shingle")))).alias(f"mh_{p}")
        for p in range(n_perm)
    ]
    wide = sh.groupBy("id").agg(*aggs)
    # unpivot back to the (id, p, mh) long shape
    pairs = []
    for p in range(n_perm):
        pairs += [f"'{p}'", f"mh_{p}"]
    return wide.selectExpr("id", f"stack({n_perm}, {', '.join(pairs)}) AS (p, mh)").select(
        "id", F.col("p").cast("int").alias("p"), "mh"
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perm: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing ≥1 LSH band bucket."""
    rows_per_band = n_perm // bands
    sigs = (
        minhash_signatures(docs, id_col, text_col, n_perm, shingle_n)
        .withColumn("band", (F.col("p") / rows_per_band).cast("int"))
        .groupBy("id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "mh"))), lambda x: x["mh"]
                ),
                ",",
            ).alias("sig")
        )
    )
    a = sigs.alias("a")
    b = sigs.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.sig") == F.col("b.sig")))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact Jaccard near-dup pairs via shingle equi-join (never crossJoin):
    pairs sharing zero shingles are never materialized."""
    sh = doc_shingles(docs, id_col, text_col, shingle_n)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32) -> DataFrame:
    """32-bit SimHash fingerprints: per-token md5-derived hash, tf-weighted
    sign aggregation per bit. (id, simhash long)."""
    tf = (
        docs.select(F.col(id_col).alias("id"), F.explode(tokenize_expr(text_col)).alias("t"))
        .groupBy("id", "t")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long"))
    )
    bit = tf.select(
        "id", "tf", "h", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b")
    ).withColumn(
        "w",
        F.when(F.expr("shiftright(h, b)").bitwiseAND(F.lit(1)) == 1, F.col("tf")).otherwise(
            -F.col("tf")
        ),
    )
    return (
        bit.groupBy("id", "b")
        .agg(F.sum("w").alias("s"))
        .withColumn(
            "bitval",
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(
                F.lit(0).cast("long")
            ),
        )
        .groupBy("id")
        .agg(F.sum("bitval").alias("simhash"))
    )


def embedding_near_dup(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Cosine-threshold near-duplicate pairs over an embedding column.

    Exact all-pairs at test scale. At 10^12 scale the identical
    verification expression runs per LSH/IVF bucket (join on bucket id
    from simhash-of-projection or the ANN sidecar's IVF assignment)
    instead of the full self-join.
    """
    vec64 = F.transform(F.col(vector_col), lambda v: v.cast("double"))
    norm = F.sqrt(
        F.aggregate(F.transform(vec64, lambda v: v * v), F.lit(0.0), lambda a, v: a + v)
    )
    base = vectors.select(
        F.col(id_col).alias("id"), vec64.alias("v"), norm.alias("nrm")
    )
    a, b = base.alias("a"), base.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (dot / (F.col("a.nrm") * F.col("b.nrm"))).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )

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


def dedup_keep_list(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The pipeline DECISION exact dedup feeds downstream: every doc id
    with a keep flag — the minimum id of each exact-content group
    survives, all other members drop. (id, keep, group_size). One
    hash-partitioned window over the content fingerprint; fingerprints
    are uniformly distributed, so no skew handling is needed."""
    from pyspark.sql import Window

    w = Window.partitionBy("fingerprint")
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.md5(_canon_text(text_col)).alias("fingerprint"),
        )
        .withColumn("keep", F.col("id") == F.min("id").over(w))
        .withColumn("group_size", F.count("*").over(w).cast("int"))
        .select("id", "keep", "group_size")
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


def simhash_near_dup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
    bits: int = 32,
) -> DataFrame:
    """EXACT SimHash near-duplicate pairs: all (id_a < id_b) with
    hamming(simhash_a, simhash_b) ≤ ``max_hamming`` → (id_a, id_b, hamming).

    Scale shape: the fingerprint is split into ``bands`` contiguous bit
    bands; candidates are pairs agreeing on ≥1 band (equi-join on
    (band, band_value) — a compact uniformly-distributed key), then the
    exact hamming distance verifies. With ``bands > max_hamming`` this is
    LOSSLESS by pigeonhole: ≤ max_hamming differing bits cannot touch all
    bands, so every true pair shares at least one identical band. No
    crossJoin anywhere; the result provably equals the all-pairs scan.
    """
    if bands <= max_hamming:
        raise ValueError("bands must exceed max_hamming for exact recall")
    if bits % bands:
        raise ValueError("bits must divide evenly into bands")
    bw = bits // bands
    sh = simhash(docs, id_col, text_col, bits)
    band_vals = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.expr(f"shiftright(simhash, {i * bw})")
                        .bitwiseAND(F.lit((1 << bw) - 1))
                        .alias("val"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bv"),
    ).select("id", "simhash", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    a, b = band_vals.alias("a"), band_vals.alias("b")
    cand = (
        a.join(b, ["band", "val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def _cos_base(vectors: DataFrame, id_col: str, vector_col: str) -> DataFrame:
    vec64 = F.transform(F.col(vector_col), lambda v: v.cast("double"))
    norm = F.sqrt(
        F.aggregate(F.transform(vec64, lambda v: v * v), F.lit(0.0), lambda a, v: a + v)
    )
    return vectors.select(F.col(id_col).alias("id"), vec64.alias("v"), norm.alias("nrm"))


def _pair_dot():
    return F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def embedding_near_dup(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    threshold: float = 0.95,
    n_blocks: int = 16,
) -> DataFrame:
    """EXACT cosine-threshold near-duplicate pairs over an embedding column.

    Distributed block-matrix shape — never a BroadcastNestedLoopJoin: rows
    hash into ``n_blocks`` blocks, each packed into one dense matrix; the
    n_blocks·(n_blocks+1)/2 unordered block pairs form a tiny broadcast
    relation; two EQUI-joins route each block pair's two packs into one
    task, where the full cosine sub-matrix is ONE BLAS matmul. Exact
    all-pairs work is inherent to an exact threshold join (O(N²) dot
    products), but it runs as ~B²/2 balanced matrix multiplies on compact
    join keys — no driver-side broadcast of the data, no single fat
    partition, no per-row expression folds. For high thresholds at extreme
    scale, :func:`embedding_near_dup_lsh` prunes candidates first.
    """
    import numpy as np
    import pandas as pd

    spark = vectors.sparkSession
    base = vectors.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vector_col), lambda v: v.cast("double")).alias("v"),
    ).withColumn("blk", F.pmod(F.xxhash64("id"), F.lit(n_blocks)).cast("int"))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        m = np.stack([np.asarray(v, np.float64) for v in pdf["v"].to_numpy()])[order]
        return pd.DataFrame(
            {"blk": [int(pdf["blk"].iloc[0])], "n": [np.int32(ids.size)],
             "dim": [np.int32(m.shape[1])], "ids": [ids.tobytes()],
             "mat": [m.tobytes()]}
        )

    packs = base.groupBy("blk").applyInPandas(
        pack, "blk int, n int, dim int, ids binary, mat binary"
    )
    pair_rows = [(a, b) for a in range(n_blocks) for b in range(n_blocks) if a <= b]
    pairs = spark.createDataFrame(pair_rows, "ba int, bb int")
    a_side = packs.select(
        F.col("blk").alias("ba"), F.col("n").alias("na"), "dim",
        F.col("ids").alias("ids_a"), F.col("mat").alias("mat_a"),
    )
    b_side = packs.select(
        F.col("blk").alias("bb"), F.col("n").alias("nb"),
        F.col("ids").alias("ids_b"), F.col("mat").alias("mat_b"),
    )
    j = a_side.join(F.broadcast(pairs), "ba").join(b_side, "bb")
    thr = float(threshold)

    def verify(it):
        for pdf in it:
            for r in pdf.itertuples():
                ia = np.frombuffer(r.ids_a, np.int64)
                ib = np.frombuffer(r.ids_b, np.int64)
                ma = np.frombuffer(r.mat_a, np.float64).reshape(r.na, r.dim)
                mb = np.frombuffer(r.mat_b, np.float64).reshape(r.nb, r.dim)
                na = np.linalg.norm(ma, axis=1)
                nb = np.linalg.norm(mb, axis=1)
                na[na == 0] = 1.0
                nb[nb == 0] = 1.0
                cosm = (ma @ mb.T) / np.outer(na, nb)
                mask = cosm >= thr
                if r.ba == r.bb:
                    mask &= np.triu(np.ones_like(mask), k=1).astype(bool)
                ii, jj = np.nonzero(mask)
                if ii.size == 0:
                    continue
                aid, bid = ia[ii], ib[jj]
                yield pd.DataFrame(
                    {"id_a": np.minimum(aid, bid),
                     "id_b": np.maximum(aid, bid),
                     "cos": np.round(cosm[ii, jj], 6)}
                )

    return j.mapInPandas(verify, "id_a long, id_b long, cos double")


def embedding_near_dup_lsh(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    threshold: float = 0.8,
    bands: int = 32,
    rows_per_band: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine near-dup pairs: signed-random-projection LSH
    candidates (equi-join on (band, signature)) + exact cosine verification
    of candidates only. Precision is exact (every returned pair is
    verified); recall is probabilistic — for a pair at cosine s, the miss
    probability is (1 − (1 − acos(s)/π)^r)^b, e.g. ≈1e-7 at s=0.8 with
    r=4, b=32. Deterministic: projections derive from ``seed``.

    This is the 10^12-row path: candidate volume scales with bucket
    collisions, not N², and every join is an equi-join on a compact key.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(bands * rows_per_band, dim))
    vec64 = F.transform(F.col(vector_col), lambda v: v.cast("double"))
    base = vectors.select(F.col(id_col).alias("id"), vec64.alias("v"))
    # one signature column per band: r sign bits of fixed projections,
    # evaluated as pure Catalyst expressions (no UDF)
    sig_cols = []
    for bd in range(bands):
        bits = []
        for r_ in range(rows_per_band):
            p = planes[bd * rows_per_band + r_]
            dot = F.aggregate(
                F.zip_with(
                    F.col("v"),
                    F.array(*[F.lit(float(x)) for x in p]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(1 << r_))
        sig = bits[0]
        for extra in bits[1:]:
            sig = sig + extra
        sig_cols.append(F.struct(F.lit(bd).alias("band"), sig.alias("sig")))
    buckets = base.select(
        "id", F.explode(F.array(*sig_cols)).alias("bs")
    ).select("id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    cand = (
        buckets.alias("x")
        .join(buckets.alias("y"), ["band", "sig"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    cb = _cos_base(vectors, id_col, vector_col)
    verified = (
        cand.join(cb.alias("a"), F.col("id_a") == F.col("a.id"))
        .join(cb.alias("b"), F.col("id_b") == F.col("b.id"))
        .select(
            "id_a",
            "id_b",
            (_pair_dot() / (F.col("a.nrm") * F.col("b.nrm"))).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )
    return verified


def duplicate_components(
    pairs: DataFrame,
    all_ids: DataFrame | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components over near-duplicate candidate pairs →
    ``(id, component, keep)`` with ``component`` = the minimum id reachable
    through the pair graph and ``keep`` = (id == component) — the cluster
    decision table a dedup pipeline feeds downstream (pairs alone
    under-delete: A~B and B~C must collapse to ONE survivor even when A~C
    was never emitted as a candidate).

    Algorithm: iterative min-label propagation WITH pointer jumping.
    Every round each node adopts the minimum label in its closed
    neighborhood (its own label and all neighbors'), then follows one hop
    through the label table (label ← label[label], path halving) — the
    hop compresses chains exponentially, so rounds ≈ O(log diameter)
    instead of O(diameter); a fixpoint is the component minimum.
    ``max_iterations`` is a generous backstop.

    Scale shape: each round is TWO equi-joins on the node id + ONE
    groupBy(min) — compact long keys, no crossJoin, partial aggregation
    map-side. Every round eagerly ``localCheckpoint``s the new label
    table and unpersists the previous round's frames — lineage stays one
    round deep and executor storage stays bounded at two label tables
    (iterative-plan hygiene; an unbounded cache chain OOMs the driver
    long before the algorithm converges). Deterministic: min is
    order-independent.

    ``all_ids`` (one ``id`` column, optional): include singletons with
    ``component = id`` so the output is a TOTAL decision table.
    """
    edges = pairs.select(
        F.col(id_a).cast("long").alias("a"), F.col(id_b).cast("long").alias("b")
    )
    # materialize the pair graph ONCE — candidate generation (band joins,
    # hamming verify, ...) upstream of `pairs` must not re-execute every
    # propagation round
    und = (
        edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select(F.col("a").alias("id")).distinct().withColumn("label", F.col("id"))
    ).localCheckpoint(eager=True)
    for it in range(max_iterations):
        nbr_min = (
            und.join(labels, und["a"] == labels["id"])
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("label").alias("nmin"))
        )
        cand = labels.join(nbr_min, "id", "left").select(
            "id",
            F.least(F.col("label"), F.coalesce("nmin", "label")).alias("label"),
        )
        # pointer jump: every label IS a node id, so follow one hop
        # through the PREVIOUS label table (already materialized — no
        # extra pass) — chains collapse exponentially
        hop = labels.select(
            F.col("id").alias("hid"), F.col("label").alias("hlabel")
        )
        new_labels = (
            cand.join(hop, cand["label"] == hop["hid"], "left")
            .select(
                cand["id"],
                F.least(cand["label"], F.coalesce("hlabel", cand["label"])).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        # the previous round's checkpointed labels are now obsolete —
        # release their storage (bounded at two label tables live)
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"duplicate_components did not converge in {max_iterations} rounds"
        )
    comp = labels.select("id", F.col("label").alias("component"))
    if all_ids is not None:
        comp = (
            all_ids.select(F.col(all_ids.columns[0]).cast("long").alias("id"))
            .join(comp, "id", "left")
            .select("id", F.coalesce("component", "id").alias("component"))
        )
    return comp.withColumn("keep", F.col("id") == F.col("component"))


def ngram_contamination(
    train: DataFrame,
    evals: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Eval-set decontamination for training corpora →
    DataFrame(id_col, overlap_ngrams, contaminated): for EVERY train doc,
    how many of its DISTINCT token n-grams appear in ANY eval doc, and
    the boolean flag. Docs shorter than n tokens contribute no n-grams
    (never contaminated by themselves).

    Physical shape (100 TB): explode → distinct per side (map-side
    partial dedup), ONE equi-join on the n-gram string — the eval side of
    a decontamination run is benchmarks, i.e. tiny next to the corpus, so
    AQE broadcast-converts it — then a groupBy on the train doc id. No
    all-pairs step anywhere. At extreme gram cardinality the join key can
    be xxhash64(g) (8-byte shuffle keys, 2^-64 collision odds); the
    string key is kept here for bit-exact oracle parity.
    """
    if n < 1:
        raise ValueError("n must be >= 1")

    def grams(df: DataFrame):
        toks = tokenize_expr(text_col)
        pat = "regexp_extract_all(lower({c}), '[a-z0-9_]+', 0)".format(c=text_col)
        return F.when(
            F.size(toks) >= n,
            F.expr(
                f"transform(sequence(1, size({pat}) - {n - 1}), "
                f"i -> concat_ws(' ', slice({pat}, i, {n})))"
            ),
        ).otherwise(F.array().cast("array<string>"))

    train_g = train.select(
        F.col(id_col).alias("id"), F.explode(grams(train)).alias("g")
    ).distinct()
    eval_g = evals.select(F.explode(grams(evals)).alias("g")).distinct()
    overlap = (
        train_g.join(eval_g, "g", "left_semi")
        .groupBy("id")
        .agg(F.count("*").alias("o"))
    )
    return (
        train.select(F.col(id_col).cast("long").alias("id"))
        .join(overlap, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("o", F.lit(0)).cast("long").alias("overlap_ngrams"),
            (F.coalesce("o", F.lit(0)) > 0).alias("contaminated"),
        )
    )

"""Round-5 delete/crash-consistency surface:

- DataFrame-native ``delete_ann`` with the blob tombstone tier: above
  ``FILTER_BROADCAST_MAX`` registered deletes, NO driver-side id array is
  ever built (poisoned array tier) and every search format still excludes
  the deleted ids — the per-segment liveDocs model
  (``TestCuVSDeletedDocuments.java:83``) at mass-delete scale.
- Absolute tombstone-count merge trigger (a fraction is not a size), read
  from the catalog's PERSISTED config, not the deleting caller's cfg.
- merge_ann crash states: stale ``ann_ids`` self-heals from manifest tags
  (ADVICE: a crash between the flat and ids appends must not silently
  exclude merged vectors from filtered queries); segments whose
  ``ann_ivfpq`` / ``ann_bq`` rows are missing stay reachable.
- merge_ann refuses overlapping groups (lineage corruption guard).
"""

from __future__ import annotations

import dataclasses
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

import cuvs_lucene_spark.operators.ann as A
from cuvs_lucene_spark.config import IndexConfig
from cuvs_lucene_spark.sources.catalog import IndexCatalog

CFG = IndexConfig(rows_per_segment=100, block_size=16, term_buckets=8)
# crash-state tests need the merge appends to SURVIVE (auto-compaction
# rewrites tables and clears the append tags being doctored)
NOCOMPACT = dataclasses.replace(CFG, compact_dropped_fraction=1.0)


def _vec(i: int) -> list[float]:
    return [float(i % 13), float(i % 7), float(i % 5), 1.0] * 2


def _build(spark, root, n=120, rps=40, metric="l2", cfg=CFG):
    df = spark.createDataFrame(
        [(i, _vec(i)) for i in range(n)], "vec_id long, embedding array<float>"
    )
    ccfg = dataclasses.replace(cfg, ann=dataclasses.replace(cfg.ann, metric=metric))
    return A.build_ann(
        spark, df, root, ccfg, id_col="vec_id", vector_col="embedding",
        rows_per_segment=rps,
    ), df


def test_dataframe_delete_blob_tier_no_driver_array(spark, tmp_path, monkeypatch):
    """Mass delete > FILTER_BROADCAST_MAX via a DataFrame: the tombstone
    set must resolve through per-segment blobs on EVERY search path —
    poison the closure-array tier and compare against the array-tier
    results captured first."""
    cat, df = _build(spark, str(tmp_path / "massdel"))
    A.build_ann_pq(spark, cat, CFG)
    A.build_ann_ivfpq(spark, cat, CFG)
    from cuvs_lucene_spark.operators.ann_graph import ann_topk_graph, build_ann_graph

    build_ann_graph(spark, cat, CFG)

    # delete every third id, registered as a DataFrame (no driver set)
    dels = df.filter(F.col("vec_id") % 3 == 0).select("vec_id")
    n_del = dels.count()
    n = A.delete_ann(spark, cat, dels, CFG, auto_merge=False)
    assert n == n_del

    q = _vec(1)
    searches = {
        "exact": lambda: A.ann_topk(spark, cat, q, k=8, cfg=CFG, mode="exact"),
        "ivf": lambda: A.ann_topk(spark, cat, q, k=8, cfg=CFG, mode="ivf"),
        "sq": lambda: A.ann_topk_sq(spark, cat, q, k=8, cfg=CFG),
        "pq": lambda: A.ann_topk_pq(spark, cat, q, k=8, cfg=CFG),
        "bq": lambda: A.ann_topk_bq(spark, cat, q, k=8, cfg=CFG),
        "ivfpq": lambda: A.ann_topk_ivfpq(spark, cat, q, k=8, cfg=CFG),
        "graph": lambda: ann_topk_graph(spark, cat, q, k=8, cfg=CFG),
    }
    want = {name: fn().collect() for name, fn in searches.items()}
    for name, rows in want.items():
        assert rows, name
        assert all(r[0] % 3 != 0 for r in rows), (name, rows)

    # force the blob tier (count now exceeds the patched threshold) and
    # poison the closure-array tier — it must never be consulted
    monkeypatch.setattr(A, "FILTER_BROADCAST_MAX", 5)
    cat._ann_tomb_memo = None
    monkeypatch.setattr(
        A, "_tombstone_array",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("driver tombstone array built on the blob tier")
        ),
    )
    for name, fn in searches.items():
        got = fn().collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want[name]], name

    # the bucketed kNN join honors blob-tier tombstones too
    qdf = df.filter(F.col("vec_id").isin([1, 2])).selectExpr(
        "vec_id AS q_id", "embedding AS q_vec"
    )
    join_rows = A.knn_join_ivf(spark, cat, qdf, k=3).collect()
    assert join_rows and all(r["vec_id"] % 3 != 0 for r in join_rows)


def test_merge_ann_drops_blob_tier_tombstones(spark, tmp_path, monkeypatch):
    """merge_ann applies tombstones from the BLOB tier (no closure array):
    merged segments physically drop the deleted rows."""
    cat, df = _build(spark, str(tmp_path / "mergedel"))
    A.delete_ann(
        spark, cat,
        df.filter(F.col("vec_id") % 2 == 0).select("vec_id"),
        CFG, auto_merge=False,
    )
    monkeypatch.setattr(A, "FILTER_BROADCAST_MAX", 5)
    cat._ann_tomb_memo = None
    monkeypatch.setattr(
        A, "_tombstone_array",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("driver tombstone array built on the blob tier")
        ),
    )
    A.merge_ann(spark, cat, CFG)
    live = sorted(
        r["ext_id"]
        for r in A._ann_ids(spark, cat).select("ext_id").collect()
    )
    assert live == [i for i in range(120) if i % 2 == 1]
    # physical drop cleared the registered tombstones
    assert cat.table_lineage("ann_tombstones").get("n") == 0


def test_absolute_delete_trigger_from_persisted_config(spark, tmp_path):
    """delete_ann's envelope reads delete_merge_max_count from the
    catalog's persisted config: a delete issued with a DEFAULT cfg still
    auto-merges once the absolute cap (persisted at build) is crossed."""
    tight = dataclasses.replace(
        CFG,
        ann=dataclasses.replace(
            CFG.ann, delete_merge_fraction=1.0, delete_merge_max_count=5
        ),
    )
    cat, df = _build(spark, str(tmp_path / "abstrig"), cfg=tight)
    assert cat.read_manifest()["config"]["delete_merge_max_count"] == 5
    # 6 deletes ≥ the persisted cap of 5 (fraction 1.0 can never fire) —
    # the caller passes a default cfg whose cap is 2M; persisted wins
    remaining = A.delete_ann(spark, cat, list(range(0, 12, 2)), IndexConfig())
    assert remaining == 0  # auto-merge dropped the rows + cleared tombstones
    got = {r["ext_id"] for r in A.ann_topk(
        spark, cat, _vec(1), k=120, cfg=CFG, mode="exact").collect()}
    assert got == {i for i in range(120) if not (i < 12 and i % 2 == 0)}


def test_merge_ann_overlapping_groups_raise(spark, tmp_path):
    cat, _ = _build(spark, str(tmp_path / "overlap"))
    segs = sorted(
        int(r["segment_id"])
        for r in cat.read(spark, "ann_flat").select("segment_id").collect()
    )
    assert len(segs) >= 2
    with pytest.raises(ValueError, match="overlap"):
        A.merge_ann(spark, cat, CFG, groups=[[segs[0], segs[1]], [segs[1], segs[0]]])
    with pytest.raises(ValueError, match="overlap"):
        A.merge_ann(spark, cat, CFG, groups=[[segs[0], segs[0], segs[1]]])


def _doctor_drop_append(cat: IndexCatalog, table: str, tag: str) -> None:
    """Simulate a crash BEFORE ``table``'s merge append committed: remove
    the tagged increment from the manifest (and disk), leaving ann_flat's
    commit in place — the exact state ADVICE flags."""
    import os

    m = cat.read_manifest()
    ent = m["tables"][table]
    snap = ent["append_tags"].pop(tag)
    ent["appends"] = [s for s in ent.get("appends", []) if s != snap]
    cat._write_manifest(m)
    shutil.rmtree(os.path.join(cat.root, table, snap), ignore_errors=True)


def test_stale_ann_ids_self_heals(spark, tmp_path):
    """Crash between merge_ann's ann_flat append and its ann_ids append:
    the manifest tag gap must be detected (zero-job) and the map
    re-derived, so a DataFrame-filtered query still sees merged vectors."""
    cat, df = _build(spark, str(tmp_path / "staleids"), cfg=NOCOMPACT)
    A.merge_ann(spark, cat, NOCOMPACT)
    tag = "ann_merge_gen_1"
    assert tag in cat.read_manifest()["tables"]["ann_ids"].get("append_tags", {})
    _doctor_drop_append(cat, "ann_ids", tag)
    assert not A._derived_in_sync(cat, "ann_ids")

    fdf = df.filter(F.col("vec_id") % 2 == 0).select("vec_id")
    got = A.ann_topk(
        spark, cat, _vec(1), k=8, cfg=CFG, mode="exact",
        filter_ext_ids=fdf, filter_mode="df",
    ).collect()
    assert len(got) == 8 and all(r["ext_id"] % 2 == 0 for r in got)
    # the heal committed a consistent map (covers_tags recorded)
    assert A._derived_in_sync(cat, "ann_ids")


def test_missing_ivfpq_rows_stay_reachable(spark, tmp_path):
    """Crash before the merge's ann_ivfpq append (it is appended last):
    the merged segments have flat/ivf rows but no ivfpq rows — the search
    must brute-force them (anti-join derivation), not silently drop them."""
    cat, df = _build(spark, str(tmp_path / "ivfpqcrash"), cfg=NOCOMPACT)
    A.build_ann_pq(spark, cat, CFG)
    A.build_ann_ivfpq(spark, cat, CFG)
    A.merge_ann(spark, cat, NOCOMPACT)
    for t in ("ann_ivfpq", "ann_pq"):
        if "ann_merge_gen_1" in cat.read_manifest()["tables"][t].get(
            "append_tags", {}
        ):
            _doctor_drop_append(cat, t, "ann_merge_gen_1")
    assert not A._derived_in_sync(cat, "ann_ivfpq")
    got = [
        (r["ext_id"], round(r["score"], 9))
        for r in A.ann_topk_ivfpq(spark, cat, _vec(1), k=8, cfg=CFG).collect()
    ]
    want = [
        (r["ext_id"], round(r["score"], 9))
        for r in A.ann_topk(
            spark, cat, _vec(1), k=8, cfg=CFG, mode="exact"
        ).collect()
    ]
    assert got == want  # all-bf equals exact


def test_crash_before_any_derived_append_ivf_safe(spark, tmp_path, monkeypatch):
    """Crash during the (now concurrent) derived appends, failing ann_sq:
    the crashed table must be detected stale, any sibling table that DID
    commit must be genuinely complete, and IVF search / the kNN join must
    neither drop the merged vectors NOR emit duplicates from the
    merged-away segments' stale lists. (ann_ivfpq runs after the
    concurrent batch, so a batch crash always leaves it stale too.)"""
    cat, df = _build(spark, str(tmp_path / "ivfcrash"), cfg=NOCOMPACT)
    real_append = IndexCatalog.append

    def crashing_append(self, d, table, **kw):
        if table == "ann_sq":
            raise RuntimeError("simulated crash before derived appends")
        return real_append(self, d, table, **kw)

    monkeypatch.setattr(IndexCatalog, "append", crashing_append)
    with pytest.raises(RuntimeError, match="simulated crash"):
        A.merge_ann(spark, cat, NOCOMPACT)
    monkeypatch.setattr(IndexCatalog, "append", real_append)
    assert not A._derived_in_sync(cat, "ann_sq")
    if cat.exists("ann_ivfpq"):
        assert not A._derived_in_sync(cat, "ann_ivfpq")

    want = [
        (r["ext_id"], round(r["score"], 9))
        for r in A.ann_topk(spark, cat, _vec(1), k=10, cfg=CFG, mode="exact").collect()
    ]
    got = [
        (r["ext_id"], round(r["score"], 9))
        for r in A.ann_topk(spark, cat, _vec(1), k=10, cfg=CFG, mode="ivf").collect()
    ]
    assert got == want  # complete AND duplicate-free
    # SQ path: stale rows (old segs, no flat → skipped) + missing rows
    # (new segs → exact fallback) — still exact
    got_sq = [
        (r["ext_id"], round(r["score"], 9))
        for r in A.ann_topk_sq(spark, cat, _vec(1), k=10, cfg=CFG).collect()
    ]
    assert got_sq == want
    # the bucketed join: per-query unique ranks, containment vs exact
    qdf = df.filter(F.col("vec_id").isin([1, 5])).selectExpr(
        "vec_id AS q_id", "embedding AS q_vec"
    )
    rows = A.knn_join_ivf(spark, cat, qdf, k=3).collect()
    keys = [(r["q_id"], r["rank"]) for r in rows]
    assert len(keys) == len(set(keys)) == 6
    assert len({(r["q_id"], r["vec_id"]) for r in rows}) == 6  # no dup vecs


def test_missing_bq_rows_pure_hamming_reachable(spark, tmp_path):
    """Crash before the merge's ann_bq append: the pure-hamming path must
    recompute codes from flat for the uncovered segments (numpy oracle)."""
    cat, df = _build(spark, str(tmp_path / "bqcrash"), cfg=NOCOMPACT)
    A.merge_ann(spark, cat, NOCOMPACT)
    _doctor_drop_append(cat, "ann_bq", "ann_merge_gen_1")
    assert not A._derived_in_sync(cat, "ann_bq")

    got = [
        (r["ext_id"], r["hamming"])
        for r in A.ann_topk_bq(spark, cat, _vec(1), k=10, cfg=CFG).collect()
    ]
    # numpy oracle over the (single) merged segment
    from cuvs_lucene_spark.functions.quantize import binary_quantize

    rows = cat.read(spark, "ann_flat").collect()
    pairs = []
    q = np.asarray(_vec(1), np.float32)
    for r in rows:
        x = np.frombuffer(r["vectors"], np.float32).reshape(r["n_vecs"], r["dim"])
        ids = np.frombuffer(r["ext_ids"], np.int64)
        codes, cent = binary_quantize(x)
        qbits = np.packbits(q.astype(np.float64) > cent.astype(np.float64))
        ham = np.unpackbits(codes ^ qbits[None, :], axis=1).sum(1)
        pairs += [(int(i), int(h)) for i, h in zip(ids, ham)]
    want = sorted(pairs, key=lambda t: (t[1], t[0]))[:10]
    assert got == want


def test_full_rebuild_records_covers_tags(spark, tmp_path):
    """A FULL rebuild of a derived table (build_ann_pq / build_ann_ivfpq
    after streaming/merge appends tagged ann_flat) derives from the
    CURRENT flat — it must record covers_tags, else _derived_in_sync
    reads the fresh tagless entry as permanently stale and every later
    query pays the crash-healing path forever."""
    cat, df = _build(spark, str(tmp_path / "coverstags"), cfg=NOCOMPACT)
    A.merge_ann(spark, cat, NOCOMPACT)  # tags ann_flat with ann_merge_gen_1
    assert cat.read_manifest()["tables"]["ann_flat"].get("append_tags")
    A.build_ann_pq(spark, cat, CFG)       # full rebuild (entry replaced)
    A.build_ann_ivfpq(spark, cat, CFG)    # full rebuild from ivf ∩ pq
    assert A._derived_in_sync(cat, "ann_pq")
    assert A._derived_in_sync(cat, "ann_ivfpq")


def test_delete_ann_dataframe_requires_ext_id_column(spark, tmp_path):
    """delete_docs parity: a multi-column DataFrame without a named
    ext_id column must raise — columns[0] of a (segment_id, ext_id)
    slice would silently tombstone segment ids as ext ids."""
    cat, df = _build(spark, str(tmp_path / "delcol"))
    bad = spark.createDataFrame([(0, 5), (1, 45)], "segment_id long, vec long")
    with pytest.raises(ValueError, match="ext_id"):
        A.delete_ann(spark, cat, bad, CFG, auto_merge=False)
    # named ext_id column wins regardless of position
    ok = spark.createDataFrame(
        [(0, 5), (1, 45)], "segment_id long, ext_id long"
    )
    A.delete_ann(spark, cat, ok, CFG, auto_merge=False)
    got = {r["ext_id"] for r in A.ann_topk(
        spark, cat, _vec(5), k=120, cfg=CFG, mode="exact"
    ).collect()}
    assert 5 not in got and 45 not in got and got


def test_probe_mode_validated_and_shuffle_never_driver(spark, tmp_path, monkeypatch):
    """Unknown probe_mode raises on both entry points; probe_mode='shuffle'
    on the single-query path degrades to the DISTRIBUTED probe — never
    the driver tier it was opting out of (poisoned driver pack)."""
    cat, df = _build(spark, str(tmp_path / "probemode"))
    with pytest.raises(ValueError, match="probe_mode"):
        A.ann_topk(spark, cat, _vec(1), k=5, cfg=CFG, mode="ivf",
                   probe_mode="bogus")
    q = spark.createDataFrame(
        [(0, _vec(1))], "q_id long, q_vec array<double>"
    )
    with pytest.raises(ValueError, match="probe_mode"):
        A.knn_join_ivf(spark, cat, q, k=3, probe_mode="bogus")

    def poisoned_pack(*a, **k):
        raise AssertionError("driver centroid pack used under probe_mode='shuffle'")

    monkeypatch.setattr(A, "_centroid_pack", poisoned_pack)
    got = A.ann_topk(
        spark, cat, _vec(1), k=5, cfg=CFG, mode="ivf", probe_mode="shuffle"
    ).collect()
    assert len(got) == 5

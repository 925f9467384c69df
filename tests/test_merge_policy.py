"""TieredMergePolicy invariants (hypothesis property tests over the pure
decision core ``tier_groups`` + one Spark integration smoke).

Reference behavior: the host Lucene side of the reference runs merges
under TieredMergePolicy (``TestMerge.java:252-254``); the invariants
pinned here are the policy's contract — size-comparable groups, bounded
fan-in, one merge per segment per round, settled segments untouched
unless delete pressure (deletesPctAllowed) applies.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from cuvs_lucene_spark.config import IndexConfig
from cuvs_lucene_spark.operators.merge import pick_merge_groups, tier_groups

sizes_st = st.lists(
    st.tuples(st.integers(min_value=0, max_value=1_000_000),
              st.integers(min_value=0, max_value=10_000)),
    min_size=0, max_size=60,
    unique_by=lambda t: t[1],
)


@settings(max_examples=300, deadline=None)
@given(
    sizes=sizes_st,
    fanin=st.integers(min_value=2, max_value=12),
    cap=st.integers(min_value=1, max_value=500_000),
    ratio=st.floats(min_value=1.5, max_value=50.0),
)
def test_tier_groups_invariants(sizes, fanin, cap, ratio):
    groups = tier_groups(sizes, fanin, cap, size_ratio_bound=ratio)
    size_of = {s: max(1, n) for n, s in sizes}
    seen = set()
    for g in groups:
        # bounded fan-in, no singletons
        assert 2 <= len(g) <= fanin
        # no segment merged twice in one round
        assert not seen.intersection(g)
        seen.update(g)
        # only undersized segments selected (no delete pressure given)
        assert all(dict((s, n) for n, s in sizes)[s] < cap for s in g)
        # size-comparable: span bounded by ratio × smallest member
        mem = [size_of[s] for s in g]
        assert max(mem) <= ratio * min(mem) + 1e-9
    # determinism
    assert tier_groups(sizes, fanin, cap, size_ratio_bound=ratio) == groups


@settings(max_examples=200, deadline=None)
@given(
    sizes=sizes_st,
    fanin=st.integers(min_value=2, max_value=8),
    cap=st.integers(min_value=1, max_value=100_000),
    dead=st.dictionaries(
        st.integers(min_value=0, max_value=10_000),
        st.floats(min_value=0.0, max_value=1.0),
        max_size=20,
    ),
)
def test_tier_groups_delete_pressure(sizes, fanin, cap, dead):
    allowed = 0.2
    groups = tier_groups(
        sizes, fanin, cap, size_ratio_bound=1e9,
        deleted_frac=dead, deletes_pct_allowed=allowed,
    )
    n_of = dict((s, n) for n, s in sizes)
    chosen = {s for g in groups for s in g}
    for s in chosen:
        # an over-cap segment is selected ONLY under delete pressure
        if n_of[s] >= cap:
            assert dead.get(s, 0.0) > allowed
    # singleton delete-reclaim: EVERY pressured segment is selected (alone
    # if no partner exists — TieredMergePolicy's singleton merge)
    for n, s in sizes:
        if dead.get(s, 0.0) > allowed:
            assert s in chosen
    for g in groups:
        if len(g) == 1:  # singletons exist only under delete pressure
            assert dead.get(g[0], 0.0) > allowed
    # and pressure actually admits them when a partner exists: with an
    # unbounded ratio, every eligible segment pairs up except at most one
    eligible = sorted(
        s for n, s in sizes if n < cap or dead.get(s, 0.0) > allowed
    )
    assert len(chosen) >= len(eligible) - (len(eligible) % fanin == 1 and 1)


def test_pick_merge_groups_with_deletes_integration(spark, tmp_path):
    """End-to-end: a catalog with many small segments and a tombstoned
    settled segment — the policy returns valid groups over live sizes and
    the maintenance merge consumes them."""
    from cuvs_lucene_spark.operators.deletes import delete_docs
    from cuvs_lucene_spark.operators.merge import merge_segments
    from cuvs_lucene_spark.operators.segments import build_index

    cfg = IndexConfig(rows_per_segment=40, block_size=16, term_buckets=8)
    docs = spark.createDataFrame(
        [(i, f"alpha beta doc{i} gamma") for i in range(200)],
        "doc_id long, text string",
    )
    cat = build_index(
        spark, docs, str(tmp_path / "tieridx"), cfg,
        content_col="text", id_col="doc_id",
    )
    # tombstone 80% of one segment's docs → delete pressure at cap 40
    delete_docs(
        spark, cat,
        spark.createDataFrame([(i,) for i in range(0, 32)], "ext_id long"),
    )
    groups = pick_merge_groups(spark, cat, cfg, max_segment_docs=40)
    flat = [s for g in groups for s in g]
    assert len(flat) == len(set(flat))
    # the settled (at-cap) segments are ineligible; the 80%-dead segment
    # is reclaimed ALONE (TieredMergePolicy's singleton delete merge)
    assert groups and all(
        len(g) >= 2 or len(g) == 1 for g in groups
    ) and any(len(g) == 1 for g in groups)
    if groups:
        merge_segments(spark, cat, cfg, groups=groups)
        # merged result stays queryable and excludes deleted docs
        from cuvs_lucene_spark.operators.bm25 import bm25_topk

        got = bm25_topk(spark, cat, ["alpha"], k=5, cfg=cfg).collect()
        assert got and all(r["ext_id"] >= 32 for r in got)

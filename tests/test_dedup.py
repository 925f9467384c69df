"""Connected-components dedup clustering (pairs -> decision table):
chain topology, transitivity on the real corpus, keep-list invariants."""



def test_duplicate_components_chain(spark):
    """A~B, B~C (no A~C pair) must collapse into ONE component with the
    min id as survivor; a chain longer than one hop exercises multiple
    propagation rounds. Disjoint cluster + singleton stay separate."""
    from cuvs_lucene_spark.operators.dedup import duplicate_components

    pairs = spark.createDataFrame(
        [(10, 20), (20, 30), (30, 40), (40, 50),  # 5-chain, diameter 4
         (100, 110),                              # separate 2-cluster
         (7, 200)],                               # min-id joins via high id
        "id_a long, id_b long",
    )
    ids = spark.createDataFrame([(i,) for i in
                                 [7, 10, 20, 30, 40, 50, 100, 110, 200, 999]],
                                "doc_id long")
    got = {
        r["id"]: (r["component"], r["keep"])
        for r in duplicate_components(pairs, all_ids=ids).collect()
    }
    assert len(got) == 10
    for i in [10, 20, 30, 40, 50]:
        assert got[i] == (10, i == 10)
    for i in [100, 110]:
        assert got[i] == (100, i == 100)
    for i in [7, 200]:
        assert got[i] == (7, i == 7)
    assert got[999] == (999, True)  # singleton keeps itself


def test_duplicate_components_transitive_vs_pairs(spark, docs_df):
    """On the real corpus: components refine the pair graph — every pair's
    two ids land in the same component, and keep-count == component count."""
    from cuvs_lucene_spark.operators.dedup import (
        duplicate_components,
        simhash_near_dup,
    )

    pairs = simhash_near_dup(docs_df, max_hamming=3, bands=4)
    comp = duplicate_components(pairs, all_ids=docs_df.select("doc_id")).cache()
    cmap = {r["id"]: r["component"] for r in comp.collect()}
    for r in pairs.collect():
        assert cmap[r["id_a"]] == cmap[r["id_b"]]
    n_components = len(set(cmap.values()))
    n_keep = sum(1 for r in comp.collect() if r["keep"])
    assert n_keep == n_components
    # every component id is a member's id and the minimum of its members
    members = {}
    for i, c in cmap.items():
        members.setdefault(c, []).append(i)
    for c, ms in members.items():
        assert c == min(ms)


def test_duplicate_components_random_vs_union_find(spark):
    """Randomized cross-check: the Spark label propagation equals a plain
    union-find reference on arbitrary graph shapes (chains, stars, cliques
    emerge from uniform random pairs)."""
    import numpy as np

    from cuvs_lucene_spark.operators.dedup import duplicate_components

    for seed in [1, 17, 99]:
        rng = np.random.default_rng(seed)
        n_nodes, n_edges = 200, 120
        ea = rng.integers(0, n_nodes, n_edges)
        eb = rng.integers(0, n_nodes, n_edges)
        keep = ea != eb
        ea, eb = ea[keep], eb[keep]
        # union-find reference
        parent = list(range(n_nodes))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for a, b in zip(ea, eb):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {}
        for i in range(n_nodes):
            expected.setdefault(find(i), []).append(i)
        exp_comp = {i: min(ms) for ms in expected.values() for i in ms}

        pairs = spark.createDataFrame(
            [(int(a), int(b)) for a, b in zip(ea, eb)], "id_a long, id_b long"
        )
        ids = spark.createDataFrame([(i,) for i in range(n_nodes)], "doc_id long")
        got = {
            r["id"]: r["component"]
            for r in duplicate_components(pairs, all_ids=ids).collect()
        }
        assert got == exp_comp, f"seed {seed} mismatch"

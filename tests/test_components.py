"""Connected-components / canonical-dedup semantics vs a pure-Python
union-find oracle."""

import random

from pyspark.sql import functions as F

from dqc_spark.components import connected_components, keep_canonical


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    out = {}
    for n in list(parent):
        out[n] = find(n)
    return out


def test_components_match_union_find_random_graph(spark):
    import warnings

    import dqc_spark.components as C

    rng = random.Random(42)
    nodes = list(range(200))
    edges = {(min(a, b), max(a, b))
             for a, b in (rng.sample(nodes, 2) for _ in range(150))}
    oracle = _union_find_components(edges)

    pairs = spark.createDataFrame(sorted(edges), "key_a long, key_b long")
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # non-convergence must not happen
        got = {
            r.key: r.component
            for r in connected_components(pairs).collect()
        }
    # same node set, and identical min-id component labels
    assert set(got) == set(oracle)
    assert got == oracle
    assert C.last_run_info.converged
    # star alternation contracts paths exponentially: a 200-node random
    # graph must settle in far fewer than diameter rounds
    assert C.last_run_info.rounds <= 8


def test_components_long_chain_converges_in_log_rounds(spark):
    # worst-case diameter for label propagation: a path 0-1-...-100.
    # min-label needs 100 rounds; large-star/small-star needs O(log^2)
    import dqc_spark.components as C

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100)], "key_a long, key_b long"
    )
    got = connected_components(pairs, max_iter=15).collect()
    assert {r.component for r in got} == {0}
    assert len(got) == 101
    assert C.last_run_info.converged
    assert C.last_run_info.rounds <= 12


def test_non_converged_labels_are_one_row_per_key(spark):
    # with max_iter too small the residual edge set can mention a node
    # as both child and root; the returned labels must still be a
    # function (one row per key), warning included
    import warnings

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "key_a long, key_b long"
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        got = connected_components(pairs, max_iter=1).collect()
    keys = [r.key for r in got]
    assert len(keys) == len(set(keys)) == 61
    # labels form a finer partition: component <= key everywhere
    assert all(r.component <= r.key for r in got)
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], "doc_id long, text string"
    )
    # clusters {1,3,5} and {2,8}; 0,4,6,7,9 unclustered
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (2, 8)], "key_a long, key_b long"
    )
    kept = keep_canonical(docs, pairs, "doc_id")
    assert sorted(r.doc_id for r in kept.collect()) == [0, 1, 2, 4, 6, 7, 9]


def test_keep_canonical_end_to_end_minhash(spark, sf_dir):
    import os

    from dqc_spark.cache import release_all
    from dqc_spark.dedup import minhash_near_dups

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # materialize the pair list ONCE: minhash + the iterative components
    # loop both persist intermediates, and re-deriving pairs through the
    # whole minhash lineage for every consumer (keep_canonical runs its
    # own CC pass internally) held enough cached blocks to OOM the 1 GiB
    # default driver heap under spark-submit
    pairs_rows = [
        (r.key_a, r.key_b)
        for r in minhash_near_dups(docs, "doc_id", threshold=0.5)
        .select("key_a", "key_b").collect()
    ]
    release_all()
    pairs = spark.createDataFrame(pairs_rows, "key_a long, key_b long")
    comp = connected_components(pairs)
    n_losers = comp.filter(F.col("key") != F.col("component")).count()
    release_all()
    kept = keep_canonical(docs, pairs, "doc_id")
    n_docs, n_kept = docs.count(), kept.count()
    assert n_kept == n_docs - n_losers
    assert n_losers > 0  # synthetic corpus does contain near-dups


def test_soft_weights_near_dup_clusters(spark):
    import pytest

    from dqc_spark.components import soft_weights

    docs = spark.createDataFrame(
        [(i,) for i in range(1, 8)], "doc_id long")
    # clusters: {1,2,3} (chain), {5,6}; 4 and 7 unclustered
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "key_a long, key_b long")
    got = {r["doc_id"]: (r["cluster_size"], r["weight"])
           for r in soft_weights(docs, pairs, "doc_id").collect()}
    assert got[1] == (3, 1 / 3) and got[2] == (3, 1 / 3)
    assert got[3] == (3, 1 / 3)
    assert got[5] == (2, 0.5) and got[6] == (2, 0.5)
    assert got[4] == (1, 1.0) and got[7] == (1, 1.0)
    # total mass = number of distinct contents (3 clusters + 2 singles)
    assert sum(w for _, w in got.values()) == pytest.approx(4.0)


def test_keep_canonical_priority_prefers_low_rank(spark):
    from dqc_spark.components import keep_canonical, keep_canonical_priority

    # one chain cluster {1,2,3} (1-2, 2-3) and an unclustered doc 4
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "key_a long, key_b long")
    rows = [
        (1, 2, "a"),    # worst rank but smallest key
        (2, 0, "b"),    # best rank -> the winner
        (3, None, "c"),  # NULL priority ranks worst
        (4, 9, "solo"),  # unclustered: passes through whatever its rank
    ]
    df = spark.createDataFrame(rows, "doc_id long, pri int, text string")
    kept = {r["doc_id"] for r in
            keep_canonical_priority(df, pairs, "doc_id", "pri").collect()}
    assert kept == {2, 4}

    # flat priority degrades to keep_canonical's min-key rule
    from pyspark.sql import functions as F

    flat = keep_canonical_priority(df, pairs, "doc_id", F.lit(1))
    assert {r["doc_id"] for r in flat.collect()} == {
        r["doc_id"] for r in keep_canonical(df, pairs, "doc_id").collect()}

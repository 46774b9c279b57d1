"""SemDeDup (semdedup.py): python-model parity per cluster, planted
near-duplicate recall, threshold monotonicity, partition invariance,
and the soft-dedup weights operator (dedup.py::dedup_soft_weights)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dqc_spark.dedup import dedup_soft_weights
from dqc_spark.semdedup import semantic_dedup, semdedup_prune_py


def _corpus(n=120, dim=16, seed=11, dup_every=5):
    """Random unit-ish vectors; every ``dup_every``-th row is a tiny
    perturbation of its predecessor (a planted semantic duplicate)."""
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    vecs = rng.normal(size=(n, dim))
    planted = []
    for i in range(1, n):
        if i % dup_every == 0:
            vecs[i] = vecs[i - 1] + rng.normal(size=dim) * 1e-3
            planted.append(i)
    return vecs, planted


def _assign_df(spark, vecs):
    return spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>")


def _centroids(vecs, k=4):
    # fixed deterministic centroids (first k rows, normalized) so the
    # tests pin the PRUNE semantics, not Spark-ML k-means internals
    c = np.asarray(vecs[:k], dtype=np.float64)
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def test_matches_python_model_per_cluster(spark):
    vecs, _ = _corpus()
    cent = _centroids(vecs)
    rows = semantic_dedup(_assign_df(spark, vecs), cent,
                          threshold=0.9).collect()
    assert len(rows) == len(vecs)  # decision-column form: no row lost
    by_cluster: dict = {}
    # recompute each cluster's membership exactly as build_ivf_index does
    cn = cent
    half = 0.5 * (cn * cn).sum(axis=1)
    for i, v in enumerate(vecs):
        vn = v / (np.linalg.norm(v) or 1.0)
        cl = int(np.argmax(vn @ cn.T - half))
        by_cluster.setdefault(cl, []).append((i, v))
    want: dict = {}
    for cl, items in by_cluster.items():
        want.update(semdedup_prune_py(items, 0.9))
    got = {r["vec_id"]: r["keep"] for r in rows}
    assert got == want


def test_planted_duplicates_dropped(spark):
    vecs, planted = _corpus()
    cent = _centroids(vecs)
    got = {r["vec_id"]: r["keep"]
           for r in semantic_dedup(_assign_df(spark, vecs), cent,
                                   threshold=0.98).collect()}
    # a perturbed copy is cosine ~0.999+ to its source; both land in the
    # same cluster (argmax moves only at cluster boundaries), so at most
    # a couple of boundary cases may survive
    dropped = [i for i in planted if not got[i]]
    assert len(dropped) >= len(planted) - 2
    # and the sources themselves are kept (greedy keeps first-by-key)
    assert all(got[i - 1] for i in dropped)


def test_threshold_monotone_and_extremes(spark):
    vecs, _ = _corpus(n=60)
    cent = _centroids(vecs)
    df = _assign_df(spark, vecs)
    kept_hi = {r["vec_id"] for r in
               semantic_dedup(df, cent, threshold=1.5).collect()
               if r["keep"]}
    kept_mid = {r["vec_id"] for r in
                semantic_dedup(df, cent, threshold=0.95).collect()
                if r["keep"]}
    kept_lo = {r["vec_id"] for r in
               semantic_dedup(df, cent, threshold=-1.1).collect()
               if r["keep"]}
    assert kept_hi == set(range(60))      # nothing reaches cosine 1.5
    assert kept_mid.issubset(kept_hi)
    # threshold below -1: everything is a dup of the first kept doc in
    # its cluster -> exactly one survivor per nonempty cluster
    assert len(kept_lo) == len(
        {r["cluster"] for r in semantic_dedup(df, cent,
         threshold=-1.1).collect()})


def test_partition_invariance(spark):
    vecs, _ = _corpus(n=80)
    cent = _centroids(vecs)
    a = sorted(map(tuple, semantic_dedup(
        _assign_df(spark, vecs), cent, threshold=0.9).collect()))
    b = sorted(map(tuple, semantic_dedup(
        _assign_df(spark, vecs).repartition(13), cent,
        threshold=0.9).collect()))
    assert a == b


def test_prune_py_dropped_doc_does_not_shadow():
    # b duplicates a; c duplicates b but NOT a -> c must be KEPT
    # (comparison is against kept docs only, the SemDeDup rule)
    a = np.array([1.0, 0.0])
    b = np.array([0.96, np.sqrt(1 - 0.96**2)])
    c_ang = 2 * np.arccos(0.96)
    c = np.array([np.cos(c_ang), np.sin(c_ang)])
    out = semdedup_prune_py([("a", a), ("b", b), ("c", c)], 0.95)
    assert out == {"a": True, "b": False, "c": True}


# ---------------------------------------------------------------------------
# soft dedup weights
# ---------------------------------------------------------------------------


def test_soft_weights(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "x"), (4, "y"), (5, None), (6, None)],
        "doc_id bigint, text string")
    rows = {r["doc_id"]: r for r in dedup_soft_weights(
        df, "doc_id").collect()}
    assert len(rows) == 6  # every row kept, including NULL texts
    assert [rows[i]["n_copies"] for i in (1, 2, 3)] == [3, 3, 3]
    assert rows[1]["weight"] == pytest.approx(1 / 3)
    assert rows[4]["n_copies"] == 1 and rows[4]["weight"] == 1.0
    # NULL texts form one group of their own
    assert rows[5]["n_copies"] == 2 and rows[5]["weight"] == 0.5
    # total mass == number of distinct contents (incl. the NULL group)
    assert sum(r["weight"] for r in rows.values()) == pytest.approx(3.0)


# ---------------------------------------------------------------------------
# cross-split leakage
# ---------------------------------------------------------------------------


def test_split_leakage_detects_planted_pair(spark):
    from dqc_spark.decontam import split_leakage

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base + " one", "train"),
        (2, base + " one extra", "val"),      # near-dup of 1, cross-split
        (3, "completely different content about spark shuffles", "train"),
        (4, base + " one tweak", "train"),    # near-dup of 1, SAME split
        (5, "unrelated validation document text entirely", "val"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, split string")
    got = split_leakage(df, "doc_id", threshold=0.5).collect()
    pairs = {frozenset((r["key_a"], r["key_b"])) for r in got}
    assert frozenset((1, 2)) in pairs
    # same-split near-dup (1,4) must NOT be reported
    assert frozenset((1, 4)) not in pairs
    for r in got:
        assert r["split_a"] != r["split_b"]
        assert r["est_jaccard"] >= 0.5


def test_split_leakage_clean_corpus_empty(spark):
    from dqc_spark.decontam import split_leakage

    rows = [(1, "alpha beta gamma delta epsilon", "train"),
            (2, "zeta eta theta iota kappa", "val")]
    df = spark.createDataFrame(rows, "doc_id long, text string, split string")
    assert split_leakage(df, "doc_id", threshold=0.5).count() == 0


# ---------------------------------------------------------------------------
# model-free text SemDeDup
# ---------------------------------------------------------------------------


def test_semantic_dedup_text_prunes_bag_of_words_rewrites(spark):
    from dqc_spark.semdedup import semantic_dedup_text

    texts = {
        1: "spark shuffles data between executors during wide stages",
        # word-shuffled copy of 1: identical bag-of-words -> TF-IDF
        # cosine 1.0, while its exact digest and word ORDER differ
        2: "wide executors during data shuffles spark stages between",
        3: "completely unrelated cooking recipe with flour and sugar",
        4: "another different document about database indexing trees",
    }
    df = spark.createDataFrame(list(texts.items()),
                               "doc_id long, text string")
    got = {r["doc_id"]: r["keep"]
           for r in semantic_dedup_text(df, "doc_id", n_clusters=2,
                                        threshold=0.95).collect()}
    assert len(got) == 4          # decision-column contract
    assert got[1] and not got[2]  # the rewrite is pruned, source kept
    assert got[3] and got[4]


def test_semantic_dedup_text_empty_and_null_docs(spark):
    from dqc_spark.semdedup import semantic_dedup_text

    df = spark.createDataFrame(
        [(1, "real content words here"), (2, ""), (3, None)],
        "doc_id long, text string")
    rows = semantic_dedup_text(df, "doc_id", n_clusters=2,
                               threshold=0.9).collect()
    assert len(rows) == 3  # zero vectors survive the plumbing


def test_blocked_prune_matches_one_gram_greedy(spark):
    # 5000 vectors forced into ONE cluster (single centroid) so the
    # prune spans multiple 2048-row blocks; the keep set must equal the
    # naive one-gram greedy computed independently here
    rng = np.random.Generator(np.random.Philox(key=[99, 0]))
    vecs = rng.normal(size=(5000, 8))
    for i in range(0, 5000, 7):  # plant dups so kept != everything
        vecs[i] = vecs[(i * 31) % 5000] + rng.normal(size=8) * 1e-4
    cent = np.ones((1, 8)) / np.sqrt(8.0)
    got = {r["vec_id"]: r["keep"]
           for r in semantic_dedup(_assign_df(spark, vecs), cent,
                                   threshold=0.95).collect()}
    mn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    g = mn @ mn.T
    kept: list = []
    want = {}
    for i in range(len(mn)):
        ok = not kept or float(g[i, kept].max()) < 0.95
        want[i] = ok
        if ok:
            kept.append(i)
    assert got == want
    assert 100 < sum(want.values()) < 5000  # non-vacuous both ways


def test_split_leakage_surfaces_null_labels(spark):
    from dqc_spark.decontam import split_leakage

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(1, base + " one", "train"),
            (2, base + " one extra", None),   # unlabeled near-dup
            (3, base + " one tweak", None)]   # NULL-vs-NULL: NOT a pair
    df = spark.createDataFrame(rows, "doc_id long, text string, split string")
    pairs = {frozenset((r["key_a"], r["key_b"]))
             for r in split_leakage(df, "doc_id", threshold=0.5).collect()}
    assert frozenset((1, 2)) in pairs   # train-vs-NULL surfaced
    assert frozenset((2, 3)) not in pairs  # both unlabeled: same bucket

"""Misra–Gries heavy hitters (heavyhitters.py): the undercount bound,
heavy-item containment, merge correctness across partitions, exact
rescore, and the top-m == exact-top-m equivalence the entry relies on."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from dqc_spark.heavyhitters import (
    heavy_hitters,
    heavy_hitters_py,
    mg_compress,
    mg_summary,
)


def _exact(texts):
    c = Counter()
    for t in texts:
        c.update(t.split())
    return c


def _texts():
    # skewed stream: 'the' 300x, 'of' 200x, 'and' 120x, tail of 150
    # distinct rare words 2x each
    words = (["the"] * 300 + ["of"] * 200 + ["and"] * 120
             + [f"w{i}" for i in range(150) for _ in range(2)])
    # deterministic pseudo-random interleave so rare words surround the
    # heavy ones (md5 over (position, word), NOT builtin hash(): str
    # hashing is salted per process and would make a failing corpus
    # unreproducible)
    import hashlib

    words = [w for _, w in sorted(
        (hashlib.md5(f"{i}:{w}".encode()).hexdigest(), w)
        for i, w in enumerate(words))]
    return [" ".join(words[i:i + 25]) for i in range(0, len(words), 25)]


def test_compress_keeps_at_most_k_and_bounds_loss():
    c = Counter({"a": 10, "b": 7, "c": 5, "d": 3, "e": 1})
    before = dict(c)
    mg_compress(c, 2)
    assert len(c) <= 2
    # survivors lost exactly the (k+1)-th largest count (5)
    for g, n in c.items():
        assert n == before[g] - 5, g


def test_py_reference_guarantees():
    texts = _texts()
    exact = _exact(texts)
    n = sum(exact.values())
    k = 16
    got = heavy_hitters_py((t.split() for t in texts), k)
    assert len(got) <= k
    for g, est in got.items():
        assert est <= exact[g] <= est + n // (k + 1) + 1, g
    for g, true_n in exact.items():
        if true_n > n / (k + 1):
            assert g in got, (g, true_n)


def test_spark_summary_guarantees_and_merge(spark):
    texts = _texts()
    exact = Counter()
    for t in texts:
        exact.update(t.split())
    n = sum(exact.values())
    df = spark.createDataFrame(
        [(t,) for t in texts], "text string").repartition(7)
    k = 16
    got = mg_summary(df, k=k, tokenizer=str.split)
    assert len(got) <= k
    for g, est in got.items():
        assert est <= exact[g], g           # never overcounts
        assert exact[g] - est <= n / (k + 1) + 1, g
    for g, true_n in exact.items():
        if true_n > n / (k + 1):
            assert g in got, (g, true_n)


def test_rescore_counts_are_exact(spark):
    texts = _texts()
    exact = _exact(texts)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    out = {r["gram"]: r["n_occurrences"]
           for r in heavy_hitters(df, k=16, tokenizer=str.split,
                                  rescore=True).collect()}
    for g, cnt in out.items():
        assert cnt == exact[g], g
    assert "the" in out and "of" in out and "and" in out


def test_topm_equals_exact_topm_when_guarantee_holds(spark):
    texts = _texts()
    exact = _exact(texts)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = (
        heavy_hitters(df, k=64, tokenizer=str.split, rescore=True)
        .orderBy(F.desc("n_occurrences"), "gram").limit(3).collect()
    )
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [(r["gram"], r["n_occurrences"]) for r in got] == want


def test_empty_corpus(spark):
    df = spark.createDataFrame([], "text string")
    assert heavy_hitters(df, k=8).count() == 0
    assert mg_summary(df, k=8) == Counter()

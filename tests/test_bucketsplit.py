"""CCNet-style per-group quantile buckets: differential vs a pandas
rank model, balance, partition invariance, labels, NULL guard, and the
perplexity composition."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dqc_spark.bucketsplit import CCNET_LABELS, perplexity_buckets, score_buckets


def _model(rows, n_buckets=3):
    """Independent pandas model: rank within group, integer division."""
    df = pd.DataFrame(rows, columns=["g", "s", "k"])
    df = df.sort_values(["g", "s", "k"]).reset_index(drop=True)
    df["rk"] = df.groupby("g").cumcount()
    df["n"] = df.groupby("g")["s"].transform("size")
    df["bucket"] = (n_buckets * df["rk"]) // df["n"]
    return dict(zip(df["k"], df["bucket"]))


def _rows(n=211, n_groups=4, seed=7):
    import random

    rng = random.Random(seed)
    return [
        (f"g{i % n_groups}", rng.randrange(0, 50), i)  # heavy score ties
        for i in range(n)
    ]


@pytest.fixture(scope="module")
def rows():
    return _rows()


def test_differential_vs_pandas_model(spark, rows):
    df = spark.createDataFrame(rows, "g string, s long, k long")
    got = {r["k"]: r["bucket"]
           for r in score_buckets(df, "g", "s", "k").collect()}
    assert got == _model(rows)


def test_balanced_even_with_ties(spark, rows):
    df = spark.createDataFrame(rows, "g string, s long, k long")
    sizes = (score_buckets(df, "g", "s", "k", n_buckets=5)
             .groupBy("g", "bucket").count().collect())
    per_group = {}
    for r in sizes:
        per_group.setdefault(r["g"], []).append(r["count"])
    for g, counts in per_group.items():
        assert len(counts) == 5 and max(counts) - min(counts) <= 1, (g, counts)


def test_partition_count_invariance(spark, rows):
    a = spark.createDataFrame(rows, "g string, s long, k long").repartition(1)
    b = spark.createDataFrame(rows, "g string, s long, k long").repartition(13)
    ga = {r["k"]: r["bucket"] for r in score_buckets(a, "g", "s", "k").collect()}
    gb = {r["k"]: r["bucket"]
          for r in score_buckets(b, "g", "s", "k", num_partitions=5).collect()}
    assert ga == gb


def test_labels(spark, rows):
    df = spark.createDataFrame(rows, "g string, s long, k long")
    got = score_buckets(df, "g", "s", "k", labels=CCNET_LABELS)
    vals = {r["bucket"] for r in got.select("bucket").distinct().collect()}
    assert vals == set(CCNET_LABELS)
    with pytest.raises(ValueError):
        score_buckets(df, "g", "s", "k", n_buckets=4, labels=CCNET_LABELS)


def test_null_group_raises(spark):
    df = spark.createDataFrame(
        [(None, 1, 1), ("g", 2, 2)], "g string, s long, k long")
    with pytest.raises(ValueError, match="NULL"):
        score_buckets(df, "g", "s", "k")


def test_duplicate_tiebreak_raises(spark):
    df = spark.createDataFrame(
        [("g", 1, 7), ("g", 2, 7)], "g string, s long, k long")
    with pytest.raises(ValueError, match="not unique"):
        score_buckets(df, "g", "s", "k")
    # multi-column tiebreak restores uniqueness
    df2 = spark.createDataFrame(
        [("g", 1, 7, "a"), ("g", 2, 7, "b")],
        "g string, s long, k long, k2 string")
    assert score_buckets(df2, "g", "s", ["k", "k2"]).count() == 2


def test_perplexity_buckets_head_is_most_natural(spark):
    from dqc_spark.pagesgen import generate_pages

    pages = generate_pages(spark, 300, n_partitions=4)
    out = perplexity_buckets(pages).select("url", "lang", "ppl", "ppl_bucket")
    means = {r["ppl_bucket"]: r["m"]
             for r in out.groupBy("ppl_bucket")
             .agg(F.avg("ppl").alias("m")).collect()}
    assert set(means) == set(CCNET_LABELS)
    assert means["head"] < means["middle"] < means["tail"]
    # deterministic across reruns
    a = sorted((r["url"], r["ppl_bucket"]) for r in out.collect())
    b = sorted((r["url"], r["ppl_bucket"])
               for r in perplexity_buckets(pages)
               .select("url", "ppl_bucket").collect())
    assert a == b


def test_null_tiebreak_detected_through_struct(spark):
    """F.struct wraps NULL fields into a non-NULL struct — the validate
    pass must count the RAW columns or a NULL tiebreak slips through
    and orders engine-dependently."""
    from dqc_spark.bucketsplit import score_buckets

    rows = [(1, "en", 1.0), (None, "en", 2.0), (3, "en", 3.0)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, ppl double")
    with pytest.raises(ValueError, match="not unique/non-NULL"):
        score_buckets(df, "lang", "ppl", "doc_id", 3)

"""DSIR importance resampling (dsir.py): exact weight parity with the
shared perplexity kernel, Gumbel top-k correctness vs brute force,
determinism/partition invariance, distribution sanity, and the
TakeOrderedAndProject plan pin."""

import pytest
from pyspark.sql import functions as F

from dqc_spark.dsir import (
    gumbel_keyed,
    importance_weight_py,
    importance_weights,
    weighted_sample,
)
from dqc_spark.lmtrain import train_lm_py


@pytest.fixture(scope="module")
def lms():
    target_texts = [
        "the quick brown fox jumps over the lazy dog every day",
        "a history of the roman empire and the republic before it",
        "the committee published the annual report on the economy",
    ] * 3
    raw_texts = target_texts + [
        "zzz qqq xxx kkk vvv zzz qqq xxx kkk vvv",
        "buy now click here buy now click here free free free",
        "lorem ipsum dolor sit amet consectetur adipiscing elit",
    ] * 3
    return train_lm_py(target_texts), train_lm_py(raw_texts)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "a report on the roman economy published by the committee"),
        (2, "zzz qqq xxx kkk vvv"),
        (3, "buy now click here free free free"),
        (4, "the history of the republic"),
        (5, ""),
        (6, None),
        (7, "lorem ipsum dolor sit amet"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_weights_match_python_reference(spark, docs, lms):
    target_lm, raw_lm = lms
    got = {
        r["doc_id"]: r["logw"]
        for r in importance_weights(docs, target_lm, raw_lm).collect()
    }
    for r in docs.collect():
        want = importance_weight_py(r["text"], target_lm, raw_lm)
        assert got[r["doc_id"]] == want, r["doc_id"]
    # target-like docs outrank junk; empty/None hit the shared 1e9
    # floor on both models and score exactly 0
    assert got[0] > got[2] and got[1] > got[3]
    assert got[5] == 0.0 and got[6] == 0.0


def test_weighted_sample_is_exact_gumbel_topk(spark, docs, lms):
    target_lm, raw_lm = lms
    w = importance_weights(docs, target_lm, raw_lm)
    keyed = gumbel_keyed(w, "logw", ["doc_id"], seed=7)
    rows = keyed.collect()
    want = [
        r["doc_id"]
        for r in sorted(rows, key=lambda r: (-r["__gk"], r["doc_id"]))[:3]
    ]
    got = [
        r["doc_id"]
        for r in weighted_sample(w, 3, "logw", ["doc_id"], seed=7).collect()
    ]
    assert sorted(got) == sorted(want)
    assert "__gk" not in weighted_sample(w, 3, "logw", ["doc_id"]).columns


def test_weighted_sample_deterministic_and_partition_invariant(
    spark, docs, lms
):
    target_lm, raw_lm = lms
    w = importance_weights(docs, target_lm, raw_lm)
    pick = lambda frame: sorted(  # noqa: E731
        r["doc_id"]
        for r in weighted_sample(frame, 4, "logw", ["doc_id"], seed=3).collect()
    )
    a = pick(w)
    assert a == pick(w)  # rerun
    assert a == pick(w.repartition(7))  # partition-count invariance


def test_weighted_sample_follows_weights(spark):
    # 200 rows: 20 "good" (logw=4) vs 180 "bad" (logw=0) — e^4≈55x odds.
    # Expected good fraction of a k=40 Gumbel top-k is ~0.47 (without
    # replacement); across 10 seeds the pooled mean concentrates hard.
    rows = [(i, 4.0 if i < 20 else 0.0) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, logw double")
    good = total = 0
    for seed in range(10):
        sel = weighted_sample(df, 40, "logw", ["doc_id"], seed=seed).collect()
        good += sum(1 for r in sel if r["doc_id"] < 20)
        total += len(sel)
    frac = good / total
    assert total == 400
    # uniform sampling would give 0.10; require clear weight-following
    assert frac > 0.3, frac


def test_null_weights_sort_last(spark):
    rows = [(0, None), (1, 5.0), (2, 4.0), (3, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, logw double")
    got = sorted(
        r["doc_id"] for r in weighted_sample(df, 2, "logw", ["doc_id"]).collect()
    )
    assert got == [1, 2]


def test_weighted_sample_plan_is_topk_not_global_sort(spark, docs, lms):
    target_lm, raw_lm = lms
    w = importance_weights(docs, target_lm, raw_lm)
    plan = weighted_sample(w, 3, "logw", ["doc_id"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_key_cols_are_required(spark):
    # seeding the Gumbel draw from the weight would give equal-weight
    # rows identical keys — a degenerate, layout-dependent sample
    df = spark.createDataFrame([(0, 1.0)], "doc_id bigint, logw double")
    with pytest.raises(ValueError, match="key_cols"):
        weighted_sample(df, 1)
    with pytest.raises(ValueError, match="key_cols"):
        gumbel_keyed(df)

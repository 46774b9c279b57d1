"""Interpolated Kneser-Ney smoothing (textmodels.build_kn): exact
per-context normalization, continuation-probability semantics, pruned
-context fallback, dispatch through the shared perplexity kernel, and
Spark scoring via the unchanged with_perplexity UDF path."""

import math

import pytest

from dqc_spark.textmodels import (
    build_kn,
    build_lm,
    kn_perplexity,
    perplexity,
)


def _toy_lm():
    # small corpus: "a b", "a b", "a c", "b c", "c a"
    unigrams = {"a": 3, "b": 3, "c": 3}
    bigrams = {"a\x00b": 2, "a\x00c": 1, "b\x00c": 1, "c\x00a": 1}
    return {
        "unigrams": unigrams,
        "bigrams": bigrams,
        "total": 9,
        "vocab": 4,  # 3 seen + 1 OOV slot
        "k": 0.1,
    }


def _p(kn, a, b):
    bi = kn["bigrams"]
    pc = (kn["cont"].get(b, 0) + 1.0) / (kn["types"] + kn["vocab"])
    ca = kn["ctx_total"].get(a, 0)
    if ca == 0:
        return pc
    cab = bi.get(f"{a}\x00{b}", 0)
    d = kn["discount"]
    return max(cab - d, 0.0) / ca + (d * kn["n1plus"][a] / ca) * pc


def test_derived_tables():
    kn = build_kn(_toy_lm())
    assert kn["n1plus"] == {"a": 2, "b": 1, "c": 1}
    assert kn["cont"] == {"b": 1, "c": 2, "a": 1}
    # context denominator = Σ_b c(ab), NOT the unigram count (which is
    # 3 for every word here — e.g. 'b' ends a document once, so only
    # one of its occurrences opens a bigram)
    assert kn["ctx_total"] == {"a": 3, "b": 1, "c": 1}
    assert kn["types"] == 4 and kn["kind"] == "kn"


def test_exact_normalization_per_context():
    kn = build_kn(_toy_lm())
    vocab_words = ["a", "b", "c", "__oov__"]  # seen + the OOV slot
    for ctx in ["a", "b", "c", "zz"]:  # seen contexts AND unseen
        total = sum(_p(kn, ctx, w) for w in vocab_words)
        assert total == pytest.approx(1.0, abs=1e-12), ctx
    # pruning a context's bigrams keeps every OTHER context normalized
    # and the pruned one backs off to the (normalized) continuation
    lm = _toy_lm()
    lm["bigrams"] = {k: v for k, v in lm["bigrams"].items()
                     if not k.startswith("a\x00")}
    kn2 = build_kn(lm)
    for ctx in ["a", "b", "c"]:
        total = sum(_p(kn2, ctx, w) for w in vocab_words)
        assert total == pytest.approx(1.0, abs=1e-12), ctx


def test_continuation_beats_raw_frequency():
    # 'francisco'-shape: frequent word with ONE left context gets a
    # LOWER continuation probability than a less frequent word seen
    # after many contexts
    unigrams = {"san": 5, "francisco": 5, "the": 6, "dog": 2, "cat": 2}
    bigrams = {
        "san\x00francisco": 5,  # francisco: 1 context, count 5
        "the\x00dog": 1, "san\x00dog": 0,  # dog: 2 contexts, count 2
        "cat\x00dog": 1,
        "the\x00cat": 2,
    }
    bigrams = {k: v for k, v in bigrams.items() if v > 0}
    lm = {"unigrams": unigrams, "bigrams": bigrams, "total": 20,
          "vocab": 6, "k": 0.1}
    kn = build_kn(lm)
    p_fran = (kn["cont"].get("francisco", 0) + 1) / (kn["types"] + 6)
    p_dog = (kn["cont"].get("dog", 0) + 1) / (kn["types"] + 6)
    assert p_dog > p_fran  # 2 contexts beats 1, despite 5 > 2 counts


def test_pruned_context_full_backoff_no_crash():
    lm = _toy_lm()
    # context 'b' exists in unigrams but its only bigram is pruned
    lm = dict(lm, bigrams={k: v for k, v in lm["bigrams"].items()
                           if not k.startswith("b\x00")})
    kn = build_kn(lm)
    assert kn["ctx_total"].get("b") is None
    v = kn_perplexity("b c b c", kn)
    assert math.isfinite(v) and v > 0


def test_dispatch_and_logcache_bit_exact():
    lm = build_lm()
    kn = build_kn(lm)
    text = "the of and to in the of and word time people " * 3
    via_dispatch = perplexity(text, kn)
    direct = kn_perplexity(text, kn)
    assert via_dispatch == direct  # bit-equal
    cache: dict = {}
    assert kn_perplexity(text, kn, cache) == direct
    assert kn_perplexity(text, kn, cache) == direct  # warm cache
    assert len(cache) > 0
    # add-k path untouched by the dispatch addition
    assert perplexity(text, lm) != direct


def test_kn_orders_natural_vs_garbage():
    lm = build_lm()
    kn = build_kn(lm)
    natural = "the of and to in is that it was for on are as with"
    garbage = "zxqv jkwp mmnb vvxz qqpr ttyy zzzz xxxx cccc"
    assert kn_perplexity(natural, kn) < kn_perplexity(garbage, kn)
    assert kn_perplexity("", kn) == 1e9


def test_spark_scoring_with_kn_model(spark):
    # the unchanged UDF path accepts a KN dict: model-agnostic scoring
    from dqc_spark.perplexity import with_perplexity

    kn = build_kn(build_lm())
    rows = [(1, "the of and to in is that it"),
            (2, "zxqv jkwp mmnb vvxz"),
            (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["ppl"]
           for r in with_perplexity(df, lm=kn).collect()}
    want = {i: kn_perplexity(t, kn) for i, t in rows}
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-12), i
    assert got[1] < got[2]


def test_spark_trained_lm_feeds_kn(spark):
    # the full loop: train add-k tables distributed, derive KN on the
    # driver, score through the shared kernel
    from dqc_spark.lmtrain import train_bigram_lm

    rows = [(i, "the cat sat on the mat and the dog ran")
            for i in range(20)] + [(100 + i, "xqz wvu ppo") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lm = train_bigram_lm(df.repartition(4), max_vocab=64, min_count=1)
    kn = build_kn(lm)
    assert kn["types"] == len(lm["bigrams"])
    assert kn_perplexity("the cat sat on the mat", kn) < kn_perplexity(
        "mat the ran dog xqz", kn)


def test_build_kn_discount_validated():
    lm = _toy_lm()
    with pytest.raises(ValueError, match="discount"):
        build_kn(lm, discount=0.0)
    with pytest.raises(ValueError, match="discount"):
        build_kn(lm, discount=1.5)

"""BPE trainer/encoder (bpe.py): hand-computed Sennrich merges, exact
Spark-vs-python training parity, encode parity + reconstruction
property, cap tie-breaks, determinism/partition invariance."""

import pytest
from pyspark.sql import functions as F

from dqc_spark.bpe import (
    bpe_token_counts,
    encode_py,
    encode_word,
    train_bpe,
    train_bpe_py,
)

# the classic Sennrich corpus as word frequencies, spelled as texts
SENNRICH_TEXTS = (
    ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
)


def test_merges_match_hand_computation():
    # pair counts: (e,s)=9 (s,t)=9 (t,</w>)=9 tie -> lexicographic
    # smallest ('e','s'); then ('es','t')=9 beats ('t','</w>')=9 by
    # tie-break; then ('est','</w>')=9 stands alone
    merges = train_bpe_py(SENNRICH_TEXTS, n_merges=3)
    assert merges == [("e", "s"), ("es", "t"), ("est", "</w>")]


def test_encode_applies_merges_in_rank_order():
    merges = [("e", "s"), ("es", "t"), ("est", "</w>")]
    assert encode_py("newest", merges) == ["n", "e", "w", "est</w>"]
    assert encode_py("widest", merges) == ["w", "i", "d", "est</w>"]
    # no merge applies -> pure chars + sentinel
    assert encode_py("low", merges) == ["l", "o", "w", "</w>"]
    assert encode_py(None, merges) == []


def test_encode_reconstructs_word():
    merges = train_bpe_py(SENNRICH_TEXTS, n_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["lowest", "newer", "wide", "zzz"]:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + "</w>"


def test_min_pair_count_stops_hapax_merges():
    # every word once -> every pair count 1 -> nothing merges
    assert train_bpe_py(["abc", "def"], n_merges=10) == []


def test_max_words_cap_tiebreak():
    # counts: aa=2, bb=2, cc=3; cap 2 keeps cc + (tie 2: 'aa' < 'bb')
    texts = ["aa aa bb bb cc cc cc"]
    with_cap = train_bpe_py(texts, n_merges=1, max_words=2)
    manual = train_bpe_py(["aa aa cc cc cc"], n_merges=1)
    assert with_cap == manual


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, t) for i, t in enumerate(SENNRICH_TEXTS)] + [
        (100, ""), (101, None), (102, "the newest lower widest low"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_spark_training_matches_python_exactly(spark, docs):
    texts = [r["text"] for r in docs.collect()]
    want = train_bpe_py(texts, n_merges=8)
    got = train_bpe(docs, n_merges=8, max_words=None)
    assert got == want
    # capped, and partition-count invariant
    want_cap = train_bpe_py(texts, n_merges=8, max_words=5)
    assert train_bpe(docs, n_merges=8, max_words=5) == want_cap
    assert train_bpe(docs.repartition(7), n_merges=8, max_words=5) == want_cap


def test_token_counts_match_python_oracle(spark, docs):
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    merges = train_bpe_py(texts.values(), n_merges=8)
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_counts(docs, merges).collect()
    }
    assert got.keys() == texts.keys()
    for did, t in texts.items():
        assert got[did] == len(encode_py(t, merges)), did
    assert got[100] == 0 and got[101] == 0

"""Unigram-LM (SentencePiece-style) tokenizer training: exact
Spark==python trainer parity, coverage/determinism properties, and the
encode kernel."""

import math

import pytest

from dqc_spark.unigramlm import (
    encode_unigram_py,
    encode_word_viterbi,
    train_unigram,
    train_unigram_py,
    unigram_token_counts,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "quickly and lazily the dogs and foxes play all day",
    "international internationalization internals internet",
    "中文文档内容 and internet dogs 文档",
    None,
    "",
] * 3

KW = dict(vocab_size=60, seed_size=200, max_piece_len=6)


def test_train_spark_equals_python(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string"
    ).repartition(4)
    got = train_unigram(df, **KW, max_words=None)
    exp = train_unigram_py(TEXTS, **KW)
    assert got == exp  # exact: same _fit over the same capped counts


def test_partition_invariance(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string")
    a = train_unigram(df.repartition(1), **KW, max_words=None)
    b = train_unigram(df.repartition(7), **KW, max_words=None)
    assert a == b


def test_model_shape_and_normalization():
    m = train_unigram_py(TEXTS, **KW)
    assert len(m) <= KW["vocab_size"]
    assert abs(sum(math.exp(v) for v in m.values()) - 1.0) < 1e-9
    # every single codepoint of the corpus survives pruning (coverage)
    from dqc_spark.lmtrain import _scorer_tokens
    chars = {c for t in TEXTS if t for w in _scorer_tokens(t) for c in w}
    assert chars <= set(m)
    # and at least one multi-char piece was learned
    assert any(len(p) > 1 for p in m)


def test_encode_coverage_and_word_boundaries():
    from dqc_spark.lmtrain import _scorer_tokens

    m = train_unigram_py(TEXTS, **KW)
    for t in TEXTS:
        toks = encode_unigram_py(t, m, max_len=KW["max_piece_len"])
        words = _scorer_tokens(t)
        # concatenation round-trips and pieces never cross word bounds
        assert "".join(toks) == "".join(words)
        i = 0
        for w in words:
            acc = ""
            while len(acc) < len(w):
                acc += toks[i]
                i += 1
            assert acc == w


def test_unknown_codepoints_fall_back_to_chars():
    m = train_unigram_py(TEXTS, **KW)
    toks = encode_unigram_py("qqq ЯЯ", m)
    assert "".join(toks) == "qqqяя"  # fold_case lowers the Cyrillic
    assert all(len(p) == 1 for p in toks if p in "яЯ" or p not in m)


def test_viterbi_prefers_probable_segmentation():
    logp = {"a": math.log(0.1), "b": math.log(0.1), "ab": math.log(0.8)}
    assert encode_word_viterbi("ab", logp) == ("ab",)
    assert encode_word_viterbi("aab", logp) == ("a", "ab")


def test_validation_errors():
    with pytest.raises(ValueError, match="vocab_size"):
        train_unigram_py(TEXTS, vocab_size=0)
    with pytest.raises(ValueError, match="prune_frac"):
        train_unigram_py(TEXTS, vocab_size=10, prune_frac=1.0)
    assert train_unigram_py([]) == {}
    assert train_unigram_py([None, ""]) == {}


def test_token_counts_kernel(spark):
    rows = [(i, t) for i, t in enumerate(TEXTS) if t]
    df = spark.createDataFrame(rows, "doc_id int, text string") \
        .repartition(3)
    m = train_unigram_py(TEXTS, **KW)
    out = {r.doc_id: r.n_unigram_tokens
           for r in unigram_token_counts(
               df, m, max_len=KW["max_piece_len"]).collect()}
    for i, t in rows:
        assert out[i] == len(encode_unigram_py(
            t, m, max_len=KW["max_piece_len"]))


def test_compression_beats_chars():
    """The learned vocabulary must actually compress: far fewer pieces
    than characters on in-domain text."""
    m = train_unigram_py(TEXTS, **KW)
    t = "the quick dogs play all day"
    n_chars = len(t.replace(" ", ""))
    assert len(encode_unigram_py(t, m)) <= n_chars * 0.55


def test_em_rounds_validated():
    import pytest as _pytest

    from dqc_spark.unigramlm import train_unigram_py

    with _pytest.raises(ValueError, match="em_rounds"):
        train_unigram_py(["some words here"], em_rounds=0)

"""Gopher repetition signals: exact hand-computed pins on crafted
documents, edge cases, and Spark-kernel parity with the shared python
function."""

import pytest

from dqc_spark.textstats import repetition_signals, repetition_signals_py


def test_dup_lines_exact():
    # 4 lines: 'aaaa' x2 (len 4), 'bb', 'cccccc'
    s = repetition_signals_py("aaaa\nbb\naaaa\ncccccc")
    assert s["dup_line_frac"] == pytest.approx((4 - 3) / 4)
    # dup chars: (2-1)*4 = 4 over total 4+4+2+6 = 16
    assert s["dup_line_char_frac"] == pytest.approx(4 / 16)
    # one paragraph only -> no paragraph duplication
    assert s["dup_para_frac"] == 0.0
    assert s["dup_para_char_frac"] == 0.0


def test_dup_paragraphs_exact():
    s = repetition_signals_py("para one\n\npara two\n\npara one")
    assert s["dup_para_frac"] == pytest.approx(1 / 3)
    # (2-1)*8 over 8+8+8
    assert s["dup_para_char_frac"] == pytest.approx(8 / 24)


def test_top_ngram_exact():
    t = "go go go stop"  # len 13
    s = repetition_signals_py(t)
    # bigrams: (go,go) x2 (5 chars), (go,stop) x1 -> 2*5/13
    assert s["top_2gram_char_frac"] == pytest.approx(10 / 13)
    # trigrams: (go,go,go) x1 (8 chars), (go,go,stop) x1 (10 chars)
    assert s["top_3gram_char_frac"] == pytest.approx(10 / 13)
    assert s["top_4gram_char_frac"] == pytest.approx(13 / 13)


def test_dup_ngram_coverage_counts_overlaps_once():
    # 'a b c d e' repeated: every 5-gram recurs; 2nd occurrence words
    # are covered once each despite overlapping duplicate grams
    t = "a b c d e a b c d e"
    s = repetition_signals_py(t)
    # words 5..9 covered (5 chars of 10 single-char words)
    assert s["dup_5gram_char_frac"] == pytest.approx(5 / 10)
    # no 10-gram duplicate exists (only one 10-gram)
    assert s["dup_10gram_char_frac"] == 0.0


def test_no_repetition_is_all_zero():
    s = repetition_signals_py("all words here are distinct tokens")
    for k, v in s.items():
        if k.startswith("dup_"):
            assert v == 0.0, k


def test_edges():
    for t in (None, "", "one"):
        s = repetition_signals_py(t)
        assert all(0.0 <= v <= 1.0 for v in s.values()), t
    # single repeated word: no bigram dup but top-2gram covers it
    s = repetition_signals_py("x x x x")
    assert s["top_2gram_char_frac"] == pytest.approx(3 * 3 / 7)


def test_spark_kernel_matches_python(spark):
    from pyspark.sql import functions as F

    from dqc_spark.pagesgen import generate_pages

    # (url, warc_ts) is the crawl's unique key (urls recur across
    # snapshots); repetition_signals takes one key column, so concat
    pages = generate_pages(spark, 80, n_partitions=3).select(
        F.concat("url", F.col("warc_ts").cast("string")).alias("k"),
        "text")
    got = {r["k"]: r.asDict() for r in
           repetition_signals(pages, "k").collect()}
    for row in pages.collect():
        want = repetition_signals_py(row["text"])
        have = got[row["k"]]
        for k, v in want.items():
            assert have[k] == pytest.approx(v), (row["k"], k)

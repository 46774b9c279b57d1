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


def test_structure_signals_bullet_ellipsis_dupword():
    # 4 non-empty lines: 2 bullets (one tab-indented), 1 ellipsis,
    # 1 plain; the blank and whitespace-only lines don't count
    t = ("• first point\n"
         "\t- second point\n"
         "   \n"
         "\n"
         "trailing thought...\n"
         "plain line here")
    s = repetition_signals_py(t)
    assert s["bullet_line_frac"] == pytest.approx(2 / 4)
    assert s["ellipsis_line_frac"] == pytest.approx(1 / 4)
    # unicode ellipsis and … variant
    s2 = repetition_signals_py("ends mid sentence…")
    assert s2["ellipsis_line_frac"] == 1.0
    # dup_word_frac: 6 words, 4 distinct -> 1 - 4/6
    s3 = repetition_signals_py("spark spark rdd rdd plan codegen")
    assert s3["dup_word_frac"] == pytest.approx(1 - 4 / 6)
    # degenerate inputs
    for t0 in ("", None, "\n \n\t\n"):
        s0 = repetition_signals_py(t0)
        assert s0["bullet_line_frac"] == 0.0
        assert s0["ellipsis_line_frac"] == 0.0
        assert s0["dup_word_frac"] == 0.0


def test_structure_signal_gates_in_curate(spark):
    """The new signals ride the existing repetition-gate stage: a
    bullet-list page drops at max bullet_line_frac while prose
    survives."""
    from dqc_spark.pagesgen import generate_pages
    from dqc_spark.pipeline import curate

    pages = generate_pages(spark, 40, n_partitions=2)
    from pyspark.sql import functions as F
    listified = pages.withColumn(
        "text",
        F.when(F.col("url").rlike("[02468]$"),
               F.concat(F.lit("• "),
                        F.regexp_replace("text", "\n", "\n• ")))
        .otherwise(F.col("text")))
    base = curate(listified, near_dup_threshold=None)
    gated = curate(listified, near_dup_threshold=None,
                   repetition_thresholds={"bullet_line_frac": 0.5})
    kept_base = {r["doc_key"] for r in base.select("doc_key").collect()}
    kept_gated = {r["doc_key"] for r in gated.select("doc_key").collect()}
    assert kept_gated < kept_base  # strictly fewer survive
    # every additionally-dropped doc really is bullet-heavy
    from dqc_spark.textstats import repetition_signals_py
    texts = {r["doc_key"]: r["scrubbed_text"]
             for r in base.select("doc_key", "scrubbed_text").collect()}
    for k in kept_base - kept_gated:
        assert repetition_signals_py(texts[k])["bullet_line_frac"] > 0.5


def test_structure_oracle_word_split_matches_python_split():
    """The oracle's word-split class must equal python str.split()'s
    whitespace set EXACTLY — RE2 '\\s' is ASCII-only, so NBSP/NEL/
    U+2000-200A/ideographic-space text would silently diverge (review
    finding).  Probed live against DuckDB on exotic-whitespace text,
    plus a full-codepoint sweep of the class itself."""
    import re

    import duckdb

    from dqc_spark.entry_ext import _PYWS_SPLIT

    samples = ["a\u00a0b", "a\u2003b\u2009c", "x\u3000y", "a\x1cb",
               "a\x0bb", "\u0085n", "plain words here", "", "\u2022"]
    con = duckdb.connect()
    for t in samples:
        got = con.execute(
            "SELECT len(list_filter(regexp_split_to_array(?, ?),"
            " x -> x <> ''))", [t, _PYWS_SPLIT]).fetchone()[0]
        assert got == len(t.split()), repr(t)
    one = re.compile(_PYWS_SPLIT[:-1])  # strip the '+': one-char class
    for cp in range(0x110000):
        if 0xD800 <= cp <= 0xDFFF:
            continue  # surrogates: not encodable text
        c = chr(cp)
        assert bool(one.fullmatch(c)) == (c.split() == []), hex(cp)

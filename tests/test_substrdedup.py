"""Substring-level exact dedup: distributed result == pure-python
oracle, plus semantic pins (winner keeps, overlaps merge, short docs
untouched) and the plan-shape guarantee (no text in the shuffle)."""

import pytest
from pyspark.sql import functions as F

from dqc_spark.substrdedup import (
    dedup_substrings,
    dedup_substrings_py,
    shingle_occurrences,
)


@pytest.fixture(scope="module")
def corpus(spark):
    boiler = "subscribe to our newsletter for the latest updates and offers"
    rows = [
        (1, f"alpha beta gamma delta {boiler} epsilon zeta"),
        (2, f"one two three four five six seven {boiler}"),
        (3, f"{boiler} totally different tail content here now"),
        (4, "no duplicated content in this document at all whatsoever today"),
        (5, "short doc"),
        (6, None),
        # self-repetition: same 10-word run twice inside ONE doc
        (7, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 filler x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_matches_python_oracle(spark, corpus):
    rows, df = corpus
    want = dedup_substrings_py([(k, t) for k, t in rows], k=10)
    got = {
        r["key"]: (r["text_dedup"], r["n_words"], r["n_words_kept"])
        for r in dedup_substrings(df, "doc_id", k=10).collect()
    }
    assert got == want


def test_winner_and_coverage_semantics(spark, corpus):
    rows, df = corpus
    got = {r["key"]: r for r in dedup_substrings(df, "doc_id", k=10).collect()}
    boiler_words = "subscribe to our newsletter for the latest updates and offers".split()
    # doc 1 holds the first (smallest key) occurrence -> keeps everything
    assert got[1]["text_dedup"] == rows[0][1]
    # docs 2 and 3 lose exactly the 10 boilerplate words
    assert got[2]["n_words_kept"] == got[2]["n_words"] - 10
    assert got[3]["n_words_kept"] == got[3]["n_words"] - 10
    for w in boiler_words:
        assert w not in got[3]["text_dedup"].split()
    # clean doc, short doc, NULL doc untouched
    assert got[4]["text_dedup"] == rows[3][1]
    assert got[5] ["text_dedup"] == "short doc"
    assert got[6]["text_dedup"] == "" and got[6]["n_words"] == 0
    # self-repetition: second in-doc occurrence excised, first kept
    assert got[7]["text_dedup"] == "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 filler"


def test_overlapping_duplicates_merge(spark):
    # 12 shared words -> three overlapping duplicated 10-shingles in the
    # copy; the union of spans removes all 12 words, not 10
    shared = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    df = spark.createDataFrame(
        [(1, f"{shared} original tail"), (2, f"copycat intro {shared}")],
        "doc_id long, text string",
    )
    got = {r["key"]: r for r in dedup_substrings(df, "doc_id", k=10).collect()}
    assert got[1]["text_dedup"] == f"{shared} original tail"
    assert got[2]["text_dedup"] == "copycat intro"


def test_shingle_occurrences_shape_and_determinism(spark, corpus):
    _, df = corpus
    occ = shingle_occurrences(df, "doc_id", k=10)
    assert [f.name for f in occ.schema.fields] == ["key", "pos", "h1", "h2"]
    rows1 = sorted(map(tuple, occ.collect()))
    rows2 = sorted(map(tuple, shingle_occurrences(df, "doc_id", k=10).collect()))
    assert rows1 == rows2  # deterministic hashes across runs
    # a doc with n words yields n-k+1 shingles
    n7 = sum(1 for r in rows1 if r[0] == 7)
    assert n7 == 21 - 10 + 1


def test_string_keys_and_partition_invariance(spark, corpus):
    rows, df = corpus
    urls = df.select(
        F.concat(F.lit("https://example.com/"), "doc_id").alias("url"), "text"
    )
    got = {r["key"]: r["text_dedup"]
           for r in dedup_substrings(urls, "url", k=10).collect()}
    want = dedup_substrings_py(
        [(f"https://example.com/{k}", t) for k, t in rows], k=10
    )
    assert got == {k: v[0] for k, v in want.items()}
    # result independent of physical partitioning
    re4 = {r["key"]: r["text_dedup"]
           for r in dedup_substrings(df.repartition(4), "doc_id", k=10).collect()}
    re1 = {r["key"]: r["text_dedup"]
           for r in dedup_substrings(df.coalesce(1), "doc_id", k=10).collect()}
    assert re4 == re1


def test_idempotent(spark, corpus):
    _, df = corpus
    once = dedup_substrings(df, "doc_id", k=10).select(
        F.col("key").alias("doc_id"), F.col("text_dedup").alias("text")
    )
    twice = {r["key"]: r["text_dedup"]
             for r in dedup_substrings(once, "doc_id", k=10).collect()}
    for r in once.collect():
        assert twice[r["doc_id"]] == r["text"]


def test_no_text_in_shuffle_plan(spark, corpus):
    # the winner-election aggregate must be partial (map-side combine)
    # and the exchange upstream of it must carry only (key,pos,h1,h2)
    _, df = corpus
    from dqc_spark.substrdedup import _duplicate_starts

    plan = (
        _duplicate_starts(shingle_occurrences(df, "doc_id", k=10))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_min" in plan or "partial" in plan.lower()
    # text reaches only the scan feeding the shingle kernel — every
    # Exchange carries the (key,pos,h1,h2) projection, never text
    exchange_lines = [l for l in plan.splitlines() if "Exchange" in l]
    assert exchange_lines and all("text" not in l for l in exchange_lines)


def test_cjk_text_not_rewritten_and_dedup_excises(spark):
    """Regression (r4 review): unicode_tokens isolates every CJK
    codepoint, so a plain ' '.join rebuild would inject a space
    between every character of CJK text even when NOTHING was
    deduplicated.  join_tokens rejoins CJK neighbors with no
    separator: an untouched space-free document round-trips verbatim,
    and a planted cross-doc CJK duplicate run still excises."""
    dup = "春夏秋冬山川草木風雨雷電"  # 12 chars >= k=10 window
    rows = [
        (1, f"{dup}東西南北"),
        (2, f"左右上下{dup}"),
        (3, "全部違う文字列なので重複は無い筈です"),
        (4, f"mixed latin {dup} tail words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["key"]: r for r in dedup_substrings(df, "doc_id", k=10).collect()}
    # the python twin must agree exactly (never-fork rule)
    want = dedup_substrings_py(rows, k=10)
    assert {k: (r["text_dedup"], r["n_words"], r["n_words_kept"])
            for k, r in got.items()} == want
    # doc 3 has no duplicated span: byte-identical round trip
    assert got[3]["text_dedup"] == rows[2][1]
    # doc 1 is the corpus-wide winner (smallest key): fully intact
    assert got[1]["text_dedup"] == rows[0][1]
    # docs 2/4 lose the covered run but keep their own text unspaced
    assert got[2]["text_dedup"] == "左右上下"
    assert got[4]["text_dedup"] == "mixed latin tail words here"
    # mixed boundaries keep the space between latin and CJK tokens
    df2 = spark.createDataFrame(
        [(9, "latin 文字 latin")], "doc_id long, text string")
    assert (dedup_substrings(df2, "doc_id", k=10).collect()[0]["text_dedup"]
            == "latin 文字 latin")


def test_null_key_rejected_loudly(spark):
    from dqc_spark.substrdedup import dedup_substrings
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    df = spark.createDataFrame(
        [(None, "one two three four five six seven eight nine ten x")],
        "doc_id long, text string")
    with pytest.raises((PythonException, Py4JJavaError), match="NULL"):
        dedup_substrings(df, "doc_id", k=5).collect()

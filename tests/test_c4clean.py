"""C4 line cleaning (c4clean.py): line-rule pins, kernel-vs-python
parity, page-gate semantics, and the shuffle-free plan shape."""

import pytest
from pyspark.sql import functions as F

from dqc_spark.c4clean import (
    c4_clean,
    clean_text_py,
    keep_line_py,
    page_keep_pred,
)


def test_line_rules():
    assert keep_line_py("This line has exactly five.")
    assert keep_line_py('He said "stop right there now"')  # quote terminal
    assert keep_line_py("Is this a real question now?")
    assert not keep_line_py("Too short line.")  # < 5 words
    assert not keep_line_py("No terminal punctuation on this line")
    assert not keep_line_py("Please enable JavaScript to continue viewing.")
    assert not keep_line_py("")
    # boundary: exactly min_words words counts the attached punctuation
    assert keep_line_py("one two three four five.", min_words=5)
    assert not keep_line_py("one two three four five.", min_words=6)


def test_clean_text_strips_and_rejoins():
    doc = (
        "  First sentence with enough words here.  \n"
        "short one\n"
        "\tSecond good sentence keeps its words!\n"
        "uses javascript so it must go away.\n"
        "Third one survives the whole pass?"
    )
    assert clean_text_py(doc) == (
        "First sentence with enough words here.\n"
        "Second good sentence keeps its words!\n"
        "Third one survives the whole pass?"
    )
    assert clean_text_py(None) is None
    assert clean_text_py("") == ""


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        (0, "Alpha beta gamma delta epsilon.\nZeta eta theta iota kappa!\n"
            "Lambda mu nu xi omicron?"),                      # 3 sentences, keep
        (1, "Alpha beta gamma delta epsilon.\nonly two kept here no"),  # 1 sentence
        (2, "Good first sentence with five words.\nGood second sentence "
            "with five words!\nGood third sentence with five words?\n"
            "var x = { a: 1 };"),                             # curly -> drop
        (3, "Lorem Ipsum dolor sit amet today.\nGood second sentence with "
            "five words!\nGood third sentence with five words?"),  # lorem -> drop
        (4, None),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_spark_matches_python_and_gates(spark, pages):
    got = {r["doc_id"]: r for r in c4_clean(pages).collect()}
    for r in pages.collect():
        want = clean_text_py(r["text"])
        assert got[r["doc_id"]]["clean_text"] == want, r["doc_id"]
    assert got[0]["keep"] is True and got[0]["n_sentences"] == 3
    assert got[1]["keep"] is False          # < 3 sentences
    assert got[2]["keep"] is False          # curly bracket in original
    assert got[3]["keep"] is False          # lorem ipsum in original
    assert got[4]["keep"] is None           # NULL text -> NULL gate
    assert got[5]["keep"] is False


def test_page_pred_checks_original_not_cleaned(spark):
    # the curly line itself is filtered out of clean_text, but the page
    # gate must still fire because the ORIGINAL contains '{'
    df = spark.createDataFrame(
        [(0, "One good sentence with five words.\nTwo good sentences with "
             "five words!\nThree good sentences with five words?\n{ }")],
        "doc_id bigint, text string",
    )
    row = c4_clean(df).collect()[0]
    assert "{" not in row["clean_text"]
    assert row["n_sentences"] == 3
    assert row["keep"] is False


def test_curate_c4_stage(spark):
    from dqc_spark.pagesgen import generate_pages
    from dqc_spark.pipeline import curate

    pages = generate_pages(spark, 60, n_partitions=2)
    good_lines = [
        "the quick brown fox jumps over the lazy dog today.",
        "she said the old house was on the far green hill.",
        "a small bird sang in the tall tree all morning long!",
        "we walked down to the river and watched the water flow?",
    ]
    boiler = [
        "click here",
        "please enable javascript for the full site experience now.",
        "home about contact privacy terms",
    ]
    raw = "\n".join(good_lines[:2] + boiler + good_lines[2:])
    clean = "\n".join(good_lines)
    code = clean + "\nif (x) { y; }"
    # the default broadcast LM is trained on the pagesgen vocabulary, so
    # hand-written English fails the ppl gate — score with an LM trained
    # on the planted text instead (the CCNet trained-LM path)
    from dqc_spark.lmtrain import train_lm_py

    lm = train_lm_py([raw, code])
    r = pages.first()

    def mk(url, text):
        return (url, r["warc_ts"], r["html"], text, "en")

    planted = spark.createDataFrame(
        [mk("http://planted.example.com/good", raw),
         mk("http://planted.example.com/code", code)],
        pages.schema)
    corpus = pages.unionByName(planted)

    off = curate(corpus, near_dup_threshold=None, lm=lm)
    assert off.filter(F.col("url").like("%planted%")).count() == 2

    on = curate(corpus, near_dup_threshold=None, c4_line_clean=True, lm=lm)
    got = {row["url"]: row
           for row in on.filter(F.col("url").like("%planted%")).collect()}
    # boilerplate page survives WITH its lines cleaned; curly page dies
    assert set(got) == {"http://planted.example.com/good"}
    assert got["http://planted.example.com/good"]["text"] == clean
    # the synthetic pages have no terminal punctuation at all -> the C4
    # stage removes every line, so none survive the sentence gate
    assert on.count() == 1


def test_plan_is_shuffle_free(spark, pages):
    plan = c4_clean(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

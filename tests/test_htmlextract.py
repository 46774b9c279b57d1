"""HTML->text extraction: byte-identical round trip on the synthetic
pages table (the north-rule invariant), messy-markup zoo, NULL paths,
and the conditional only-missing repair mode."""

import pytest
from pyspark.sql import functions as F

from dqc_spark.htmlextract import extract_text, extract_text_col, extract_text_py
from dqc_spark.pagesgen import generate_pages, make_page


def test_roundtrip_byte_identity_python():
    # text -> html (pagesgen's wrapper) -> extract == text, byte-for-byte
    for i in range(200):
        p = make_page(i)
        assert extract_text_py(p["html"]) == p["text"]


def test_roundtrip_byte_identity_spark(spark):
    pages = generate_pages(spark, 300, n_partitions=4)
    mism = (
        pages.select(
            "url", "text", extract_text_col("html").alias("extracted")
        )
        .filter(~(F.col("extracted") == F.col("text")))
        .count()
    )
    assert mism == 0


ZOO = [
    (b"<html><body><p>hello world</p></body></html>", "hello world"),
    # paragraph boundary = blank line (both tags emit a newline)
    (b"<p>a</p><p>b</p>", "a\n\nb"),
    (b"<div>x<br>y</div>", "x\ny"),
    (b"<p>keep <b>bold</b> text</p>", "keep bold text"),
    (b"<p>5 &lt; 6 &amp; 7 &gt; 2&#39;s</p>", "5 < 6 & 7 > 2's"),
    (b"<script>var x = '<p>no</p>';</script><p>yes</p>", "yes"),
    (b"<style>p { color: red }</style><p>styled</p>", "styled"),
    (b"<!-- <p>comment</p> --><p>real</p>", "real"),
    (b"<ul><li>one</li><li>two</li></ul>", "one\n\ntwo"),
    (b"<h1>Title</h1><p>body</p>", "Title\n\nbody"),
    # interior newlines in a text node survive verbatim
    (b"<p>line1\nline2</p>", "line1\nline2"),
    # tag-introduced blank runs collapse to one blank line
    (b"<div></div><div></div><div></div><p>tail</p>", "tail"),
    (b"<p>a</p><div></div><div></div><p>b</p>", "a\n\nb"),
    # attributes, self-closing, uppercase tags
    (b'<P CLASS="x">Upper</P><BR/><p>case</p>', "Upper\n\ncase"),
    # invalid utf-8 is replaced, not fatal
    ("<p>caf\xe9</p>".encode("latin-1"), "caf�"),
    (b"", ""),
    # a '</style>' STRING inside a script must not terminate it (the
    # close tag is backreference-pinned to the open tag): the whole
    # script body is removed, nothing leaks into training text
    (b'<script>var css = "</style>"; steal();</script><p>real</p>',
     "real"),
    (b'<style>s::after { content: "</script>" }</style><p>ok</p>', "ok"),
    # case-insensitive backreference
    (b"<SCRIPT>var y = 1;</script><p>z</p>", "z"),
    # normal-form collapse: text newline runs >= 3 become one blank
    # line, leading/trailing newlines trimmed (documented: round trip
    # is byte-identical only for text already in normal form)
    (b"<p>a\n\n\nb</p>", "a\n\nb"),
    (b"<p>\nx\n</p>", "x"),
]


def test_zoo_python():
    for html, want in ZOO:
        assert extract_text_py(html) == want, html


def test_zoo_spark_matches_python(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(ZOO)], "i long, html binary"
    )
    got = {r["i"]: r["text"]
           for r in df.select("i", extract_text_col("html")).collect()}
    for i, (html, want) in enumerate(ZOO):
        assert got[i] == want, html


def test_null_html(spark):
    assert extract_text_py(None) is None
    df = spark.createDataFrame([(1, None)], "i long, html binary")
    assert df.select(extract_text_col("html")).collect()[0]["text"] is None


def test_only_missing_repair(spark):
    rows = [
        (1, b"<p>from html</p>", None),          # repaired from html
        (2, b"<p>ignored</p>", "existing text"),  # existing text wins
        (3, None, None),                          # nothing to extract
    ]
    df = spark.createDataFrame(rows, "i long, html binary, text string")
    got = {r["i"]: r["text"] for r in extract_text(df).collect()}
    assert got == {1: "from html", 2: "existing text", 3: None}
    # repair mode re-extracts everything
    got2 = {r["i"]: r["text"]
            for r in extract_text(df, only_missing=False).collect()}
    assert got2 == {1: "from html", 2: "ignored", 3: None}


def test_missing_text_column(spark):
    df = spark.createDataFrame([(1, b"<p>x</p>")], "i long, html binary")
    out = extract_text(df)
    assert out.collect()[0]["text"] == "x"


# --- robots-meta noindex gate -------------------------------------------

NOINDEX_ZOO = [
    ('<meta name="robots" content="noindex, nofollow">', True),
    ("<meta content='NONE' name='ROBOTS'>", True),          # reversed attrs
    ("<meta name=robots content=noindex>", True),           # unquoted
    ("<META NAME=ROBOTS CONTENT=NOINDEX />", True),         # case + self-close
    ('<meta name="robots" content="index, follow">', False),
    ('<meta name="robots" content="nofollow">', False),     # nofollow only
    ('<!--<meta name="robots" content="noindex">-->', False),  # commented out
    ('<meta name="description" content="noindex tips">', False),  # wrong name
    ('<meta name="robots" content="noindexing">', False),   # word boundary
    ("no meta at all", False),
    ("", False),
]


def test_noindex_python_twin():
    from dqc_spark.htmlextract import noindex_py

    for frag, want in NOINDEX_ZOO:
        html = f"<html><head>{frag}</head><body>x</body></html>".encode()
        assert noindex_py(html) is want, frag
    assert noindex_py(None) is None


def test_noindex_spark_matches_python(spark):
    # Java rlike vs python re over the same pattern strings
    from dqc_spark.htmlextract import noindex_pred

    rows = [
        (i, f"<html><head>{frag}</head><body>x</body></html>".encode())
        for i, (frag, _) in enumerate(NOINDEX_ZOO)
    ] + [(len(NOINDEX_ZOO), None)]
    df = spark.createDataFrame(rows, "i long, html binary")
    got = {r["i"]: r["noindex"]
           for r in df.select("i", noindex_pred("html").alias("noindex"))
           .collect()}
    for i, (frag, want) in enumerate(NOINDEX_ZOO):
        assert got[i] is want, frag
    assert got[len(NOINDEX_ZOO)] is None  # NULL html -> NULL


def test_curate_drop_noindex(spark):
    from dqc_spark.pipeline import curate

    pages = generate_pages(spark, 80, n_partitions=2)
    # plant the directive into the html of 10 pages; curate must drop
    # exactly those and keep the rest (html content is otherwise unused
    # by the default stages)
    tagged = pages.withColumn(
        "html",
        F.when(
            F.xxhash64("url") % 8 == 0,
            F.concat(
                F.lit(b'<meta name="robots" content="noindex">'),
                F.col("html")),
        ).otherwise(F.col("html")),
    )
    off = curate(tagged, near_dup_threshold=None)
    on = curate(tagged, near_dup_threshold=None, drop_noindex=True)
    n_tagged_kept_off = off.filter(
        F.xxhash64("url") % 8 == 0).count()
    assert n_tagged_kept_off > 0  # the gate-off run keeps some tagged docs
    assert on.filter(F.xxhash64("url") % 8 == 0).count() == 0
    assert on.count() == off.count() - n_tagged_kept_off

    with pytest.raises(ValueError, match="html"):
        curate(pages.drop("html"), near_dup_threshold=None,
               drop_noindex=True)


def test_noindex_cross_dialect_fuzz(spark):
    """The noindex gate's whole design is ONE set of pattern strings
    evaluated by three regex engines; fuzz Java-rlike vs python-re over
    adversarial fragments built from the tokens the patterns care
    about."""
    import random

    from dqc_spark.htmlextract import noindex_py, noindex_pred

    rng = random.Random(0)
    tokens = [
        "<meta ", ">", "/>", "name", "content", "robots", "ROBOTS",
        "noindex", "NOINDEX", "none", "nofollow", "index", "=", " ",
        '"', "'", ",", "<!--", "-->", "<p>", "descr", "x",
    ]
    frags = ["".join(rng.choice(tokens) for _ in range(rng.randint(1, 12)))
             for _ in range(300)]
    df = spark.createDataFrame(
        [(i, f.encode()) for i, f in enumerate(frags)],
        "i long, html binary")
    got = {r["i"]: r["noindex"]
           for r in df.select("i", noindex_pred("html").alias("noindex"))
           .collect()}
    for i, f in enumerate(frags):
        assert got[i] is noindex_py(f.encode()), repr(f)

"""Main-content extraction — block parsing, the two classification
phases, Spark parity, WARC/CLI integration."""

import pytest
from pyspark.sql import functions as F

from dqc_spark.maincontent import (
    block_verdicts,
    classify_blocks_py,
    extract_main_content,
    main_content_py,
)

P1 = " ".join(f"w{i}" for i in range(22))
P2 = " ".join(f"v{i}" for i in range(25))
NAV = ('<div id="nav"><a href="/">Home</a> <a href="/a">About</a> '
       '<a href="/c">Contact</a> <a href="/p">Pricing</a></div>')
RELATED = ('<div>Related stories: <a>one</a> <a>two</a> '
           '<a>three</a></div>')
FOOTER = ('<footer><a>Privacy</a> <a>Terms</a> <a>Imprint</a> '
          'Copyright 2026</footer>')
PAGE = (
    '<html><head><title>Doc page</title>'
    '<script>var nav = "<p>no</p>";</script></head><body>'
    + NAV
    + "<h2>Section overview</h2>"
    + f"<p>{P1}</p>"
    + RELATED
    + "<p>Read the quick summary below</p>"
    + f"<p>{P2}</p>"
    + FOOTER
    + "</body></html>"
)
EXPECT = f"Section overview\n{P1}\nRead the quick summary below\n{P2}"


def test_full_page():
    assert main_content_py(PAGE) == EXPECT
    assert main_content_py(PAGE.encode()) == EXPECT  # bytes in, same out


def test_block_labels_and_evidence():
    rows = classify_blocks_py(PAGE)
    by_text = {r["text"][:16]: r for r in rows}
    assert by_text["Doc page"]["label"] == "bad"  # title: 2 words
    nav = by_text["Home About Conta"]
    assert nav["label"] == "bad" and nav["link_density"] > 0.8
    h = by_text["Section overview"]
    assert h["label"] == "heading" and h["keep"]  # next GOOD rescues it
    assert by_text[P1[:16]]["label"] == "good"
    rel = by_text["Related stories:"]
    assert rel["label"] == "bad" and 0.25 < rel["link_density"] < 0.5
    teaser = by_text["Read the quick s"]
    assert teaser["label"] == "short" and teaser["keep"]
    assert by_text["Privacy Terms Im"]["label"] == "bad"


def test_context_rules():
    long = " ".join(f"x{i}" for i in range(30))
    linky = "<p><a>aaa</a> <a>bbb</a> <a>ccc</a></p>"
    # short between two BADs -> dropped
    assert main_content_py(
        f"{linky}<p>five short words here now</p>{linky}") == ""
    # short next to a GOOD on either side -> kept
    assert "five short words" in main_content_py(
        f"<p>{long}</p><p>five short words here now</p>{linky}")
    assert "five short words" in main_content_py(
        f"{linky}<p>five short words here now</p><p>{long}</p>")
    # heading: only a FOLLOWING good rescues it
    assert main_content_py(f"<p>{long}</p><h3>The heading</h3>{linky}") \
        == long
    assert main_content_py(f"{linky}<h3>The heading</h3><p>{long}</p>") \
        == f"The heading\n{long}"
    # linky heading is nav furniture whatever follows
    assert main_content_py(
        f"<h3><a>The heading link</a></h3><p>{long}</p>") == long


def test_parser_edges():
    long = " ".join(f"x{i}" for i in range(30))
    # stray </a> is ignored; nested <a> implies </a> first (the HTML5
    # recovery rule — nested anchors cannot exist in a DOM), so the
    # first </a> ends ALL linking
    assert main_content_py(f"</a></a><p>{long}</p>") == long
    r = classify_blocks_py("<p><a><a>linked</a> still</a> free</p>",
                           long_words=2)[0]
    assert r["link_density"] == pytest.approx(len("linked") /
                                              len("linked still free"))
    # one unclosed <a> followed by more links must NOT mark the whole
    # rest of the page linked (the common crawl-HTML breakage)
    r = classify_blocks_py(
        f"<p><a href=1>one <a href=2>two</a> {long}</p>")[0]
    assert r["keep"] and r["link_density"] < 0.25
    # ...but a card link legitimately spanning block boundaries keeps
    # its anchor state across the flush, matching the DOM
    rows = classify_blocks_py("<a><div>card one</div><div>card two"
                              "</div></a>", short_words=1)
    assert all(x["link_density"] == 1.0 for x in rows)
    # entities decode before char counts; comments/script/style gone
    out = main_content_py(
        f"<!--<p>no</p>--><style>p {{}}</style><p>{long} &amp; more</p>")
    assert out == f"{long} & more"
    # <br> is a soft wrap, not a block boundary
    one = classify_blocks_py(f"<p>{long}<br>{long}</p>")
    assert len(one) == 1 and one[0]["label"] == "good"
    # self-closing <a/> opens nothing
    assert main_content_py(f"<p><a/>{long}</p>") == long


def test_custom_elements_are_not_anchors_or_blocks():
    long = " ".join(f"x{i}" for i in range(30))
    # <a-card> is a custom element, NOT an anchor: the wrapped article
    # must not count as linked (review finding)
    assert main_content_py(f"<a-card><p>{long}</p></a-card>") == long
    r = classify_blocks_py(f"<a-card><p>{long}</p></a-card>")[0]
    assert r["link_density"] == 0.0
    # <p-foo> is not a block boundary: one block, not two
    assert len(classify_blocks_py(f"<p>{long} <p-foo>inline</p-foo> "
                                  f"{long}</p>")) == 1


def test_null_empty_invalid():
    assert main_content_py(None) is None
    assert main_content_py("") == ""
    assert main_content_py(b"\xff\xfe<p>hi</p>") == ""  # replaced, short
    assert classify_blocks_py(None) == []


def test_thresholds_configurable():
    text = "six little words sit right here"
    assert main_content_py(f"<p>{text}</p>") == ""  # 6 < 20, no context
    assert main_content_py(f"<p>{text}</p>", long_words=5) == text
    linky = '<p>aa <a>bb</a></p>'  # ld = 2/5
    assert main_content_py(linky, long_words=1) == ""
    assert main_content_py(linky, long_words=1,
                           max_link_density=0.5) == "aa bb"


def test_spark_parity_and_verdict_frame(spark):
    pages = [PAGE, "<p>" + " ".join(f"y{i}" for i in range(21)) + "</p>",
             "", None]
    df = spark.createDataFrame(
        [(i, p.encode() if p is not None else None)
         for i, p in enumerate(pages)],
        "key long, html binary",
    )
    got = {r["key"]: r["main_text"]
           for r in extract_main_content(df).collect()}
    assert got == {i: main_content_py(p) for i, p in enumerate(pages)}
    # exploded audit frame == the python classifier, row for row
    v = block_verdicts(df, "key").collect()
    spark_rows = sorted(
        (r["key"], r["block_no"], r["tag"], r["label"], r["keep"],
         r["n_words"]) for r in v)
    py_rows = sorted(
        (str(i), r["block_no"], r["tag"], r["label"], r["keep"],
         r["n_words"])
        for i, p in enumerate(pages) if p is not None
        for r in classify_blocks_py(p.encode()))
    assert spark_rows == py_rows


def test_warc_main_content_and_cli(spark, tmp_path, capsys):
    from dqc_spark import cli
    from dqc_spark.warc import warc_bytes, warc_to_pages

    path = str(tmp_path / "crawl.warc")
    (tmp_path / "crawl.warc").write_bytes(warc_bytes(
        [("http://example.com/art", "2026-01-01T00:00:00Z",
          PAGE.encode())]))
    pages = warc_to_pages(spark, path, main_content=True)
    rows = pages.collect()
    assert rows[0]["text"] == EXPECT and rows[0]["lang"] == "en"

    out_p = str(tmp_path / "pages.parquet")
    rc = cli.main(["--db-path", str(tmp_path / "q.db"), "ingest-warc",
                   "--input", path, "--output", out_p, "--main-content"])
    assert rc == 0
    got = spark.read.parquet(out_p).collect()[0]
    assert got["text"] == EXPECT and "Home" not in got["text"]
    with pytest.raises(SystemExit, match="mutually exclusive"):
        cli.main(["--db-path", str(tmp_path / "q.db"), "ingest-warc",
                  "--input", path, "--output", out_p, "--raw",
                  "--main-content"])

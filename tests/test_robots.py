"""robots.txt gate: parser + matcher pinned against the RFC 9309 /
published Google REP examples (hand-written expected verdicts — the
independent spec), then the distributed join + gate."""

import pytest

from dqc_spark.robots import (
    parse_robots_py,
    robots_allowed_py,
    robots_gate,
    robots_rules,
    url_path_py,
)


def allowed(robots_txt, path, ua="*"):
    return robots_allowed_py(path, parse_robots_py(robots_txt, ua))


# --- pattern matching: the published REP match table ---------------------


@pytest.mark.parametrize("path,expect", [
    ("/fish", False), ("/fish.html", False), ("/fish/salmon.html", False),
    ("/fishheads", False), ("/fish.php?id=anything", False),
    ("/Fish.asp", True), ("/catfish", True), ("/?id=fish", True),
])
def test_prefix_rule(path, expect):
    txt = "User-agent: *\nDisallow: /fish"
    assert allowed(txt, path) is expect
    # trailing * is equivalent
    assert allowed("User-agent: *\nDisallow: /fish*", path) is expect


@pytest.mark.parametrize("path,expect", [
    ("/fish/", False), ("/fish/salmon", False), ("/fish/?id=anything", False),
    ("/fish", True), ("/fish.html", True), ("/Fish/Salmon.asp", True),
])
def test_directory_rule(path, expect):
    assert allowed("User-agent: *\nDisallow: /fish/", path) is expect


@pytest.mark.parametrize("path,expect", [
    ("/filename.php", False), ("/folder/filename.php", False),
    ("/filename.php?parameters", True), ("/filename.php5", True),
    ("/windows.PHP", True),
])
def test_wildcard_dollar_rule(path, expect):
    assert allowed("User-agent: *\nDisallow: /*.php$", path) is expect


# --- precedence: longest match, allow wins ties ---------------------------


def test_allow_overrides_broader_disallow():
    txt = "User-agent: *\nAllow: /p\nDisallow: /"
    assert allowed(txt, "/page") is True
    assert allowed(txt, "/other") is False


def test_tie_goes_to_allow():
    txt = "User-agent: *\nAllow: /folder\nDisallow: /folder"
    assert allowed(txt, "/folder/page") is True


def test_longer_disallow_beats_shorter_allow():
    txt = "User-agent: *\nAllow: /page\nDisallow: /*.htm"
    assert allowed(txt, "/page.htm") is False


def test_root_dollar_allow():
    txt = "User-agent: *\nAllow: /$\nDisallow: /"
    assert allowed(txt, "/") is True
    assert allowed(txt, "/page") is False


def test_empty_disallow_allows_everything():
    assert allowed("User-agent: *\nDisallow:", "/anything") is True


def test_no_rules_and_no_robots():
    assert allowed("", "/x") is True
    assert robots_allowed_py("/x", []) is True


# --- group selection -------------------------------------------------------


ROBOTS_GROUPS = """\
# global
User-agent: *
Disallow: /private/

User-agent: examplebot
User-agent: otherbot
Disallow: /bot-trap/

User-agent: examplebot-news
Disallow: /archive/
"""


def test_star_group_for_unknown_ua():
    assert allowed(ROBOTS_GROUPS, "/private/x", ua="randombot") is False
    assert allowed(ROBOTS_GROUPS, "/bot-trap/x", ua="randombot") is True


def test_named_group_excludes_star_rules():
    # a matched named group REPLACES *, it does not union with it
    assert allowed(ROBOTS_GROUPS, "/private/x", ua="examplebot") is True
    assert allowed(ROBOTS_GROUPS, "/bot-trap/x", ua="examplebot") is False


def test_most_specific_ua_token_wins():
    assert allowed(ROBOTS_GROUPS, "/archive/x", ua="examplebot-news") is False
    assert allowed(ROBOTS_GROUPS, "/bot-trap/x", ua="examplebot-news") is True


def test_shared_ua_run_and_merged_groups():
    assert allowed(ROBOTS_GROUPS, "/bot-trap/x", ua="otherbot") is False
    txt = ("User-agent: a\nDisallow: /one/\n\n"
           "User-agent: a\nDisallow: /two/")
    assert allowed(txt, "/one/x", ua="a") is False
    assert allowed(txt, "/two/x", ua="a") is False


def test_comments_case_and_whitespace():
    txt = ("  USER-AGENT :  *   # note\n"
           "  DISALLOW : /secret/  # hidden\n"
           "not-a-field line\n")
    assert allowed(txt, "/secret/x") is False
    assert allowed(txt, "/open/x") is True


# --- url path extraction ---------------------------------------------------


@pytest.mark.parametrize("url,path", [
    ("http://a.com/x/y?q=1", "/x/y?q=1"),
    ("https://a.com", "/"),
    ("https://a.com/", "/"),
    ("http://a.com/p#frag", "/p"),
    ("http://a.com:8080/p", "/p"),
    # query-only URL: empty path normalizes to '/' (RFC 9309/WHATWG),
    # else every '/'-anchored rule silently fails to match
    ("http://a.com?q=1", "/?q=1"),
    (None, None),
    ("no-scheme", None),
])
def test_url_path_py(url, path):
    assert url_path_py(url) == path


# --- Spark -----------------------------------------------------------------


ROBOTS_TABLE = [
    ("a.com", "User-agent: *\nDisallow: /private/\nAllow: /private/ok"),
    ("b.com", "User-agent: dqcbot\nDisallow: /\n\nUser-agent: *\nDisallow:"),
    ("c.com", None),
    ("d.com", "User-agent: *\nDisallow: /"),
]

PAGES = [
    ("http://a.com/public/1", True),
    ("http://a.com/private/1", False),
    ("http://a.com/private/ok/2", True),
    ("http://b.com/anything", True),     # '*' group allows all
    ("http://c.com/x", True),            # NULL robots text
    ("http://norobots.com/x", True),     # no robots row at all
    ("http://d.com?q=1", False),         # query-only URL, disallow-all
]


def test_robots_gate_spark(spark):
    pages = spark.createDataFrame(
        [(u,) for u, _ in PAGES], "url string")
    robots = spark.createDataFrame(
        ROBOTS_TABLE, "host string, robots_txt string")
    kept = {r.url for r in robots_gate(pages, robots).collect()}
    assert kept == {u for u, ok in PAGES if ok}
    # columns restored exactly
    assert robots_gate(pages, robots).columns == ["url"]


def test_robots_gate_ua_specific(spark):
    pages = spark.createDataFrame(
        [("http://b.com/anything",)], "url string")
    robots = spark.createDataFrame(
        ROBOTS_TABLE, "host string, robots_txt string")
    assert robots_gate(pages, robots, user_agent="dqcbot").count() == 0
    assert robots_gate(pages, robots, user_agent="other").count() == 1


def test_robots_gate_flag_col_matches_python(spark):
    pages = spark.createDataFrame(
        [(u,) for u, _ in PAGES], "url string")
    robots = spark.createDataFrame(
        ROBOTS_TABLE, "host string, robots_txt string")
    flagged = robots_gate(pages, robots, flag_col="robots_ok")
    got = {r.url: r.robots_ok for r in flagged.collect()}
    # python-twin differential
    from dqc_spark.urlops import domain_of_py

    by_host = {h: parse_robots_py(t) for h, t in ROBOTS_TABLE}
    for url, _ in PAGES:
        host = domain_of_py(url)
        want = robots_allowed_py(url_path_py(url), by_host.get(host, []))
        assert got[url] == want, url


def test_robots_gate_caller_column_collision(spark):
    """pages may legitimately carry 'allows'/'patterns' columns — the
    gate's internal rule columns join under __-prefixed names so the
    caller's survive untouched."""
    pages = spark.createDataFrame(
        [(u, "keep-me", "p") for u, _ in PAGES],
        "url string, allows string, patterns string")
    robots = spark.createDataFrame(
        ROBOTS_TABLE, "host string, robots_txt string")
    out = robots_gate(pages, robots)
    assert out.columns == ["url", "allows", "patterns"]
    assert {r.url for r in out.collect()} == {u for u, ok in PAGES if ok}
    assert all(r.allows == "keep-me" for r in out.collect())


def test_robots_rules_parse_once_shape(spark):
    robots = spark.createDataFrame(
        ROBOTS_TABLE, "host string, robots_txt string")
    rows = {r.host: r for r in robots_rules(robots).collect()}
    assert rows["a.com"].patterns == ["/private/", "/private/ok"]
    assert rows["a.com"].allows == [False, True]
    assert rows["c.com"].patterns == []


# --- curate integration + CLI ----------------------------------------------


def test_curate_robots_stage(spark):
    from dqc_spark.pagesgen import make_page
    from dqc_spark.pipeline import curate

    rows = [(f"http://site.test/{'blocked' if i % 3 == 0 else 'open'}/{i}",
             make_page(i)["text"]) for i in range(24)]
    pages = spark.createDataFrame(rows, "url string, text string")
    robots = spark.createDataFrame(
        [("site.test", "User-agent: *\nDisallow: /blocked/")],
        "host string, robots_txt string")
    metrics = {}
    out = curate(pages, near_dup_threshold=None, robots=robots,
                 stage_metrics=metrics)
    urls = [r.url for r in out.select("url").collect()]
    assert urls and all("/open/" in u for u in urls)
    assert metrics["robots"] == 16  # 24 minus the 8 /blocked/ pages


def test_cli_curate_robots(capsys, spark, tmp_path):
    from dqc_spark import cli
    from dqc_spark.pagesgen import make_page

    src = str(tmp_path / "pages.parquet")
    spark.createDataFrame(
        [(f"http://h.test/{'priv' if i % 2 else 'pub'}/{i}",
          make_page(i)["text"]) for i in range(20)],
        "url string, text string").write.parquet(src)
    rb = str(tmp_path / "robots.parquet")
    spark.createDataFrame(
        [("h.test", "User-agent: dqcbot\nDisallow: /priv/")],
        "host string, robots_txt string").write.parquet(rb)
    out_p = str(tmp_path / "out.parquet")
    rc = cli.main(["--db-path", str(tmp_path / "q.db"), "curate",
                   "--input", src, "--output", out_p,
                   "--robots", rb, "--robots-ua", "dqcbot",
                   "--near-dup-threshold", "-1"])
    assert rc == 0
    kept = [r.url for r in spark.read.parquet(out_p).collect()]
    assert kept and all("/pub/" in u for u in kept)


def test_url_path_col_matches_python_twin(spark):
    from dqc_spark.robots import url_path_col

    cases = ["http://a.com/x/y?q=1", "https://a.com", "https://a.com/",
             "http://a.com/p#frag", "http://a.com:8080/p", None,
             "no-scheme", "not a url at all", ""]
    df = spark.createDataFrame([(c,) for c in cases], "url string")
    got = [r.p for r in df.select(url_path_col("url").alias("p")).collect()]
    assert got == [url_path_py(c) for c in cases]

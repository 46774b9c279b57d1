"""URL canonicalization / domain stats: differential vs a pure-python
reference canonicalizer, idempotence, boundary cases (param-name
prefixes, consecutive tracking params), and domain_stats share math."""

import re

import pytest
from pyspark.sql import functions as F

from dqc_spark.urlops import canonical_url, domain_of, domain_stats

_TRACK_RE = re.compile(r"^(utm_[A-Za-z0-9_]+|gclid|fbclid|ref)$")


def canonical_url_py(url: str) -> str:
    """Independent python model of the documented canonical form."""
    u = url.split("#", 1)[0]
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", u)
    if not m:
        return u  # scheme-less input passes through (minus fragment)
    scheme = m.group(1).lower()
    rest = u[m.end():]
    sep = re.search(r"[/?]", rest)
    authority = rest[: sep.start()] if sep else rest
    tail = rest[sep.start():] if sep else ""
    authority = authority.lower()
    if scheme == "http" and authority.endswith(":80"):
        authority = authority[: -3]
    elif scheme == "https" and authority.endswith(":443"):
        authority = authority[: -4]
    # tracking-param removal on the query part
    if "?" in tail:
        path, q = tail.split("?", 1)
        parts = [p for p in q.split("&")
                 if not _TRACK_RE.match(p.split("=", 1)[0])]
        tail = path + ("?" + "&".join(parts) if parts else "")
    # trailing slash, only when no query survives: bare root '/'
    # drops entirely, a non-root trailing slash is stripped
    if "?" not in tail:
        if tail == "/":
            tail = ""
        elif len(tail) >= 3 and tail[0] == "/" and tail[-1] == "/":
            tail = tail[:-1]
    return scheme + "://" + authority + tail


URL_ZOO = [
    "HTTP://WWW.Example.COM:80/Path/Page?id=3&utm_source=x#frag",
    "https://example.org:443/",
    "https://example.org/a/b/",
    "https://example.org/a/b",
    "http://example.org",
    "http://example.org/?utm_a=1&utm_b=2&utm_c=3",
    "http://example.org/?utm_a=1&utm_b=2&id=9",
    "http://example.org/?id=9&utm_a=1&gclid=zz",
    "http://example.org/?refresh=1&id=2",          # 'ref' prefix trap
    "http://example.org/?ref=home&fbclid=abc",
    "http://example.org/?ref",                      # valueless tracking
    "http://example.org/search?q=a+b&page=2",
    "HtTpS://MiXeD.Case.ORG/KeepPathCase/X",
    "ftp://Files.Example.com:21/pub/",
    "example.org/no/scheme?utm_source=x#frag",      # scheme-less
    "http://example.org:8080/alt-port/",
    "http://example.org/trail/?utm_source=x",
    "http://example.org/#onlyfrag",
    "http://a.com/search&ref=nav?q=1",      # '&' in PATH (RFC sub-delim)
    "http://a.com/p?a=x?ref=1&b=2",         # '?ref' inside a VALUE
    "http://a.com/p?a=/",                   # query ends with '/'
    "http://a.com/p/?a=1",                  # path slash kept: query survives
    "http://a.com/&utm_source=feed/x",      # '&utm_' in PATH
]


@pytest.fixture(scope="module")
def url_df(spark):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(URL_ZOO)], "i long, url string"
    )


def test_differential_vs_python_model(spark, url_df):
    got = {r["i"]: r["canonical_url"]
           for r in url_df.select("i", canonical_url("url")).collect()}
    for i, u in enumerate(URL_ZOO):
        assert got[i] == canonical_url_py(u), (u, got[i], canonical_url_py(u))


def test_idempotent(spark, url_df):
    once = url_df.select("i", canonical_url("url"))
    twice = once.select("i", canonical_url("canonical_url").alias("c2"),
                        "canonical_url")
    for r in twice.collect():
        assert r["c2"] == r["canonical_url"]
    for u in URL_ZOO:  # python model too
        assert canonical_url_py(canonical_url_py(u)) == canonical_url_py(u)


def test_specific_forms(spark):
    cases = {
        # default port + host case + fragment + tracking all at once
        "HTTP://WWW.Example.COM:80/Path?id=3&utm_source=x#f":
            "http://www.example.com/Path?id=3",
        # three consecutive tracking params collapse to no query
        "http://a.com/p?utm_a=1&utm_b=2&utm_c=3": "http://a.com/p",
        # 'refresh' is NOT 'ref'
        "http://a.com/p?refresh=1": "http://a.com/p?refresh=1",
        # bare root slash drops (http://x.com/ == http://x.com), non-
        # root trailing slash stripped
        "https://a.com/": "https://a.com",
        "https://a.com": "https://a.com",
        "https://a.com/x/": "https://a.com/x",
        # non-default port survives
        "http://a.com:8080/x": "http://a.com:8080/x",
        # https keeps :80 (not its default)
        "https://a.com:80/x": "https://a.com:80/x",
    }
    df = spark.createDataFrame(list(cases.items()), "url string, want string")
    for r in df.select(canonical_url("url"), "want").collect():
        assert r["canonical_url"] == r["want"]


def test_domain_of(spark):
    rows = [("HTTP://WWW.Ex.COM:80/p", "www.ex.com"),
            ("https://a.b.c/x?y#z", "a.b.c"),
            # userinfo is skipped, not reported as (part of) the host —
            # 'http://spam@x.com/' must not evade an x.com blocklist
            ("http://user@X.com/p", "x.com"),
            ("http://u:p@x.com/p", "x.com"),
            # MULTIPLE '@'s: urlsplit/WHATWG resolve the host after the
            # LAST '@' of the authority — a non-greedy skip would
            # report 'b' and evade an x.com blocklist entry
            ("http://a@b@x.com/p", "x.com"),
            # '@' in the path is NOT userinfo
            ("http://x.com/u@name", "x.com"),
            ("no-scheme/path", ""),
            (None, None)]
    df = spark.createDataFrame(rows, "url string, want string")
    for r in df.select(domain_of("url"), "want").collect():
        assert r["domain"] == r["want"]


def test_domain_stats(spark):
    rows = [(f"http://{d}/p{i}", "x" * n) for d, i, n in
            [("a.com", 1, 10), ("a.com", 2, 20), ("b.com", 1, 5)]]
    df = spark.createDataFrame(rows, "url string, text string")
    got = {r["domain"]: r for r in domain_stats(df).collect()}
    assert got["a.com"]["n_docs"] == 2 and got["a.com"]["total_chars"] == 30
    assert got["b.com"]["n_docs"] == 1 and got["b.com"]["total_chars"] == 5
    assert got["a.com"]["share"] == pytest.approx(2 / 3)
    assert sum(r["share"] for r in got.values()) == pytest.approx(1.0)


def test_domain_stats_no_text(spark):
    df = spark.createDataFrame([("http://a.com/1",)], "url string")
    row = domain_stats(df, text_col=None).collect()[0]
    assert row["n_docs"] == 1 and row["total_chars"] is None


# ---------------------------------------------------------------------------
# domain_filter
# ---------------------------------------------------------------------------

BLOCK_ROWS = [
    (1, "http://ads.spam.com/x"),        # subdomain of blocked spam.com
    (2, "http://spam.com/y"),            # exact blocked
    (3, "http://notspam.com/z"),         # NOT a suffix match ('.'-bounded)
    (4, "https://good.org/a"),
    (5, "https://deep.a.b.tracker.net/b"),  # deep subdomain of tracker.net
    (6, None),                           # NULL url
    (7, "no-scheme-url"),                # unparseable -> domain ''
]
BLOCKED = ["spam.com", "tracker.net"]


@pytest.fixture(scope="module")
def block_df(spark):
    return spark.createDataFrame(BLOCK_ROWS, "i long, url string")


def test_domain_filter_block_const(spark, block_df):
    from dqc_spark.urlops import domain_filter

    kept = sorted(r["i"] for r in domain_filter(block_df, BLOCKED).collect())
    assert kept == [3, 4, 6, 7]  # NULL/unparseable kept in block mode


def test_domain_filter_allow_const(spark, block_df):
    from dqc_spark.urlops import domain_filter

    kept = sorted(
        r["i"]
        for r in domain_filter(block_df, BLOCKED, mode="allow").collect()
    )
    assert kept == [1, 2, 5]  # NULL/unparseable dropped in allow mode


def test_domain_filter_dataframe_path_matches_const(spark, block_df):
    from dqc_spark.urlops import domain_filter

    bl = spark.createDataFrame([(d,) for d in BLOCKED], "domain string")
    for mode in ("block", "allow"):
        a = sorted(r["i"] for r in
                   domain_filter(block_df, BLOCKED, mode=mode).collect())
        b = sorted(r["i"] for r in
                   domain_filter(block_df, bl, mode=mode).collect())
        # identical INCLUDING the NULL-url row: a NULL key matches
        # nothing in an equi-join, so left_anti keeps it and left_semi
        # drops it — the same semantics the const path pins via coalesce
        assert a == b, mode


def test_domain_filter_case_insensitive(spark):
    from dqc_spark.urlops import domain_filter

    df = spark.createDataFrame(
        [(1, "http://ADS.Spam.COM/x")], "i long, url string"
    )
    assert domain_filter(df, ["SPAM.com"]).count() == 0


def test_domain_filter_bad_mode(spark, block_df):
    from dqc_spark.urlops import domain_filter

    with pytest.raises(ValueError):
        domain_filter(block_df, BLOCKED, mode="deny")


def test_url_dedup_collapses_spellings(spark):
    from dqc_spark.urlops import url_dedup

    rows = [
        (1, "HTTP://WWW.EXAMPLE.COM:80/a?utm_source=x"),
        (2, "http://www.example.com/a#frag"),
        (3, "http://www.example.com/a"),
        (4, "http://www.example.com/b"),        # different page survives
        (5, "http://www.example.com/a/"),
    ]
    df = spark.createDataFrame(rows, "i long, url string")
    kept = sorted(r["i"] for r in url_dedup(df, key_cols=["i"]).collect())
    assert kept == [1, 4]  # min key per canonical group
    # default key: the url string itself elects the winner
    kept_urls = sorted(
        r["url"] for r in url_dedup(df).select("url").collect())
    assert kept_urls == [
        "HTTP://WWW.EXAMPLE.COM:80/a?utm_source=x",
        "http://www.example.com/b",
    ]
    # byte-identical urls (the same page re-crawled) collapse to ONE
    # row even under the default key — the winner key matches both
    # tied rows, so without the post-join dedup both would survive
    dup = spark.createDataFrame(
        [(1, "http://x.com/a"), (2, "http://x.com/a"),
         (3, "http://x.com/b")], "i long, url string")
    assert url_dedup(dup).count() == 2
    assert url_dedup(dup, key_cols=["i"]).count() == 2
    # collapse_ties=False skips the full-row dropDuplicates exchange
    # (text never moves) — byte-identical ties then pass through
    assert url_dedup(dup, collapse_ties=False).count() == 3
    # ...and is a no-op difference when keys are unique per row (the
    # winner key matches exactly one row, so there are no ties)
    assert url_dedup(dup, key_cols=["i"], collapse_ties=False).count() == 2


def test_curate_blocked_domains(spark):
    from dqc_spark.pagesgen import generate_pages
    from dqc_spark.pipeline import curate

    pages = generate_pages(spark, 200, n_partitions=4)
    blocked = ["site0.example.com", "site1.example.com"]
    cur = curate(pages, near_dup_threshold=None, blocked_domains=blocked)
    doms = {r["domain"] for r in cur.select("domain").distinct().collect()}
    assert doms and not doms.intersection(blocked)
    # and the unblocked run does keep those domains (non-vacuous)
    base = curate(pages, near_dup_threshold=None)
    doms_base = {r["domain"]
                 for r in base.select("domain").distinct().collect()}
    assert doms_base.intersection(blocked)


def test_domain_of_py_matches_column(spark):
    """domain_of / domain_of_py dual-implementation pin."""
    from dqc_spark.urlops import domain_of, domain_of_py

    urls = ["http://A.com/x", "https://b.org:8080/p?q#f", "ftp://c",
            "nonsense", None, "http://host/path", "http://", "",
            "http://u@h.com/x", "http://a@b@h.com/x", "http://h.com/u@x"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r[0] for r in df.select(domain_of("url")).collect()]
    assert got == [domain_of_py(u) for u in urls]


def test_domain_keep_rate_counts(spark):
    from dqc_spark.urlops import domain_keep_rate

    rows = [
        ("http://spam.com/1", True), ("http://spam.com/2", False),
        ("http://spam.com/3", False), ("http://spam.com/4", None),
        ("http://good.org/1", True), ("http://good.org/2", True),
    ]
    df = spark.createDataFrame(rows, "url string, keep boolean")
    got = {r.domain: r for r in
           domain_keep_rate(df, "url", "keep").collect()}
    assert got["spam.com"].n_docs == 4
    # NULL keep counts as drop
    assert got["spam.com"].n_keep == 1
    assert got["spam.com"].keep_rate == 0.25
    assert got["good.org"].keep_rate == 1.0


def test_induce_blocklist_feeds_domain_filter(spark):
    """End-to-end feedback loop: induce the blocklist from a labeled
    run, feed it to domain_filter, the spam host's pages drop and the
    small-sample host survives min_docs."""
    from dqc_spark.urlops import domain_filter, induce_domain_blocklist

    rows = (
        [(f"http://farm.net/{i}", i % 10 == 0) for i in range(20)]  # 10%
        + [(f"http://ok.com/{i}", True) for i in range(20)]
        + [("http://tiny.io/1", False), ("http://tiny.io/2", False)]
    )
    df = spark.createDataFrame(rows, "url string, keep boolean")
    bl = induce_domain_blocklist(df, max_keep_rate=0.25, min_docs=5)
    assert {r.domain for r in bl.collect()} == {"farm.net"}
    kept = domain_filter(df, bl, url_col="url", mode="block")
    doms = {r[0] for r in
            kept.selectExpr("url").collect()}
    assert all("farm.net" not in u for u in doms)
    assert any("tiny.io" in u for u in doms)  # below min_docs -> kept


def test_curate_domain_strips_userinfo(spark):
    """The quota/mix `domain` column uses the shared domain_of host
    notion: userinfo-salted re-crawl urls (http://u:p@host/...) land in
    the SAME stratum as the plain spelling instead of fragmenting the
    hot-domain cap (the r4 domain_of evasion fix, applied to curate)."""
    from pyspark.sql import functions as F

    from dqc_spark.pagesgen import generate_pages
    from dqc_spark.pipeline import curate

    pages = generate_pages(spark, 120, n_partitions=2)
    salted = pages.withColumn(
        "url", F.regexp_replace("url", "^http://", "http://u:p@"))
    doms = {r["domain"] for r in curate(salted, near_dup_threshold=None)
            .select("domain").distinct().collect()}
    assert doms and all("@" not in d for d in doms)
    base = {r["domain"] for r in curate(pages, near_dup_threshold=None)
            .select("domain").distinct().collect()}
    assert doms <= base

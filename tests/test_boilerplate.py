"""Per-domain boilerplate line removal — semantics, edges, invariance."""

import pytest
from pyspark.sql import functions as F

from dqc_spark.boilerplate import boilerplate_lines, remove_boilerplate

NAV_A = "NAV MENU SITE-A HOME ABOUT CONTACT"
NAV_B = "NAV MENU SITE-B HOME ABOUT CONTACT"

# (key, domain, text): site-a's nav banner is on 4/5 of its pages; the
# SAME banner string also appears once on site-b (rare there -> kept);
# site-c has the min_pages=4 floor's worth of pages minus one.
DOCS = [
    (0, "site-a", NAV_A + "\ncontent zero alpha beta"),
    (1, "site-a", NAV_A + "\ncontent one gamma delta"),
    (2, "site-a", NAV_A + "\ncontent two epsilon"),
    (3, "site-a", "content three zeta eta\n" + NAV_A),
    (4, "site-a", "content four theta iota"),  # no banner
    (5, "site-b", NAV_A + "\nsite-b page with site-a's banner once"),
    (6, "site-b", NAV_B + "\nother content kappa"),
    (7, "site-b", NAV_B + "\nother content lambda"),
    (8, "site-b", NAV_B + "\nother content mu"),
    (9, "site-b", "no banner here nu"),
    (10, "site-c", "tiny site repeated line\nxi"),
    (11, "site-c", "tiny site repeated line\nomicron"),
    (12, "site-c", "tiny site repeated line\npi"),
    (13, None, NAV_A + "\nnull-domain page keeps everything"),
    (14, "site-a", "a\nb\n" + NAV_A),  # short lines exempt
]


def _py_model(max_frac=0.5, min_pages=4, min_len=4):
    """Independent reference implementation."""
    from collections import defaultdict

    group_pages = defaultdict(int)
    for _, g, _t in DOCS:
        if g is not None:
            group_pages[g] += 1
    line_pages = defaultdict(set)
    for k, g, t in DOCS:
        if g is None:
            continue
        for ln in (t or "").split("\n"):
            if len(ln) >= min_len:
                line_pages[(g, ln)].add(k)
    boiler = {
        (g, ln)
        for (g, ln), pages in line_pages.items()
        if group_pages[g] >= min_pages
        and len(pages) * 1_000_000 >= round(max_frac * 1e6) * group_pages[g]
    }
    out = {}
    for k, g, t in DOCS:
        lines = (t or "").split("\n")
        kept = [
            ln
            for ln in lines
            if len(ln) < min_len or g is None or (g, ln) not in boiler
        ]
        out[k] = (g, "\n".join(kept), len(lines), len(kept))
    return out, boiler


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "key long, domain string, text string")


def test_matches_python_model(spark, docs_df):
    expect, _ = _py_model()
    got = {
        r["key"]: (r["domain"], r["text_clean"], r["n_lines"],
                   r["n_lines_kept"])
        for r in remove_boilerplate(docs_df, "key", "domain").collect()
    }
    assert got == expect


def test_template_removed_everywhere_but_rare_elsewhere_kept(
    spark, docs_df
):
    rows = {
        r["key"]: r["text_clean"]
        for r in remove_boilerplate(docs_df, "key", "domain").collect()
    }
    # removed from every site-a page that had it
    for k in (0, 1, 2, 3, 14):
        assert NAV_A not in rows[k]
    # content lines intact
    assert "content zero alpha beta" in rows[0]
    # the SAME string on site-b is rare there -> kept
    assert NAV_A in rows[5]
    # site-b's own banner (4/5 pages) removed
    for k in (6, 7, 8):
        assert NAV_B not in rows[k]


def test_min_pages_spares_small_groups(spark, docs_df):
    rows = {
        r["key"]: r["text_clean"]
        for r in remove_boilerplate(docs_df, "key", "domain").collect()
    }
    # site-c has 3 pages < min_pages=4: its 100%-frequency line survives
    for k in (10, 11, 12):
        assert "tiny site repeated line" in rows[k]
    # and is removed once the floor admits the group
    rows3 = {
        r["key"]: r["text_clean"]
        for r in remove_boilerplate(
            docs_df, "key", "domain", min_pages=3
        ).collect()
    }
    for k in (10, 11, 12):
        assert "tiny site repeated line" not in rows3[k]


def test_null_group_and_short_lines_exempt(spark, docs_df):
    rows = {
        r["key"]: r
        for r in remove_boilerplate(docs_df, "key", "domain").collect()
    }
    assert NAV_A in rows[13]["text_clean"]  # NULL domain: no verdicts
    assert rows[13]["domain"] is None
    assert rows[14]["text_clean"].startswith("a\nb")  # short lines kept


def test_verdict_frame_evidence(spark, docs_df):
    v = {
        (r["domain"], r["line_md5"]): (
            r["n_pages_with_line"], r["group_pages"])
        for r in boilerplate_lines(docs_df, "key", "domain").collect()
    }
    import hashlib

    h = hashlib.md5(NAV_A.encode()).hexdigest()
    assert v[("site-a", h)] == (5, 6)  # 5 of 6 site-a pages
    assert ("site-b", h) not in v  # rare on site-b


def test_partition_invariance(spark, docs_df):
    base = sorted(
        map(tuple, remove_boilerplate(docs_df, "key", "domain").collect())
    )
    for n in (1, 7):
        got = sorted(
            map(
                tuple,
                remove_boilerplate(
                    docs_df.repartition(n), "key", "domain"
                ).collect(),
            )
        )
        assert got == base


BANNER = "COOKIE CONSENT BANNER ACCEPT ALL TRACKING CHOICES"


def _banner_pages(spark, n_big=16, n_tiny=3):
    """big.test carries BANNER on every page (stripped); tiny.test has
    the same banner on 100% of its pages but sits under the min_pages=4
    floor (kept)."""
    from dqc_spark.pagesgen import make_page

    rows = [(f"http://big.test/{i}", BANNER + "\n" + make_page(i)["text"])
            for i in range(n_big)]
    rows += [(f"http://tiny.test/{i}",
              BANNER + "\n" + make_page(100 + i)["text"])
             for i in range(n_tiny)]
    return spark.createDataFrame(rows, "url string, text string")


def test_curate_boilerplate_stage(spark):
    from dqc_spark.pipeline import curate

    pages = _banner_pages(spark)
    metrics = {}
    out = curate(pages, near_dup_threshold=None,
                 boilerplate_max_frac=0.5, stage_metrics=metrics)
    got = {r["url"]: r["scrubbed_text"] for r in out.collect()}
    big = {u: t for u, t in got.items() if u.startswith("http://big.test")}
    tiny = {u: t for u, t in got.items() if u.startswith("http://tiny.test")}
    # the domain template is gone from every big.test survivor, the
    # content it framed is not
    assert big and all(BANNER not in t for t in big.values())
    assert all(len(t.strip()) > 0 for t in big.values())
    # tiny.test is under the page floor: its 100%-frequency banner stays
    assert tiny and all(BANNER in t for t in tiny.values())
    # the stage rewrites text, it never drops rows
    assert metrics["boilerplate_strip"] == metrics["input"]
    # composition guard: a min_pages override without the stage is an error
    with pytest.raises(ValueError, match="boilerplate_min_pages"):
        curate(pages, near_dup_threshold=None, boilerplate_min_pages=2)


def test_curate_hostless_keys_are_exempt(spark):
    """domain_of returns '' for unparseable keys; the stage must route
    those to the NULL-group exemption instead of pooling every host-less
    page into one fake '' domain (review finding)."""
    from dqc_spark.pagesgen import make_page
    from dqc_spark.pipeline import curate

    rows = [(f"not a url {i}", BANNER + "\n" + make_page(i)["text"])
            for i in range(12)]
    pages = spark.createDataFrame(rows, "url string, text string")
    out = curate(pages, near_dup_threshold=None, boilerplate_max_frac=0.5)
    got = [r["scrubbed_text"] for r in out.collect()]
    assert got and all(BANNER in t for t in got)


def test_cli_curate_boilerplate(spark, tmp_path):
    from dqc_spark import cli

    src = str(tmp_path / "pages.parquet")
    _banner_pages(spark).write.parquet(src)
    out_p = str(tmp_path / "out.parquet")
    rc = cli.main(["--db-path", str(tmp_path / "q.db"), "curate",
                   "--input", src, "--output", out_p,
                   "--boilerplate-frac", "0.5",
                   "--near-dup-threshold", "-1"])
    assert rc == 0
    kept = {r.url: r.scrubbed_text
            for r in spark.read.parquet(out_p).collect()}
    assert kept and all(
        BANNER not in t
        for u, t in kept.items() if u.startswith("http://big.test"))


def test_validation(spark, docs_df):
    with pytest.raises(ValueError, match="max_frac"):
        remove_boilerplate(docs_df, "key", "domain", max_frac=0.0)
    with pytest.raises(ValueError, match="min_pages"):
        remove_boilerplate(docs_df, "key", "domain", min_pages=0)
    with pytest.raises(ValueError, match="regex"):
        remove_boilerplate(docs_df, "key", "domain", sep=r"\n{2,}")

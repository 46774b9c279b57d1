"""CDXJ index: parse, selective pruning, fetch planning."""

import datetime

import pytest

from dqc_spark.cdx import cdxj_line, fetch_plan, read_cdxj, select_captures


@pytest.fixture()
def index_path(tmp_path):
    lines = []
    for i in range(12):
        lines.append(cdxj_line(
            f"test,site)/p{i}", f"2025010{1 + i % 9}000000",
            {
                "url": f"http://site.test/p{i}",
                "mime": "text/html" if i % 3 else "image/png",
                "status": "200" if i % 4 else "404",
                "digest": f"D{i % 5}",       # planted digest collisions
                "length": str(100 + i),
                "offset": str(1000 * i),
                "filename": f"crawl-{i % 2}.warc.gz",
                "languages": "eng" if i % 2 else "eng,deu",
            }))
    lines.append("truncated garbage line")
    lines.append("urlkey 20250101000000 {not json")
    p = tmp_path / "index.cdxj"
    p.write_text("\n".join(lines))
    return str(p)


def test_read_cdxj(spark, index_path):
    idx = read_cdxj(spark, index_path)
    rows = {r.urlkey: r for r in idx.collect()}
    assert len(rows) == 12  # malformed lines dropped
    r1 = rows["test,site)/p1"]
    assert r1.url == "http://site.test/p1"
    assert r1.capture_ts == datetime.datetime(2025, 1, 2)
    assert r1.length == 101 and r1.offset == 1000
    assert r1.status == "200" and r1.mime == "text/html"
    assert rows["test,site)/p3"].mime == "image/png"


def test_read_cdxj_is_pure_catalyst(spark, index_path):
    plan = read_cdxj(spark, index_path) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # parse is a pure map


def test_select_captures_filters(spark, index_path):
    idx = read_cdxj(spark, index_path)
    sel = select_captures(idx, dedup_digest=False)
    got = {r.urlkey for r in sel.collect()}
    # 200 AND text/html: i % 4 != 0 and i % 3 != 0
    want = {f"test,site)/p{i}" for i in range(12) if i % 4 and i % 3}
    assert got == want


def test_select_captures_language(spark, index_path):
    idx = read_cdxj(spark, index_path)
    sel = select_captures(idx, statuses=(), mimes=None,
                          languages=("deu",), dedup_digest=False)
    assert {r.urlkey for r in sel.collect()} == {
        f"test,site)/p{i}" for i in range(12) if i % 2 == 0}


def test_select_captures_digest_dedup(spark, index_path):
    idx = read_cdxj(spark, index_path)
    sel = select_captures(idx, statuses=(), mimes=None)
    rows = {r.digest: r for r in sel.collect()}
    assert len(rows) == 5  # one winner per planted digest
    # newest capture wins (max struct leads with capture_ts):
    # D0 captures are i in {0, 5, 10} with days {1, 6, 2} -> p5
    assert rows["D0"].urlkey == "test,site)/p5"


def test_fetch_plan_groups_and_sorts(spark, index_path):
    idx = read_cdxj(spark, index_path)
    plan = {r.filename: r for r in
            fetch_plan(select_captures(idx, dedup_digest=False)).collect()}
    assert set(plan) == {"crawl-0.warc.gz", "crawl-1.warc.gz"}
    for fname, row in plan.items():
        offs = [x.offset for x in row.ranges]
        assert offs == sorted(offs)
        assert row.n_ranges == len(offs)
        assert row.total_bytes == sum(x.length for x in row.ranges)


def test_select_captures_null_digest_not_collapsed(spark, tmp_path):
    """Captures MISSING a digest must each survive dedup_digest —
    grouping raw NULLs would elect one winner among all of them."""
    lines = []
    for i in range(4):
        payload = {
            "url": f"http://x.test/p{i}", "mime": "text/html",
            "status": "200", "length": "10", "offset": str(i * 100),
            "filename": "f.warc.gz", "languages": "eng",
        }
        if i == 0:
            payload["digest"] = "DD"  # one real digest
        lines.append(cdxj_line(f"test,x)/p{i}", "20250101000000", payload))
    # digest AND filename both missing (a sentinel COMPONENT is NULL):
    # F.concat null-propagates, so an unguarded sentinel would fold to
    # NULL for both rows and silently drop one — each must survive.
    for i in (4, 5):
        lines.append(cdxj_line(
            f"test,x)/q{i}", "20250101000000",
            {"url": f"http://x.test/q{i}", "mime": "text/html",
             "status": "200", "length": "10", "offset": str(i * 100)}))
    p = tmp_path / "nd.cdxj"
    p.write_text("\n".join(lines))
    out = select_captures(read_cdxj(spark, str(p))).collect()
    assert len(out) == 6
    assert sorted(r.digest is None for r in out) == \
        [False] + [True] * 5

"""Link graph: href extraction pins, domain edges, and PageRank vs an
independent pure-python power iteration."""

import pytest
from pyspark.sql import functions as F

from dqc_spark.linkgraph import (domain_edges, extract_links_py, pagerank)


# ---------------------------------------------------------------------------
# extraction
# ---------------------------------------------------------------------------

def test_extract_links_py():
    html = (b'<a href="http://a.com/x">x</a>'
            b"<a href='/rel'>rel</a>"
            b'<A HREF=http://b.com/unquoted>u</A>'
            b'<a class="k" href="http://a.com/x">dup</a>'
            b'<a href="#frag">skip</a>'
            b'<a href="javascript:void(0)">skip</a>'
            b'<a href="mailto:x@y.z">skip</a>'
            b'<a href="ftp://f.com/f">skip</a>'
            b'<a href="?q=1&amp;r=2">entity</a>')
    got = extract_links_py(html, "https://base.org/dir/page")
    assert got == [
        "http://a.com/x",
        "https://base.org/rel",
        "http://b.com/unquoted",
        "https://base.org/dir/page?q=1&r=2",
    ]
    assert extract_links_py(None, "http://x.com") == []
    assert extract_links_py(b"no links here", "http://x.com") == []


def test_domain_edges(spark):
    rows = [
        ("http://a.com/1",
         b'<a href="http://b.com/x">.</a><a href="http://b.com/y">.</a>'
         b'<a href="http://a.com/self">.</a>'),
        ("http://a.com/2", b'<a href="http://c.com/z">.</a>'),
        ("http://b.com/1", b'<a href="/rel">.</a>'),  # self after resolve
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {(r["src_domain"], r["dst_domain"]): r["weight"]
           for r in domain_edges(df).collect()}
    assert got == {("a.com", "b.com"): 2, ("a.com", "c.com"): 1}


# ---------------------------------------------------------------------------
# pagerank
# ---------------------------------------------------------------------------

def pagerank_py(edges, damping=0.85, n_iter=10):
    """Independent model: dense power iteration with dangling
    redistribution, same definition as the docstring."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = [0.0] * n
    for s, _, w in edges:
        out[idx[s]] += w
    ranks = [1.0 / n] * n
    for _ in range(n_iter):
        dangling = sum(r for i, r in enumerate(ranks) if out[i] == 0.0)
        new = [(1 - damping) / n + damping * dangling / n] * n
        for s, d, w in edges:
            new[idx[d]] += damping * ranks[idx[s]] * (w / out[idx[s]])
        ranks = new
    return dict(zip(nodes, ranks))


EDGES = [
    ("a", "b", 2.0), ("a", "c", 1.0), ("b", "c", 1.0),
    ("c", "a", 1.0), ("d", "c", 3.0),  # e: dangling sink target
    ("c", "e", 1.0),
]


@pytest.mark.parametrize("thresh", [50_000, 0],
                         ids=["driver-fastpath", "distributed"])
def test_pagerank_matches_python_model(spark, thresh):
    df = spark.createDataFrame(
        EDGES, "src_domain string, dst_domain string, weight double")
    got = {r["node"]: r["rank"]
           for r in pagerank(df, n_iter=12,
                             driver_threshold=thresh).collect()}
    want = pagerank_py(EDGES, n_iter=12)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9), k
    assert sum(got.values()) == pytest.approx(1.0)


def test_pagerank_uniform_on_cycle(spark):
    cyc = [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)]
    df = spark.createDataFrame(
        cyc, "src_domain string, dst_domain string, weight double")
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=8).collect()}
    for v in got.values():
        assert v == pytest.approx(1 / 3)


def test_pagerank_empty(spark):
    df = spark.createDataFrame(
        [], "src_domain string, dst_domain string, weight double")
    assert pagerank(df).count() == 0


def test_pagerank_partition_invariance(spark):
    # distributed path: the fast path is trivially layout-independent
    a = spark.createDataFrame(
        EDGES, "src_domain string, dst_domain string, weight double")
    ga = {r["node"]: r["rank"]
          for r in pagerank(a.repartition(1), n_iter=7,
                            driver_threshold=0).collect()}
    gb = {r["node"]: r["rank"]
          for r in pagerank(a.repartition(9), n_iter=7,
                            driver_threshold=0).collect()}
    for k in ga:
        assert ga[k] == pytest.approx(gb[k], rel=1e-12), k


def test_pagerank_fastpath_equals_distributed(spark):
    df = spark.createDataFrame(
        EDGES, "src_domain string, dst_domain string, weight double")
    fast = {r["node"]: r["rank"] for r in pagerank(df, n_iter=9).collect()}
    dist = {r["node"]: r["rank"]
            for r in pagerank(df, n_iter=9, driver_threshold=0).collect()}
    for k in dist:
        assert fast[k] == pytest.approx(dist[k], rel=1e-12), k


def test_end_to_end_prior(spark):
    """Pages whose anchors concentrate on one domain push its rank up."""
    rows = []
    for i in range(30):
        src = f"http://site{i % 5}.example.com/p{i}"
        # everyone links to hub.example.net; half also link to a peer
        links = '<a href="http://hub.example.net/">hub</a>'
        if i % 2 == 0:
            links += f'<a href="http://site{(i + 1) % 5}.example.com/">p</a>'
        rows.append((src, f"<html><body>{links}</body></html>".encode()))
    df = spark.createDataFrame(rows, "url string, html binary")
    pr = pagerank(domain_edges(df), n_iter=10)
    top = pr.orderBy(F.desc("rank")).first()
    assert top["node"] == "hub.example.net"


# ---------------------------------------------------------------------------
# curate() domain-reputation gate
# ---------------------------------------------------------------------------

def test_curate_min_domain_rank_gate(spark):
    """Explicit (node, rank) prior: low-rank domains drop, unknown
    domains keep, everything else matches the ungated run."""
    from dqc_spark.pagesgen import generate_pages
    from dqc_spark.pipeline import curate
    from dqc_spark.urlops import domain_of

    pages = generate_pages(spark, 120, n_partitions=4).persist()
    domains = sorted(
        r["d"] for r in
        pages.select(domain_of("url").alias("d")).distinct().collect())
    assert len(domains) >= 2
    spam, rest = domains[0], domains[1:]
    base = curate(pages, near_dup_threshold=None).persist()
    base_by_domain = {
        r["d"]: r["n"] for r in base.groupBy(
            domain_of("url").alias("d")).count()
        .withColumnRenamed("count", "n").collect()}

    # rank table covers every domain: spam far below, rest far above
    ranks = spark.createDataFrame(
        [(spam, 0.001)] + [(d, 0.9) for d in rest], "node string, rank double")
    gated = curate(pages, near_dup_threshold=None,
                   domain_ranks=ranks, min_domain_rank=0.5).persist()
    got_by_domain = {
        r["d"]: r["n"] for r in gated.groupBy(
            domain_of("url").alias("d")).count()
        .withColumnRenamed("count", "n").collect()}
    assert spam not in got_by_domain
    assert got_by_domain == {d: n for d, n in base_by_domain.items()
                             if d != spam}

    # a rank table that only names the spam domain: unknowns are KEPT
    only_spam = spark.createDataFrame(
        [(spam, 0.001)], "node string, rank double")
    gated2 = curate(pages, near_dup_threshold=None,
                    domain_ranks=only_spam, min_domain_rank=0.5)
    got2 = {r["d"]: r["n"] for r in gated2.groupBy(
        domain_of("url").alias("d")).count()
        .withColumnRenamed("count", "n").collect()}
    assert got2 == got_by_domain
    base.unpersist(); gated.unpersist(); pages.unpersist()


def test_curate_self_prior_and_missing_html(spark):
    from dqc_spark.pagesgen import generate_pages
    from dqc_spark.pipeline import curate

    pages = generate_pages(spark, 60, n_partitions=3).persist()
    # threshold 0: every ranked (and unknown) domain passes — exercises
    # the compute-the-prior-from-own-html path without changing output
    base_n = curate(pages, near_dup_threshold=None).count()
    self_n = curate(pages, near_dup_threshold=None,
                    min_domain_rank=0.0).count()
    assert self_n == base_n

    with pytest.raises(ValueError, match="html"):
        curate(pages.drop("html"), near_dup_threshold=None,
               min_domain_rank=0.1).count()
    pages.unpersist()


# ---------------------------------------------------------------------------
# anchor text
# ---------------------------------------------------------------------------

def test_extract_anchors_py():
    from dqc_spark.linkgraph import extract_anchors_py

    html = (b'<a href="http://a.com/x"><b>Bold</b> &amp; Plain</a>'
            b'<a href="http://a.com/x">Bold\n  again</a>'
            b"<a href='/rel'>rel text</a>"
            b'<a href="http://img.com/"><img src="x.png"/></a>'
            b'<a href="#frag">skip</a>'
            b'<a href="mailto:x@y.z">skip</a>')
    got = extract_anchors_py(html, "https://base.org/d/p")
    assert got == [
        ("http://a.com/x", "Bold & Plain"),
        ("http://a.com/x", "Bold again"),
        ("https://base.org/rel", "rel text"),
    ]
    assert extract_anchors_py(None, "http://x.com") == []


def test_anchor_term_counts(spark):
    from dqc_spark.linkgraph import anchor_term_counts

    rows = [
        ("http://a.com/1",
         b'<a href="http://b.com/x">Great News Site</a>'
         b'<a href="http://a.com/self">my page</a>'
         b'<a href="http://c.com/z">news</a>'),
        ("http://b.com/1", b'<a href="http://c.com/z">News news</a>'),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {(r["domain"], r["term"]): r["n_mentions"]
           for r in anchor_term_counts(df).collect()}
    assert got == {("b.com", "great"): 1, ("b.com", "news"): 1,
                   ("b.com", "site"): 1, ("c.com", "news"): 3}
    # self-votes included on request
    got2 = {(r["domain"], r["term"]): r["n_mentions"]
            for r in anchor_term_counts(df, drop_self=False).collect()}
    assert got2[("a.com", "my")] == 1 and got2[("a.com", "page")] == 1
    assert got2[("c.com", "news")] == 3


def test_anchor_term_counts_partition_invariance(spark):
    from dqc_spark.linkgraph import anchor_term_counts

    rows = [
        (f"http://src{i % 7}.net/p{i}",
         (f'<a href="http://dst{i % 3}.org/x">topic {i % 5} page</a>'
          f'<a href="http://dst{(i + 1) % 3}.org/y">other words</a>')
         .encode())
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    a = {(r["domain"], r["term"]): r["n_mentions"]
         for r in anchor_term_counts(df.repartition(1)).collect()}
    b = {(r["domain"], r["term"]): r["n_mentions"]
         for r in anchor_term_counts(df.repartition(9)).collect()}
    assert a == b and len(a) > 0


def test_generated_pages_carry_link_graph(spark):
    """v2 pagesgen: pages embed empty-anchor outlinks — real edges for
    the graph operators, zero change to extracted text (the round-trip
    invariant is pinned in test_htmlextract)."""
    from dqc_spark.pagesgen import generate_pages

    pages = generate_pages(spark, 100, n_partitions=4)
    edges = domain_edges(pages)
    assert edges.count() > 0
    # hub skew: the hot site domains absorb most link weight
    top = edges.groupBy("dst_domain").agg(
        F.sum("weight").alias("w")).orderBy(F.desc("w")).first()
    assert top["dst_domain"] in {f"site{i}.example.com" for i in range(5)}


# ---------------------------------------------------------------------------
# trustrank (personalized teleport)
# ---------------------------------------------------------------------------

def trustrank_py(edges, seeds, damping=0.85, n_iter=10, weights=None):
    """Independent dense model: power iteration with teleport AND
    dangling mass restricted to the trust vector."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    t = [0.0] * n
    if weights is None:
        weights = {s: 1.0 for s in seeds}
    tot = sum(w for s, w in weights.items() if s in idx)
    for s, w in weights.items():
        if s in idx:
            t[idx[s]] = w / tot
    out = [0.0] * n
    for s, _, w in edges:
        out[idx[s]] += w
    ranks = list(t)
    for _ in range(n_iter):
        dangling = sum(r for i, r in enumerate(ranks) if out[i] == 0.0)
        new = [(1 - damping) * t[i] + damping * dangling * t[i]
               for i in range(n)]
        for s, d, w in edges:
            new[idx[d]] += damping * ranks[idx[s]] * (w / out[idx[s]])
        ranks = new
    return dict(zip(nodes, ranks))


@pytest.mark.parametrize("thresh", [50_000, 0],
                         ids=["driver-fastpath", "distributed"])
def test_trustrank_matches_python_model(spark, thresh):
    from dqc_spark.linkgraph import trustrank

    df = spark.createDataFrame(
        EDGES, "src_domain string, dst_domain string, weight double")
    got = {r["node"]: r["rank"]
           for r in trustrank(df, ["a", "d"], n_iter=12,
                              driver_threshold=thresh).collect()}
    want = trustrank_py(EDGES, ["a", "d"], n_iter=12)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9, abs=1e-15), k
    assert sum(got.values()) == pytest.approx(1.0)


def test_trustrank_uniform_teleport_equals_pagerank(spark):
    from dqc_spark.linkgraph import trustrank

    df = spark.createDataFrame(
        EDGES, "src_domain string, dst_domain string, weight double")
    all_nodes = sorted({e[0] for e in EDGES} | {e[1] for e in EDGES})
    tr = {r["node"]: r["rank"]
          for r in trustrank(df, all_nodes, n_iter=9).collect()}
    pr = {r["node"]: r["rank"] for r in pagerank(df, n_iter=9).collect()}
    for k in pr:
        assert tr[k] == pytest.approx(pr[k], rel=1e-12), k


def test_trustrank_starves_unreachable_spam(spark):
    from dqc_spark.linkgraph import trustrank

    # trusted cluster a<->b; spam farm x<->y interlinks itself but no
    # trusted domain links toward it: ordinary pagerank gives the farm
    # mass via teleport, trustrank gives it exactly the damped dangling
    # leakage — zero here (no dangling nodes)
    edges = [("a", "b", 1.0), ("b", "a", 1.0),
             ("x", "y", 5.0), ("y", "x", 5.0)]
    df = spark.createDataFrame(
        edges, "src_domain string, dst_domain string, weight double")
    pr = {r["node"]: r["rank"] for r in pagerank(df, n_iter=10).collect()}
    tr = {r["node"]: r["rank"]
          for r in trustrank(df, ["a"], n_iter=10).collect()}
    assert pr["x"] > 0.2            # the farm self-boosts under pagerank
    assert tr["x"] == pytest.approx(0.0, abs=1e-15)
    assert tr["y"] == pytest.approx(0.0, abs=1e-15)
    assert tr["a"] + tr["b"] == pytest.approx(1.0)


def test_trustrank_weighted_seeds_and_absent_seed(spark):
    from dqc_spark.linkgraph import trustrank

    df = spark.createDataFrame(
        EDGES, "src_domain string, dst_domain string, weight double")
    # seed weights 3:1, plus a seed absent from the graph (dropped and
    # renormalized over in-graph seeds)
    tp = spark.createDataFrame(
        [("a", 3.0), ("d", 1.0), ("ghost", 9.0)],
        "node string, weight double")
    got = {r["node"]: r["rank"]
           for r in trustrank(df, tp, n_iter=8).collect()}
    want = trustrank_py(EDGES, None, n_iter=8,
                        weights={"a": 3.0, "d": 1.0, "ghost": 9.0})
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9, abs=1e-15), k


def test_trustrank_disjoint_seeds_raise(spark):
    from dqc_spark.linkgraph import trustrank

    df = spark.createDataFrame(
        EDGES, "src_domain string, dst_domain string, weight double")
    with pytest.raises(ValueError, match="teleport"):
        trustrank(df, ["nope"], n_iter=3)


def test_curate_trust_seeds_prior(spark):
    """trust_seeds switches the self-built prior to TrustRank: with a
    threshold that keeps every pagerank'd domain, seeding trust on one
    domain starves the never-linked-from-it rest."""
    from dqc_spark.pagesgen import generate_pages
    from dqc_spark.pipeline import curate
    from dqc_spark.urlops import domain_of

    pages = generate_pages(spark, 60, n_partitions=3).persist()
    domains = sorted(
        r["d"] for r in
        pages.select(domain_of("url").alias("d")).distinct().collect())
    seed = domains[0]
    base_n = curate(pages, near_dup_threshold=None).count()
    # threshold 0 keeps everything under either prior (unknowns kept,
    # ranks >= 0) — exercises the trustrank code path end to end
    tr_all = curate(pages, near_dup_threshold=None, min_domain_rank=0.0,
                    trust_seeds=[seed]).count()
    assert tr_all == base_n
    # a positive threshold under trustrank keeps only domains reachable
    # from the seed (the seed itself at minimum); strictly fewer
    # domains than the pagerank prior keeps at the same tiny threshold
    tr = curate(pages, near_dup_threshold=None, min_domain_rank=1e-9,
                trust_seeds=[seed]).persist()
    tr_domains = {r["d"] for r in
                  tr.select(domain_of("url").alias("d")).distinct().collect()}
    pr_domains = {
        r["d"] for r in
        curate(pages, near_dup_threshold=None, min_domain_rank=1e-9)
        .select(domain_of("url").alias("d")).distinct().collect()}
    assert seed in tr_domains or not tr_domains  # seed survives if kept at all
    assert tr_domains <= pr_domains
    tr.unpersist()

    with pytest.raises(ValueError, match="trust_seeds"):
        ranks = spark.createDataFrame(
            [(seed, 0.9)], "node string, rank double")
        curate(pages, near_dup_threshold=None, min_domain_rank=0.5,
               domain_ranks=ranks, trust_seeds=[seed]).count()
    pages.unpersist()


def test_curate_trust_seeds_without_rank_raises(spark):
    from dqc_spark.pagesgen import generate_pages
    from dqc_spark.pipeline import curate

    pages = generate_pages(spark, 10, n_partitions=1)
    with pytest.raises(ValueError, match="min_domain_rank"):
        curate(pages, near_dup_threshold=None, trust_seeds=["a.com"])


def test_pagerank_null_endpoints_no_rank_leak(spark):
    """Edges with a NULL endpoint are not links: their mass becomes
    ordinary dangling mass and ranks still sum to 1 in BOTH paths
    (the distributed loop used to leak NULL-dst contributions)."""
    from dqc_spark.linkgraph import pagerank

    rows = [("a", None, 1.0), ("a", "b", 1.0), (None, "a", 1.0),
            ("b", "a", 1.0)]
    df = spark.createDataFrame(
        rows, "src_domain string, dst_domain string, weight double")
    for thresh in (0, 50_000):
        got = {r["node"]: r["rank"]
               for r in pagerank(df, n_iter=6,
                                 driver_threshold=thresh).collect()}
        assert set(got) == {"a", "b"}, got
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_trustrank_duplicate_seeds_paths_agree(spark):
    """Duplicate teleport entries: list seeds dedup (uniform trust per
    unique seed); the distributed path must not fan nodes into
    duplicate rank rows (it used to double-count their out-edges)."""
    from dqc_spark.linkgraph import trustrank

    rows = [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0),
            ("a", "c", 2.0)]
    df = spark.createDataFrame(
        rows, "src_domain string, dst_domain string, weight double")
    fast = {r["node"]: r["rank"] for r in trustrank(
        df, ["a", "a", "b"], n_iter=5).collect()}
    dist = trustrank(df, ["a", "a", "b"], n_iter=5, driver_threshold=0)
    rows_d = dist.collect()
    assert len(rows_d) == 3  # one row per node, no duplicates
    for r in rows_d:
        assert r["rank"] == pytest.approx(fast[r["node"]], abs=1e-9)
    # weighted DataFrame seeds with duplicate rows SUM (both paths)
    tp = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 2.0)], ["node", "weight"])
    f2 = {r["node"]: r["rank"] for r in trustrank(
        df, tp, n_iter=5).collect()}
    d2 = {r["node"]: r["rank"] for r in trustrank(
        df, tp, n_iter=5, driver_threshold=0).collect()}
    for k in f2:
        assert d2[k] == pytest.approx(f2[k], abs=1e-9)


def test_trustrank_empty_seeds_raise(spark):
    from dqc_spark.linkgraph import trustrank

    df = spark.createDataFrame(
        [("a", "b", 1.0)],
        "src_domain string, dst_domain string, weight double")
    with pytest.raises(ValueError, match="non-empty"):
        trustrank(df, [])


def test_domain_edges_drops_unparseable_src(spark):
    """Pages with unparseable urls must not pool into one phantom ''
    source domain."""
    from dqc_spark.linkgraph import domain_edges

    rows = [
        ("http://a.com/1", b'<a href="http://b.com/x">l</a>'),
        ("not a url", b'<a href="http://b.com/x">l</a>'),
        ("also-not-a-url", b'<a href="http://c.com/x">l</a>'),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {(r.src_domain, r.dst_domain) for r in domain_edges(df).collect()}
    assert got == {("a.com", "b.com")}

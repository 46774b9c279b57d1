"""Golden pipeline tests (BASELINE.md gates): Spark pipeline vs the
single-process pure-Python oracle — keep/drop F1 >= 0.99 and
byte-identical scrubbed text per document."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dqc_spark.pagesgen import generate_pages, generate_pages_local
from dqc_spark.pipeline import annotate, run_pipeline, table_checks
from dqc_spark.pipeline_oracle import oracle_labels
from dqc_spark.scrub import scrub_text_py

N_DOCS = 400


@pytest.fixture(scope="module")
def pages(spark):
    return generate_pages(spark, N_DOCS, n_partitions=4)


def test_generator_deterministic_across_partitioning(spark):
    a = generate_pages(spark, 50, n_partitions=1).orderBy("url", "text").collect()
    b = generate_pages(spark, 50, n_partitions=7).orderBy("url", "text").collect()
    assert [r.asDict() for r in a] == [
        {**r.asDict()} for r in b
    ]


def test_generator_matches_local_oracle(spark):
    spark_rows = generate_pages(spark, 60, n_partitions=3).collect()
    local_rows = generate_pages_local(60)
    s = sorted(((r["url"], r["text"], r["lang"]) for r in spark_rows))
    l = sorted(((r["url"], r["text"], r["lang"]) for r in local_rows))
    assert s == l


def test_keep_f1_and_scrub_byte_identity(spark, pages):
    ann = annotate(pages)
    got = {
        (r["url"], r["text"]): (r["keep"], r["scrubbed_text"])
        for r in ann.select("url", "text", "keep", "scrubbed_text").collect()
    }
    golden = oracle_labels(generate_pages_local(N_DOCS))
    texts = {(r["url"], r["text"]): r for r in
             (dict(g, text=t["text"]) for g, t in
              zip(golden, generate_pages_local(N_DOCS)))}

    tp = fp = fn = tn = 0
    byte_mismatches = 0
    for key, g in texts.items():
        k_spark, scrub_spark = got[key]
        if g["keep"] and k_spark:
            tp += 1
            if scrub_spark != g["scrubbed_text"]:
                byte_mismatches += 1
        elif g["keep"] and not k_spark:
            fn += 1
        elif not g["keep"] and k_spark:
            fp += 1
        else:
            tn += 1
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall)
    assert f1 >= 0.99, (tp, fp, fn, tn)
    assert byte_mismatches == 0
    assert tp > 0 and tn > 0  # non-trivial split


def test_scrub_rules_byte_level():
    s = ("mail me: a.b-c%d@sub.example.co.uk, tel (415) 555-0199, "
         "ssn 123-45-6789, ip 10.0.0.1, card 4111-1111-1111-1111 badword2!")
    out = scrub_text_py(s)
    assert out == ("mail me: <EMAIL>, tel <PHONE>, ssn <SSN>, ip <IP>, "
                   "card <CC> <TOX>!")
    assert scrub_text_py("no pii here.") == "no pii here."
    assert scrub_text_py(None) is None


def test_scrub_checksum_and_ipv6_rules():
    # Luhn gate: a valid PAN scrubs, a random 16-digit run survives
    assert scrub_text_py("pay 4111 1111 1111 1111 now") == "pay <CC> now"
    assert (scrub_text_py("order 1234 5678 9012 3456 ref")
            == "order 1234 5678 9012 3456 ref")
    # mod-97 gate: real IBANs scrub (digit-body and letter-body forms),
    # a checksum-failing lookalike survives
    assert (scrub_text_py("iban DE89 3704 0044 0532 0130 00 x")
            == "iban <IBAN> x")
    assert (scrub_text_py("iban GB82WEST12345698765432 x")
            == "iban <IBAN> x")
    assert (scrub_text_py("ref XX00 1234 5678 9012 x")
            == "ref XX00 1234 5678 9012 x")
    # IPv6 full + compressed; colon-separated times / MACs out of scope
    assert (scrub_text_py("at 2001:0db8:85a3:0000:0000:8a2e:0370:7334 !")
            == "at <IP> !")
    assert scrub_text_py("at 2001:db8::1 !") == "at <IP> !"
    assert scrub_text_py("at 12:30:45 !") == "at 12:30:45 !"
    assert (scrub_text_py("mac aa:bb:cc:dd:ee:ff !")
            == "mac aa:bb:cc:dd:ee:ff !")
    # embedded-IPv4 tails (RFC 4291 §2.2.3): the whole address scrubs,
    # no trailing octets leak (r4 review regression)
    assert (scrub_text_py("peer 2001:db8::192.168.0.1 here")
            == "peer <IP> here")
    assert (scrub_text_py("peer ::ffff:192.168.0.1 here")
            == "peer <IP> here")
    assert (scrub_text_py("at 1:2:3:4:5:6:192.168.0.1 !") == "at <IP> !")
    assert (scrub_text_py("at 1:2:3::ffff:10.0.0.7 !") == "at <IP> !")


def test_scrub_prescan_covers_every_rule():
    """_PRESCAN must match a sample hit of EVERY rule — extend this
    list whenever SCRUB_RULES grows, or the prescan silently skips the
    new rule's documents."""
    from dqc_spark.scrub import _PRESCAN, SCRUB_RULES, scrub_text_py

    samples = {
        "email": "bob@example.com",
        "ssn": "123-45-6789",
        "iban": "DE89 3704 0044 0532 0130 00",
        "phone": "555-867-5309",
        "ipv6": "2001:db8::1",
        "ipv4": "10.0.0.1",
        "credit_card": "4111 1111 1111 1111",
        "toxicity": "badword1",
    }
    assert set(samples) == {name for name, _, _ in SCRUB_RULES}
    for name, hit in samples.items():
        assert _PRESCAN.search(hit), name
    # the one digit-OPTIONAL rule: hex-letter-only IPv6 forms must pass
    # the prescan too (r4 review: a [0-9@]-only prescan leaked them)
    for v6 in ("dead:beef:cafe:face:feed:face:dead:beef",
               "ab:cd::ef", "AbCd:ef::Fa"):
        assert _PRESCAN.search(v6), v6
    assert scrub_text_py("peer dead:beef::cafe here") == "peer <IP> here"
    # and the two-stage kernel equals the rules run unconditionally
    import re as _re
    from dqc_spark.scrub import COMPILED

    for text in [*samples.values(), "no pii words only", "", "x@y a 7"]:
        unconditional = text
        for _, rx, repl in COMPILED:
            unconditional = rx.sub(repl, unconditional)
        assert scrub_text_py(text) == unconditional, text


def test_table_checks_and_audit(spark, pages):
    from dqc_spark.audit import MemoryAuditSink

    sink = MemoryAuditSink()
    ann = run_pipeline(pages, audit=sink)
    results = {r["check_type"]: r for r in sink.rows}
    # planted failure modes must surface as failing table-level checks
    assert results["gate_too_few_words"]["result"] is False
    assert results["gate_high_ppl"]["result"] is False
    assert results["is_column_unique"]["result"] is False  # dup urls planted
    assert results["is_column_enum"]["result"] is True     # langs all valid
    assert results["is_table_row_count_between"]["result"] is True


def test_salted_count_matches_plain_groupby(spark, pages):
    from dqc_spark.skew import salted_group_count

    plain = {
        r["url"]: r["n"]
        for r in pages.groupBy("url").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {r["url"]: r["n"] for r in salted_group_count(pages, "url").collect()}
    assert plain == salted


def test_entry_contract(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "keep" in df.columns and "doc_id" in df.columns


def test_isspace_equals_regex_ws():
    """features_batch replaces features_py's regex-\\s splits with
    str.split() (str.isspace semantics).  The substitution is exact only
    while the two character classes agree — assert that over the entire
    codepoint space so a future Python/Unicode bump can't silently
    desynchronize the batch kernel from the golden oracle."""
    import re

    ws = re.compile(r"\s")
    diff = [
        i
        for i in range(0x110000)
        if chr(i).isspace() != (ws.match(chr(i)) is not None)
    ]
    assert diff == [], [hex(i) for i in diff[:10]]


def assert_features_match(texts):
    """Single-sourced pin of the dual-implementation contract: every
    feature of ``features_batch(texts)`` must equal (==, not approx)
    ``features_py`` per row, with None (never NaN) for the undefined
    cases.  Shared by the example-based test here and the hypothesis
    property test (tests/test_property.py)."""
    import math

    from dqc_spark.features import FEATURE_NAMES, features_batch, features_py

    got = features_batch(texts)
    for i, t in enumerate(texts):
        want = features_py(t or "")
        for k in FEATURE_NAMES:
            g, w = got[k].iloc[i], want[k]
            if w is None:
                assert g is None, (i, k, g)  # None, not NaN: Arrow null
            else:
                assert g == w and not (
                    isinstance(g, float) and math.isnan(g)
                ), (i, k, repr(t)[:40], g, w)


def test_features_batch_matches_features_py():
    """The batch-vectorized kernel is pinned EXACTLY (==, not approx) to
    the per-document golden oracle, including the nasty edges: empty,
    None, whitespace-only, CJK, astral plane, combining marks, ellipsis
    runs, hash runs, duplicate lines/bigrams."""
    from dqc_spark.pagesgen import make_page

    texts = [make_page(i)["text"] for i in range(300)]
    texts += [
        "",
        None,
        "   \t\n  ",
        "one",
        "a a a a a",
        "x\ny\nx\ny\n\n",
        "## #tag ...... ... ..",
        "the and of to in the the",
        "你好 世界 你好 世界",
        "emoji 🚀🚀 and astral 𝒜𝒜 text",
        "combining á é á",
        "    odd spaces",
        "...",
        ".." * 500,
        "tab\tsep\tvals",
    ]
    # batches ENDING in empty/None rows regressed once: the reduceat
    # offsets for trailing empty docs truncated the last non-empty
    # document's final character — keep these orderings pinned
    texts += ["hello world", "", None, ""]
    assert_features_match(texts)


def test_perplexity_cache_is_exact():
    """perplexity(text, lm, cache) must be BIT-equal to the uncached
    call — the cache stores finished math.log values, so summation
    order and operands are identical."""
    from dqc_spark.pagesgen import make_page
    from dqc_spark.textmodels import build_lm, perplexity

    lm = build_lm()
    texts = [make_page(i)["text"] for i in range(200)] + ["", "zq zq zq"]
    cache: dict = {}
    for t in texts:
        assert perplexity(t, lm) == perplexity(t, lm, cache)
    assert len(cache) > 0


def test_column_engine_matches_pandas_engine(spark):
    """The pure-Catalyst gate expressions and the fused-UDF kernel are
    dual implementations of the same semantics — identical keep/gate
    decisions (floating-point ties aside, which the generator avoids)."""
    pages = generate_pages(spark, 150, n_partitions=3)
    cols = ["url", "text", "keep"] + [c for c in
            annotate(pages).columns if c.startswith("gate_")]
    a = annotate(pages, engine="pandas").select(*cols)
    b = annotate(pages, engine="column").select(*cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_engines_agree_on_null_and_empty_text(spark):
    """NULL text must gate identically to "" in BOTH engines (the pandas
    kernel maps None -> ""; the Column forms coalesce the input)."""
    import datetime as dt

    from dqc_spark.pagesgen import PAGES_SCHEMA

    ts = dt.datetime(2024, 1, 1)
    sch = PAGES_SCHEMA
    rows = [("u1", ts, b"", None, "en"), ("u2", ts, b"", "", "en"),
            ("u3", ts, b"", "plain short text", "en")]
    # PAGES_SCHEMA marks text non-null; build a nullable clone
    from pyspark.sql import types as T
    nullable = T.StructType([T.StructField(f.name, f.dataType, True) for f in sch])
    pages = spark.createDataFrame(rows, nullable)
    for eng in ("pandas", "column"):
        ann = {r.url: (r.keep, r.n_words)
               for r in annotate(pages, engine=eng).collect()}
        assert ann["u1"][0] is False and ann["u2"][0] is False, eng
        assert ann["u1"][1] == 0 and ann["u2"][1] == 0, eng


def test_curate_end_to_end(spark):
    from dqc_spark.pagesgen import generate_pages
    from dqc_spark.pipeline import annotate, curate

    pages = generate_pages(spark, 400, n_partitions=4)
    cur = curate(pages, near_dup_threshold=0.7, domain_quota=50,
                 pack_budget=500).persist()
    n_cur = cur.count()
    n_kept = annotate(pages).filter(F.col("keep")).count()
    assert 0 < n_cur <= n_kept

    # exact dedup: scrubbed_text unique among survivors
    assert cur.select("scrubbed_text").distinct().count() == n_cur
    # doc keys unique
    assert cur.select("doc_key").distinct().count() == n_cur
    # domain quota respected
    assert all(
        r["count"] <= 50 for r in cur.groupBy("domain").count().collect()
    )
    # packing: every surviving doc has a bin, bins dense from 0 per lang
    assert cur.filter(F.col("bin_id").isNull()).count() == 0
    assert all(
        r["mn"] == 0
        for r in cur.groupBy("lang").agg(F.min("bin_id").alias("mn")).collect()
    )
    cur.unpersist()


def test_curate_full_composition(spark):
    """curate with every optional stage ON: prior-snapshot filter,
    normalization, corpus line dedup, decontamination, temperature mix.
    Each stage's effect is asserted against planted inputs."""
    from dqc_spark.pagesgen import generate_pages
    from dqc_spark.pipeline import curate

    pages = generate_pages(spark, 300, n_partitions=4)
    # prior snapshot = an exact subset of the crawl (re-crawled content)
    prior = pages.filter(F.col("url").substr(-1, 1).isin("0", "1"))
    # benchmark = a handful of crawl texts verbatim (planted leakage)
    benchmark = pages.select("text").limit(5)

    cur = curate(
        pages,
        near_dup_threshold=0.7,
        domain_quota=50,
        pack_budget=500,
        prior=prior,
        normalize_text=True,
        line_dedup_min_len=10,
        benchmark=benchmark,
        decontam_ngram=8,
        decontam_max_frac=0.8,
        mix_alpha=0.7,
    ).persist()
    n_cur = cur.count()
    baseline = curate(pages, near_dup_threshold=0.7, domain_quota=50,
                      pack_budget=500).persist()
    n_base = baseline.count()
    # every added stage only removes rows
    assert 0 < n_cur <= n_base
    # prior-snapshot stage == manual pre-filter (composition applies it)
    from dqc_spark.snapshot import new_docs

    manual = curate(new_docs(pages, prior), near_dup_threshold=None)
    auto = curate(pages, prior=prior, near_dup_threshold=None)
    assert auto.count() == manual.count() < curate(
        pages, near_dup_threshold=None
    ).count()
    # no surviving scrubbed_text fully contains a benchmark doc
    bench_texts = [r["text"] for r in benchmark.collect()]
    surv = [r["scrubbed_text"] for r in cur.collect()]
    leaked = sum(1 for s in surv for b in bench_texts if b and b in s)
    assert leaked == 0
    # survivors still unique and packed
    assert cur.select("doc_key").distinct().count() == n_cur
    assert cur.filter(F.col("bin_id").isNull()).count() == 0
    cur.unpersist(); baseline.unpersist()


def test_curate_repetition_gates(spark):
    """A doc that passes the base gates but trips the Gopher n-gram
    repetition suite is dropped only when repetition_thresholds is on."""
    from dqc_spark.pagesgen import generate_pages
    from dqc_spark.pipeline import curate

    from dqc_spark.pipeline_oracle import gate_flags_py
    from dqc_spark.textstats import repetition_signals_py

    pages = generate_pages(spark, 200, n_partitions=4)
    # planted: a donor's own text plus one 10-word snippet of itself
    # repeated twice — dup_5gram_char_frac spikes, but dup_line stays 0
    # and dup_bigram stays under the base 0.40 gate.  The donor is
    # chosen by a deterministic python-side search (url order) that
    # verifies BOTH preconditions via the golden kernels — a post-shuffle
    # `.first()` pick is partition-order-dependent and a donor that
    # happens to trip a base gate flakes the test.
    src, planted_text = None, None
    for r in sorted(pages.collect(), key=lambda r: r["url"]):
        words = (r["text"] or "").split()
        if len(words) < 80:
            continue
        cand = f"{r['text']} {' '.join(words[:10])} {' '.join(words[:10])}"
        flags = gate_flags_py(cand, r["lang"])
        if any(v for k, v in flags.items() if k.startswith("gate_")):
            continue
        if repetition_signals_py(cand)["dup_5gram_char_frac"] > 0.08:
            src, planted_text = r, cand
            break
    assert src is not None, "no donor satisfies the planted preconditions"
    planted_url = "http://planted.example.com/rep"
    planted = spark.createDataFrame(
        [(planted_url, src["warc_ts"], src["html"], planted_text,
          src["lang"])],
        pages.schema)
    corpus = pages.unionByName(planted)

    off = curate(corpus, near_dup_threshold=None)
    assert off.filter(F.col("url") == planted_url).count() == 1
    on = curate(corpus, near_dup_threshold=None,
                repetition_thresholds={"dup_5gram_char_frac": 0.08})
    assert on.filter(F.col("url") == planted_url).count() == 0
    # the gate only removes rows, never adds
    assert on.count() < off.count()

    with pytest.raises(ValueError, match="unknown repetition"):
        curate(corpus, near_dup_threshold=None,
               repetition_thresholds={"not_a_signal": 0.1}).count()


def test_curate_stage_metrics(spark):
    from dqc_spark.pagesgen import generate_pages
    from dqc_spark.pipeline import curate

    pages = generate_pages(spark, 120, n_partitions=2)
    metrics: dict = {}
    out = curate(pages, near_dup_threshold=0.7, domain_quota=50,
                 stage_metrics=metrics)
    # enabled stages appear in execution order with monotonically
    # non-increasing survivors; disabled stages are absent
    assert list(metrics) == ["input", "quality_gates", "url_dedup",
                             "exact_dedup", "near_dup", "domain_quota",
                             "final"]
    vals = list(metrics.values())
    assert vals[0] == 120
    assert all(a >= b for a, b in zip(vals, vals[1:])), metrics
    assert metrics["final"] == out.count()


def test_curate_quality_model_gate(spark):
    """Stage 1a': a trained classifier gate drops planted mediocre docs
    that PASS every heuristic gate (stopword_ratio 0.08 > the 0.05
    floor) — the model learns the sharper boundary from labels."""
    from dqc_spark.pipeline import annotate, curate
    from dqc_spark.qualitymodel import train_logreg

    # both classes: >= 20 words, alphabetic, in-LM-ORDER word runs so
    # the default bigram LM scores ppl ~51 (< the 100 gate), en langid.
    # good ~ 0.69 stopword ratio; mediocre ~ 0.074 — above the 0.05
    # heuristic floor, below what the labels call quality.
    from dqc_spark.textmodels import WORDS

    en = WORDS["en"]
    good = " ".join(en[:28])
    mediocre = " ".join(en[44:68] + ["the", "of"])
    rows = []
    for i in range(12):
        rows.append((f"http://good.example.com/{i}", good + f" tag{i}",
                     "en", 1.0))
        rows.append((f"http://soso.example.com/{i}",
                     mediocre + f" tag{i}", "en", 0.0))
    pages = spark.createDataFrame(
        [(u, t, l) for u, t, l, _ in rows], "url string, text string, lang string")
    labeled = spark.createDataFrame(rows,
        "url string, text string, lang string, label double")

    ann = annotate(labeled).persist()
    # sanity: every planted doc passes the heuristic gates
    assert ann.filter(~F.col("keep")).count() == 0
    model = train_logreg(ann, ["stopword_ratio"], "label")
    ann.unpersist()

    metrics: dict = {}
    cur = curate(pages, near_dup_threshold=None, quality_model=model,
                 quality_model_threshold=0.5, stage_metrics=metrics)
    kept = {r["url"] for r in cur.select("url").collect()}
    assert kept == {u for u, _, _, lab in rows if lab == 1.0}
    # the stage metric rows pin where the cut happened
    assert metrics["quality_gates"] == 24
    assert metrics["quality_model_gate"] == 12

    # no-silent-noop guards
    import dataclasses

    with pytest.raises(ValueError, match="quality_model_threshold"):
        curate(pages, quality_model_threshold=0.5)
    bad = dataclasses.replace(model, feature_cols=["no_such_feature"])
    with pytest.raises(ValueError, match="no_such_feature"):
        curate(pages, quality_model=bad).count()

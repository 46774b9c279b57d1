"""Corpus data-card report (report.py): fused per-group aggregation
semantics pinned against hand-computed values, plus the markdown
renderer contract.  The cross-engine differential is the
``corpus_report_by_lang`` driver oracle."""

import pytest
from pyspark.sql import Row

from dqc_spark.report import corpus_report, report_markdown


@pytest.fixture()
def docs(spark):
    # lengths straddle the default 200/2000 bucket edges exactly:
    # 199 short, 200 medium (boundary in), 1999 medium, 2000 long
    rows = [
        Row(doc_id=0, lang="en", text="a " * 100),          # 200 ch, 100 tok
        Row(doc_id=1, lang="en", text="b" * 199),           # short
        Row(doc_id=2, lang="en", text=None),                # null -> short
        Row(doc_id=3, lang="fr", text="c" * 2000),          # long, 1 token
        Row(doc_id=4, lang=None, text="x y"),               # null group
    ]
    return spark.createDataFrame(rows)


def test_corpus_report_values(docs):
    got = {r["lang"]: r for r in corpus_report(docs).collect()}
    en = got["en"]
    # "a " * 100 = 200 chars incl. trailing space, 100 tokens
    assert (en["n_docs"], en["n_null_text"]) == (3, 1)
    assert en["total_chars"] == 200 + 199 + 0
    assert en["total_tokens"] == 100 + 1 + 0
    assert (en["n_short"], en["n_medium"], en["n_long"]) == (2, 1, 0)
    assert en["avg_chars"] == pytest.approx(399 / 3)
    assert en["doc_share"] == pytest.approx(3 / 5)
    fr = got["fr"]
    assert (fr["n_short"], fr["n_medium"], fr["n_long"]) == (0, 0, 1)
    assert fr["total_tokens"] == 1
    # NULL group is its own visible row, not silently dropped
    assert got[None]["n_docs"] == 1 and got[None]["total_tokens"] == 2


def test_corpus_report_bucket_edges_and_validation(spark, docs):
    # custom edges: boundary value lands in the UPPER bucket (>= edge)
    r = {x["lang"]: x for x in corpus_report(
        docs, short_max_chars=200, long_min_chars=201).collect()}
    assert (r["en"]["n_short"], r["en"]["n_medium"]) == (2, 1)
    with pytest.raises(ValueError, match="short_max_chars"):
        corpus_report(docs, short_max_chars=0)
    with pytest.raises(ValueError, match="short_max_chars"):
        corpus_report(docs, short_max_chars=300, long_min_chars=300)


def test_report_markdown_renders_sorted_with_total(docs):
    md = report_markdown(corpus_report(docs))
    lines = md.splitlines()
    assert lines[0].startswith("| lang | docs | share |")
    # en (3 docs) sorts first; (null) rendered explicitly; TOTAL last
    assert lines[2].startswith("| en | 3 |")
    assert any(ln.startswith("| (null) | 1 |") for ln in lines)
    assert lines[-1].startswith("| **TOTAL** | 5 | 100.0% |")

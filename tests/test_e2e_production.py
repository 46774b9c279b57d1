"""End-to-end production story: the composed path a real crawl takes.

    WARC archives  ->  warc_to_pages (html->text + langid)
                   ->  run_resumable over a SNAPSHOT output table,
                       audit on a SNAPSHOT audit table
                   ->  second crawl batch resumes (only the new day runs,
                       committed atomically)
                   ->  audit lineage + anomaly scan over the audit table

Each piece has its own suite; this pins that they COMPOSE — schema
contracts across module boundaries (hinted pages table -> annotate ->
snapshot commit -> audit read-back) are exactly where integration rot
shows up first.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from dqc_spark.audit import SnapshotAuditSink
from dqc_spark.resume import run_resumable
from dqc_spark.scrub import scrub_text_py
from dqc_spark.snaptable import SnapshotTable
from dqc_spark.warc import warc_bytes, warc_to_pages

# Good bodies come from the LM's own training sequence (corpus_seq):
# arbitrary hand-written prose is out-of-domain for the in-repo bigram
# LM and fails gate_high_ppl by design — a real pipeline would train
# the LM on its own reference corpus, which is exactly what pagesgen
# models.
from dqc_spark.textmodels import corpus_seq

_SEQ = corpus_seq("en")


def _good_body(i: int) -> str:
    return " ".join(_SEQ[(37 * i + j) % len(_SEQ)] for j in range(180))


PII_BODY = (
    _good_body(8) + " Contact me at alice@example.com or call "
    "555-867-5309 during business hours."
)
JUNK_BODY = "zxqv " * 3  # too short, no stopwords: gated out

DAY1 = [
    (f"http://site{i}.example.com/good", f"2025-03-01T0{i}:00:00Z",
     f"<html><body><p>{_good_body(i)}</p></body></html>".encode())
    for i in range(4)
] + [
    ("http://pii.example.com/contact", "2025-03-01T08:00:00Z",
     f"<html><body><p>{PII_BODY}</p></body></html>".encode()),
    ("http://junk.example.com/spam", "2025-03-01T09:00:00Z",
     f"<html><body><p>{JUNK_BODY}</p></body></html>".encode()),
]
DAY2 = [
    ("http://site9.example.com/fresh", "2025-03-02T01:00:00Z",
     f"<html><body><p>{_good_body(9)}</p></body></html>".encode()),
]


@pytest.fixture()
def crawl(tmp_path):
    warc_dir = tmp_path / "crawl"
    warc_dir.mkdir()
    (warc_dir / "batch1.warc.gz").write_bytes(
        warc_bytes(DAY1, gzip_members=True))
    return tmp_path, str(warc_dir)


def test_production_run_composes(spark, crawl):
    tmp_path, warc_dir = crawl
    out = str(tmp_path / "corpus")
    audit = SnapshotAuditSink(spark, str(tmp_path / "audit"))

    # -- batch 1: ingest + curate + atomic commit --------------------------
    pages = warc_to_pages(spark, warc_dir)
    assert set(pages.columns) == {"url", "warc_ts", "html", "text", "lang"}
    s1 = run_resumable(spark, pages, out, audit, run_group="crawl-2025-03",
                       output_format="snapshot")
    assert s1["processed"] == ["2025-03-01"] and not s1["skipped"]

    t = SnapshotTable(spark, out)
    corpus = t.read()
    rows = {r["url"]: r for r in corpus.collect()}
    assert len(rows) == 6
    # quality gates: prose kept, junk dropped
    assert all(rows[f"http://site{i}.example.com/good"]["keep"]
               for i in range(4))
    assert not rows["http://junk.example.com/spam"]["keep"]
    # PII scrub: byte-identical to the golden python kernel, and the
    # raw identifiers are gone from the kept document
    pii = rows["http://pii.example.com/contact"]
    assert pii["scrubbed_text"] == scrub_text_py(pii["text"])
    assert "alice@example.com" not in pii["scrubbed_text"]
    assert "555-867-5309" not in pii["scrubbed_text"]
    # warc_ts survived the whole lineage with timestamp fidelity
    assert rows["http://pii.example.com/contact"]["warc_ts"] == \
        datetime.datetime(2025, 3, 1, 8, 0, 0)

    # audit: lineage row for the completed day on a versioned table
    done = audit.read().filter(
        F.col("check_type") == "partition_complete").collect()
    assert len(done) == 1 and done[0]["params"]["day"] == "2025-03-01"
    assert int(done[0]["params"]["n_docs"]) == 6
    assert int(done[0]["params"]["n_kept"]) == 5

    # -- batch 2 arrives: resume touches ONLY the new day ------------------
    with open(f"{warc_dir}/batch2.warc.gz", "wb") as f:
        f.write(warc_bytes(DAY2, gzip_members=True))
    pages2 = warc_to_pages(spark, warc_dir)
    s2 = run_resumable(spark, pages2, out, audit,
                       run_group="crawl-2025-03", output_format="snapshot")
    assert s2["processed"] == ["2025-03-02"]
    assert s2["skipped"] == ["2025-03-01"]
    assert t.current_version() == 2
    assert t.read().count() == 7
    # day-1 files carried by reference into the v2 manifest (the
    # skipped day was not rewritten)
    v1_files = {fe["path"] for fe in t.manifest(1)["files"]}
    v2_files = {fe["path"] for fe in t.manifest(2)["files"]}
    assert v1_files <= v2_files
    # time travel: the corpus as the first run published it
    assert t.read(version=1).count() == 6

    # -- monitoring over the audit trail -----------------------------------
    from dqc_spark.monitor import audit_anomalies

    flags = audit_anomalies(audit.read()).filter("is_anomaly")
    assert flags.count() == 0  # two healthy runs, nothing to flag

    # audit table itself is versioned: empty create + one commit per
    # flush, and "the audit as of the first run" is a stable read
    assert audit._tbl().current_version() == 3
    assert audit.read_version(2).count() == 1

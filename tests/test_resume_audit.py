"""Resume / audit-sink tests: one audit row per check per run; a rerun
only processes missing day partitions (SURVEY §5.2 item 4)."""

import os

from pyspark.sql import functions as F

from dqc_spark.audit import ParquetAuditSink, SQLiteAuditSink, format_log_rows
from dqc_spark.pagesgen import generate_pages
from dqc_spark.resume import completed_days, run_resumable


def test_resume_skips_completed_days(spark, tmp_path):
    pages = generate_pages(spark, 300, n_partitions=4)
    out = str(tmp_path / "out")
    audit = ParquetAuditSink(spark, str(tmp_path / "audit"))

    s1 = run_resumable(spark, pages, out, audit, run_group="g1")
    assert s1["processed"] and not s1["skipped"]
    n_days = len(s1["processed"])
    assert len(completed_days(audit, "g1")) == n_days

    # full rerun: everything skipped, no new work
    s2 = run_resumable(spark, pages, out, audit, run_group="g1")
    assert s2["processed"] == [] and len(s2["skipped"]) == n_days

    # simulate a crash that lost the last day's completion record:
    # rewrite audit without it, rerun -> only that day reprocessed
    lost_day = s1["processed"][-1]
    kept_rows = audit.read().filter(
        ~(F.col("params")["day"] == lost_day)
    )
    audit2_path = str(tmp_path / "audit2")
    kept_rows.write.parquet(audit2_path)
    audit2 = ParquetAuditSink(spark, audit2_path)
    s3 = run_resumable(spark, pages, out, audit2, run_group="g1")
    assert s3["processed"] == [lost_day]

    # output is complete and idempotent after resume
    result = spark.read.parquet(out)
    assert result.count() == 300
    assert result.select("url").distinct().count() <= 300


def test_audit_lineage_metrics(spark, tmp_path):
    pages = generate_pages(spark, 200, n_partitions=2)
    audit = ParquetAuditSink(spark, str(tmp_path / "a"))
    run_resumable(spark, pages, str(tmp_path / "o"), audit, run_group="g")
    rows = audit.read().filter(F.col("check_type") == "partition_complete").collect()
    assert sum(int(r["params"]["n_docs"]) for r in rows) == 200
    assert all(int(r["params"]["n_kept"]) <= int(r["params"]["n_docs"])
               for r in rows)
    assert {r["partition_id"] for r in rows} == set(range(len(rows)))
    assert format_log_rows(sorted(rows, key=lambda r: r["seq"]))


def test_sqlite_sink_reference_parity(tmp_path):
    db = str(tmp_path / "q.db")
    sink = SQLiteAuditSink(db)
    sink.log("is_column_unique", True, {"column": "id"}, error_count=0)
    rows = sink.all_logs()
    assert len(rows) == 1
    rid, ts, ctype, result, params = rows[0]
    assert rid == 1 and ctype == "is_column_unique" and result == 1
    assert ts.endswith("Z") and "T" in ts  # RFC3339 (connector.go:86-94)
    assert '"column": "id"' in params
    sink.clear()
    assert sink.all_logs() == []


def test_curate_incremental_two_runs(spark, tmp_path):
    """The content-level resume verb: run 1 curates everything, an
    identical run 2 short-circuits to zero work, a superset run 3
    curates only the genuinely-new content; every run leaves an audit
    row and the output only ever grows by the appended increment."""
    from dqc_spark.audit import ParquetAuditSink
    from dqc_spark.pagesgen import generate_pages
    from dqc_spark.resume import curate_incremental

    out = str(tmp_path / "corpus.parquet")
    audit = ParquetAuditSink(spark, str(tmp_path / "audit.parquet"))
    pages1 = generate_pages(spark, 60, n_partitions=2)

    s1 = curate_incremental(spark, pages1, out, audit, "rg",
                            near_dup_threshold=None)
    assert not s1["skipped"] and s1["n_new"] == 60
    assert s1["n_appended"] > 0
    n_after_1 = spark.read.parquet(out).count()
    assert n_after_1 == s1["n_appended"]

    # identical re-run: nothing new, no write, audit row records it
    s2 = curate_incremental(spark, pages1, out, audit, "rg",
                            near_dup_threshold=None)
    assert s2["skipped"] and s2["n_new"] == 0
    assert spark.read.parquet(out).count() == n_after_1

    # superset crawl: only the added docs' (distinct) content is new
    pages3 = generate_pages(spark, 90, n_partitions=2)
    s3 = curate_incremental(spark, pages3, out, audit, "rg",
                            near_dup_threshold=None)
    assert not s3["skipped"]
    assert 0 < s3["n_new"] <= 30  # dup texts in the overlap don't recur
    assert spark.read.parquet(out).count() == n_after_1 + s3["n_appended"]

    rows = (audit.read()
            .filter(F.col("check_type") == "curate_increment").collect())
    assert len(rows) == 3
    by_new = sorted(int(r["params"]["n_new"]) for r in rows)
    assert by_new[0] == 0 and by_new[-1] == 60


def test_curate_incremental_null_text_rows_settle(spark, tmp_path):
    """Regression (r4 review): NULL-text rows digest to NULL, and a
    null-unsafe anti-join re-classified them as 'new' forever — the
    nothing-new short-circuit was unreachable for any corpus with one
    NULL text.  The null-safe probe must let an identical re-run skip."""
    from dqc_spark.audit import ParquetAuditSink
    from dqc_spark.resume import curate_incremental

    out = str(tmp_path / "corpus.parquet")
    audit = ParquetAuditSink(spark, str(tmp_path / "audit.parquet"))
    pages = spark.createDataFrame(
        [("u1", "real content words here for the gates to chew on", "en"),
         ("u2", None, "en"),
         ("u3", None, "en")],
        "url string, text string, lang string",
    )
    s1 = curate_incremental(spark, pages, out, audit, "rg",
                            near_dup_threshold=None)
    assert not s1["skipped"] and s1["n_new"] == 3
    s2 = curate_incremental(spark, pages, out, audit, "rg",
                            near_dup_threshold=None)
    assert s2["skipped"] and s2["n_new"] == 0
    # the state table holds ONE null marker row at most (distinct)
    state = spark.read.parquet(out.rstrip("/") + "_ingested")
    assert state.filter(F.col("digest").isNull()).count() <= 1

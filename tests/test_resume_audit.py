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

"""Snapshot-table semantics: atomic versioned commits, time travel,
partition overwrite, copy-on-write DELETE/MERGE, manifest pruning,
vacuum.  Every mutation is checked against a plain-python model of the
expected row set — the table is only bookkeeping, so the model is a
dict."""

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dqc_spark import snaptable
from dqc_spark.snaptable import CommitConflict, SnapshotTable


def _rows(df):
    return sorted(
        (tuple(r[c] for c in sorted(df.columns)) for r in df.collect()),
        key=lambda t: [(v is None, v) for v in t])


@pytest.fixture()
def pages(spark):
    return spark.createDataFrame(
        [
            Row(url=f"http://ex.com/{i}", day=f"2024-01-0{1 + i % 3}",
                text=f"doc {i}", score=float(i))
            for i in range(12)
        ]
    )


def test_create_read_roundtrip(spark, tmp_path, pages):
    t = snaptable.create(spark, str(tmp_path / "t"), pages,
                         partition_cols=["day"])
    assert t.current_version() == 1
    got = t.read()
    assert _rows(got) == _rows(pages)
    # partition column keeps its type (string here) and its VALUES
    assert got.schema["day"].dataType == pages.schema["day"].dataType
    assert got.filter(F.col("day") == "2024-01-02").count() == 4


def test_append_is_versioned(spark, tmp_path, pages):
    t = snaptable.create(spark, str(tmp_path / "t"), pages,
                         partition_cols=["day"])
    extra = spark.createDataFrame(
        [Row(url="http://ex.com/new", day="2024-01-04",
             text="new doc", score=99.0)])
    v2 = t.append(extra)
    assert v2 == 2
    assert t.read().count() == 13
    # time travel: v1 still reads the original 12
    assert t.read(version=1).count() == 12
    ops = [h["operation"] for h in t.history()]
    assert ops == ["create", "append"]


def test_append_schema_mismatch_rejected(spark, tmp_path, pages):
    t = snaptable.create(spark, str(tmp_path / "t"), pages,
                         partition_cols=["day"])
    bad = spark.createDataFrame([Row(url="u", day="d")])
    with pytest.raises(ValueError, match="does not match"):
        t.append(bad)


def test_overwrite_partitions_replaces_only_named_days(
        spark, tmp_path, pages):
    t = snaptable.create(spark, str(tmp_path / "t"), pages,
                         partition_cols=["day"])
    repl = spark.createDataFrame(
        [Row(url="http://ex.com/r", day="2024-01-01",
             text="rewritten", score=0.0)])
    t.overwrite_partitions(repl)
    got = t.read()
    assert got.filter(F.col("day") == "2024-01-01").count() == 1
    # other days untouched, byte-for-byte
    assert _rows(got.filter(F.col("day") != "2024-01-01")) == _rows(
        pages.filter(F.col("day") != "2024-01-01"))


def test_delete_where_is_copy_on_write(spark, tmp_path, pages):
    t = snaptable.create(spark, str(tmp_path / "t"), pages,
                         partition_cols=["day"])
    before = {fe["path"] for fe in t.manifest()["files"]}
    t.delete_where("score >= 10.0")  # hits docs 10, 11
    got = t.read()
    assert got.count() == 10
    assert got.filter(F.col("score") >= 10.0).count() == 0
    after = t.manifest()["files"]
    # files without matches carried by REFERENCE (same path object)
    untouched = {fe["path"] for fe in after} & before
    assert untouched, "copy-on-write must reuse unaffected files"
    # old version still has all 12 (snapshot isolation)
    assert t.read(version=1).count() == 12


def test_delete_where_on_partition_column(spark, tmp_path, pages):
    t = snaptable.create(spark, str(tmp_path / "t"), pages,
                         partition_cols=["day"])
    t.delete_where("day = '2024-01-03'")
    got = t.read()
    assert got.filter(F.col("day") == "2024-01-03").count() == 0
    assert got.count() == 8


def test_merge_upsert_updates_and_inserts(spark, tmp_path, pages):
    t = snaptable.create(spark, str(tmp_path / "t"), pages,
                         partition_cols=["day"])
    src = spark.createDataFrame(
        [
            Row(url="http://ex.com/0", day="2024-01-01",
                text="recrawled", score=100.0),       # update
            Row(url="http://ex.com/brandnew", day="2024-01-01",
                text="fresh", score=50.0),            # insert
        ]
    )
    t.merge_upsert(src, key_cols=["url"])
    got = t.read()
    assert got.count() == 13
    assert got.filter(F.col("url") == "http://ex.com/0") \
        .select("text").first()["text"] == "recrawled"
    assert got.filter(F.col("url") == "http://ex.com/brandnew").count() == 1


def test_merge_upsert_rejects_duplicate_source_keys(
        spark, tmp_path, pages):
    t = snaptable.create(spark, str(tmp_path / "t"), pages,
                         partition_cols=["day"])
    src = spark.createDataFrame(
        [Row(url="u", day="d", text="a", score=1.0),
         Row(url="u", day="d", text="b", score=2.0)])
    with pytest.raises(ValueError, match="duplicate keys"):
        t.merge_upsert(src, key_cols=["url"])


def test_partition_filter_prunes_files_from_metadata(
        spark, tmp_path, pages):
    t = snaptable.create(spark, str(tmp_path / "t"), pages,
                         partition_cols=["day"])
    got = t.read(partition_filter={"day": "2024-01-02"})
    assert got.count() == 4
    assert _rows(got) == _rows(pages.filter(F.col("day") == "2024-01-02"))
    # a filter matching nothing returns a typed empty frame
    empty = t.read(partition_filter={"day": "1970-01-01"})
    assert empty.count() == 0
    assert empty.schema["score"].dataType == pages.schema["score"].dataType


def test_as_of_time_travel(spark, tmp_path, pages):
    t = snaptable.create(spark, str(tmp_path / "t"), pages,
                         partition_cols=["day"])
    ts_v1 = t.manifest(1)["ts"]
    t.delete_where("score >= 6.0")
    assert t.read(as_of=ts_v1).count() == 12
    assert t.read().count() == 6
    with pytest.raises(ValueError, match="no snapshot"):
        t.read(as_of="1999-01-01T00:00:00+00:00")


def test_commit_conflict_on_concurrent_mutation(spark, tmp_path, pages):
    root = str(tmp_path / "t")
    t = snaptable.create(spark, root, pages, partition_cols=["day"])
    # simulate a writer that committed between our read and our commit:
    # hand-advance the table with an append through a second handle
    t2 = SnapshotTable(spark, root)
    base = t.current_version()
    m = t.manifest(base)
    t2.append(spark.createDataFrame(
        [Row(url="x", day="2024-01-01", text="y", score=0.0)]))
    with pytest.raises(CommitConflict):
        t._commit([], "delete", m["schema"], m["partition_cols"], base)


def test_concurrent_appends_both_land(spark, tmp_path, pages):
    root = str(tmp_path / "t")
    t = snaptable.create(spark, root, pages, partition_cols=["day"])
    a = SnapshotTable(spark, root)
    b = SnapshotTable(spark, root)
    a.append(spark.createDataFrame(
        [Row(url="a", day="2024-01-01", text="a", score=1.0)]))
    b.append(spark.createDataFrame(
        [Row(url="b", day="2024-01-02", text="b", score=2.0)]))
    assert t.read().count() == 14
    assert t.current_version() == 3


def test_stale_pointer_recovers(spark, tmp_path, pages):
    """A crash between manifest create and pointer swap must not hide
    the committed version."""
    root = str(tmp_path / "t")
    t = snaptable.create(spark, root, pages, partition_cols=["day"])
    t.append(spark.createDataFrame(
        [Row(url="x", day="2024-01-01", text="y", score=0.0)]))
    with open(os.path.join(t.meta, "_current"), "w") as f:
        f.write("1")  # stale cache
    assert t.current_version() == 2
    assert t.read().count() == 13


def test_vacuum_removes_only_orphans(spark, tmp_path, pages):
    t = snaptable.create(spark, str(tmp_path / "t"), pages,
                         partition_cols=["day"])
    t.delete_where("score >= 10.0")
    # plant an orphan: a staged write whose commit never happened
    orphan_dir = os.path.join(t.data, "stage-orphan")
    pages.limit(1).write.parquet(orphan_dir)
    removed = t.vacuum()
    assert any("stage-orphan" in p for p in removed)
    # both versions still fully readable afterwards
    assert t.read(version=1).count() == 12
    assert t.read().count() == 10


def test_expire_snapshots_bounds_history_and_storage(
        spark, tmp_path, pages):
    t = snaptable.create(spark, str(tmp_path / "t"), pages,
                         partition_cols=["day"])
    t.delete_where("score >= 9.0")   # v2
    t.overwrite(pages.filter(F.col("score") < 5.0))  # v3: fresh files
    expired = t.expire_snapshots(keep_last=1)
    assert expired == [1, 2]
    # live version unaffected; expired versions are gone
    assert t.read().count() == 5
    with pytest.raises(ValueError, match="does not exist"):
        t.manifest(1)
    # v1/v2-only files were reclaimed by the implicit vacuum
    live = {fe["path"] for fe in t.manifest()["files"]}
    on_disk = set()
    for dirpath, _d, files in os.walk(t.data):
        for name in files:
            if name.endswith(".parquet"):
                on_disk.add(os.path.relpath(
                    os.path.join(dirpath, name), t.root))
    assert on_disk == live
    with pytest.raises(ValueError):
        t.expire_snapshots(keep_last=0)


def test_add_column_is_metadata_only_and_old_files_read_null(
        spark, tmp_path, pages):
    from pyspark.sql import types as T

    t = snaptable.create(spark, str(tmp_path / "t"), pages,
                         partition_cols=["day"])
    files_before = {fe["path"] for fe in t.manifest()["files"]}
    v = t.add_column("lang", T.StringType())
    # metadata-only: exact same data files
    assert {fe["path"] for fe in t.manifest(v)["files"]} == files_before
    got = t.read()
    assert got.schema["lang"].dataType == T.StringType()
    assert got.filter(F.col("lang").isNull()).count() == 12
    # appends now carry the column; mixed-era reads reconcile
    t.append(spark.createDataFrame(
        [Row(url="n", day="2024-01-01", text="x", score=1.0, lang="en")],
        schema=t.read().schema))
    mixed = t.read()
    assert mixed.count() == 13
    assert mixed.filter(F.col("lang") == "en").count() == 1
    # a delete that rewrites an OLD file keeps the evolved schema
    t.delete_where("score >= 11.0")
    assert t.read().schema["lang"].dataType == T.StringType()
    assert t.read().count() == 12
    # pre-evolution appends are now schema errors
    with pytest.raises(ValueError, match="does not match"):
        t.append(pages.limit(1))
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("lang", T.StringType())


def test_append_racing_add_column_keeps_evolved_schema(
        spark, tmp_path, pages):
    """An append whose commit retries past a concurrent add_column must
    inherit the head's EVOLVED schema, not stamp its stale capture back
    (which would silently revert the evolution for every reader).
    Simulated by replaying append's internals around an interleaved
    evolution commit."""
    from pyspark.sql import types as T

    root = str(tmp_path / "t")
    t = snaptable.create(spark, root, pages, partition_cols=["day"])
    m_stale = t.manifest()  # appender's read
    SnapshotTable(spark, root).add_column("lang", T.StringType())  # racer
    files = t._write_data_files(pages.limit(1), m_stale["partition_cols"])
    v = t._commit(files, "append", m_stale["schema"],
                  m_stale["partition_cols"], None)
    got = T.StructType.fromJson(json.loads(t.manifest(v)["schema"]))
    assert "lang" in [f.name for f in got.fields]
    assert t.read().count() == 13
    assert t.read().filter(F.col("lang").isNull()).count() == 13


def test_compact_preserves_rows(spark, tmp_path, pages):
    t = snaptable.create(spark, str(tmp_path / "t"), pages,
                         partition_cols=["day"])
    t.append(spark.createDataFrame(
        [Row(url="x", day="2024-01-01", text="y", score=0.0)]))
    v = t.compact()
    assert _rows(t.read(version=v)) == _rows(t.read(version=2))
    assert t.manifest(v)["operation"] == "compact"


def test_unpartitioned_table(spark, tmp_path, pages):
    t = snaptable.create(spark, str(tmp_path / "t"), pages.drop("day"))
    assert t.read().count() == 12
    t.delete_where("score = 0.0")
    assert t.read().count() == 11
    with pytest.raises(ValueError, match="partitioned"):
        t.overwrite_partitions(pages.drop("day"))


def test_null_partition_value_round_trips(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(url="a", day=None, text="x", score=1.0),
         Row(url="b", day="2024-01-01", text="y", score=2.0)])
    t = snaptable.create(spark, str(tmp_path / "t"), df,
                         partition_cols=["day"])
    got = t.read()
    assert got.filter(F.col("day").isNull()).count() == 1
    assert _rows(got) == _rows(df)
    pruned = t.read(partition_filter={"day": None})
    assert pruned.count() == 1 and pruned.first()["url"] == "a"


def test_snapshot_audit_sink_versions_every_flush(spark, tmp_path):
    from dqc_spark.audit import SnapshotAuditSink

    sink = SnapshotAuditSink(spark, str(tmp_path / "audit"))
    sink.log("check-unique", True, {"table": "pages"})
    sink.flush()
    v_after_first = sink._tbl().current_version()
    sink.log("check-not-null", False, {"table": "pages"}, error_count=3)
    sink.flush()
    assert sink.read().count() == 2
    # time travel: the audit table as of the first flush has one row
    assert sink.read_version(v_after_first).count() == 1
    # clear is a committed version, not an rm: history keeps everything
    sink.clear_logs()
    assert sink.read().count() == 0
    assert sink.read_version(v_after_first).count() == 1


def test_snapshot_audit_sink_survives_reopen(spark, tmp_path):
    from dqc_spark.audit import SnapshotAuditSink

    path = str(tmp_path / "audit")
    s1 = SnapshotAuditSink(spark, path)
    s1.log("check-enum", True, {})
    s1.flush()
    s2 = SnapshotAuditSink(spark, path)  # fresh handle, same table
    s2.log("check-regex", True, {})
    s2.flush()
    assert s2.read().count() == 2


def test_overwrite_replaces_whole_table_atomically(spark, tmp_path, pages):
    t = snaptable.create(spark, str(tmp_path / "t"), pages,
                         partition_cols=["day"])
    rebuilt = pages.filter(F.col("score") < 3.0)
    v = t.overwrite(rebuilt)
    assert _rows(t.read()) == _rows(rebuilt)
    assert t.read(version=1).count() == 12  # old corpus still readable
    assert t.manifest(v)["operation"] == "overwrite"
    # no file of v1 survives into the overwrite manifest
    v1_paths = {fe["path"] for fe in t.manifest(1)["files"]}
    assert not v1_paths & {fe["path"] for fe in t.manifest(v)["files"]}


def test_cli_curate_snapshot_output(capsys, spark, tmp_path):
    from dqc_spark import cli
    from dqc_spark.pagesgen import generate_pages
    from dqc_spark.snaptable import SnapshotTable

    src = str(tmp_path / "pages.parquet")
    out = str(tmp_path / "curated_snap")
    generate_pages(spark, 80, n_partitions=2).write.parquet(src)
    args = ["--db-path", str(tmp_path / "q.db"), "curate",
            "--input", src, "--output", out,
            "--near-dup-threshold", "-1",
            "--output-format", "snapshot"]
    rc = cli.main(args)
    assert rc == 0 and "curated" in capsys.readouterr().out
    t = SnapshotTable(spark, out)
    assert t.current_version() == 1
    n1 = t.read().count()
    assert n1 > 0
    # second run = version 2, atomically replacing version 1
    rc = cli.main(args)
    assert rc == 0
    capsys.readouterr()
    assert t.current_version() == 2
    assert t.read(version=1).count() == n1
    # incremental + snapshot is an explicit contract error
    import pytest as _pytest
    with _pytest.raises(SystemExit, match="not supported"):
        cli.main(args + ["--incremental"])


def test_cli_table_ops(capsys, spark, tmp_path, pages):
    from dqc_spark import cli

    root = str(tmp_path / "t")
    t = snaptable.create(spark, root, pages, partition_cols=["day"])
    t.append(pages.limit(2))
    db = str(tmp_path / "q.db")
    assert cli.main(["--db-path", db, "table-history",
                     "--table", root]) == 0
    out = capsys.readouterr().out
    assert "v1" in out and "append" in out
    assert cli.main(["--db-path", db, "table-compact",
                     "--table", root]) == 0
    assert "compacted to v3" in capsys.readouterr().out
    assert cli.main(["--db-path", db, "table-expire",
                     "--table", root, "--keep-last", "1"]) == 0
    assert "[1, 2]" in capsys.readouterr().out
    assert cli.main(["--db-path", db, "table-vacuum",
                     "--table", root]) == 0
    assert "orphan" in capsys.readouterr().out
    assert t.read().count() == 14
    with pytest.raises(SystemExit, match="no snapshot table"):
        cli.main(["--db-path", db, "table-history",
                  "--table", str(tmp_path / "nope")])


def test_run_resumable_snapshot_output(spark, tmp_path):
    """Resume semantics hold when the day-partitioned output is a
    snapshot table: each run's pending days land as ONE atomic
    overwrite_partitions commit, and a re-run after a lost completion
    record replaces only that day (new version, other days' files
    carried by reference)."""
    from dqc_spark.audit import ParquetAuditSink
    from dqc_spark.pagesgen import generate_pages
    from dqc_spark.resume import run_resumable
    from dqc_spark.snaptable import SnapshotTable

    pages = generate_pages(spark, 200, n_partitions=2)
    out = str(tmp_path / "out")
    audit = ParquetAuditSink(spark, str(tmp_path / "audit"))
    s1 = run_resumable(spark, pages, out, audit, run_group="g",
                       output_format="snapshot")
    assert s1["processed"] and not s1["skipped"]
    t = SnapshotTable(spark, out)
    assert t.current_version() == 1
    assert t.read().count() == 200

    # full rerun: nothing pending, no new commit
    s2 = run_resumable(spark, pages, out, audit, run_group="g",
                       output_format="snapshot")
    assert s2["processed"] == []
    assert t.current_version() == 1

    # drop one day's completion record -> only that day recommits
    lost = s1["processed"][-1]
    audit2_path = str(tmp_path / "audit2")
    audit.read().filter(~(F.col("params")["day"] == lost)) \
        .write.parquet(audit2_path)
    audit2 = ParquetAuditSink(spark, audit2_path)
    s3 = run_resumable(spark, pages, out, audit2, run_group="g",
                       output_format="snapshot")
    assert s3["processed"] == [lost]
    assert t.current_version() == 2
    assert t.read().count() == 200  # still complete, no duplicate days
    # untouched days' files carried by reference into v2
    v1_untouched = {fe["path"] for fe in t.manifest(1)["files"]
                    if fe["partition"].get("day") != lost}
    v2_paths = {fe["path"] for fe in t.manifest(2)["files"]}
    assert v1_untouched <= v2_paths

    with pytest.raises(ValueError, match="unknown output_format"):
        run_resumable(spark, pages, out, audit, run_group="g",
                      output_format="csv")


def test_manifest_counts_match_data(spark, tmp_path, pages):
    t = snaptable.create(spark, str(tmp_path / "t"), pages,
                         partition_cols=["day"])
    m = t.manifest()
    assert sum(fe["rows"] for fe in m["files"]) == 12
    # manifest is valid JSON on disk with relative paths only
    with open(t._manifest_path(1)) as f:
        raw = json.load(f)
    assert all(not fe["path"].startswith("/") for fe in raw["files"])


# -- diff_versions -----------------------------------------------------------


def test_diff_versions_add_remove_change(spark, tmp_path, pages):
    t = snaptable.create(spark, str(tmp_path / "t"), pages,
                         partition_cols=["day"])
    # v2: delete urls 0-2, upsert url 3 (changed) + a brand-new url,
    # leave 4-11 untouched
    t.delete_where("url IN ('http://ex.com/0', 'http://ex.com/1', "
                   "'http://ex.com/2')")
    t.merge_upsert(
        spark.createDataFrame([
            Row(url="http://ex.com/3", day="2024-01-01",
                text="doc 3 EDITED", score=3.0),
            Row(url="http://ex.com/new", day="2024-01-04",
                text="new doc", score=99.0),
        ]),
        ["url"])
    d = {r["url"]: (r["change"], r["n_from"], r["n_to"])
         for r in t.diff_versions(["url"], 1).collect()}
    assert d == {
        "http://ex.com/0": ("removed", 1, None),
        "http://ex.com/1": ("removed", 1, None),
        "http://ex.com/2": ("removed", 1, None),
        "http://ex.com/3": ("changed", 1, 1),
        "http://ex.com/new": ("added", None, 1),
    }
    # same version -> empty; explicit v_to pins the other endpoint
    assert t.diff_versions(["url"], 1, v_to=1).count() == 0
    assert {r["change"] for r in t.diff_versions(["url"], 2, 3).collect()
            } == {"changed", "added"}


def test_diff_versions_added_column_alone_is_not_a_change(
        spark, tmp_path, pages):
    from pyspark.sql import types as T

    t = snaptable.create(spark, str(tmp_path / "t"), pages,
                         partition_cols=["day"])
    t.add_column("ppl", T.DoubleType())
    # schema evolution only: no row is added/removed/changed
    assert t.diff_versions(["url"], 1).count() == 0
    # but a row whose NEW column gets a value IS changed vs the
    # post-evolution version (both versions carry the column then)
    t.merge_upsert(
        spark.createDataFrame(
            [Row(url="http://ex.com/5", day="2024-01-03",
                 text="doc 5", score=5.0, ppl=1.5)]),
        ["url"])
    d = {r["url"]: r["change"]
         for r in t.diff_versions(["url"], 2).collect()}
    assert d == {"http://ex.com/5": "changed"}


def test_diff_versions_duplicate_and_null_keys(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(k="a", v=1), Row(k="a", v=2), Row(k=None, v=3)],
        "k string, v int")
    t = snaptable.create(spark, str(tmp_path / "t"), df)
    # v2: one of the duplicate-key rows changes value; NULL key removed
    t.overwrite(spark.createDataFrame(
        [Row(k="a", v=1), Row(k="a", v=9)], "k string, v int"))
    d = {r["k"]: (r["change"], r["n_from"], r["n_to"])
         for r in t.diff_versions(["k"], 1).collect()}
    assert d == {"a": ("changed", 2, 2), None: ("removed", 1, None)}
    with pytest.raises(ValueError, match="key column"):
        t.diff_versions(["nope"], 1)


def test_rollback_is_metadata_only_and_survives_expiry(
        spark, tmp_path, pages):
    t = snaptable.create(spark, str(tmp_path / "t"), pages,
                         partition_cols=["day"])
    t.delete_where("url = 'http://ex.com/0'")  # v2: the "bad run"
    v1_files = {fe["path"] for fe in t.manifest(1)["files"]}
    v3 = t.rollback(1)
    assert v3 == 3
    # contents restored, nothing rewritten (same files by reference)
    assert _rows(t.read()) == _rows(pages)
    assert {fe["path"] for fe in t.manifest(3)["files"]} == v1_files
    assert t.history()[-1]["props"] == {"rollback_of": "1"}
    # the bad version stays time-travelable
    assert t.read(version=2).count() == 11
    # rollback to current / to a missing version rejected loudly
    with pytest.raises(ValueError, match="already the current"):
        t.rollback(3)
    with pytest.raises(ValueError, match="does not exist"):
        t.rollback(99)
    # expiring v1+v2 must NOT reclaim files v3 re-references
    t.expire_snapshots(keep_last=1)
    assert _rows(t.read()) == _rows(pages)


def test_diff_versions_model_over_random_op_sequence(spark, tmp_path):
    """Model-based: a deterministic pseudo-random sequence of
    append/delete/merge/overwrite commits, mirrored in a plain python
    dict per version; diff_versions between every sampled version pair
    must equal the model's set difference."""
    import random

    rng = random.Random(41)

    def frame(d):
        return spark.createDataFrame(
            [Row(k=k, v=v) for k, v in sorted(d.items())],
            "k string, v long")

    state = {f"k{i}": i for i in range(12)}
    t = snaptable.create(spark, str(tmp_path / "t"), frame(state))
    models = {1: dict(state)}
    next_key = 12
    for _ in range(5):
        op = rng.choice(["append", "delete", "merge", "overwrite"])
        if op == "append":
            add = {f"k{next_key + j}": next_key + j for j in range(3)}
            next_key += 3
            t.append(frame(add))
            state.update(add)
        elif op == "delete" and state:
            mod = rng.randrange(2, 5)
            gone = [k for k in state if int(k[1:]) % mod == 0]
            t.delete_where(f"CAST(substring(k, 2) AS INT) % {mod} = 0")
            for k in gone:
                del state[k]
        elif op == "merge" and state:
            upd = {k: state[k] + 1000 for k in sorted(state)[:4]}
            ins = {f"k{next_key}": next_key}
            next_key += 1
            t.merge_upsert(frame({**upd, **ins}), ["k"])
            state.update(upd)
            state.update(ins)
        else:
            state = {k: v * 7 for k, v in list(state.items())[:8]}
            t.overwrite(frame(state))
        models[t.current_version()] = dict(state)

    versions = sorted(models)
    pairs = [(versions[0], versions[-1]),
             (versions[1], versions[-2] if len(versions) > 2 else versions[-1]),
             (versions[-2], versions[-1])]
    for va, vb in pairs:
        if va >= vb:
            continue
        a, b = models[va], models[vb]
        expect = {}
        for k in set(a) - set(b):
            expect[k] = "removed"
        for k in set(b) - set(a):
            expect[k] = "added"
        for k in set(a) & set(b):
            if a[k] != b[k]:
                expect[k] = "changed"
        got = {r["k"]: r["change"]
               for r in t.diff_versions(["k"], va, vb).collect()}
        assert got == expect, (va, vb)

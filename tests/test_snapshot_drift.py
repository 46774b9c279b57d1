"""Per-source snapshot drift report (snapshot.snapshot_drift):
side-by-side counts/volumes with deltas, groups present on only one
side, NULL-group folding, and the metadata-sized plan shape."""

from pyspark.sql import functions as F

from dqc_spark.snapshot import snapshot_drift


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, source string, text string")


def test_drift_counts_and_deltas(spark):
    prev = _df(spark, [
        (1, "wiki", "aaaa"), (2, "wiki", "bb"), (3, "web", "cccccc"),
        (4, "news", "dd"),
    ])
    cur = _df(spark, [
        (1, "wiki", "aaaa"), (5, "wiki", "eee"), (6, "wiki", "f"),
        (7, "forum", "gggg"),                      # new source
        # "news" vanished; "web" shrank to zero docs too
    ])
    got = {r["source"]: r for r in snapshot_drift(cur, prev).collect()}
    assert set(got) == {"wiki", "web", "news", "forum"}
    w = got["wiki"]
    assert (w["n_docs_prev"], w["n_docs_cur"]) == (2, 3)
    assert (w["n_chars_prev"], w["n_chars_cur"]) == (6, 8)
    assert (w["docs_delta"], w["chars_delta"]) == (1, 2)
    assert got["forum"]["n_docs_prev"] == 0
    assert got["forum"]["docs_delta"] == 1
    assert got["news"]["n_docs_cur"] == 0
    assert got["news"]["docs_delta"] == -1
    assert got["web"]["chars_delta"] == -6


def test_null_group_folds_to_one_row(spark):
    prev = _df(spark, [(1, None, "xx")])
    cur = _df(spark, [(2, None, "yyy"), (3, None, "z")])
    rows = snapshot_drift(cur, prev).collect()
    assert len(rows) == 1 and rows[0]["source"] == "<null>"
    assert rows[0]["n_docs_prev"] == 1 and rows[0]["n_docs_cur"] == 2
    assert rows[0]["chars_delta"] == 2


def test_null_text_counts_zero_chars(spark):
    prev = _df(spark, [])
    cur = _df(spark, [(1, "wiki", None)])
    r = snapshot_drift(cur, prev).collect()[0]
    assert r["n_docs_cur"] == 1 and r["n_chars_cur"] == 0


def test_plan_never_shuffles_text(spark):
    prev = _df(spark, [(1, "wiki", "aaaa")])
    cur = _df(spark, [(2, "wiki", "bb")])
    plan = snapshot_drift(cur, prev)._jdf.queryExecution() \
        .optimizedPlan().toString()
    # column pruning: doc_id may appear only in the in-memory leaf
    # relations (LogicalRDD can't prune); every operator above must
    # have dropped it, so the join carries per-group aggregates only
    for line in plan.splitlines():
        if "doc_id" in line:
            assert "LogicalRDD" in line, line


# ---------------------------------------------------------------------------
# cross-source duplicate overlap
# ---------------------------------------------------------------------------


def test_source_overlap_matrix(spark):
    from dqc_spark.snapshot import source_overlap

    rows = [
        ("a", "shared-1"), ("a", "shared-2"), ("a", "only-a"),
        ("b", "shared-1"), ("b", "shared-2"), ("b", "shared-3"),
        ("c", "shared-3"), ("c", "only-c"),
        # duplicate copies within one source must not inflate the count
        ("b", "shared-1"),
        # NULL source folds to '<null>'; NULL text is one content group
        (None, "shared-1"), (None, None), ("a", None),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {(r["source_a"], r["source_b"]): r["n_shared"]
           for r in source_overlap(df).collect()}
    assert got == {
        ("a", "b"): 2,            # shared-1, shared-2
        ("b", "c"): 1,            # shared-3
        ("<null>", "a"): 2,       # shared-1 + the NULL-text content
        ("<null>", "b"): 1,       # shared-1
    }


def test_source_overlap_empty_and_disjoint(spark):
    from dqc_spark.snapshot import source_overlap

    disjoint = spark.createDataFrame(
        [("a", "x"), ("b", "y")], "source string, text string")
    assert source_overlap(disjoint).count() == 0
    empty = disjoint.limit(0)
    assert source_overlap(empty).count() == 0

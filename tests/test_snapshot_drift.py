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


# ---------------------------------------------------------------------------
# PSI score-distribution drift
# ---------------------------------------------------------------------------


def test_score_drift_psi_math(spark):
    import math

    import pytest

    from dqc_spark.snapshot import score_drift

    prev = spark.createDataFrame([(v,) for v in [50, 150, 150, 250, 250]],
                                 "v long")
    cur = spark.createDataFrame([(v,) for v in [50, 250, 250, 250, None]],
                                "v long")
    rows = {r["bucket"]: r for r in
            score_drift(cur, prev, "v", [100.0, 200.0]).collect()}
    # buckets: -1 NULL, 0 (<100), 1 ([100,200)), 2 (>=200)
    assert set(rows) == {-1, 0, 1, 2}
    assert (rows[1]["n_cur"], rows[1]["n_prev"]) == (0, 2)
    assert (rows[-1]["n_cur"], rows[-1]["n_prev"]) == (1, 0)
    # bucket bounds
    assert rows[0]["lo"] is None and rows[0]["hi"] == 100.0
    assert rows[1]["lo"] == 100.0 and rows[1]["hi"] == 200.0
    assert rows[2]["lo"] == 200.0 and rows[2]["hi"] is None
    # hand-computed smoothed PSI terms (B=4 buckets incl. NULL -> +4)
    for b in rows:
        pc = (rows[b]["n_cur"] + 1) / (5 + 4)
        pp = (rows[b]["n_prev"] + 1) / (5 + 4)
        want = (pc - pp) * math.log(pc / pp)
        assert rows[b]["psi_term"] == pytest.approx(want, rel=1e-12), b
    # identical distributions -> PSI == 0 exactly
    same = score_drift(prev, prev, "v", [100.0, 200.0])
    assert all(r["psi_term"] == 0.0 for r in same.collect())


def test_score_drift_validation_and_one_sided(spark):
    import pytest

    from dqc_spark.snapshot import score_drift

    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError):
        score_drift(df, df, "v", [])
    with pytest.raises(ValueError):
        score_drift(df, df, "v", [5.0, 1.0])  # not ascending
    # a bucket present only on one side still reports (full outer)
    a = spark.createDataFrame([(500,)], "v long")
    b = spark.createDataFrame([(5,)], "v long")
    got = {r["bucket"]: r for r in
           score_drift(a, b, "v", [100.0]).collect()}
    assert got[0]["n_cur"] == 0 and got[0]["n_prev"] == 1
    assert got[1]["n_cur"] == 1 and got[1]["n_prev"] == 0


def test_score_drift_reports_buckets_empty_in_both(spark):
    import math

    import pytest

    from dqc_spark.snapshot import score_drift

    # all values land in bucket 0 on both sides, with DIFFERENT totals:
    # buckets -1 and 1 are empty in both snapshots but their smoothed
    # terms carry real PSI mass and must still report (review finding —
    # the observed-buckets-only join dropped them)
    cur = spark.createDataFrame([(v,) for v in [1] * 10], "v long")
    prev = spark.createDataFrame([(v,) for v in [2] * 5], "v long")
    rows = {r["bucket"]: r for r in
            score_drift(cur, prev, "v", [100.0]).collect()}
    assert set(rows) == {-1, 0, 1}
    for b in (-1, 1):
        assert (rows[b]["n_cur"], rows[b]["n_prev"]) == (0, 0)
        pc, pp = 1 / 13, 1 / 8
        want = round((pc - pp) * math.log(pc / pp), 12)
        assert rows[b]["psi_term"] == pytest.approx(want, rel=1e-9), b
    # proportions sum to 1 on each side across the full spine
    assert sum(r["p_cur"] for r in rows.values()) == pytest.approx(1.0)
    assert sum(r["p_prev"] for r in rows.values()) == pytest.approx(1.0)

"""Bucketized PR curve vs a pure-Python reference."""

import pytest
from pyspark.sql import functions as F

from dqc_spark.evalmetrics import pr_curve


def _py_pr(rows, buckets, lo=0.0, hi=1.0):
    per = {}
    for s, y in rows:
        b = min(buckets - 1, max(0, int((s - lo) * buckets / (hi - lo))))
        n, p = per.get(b, (0, 0))
        per[b] = (n + 1, p + y)
    total_pos = sum(p for _, p in per.values())
    out = {}
    for b in per:
        cn = sum(n for bb, (n, _) in per.items() if bb >= b)
        cp = sum(p for bb, (_, p) in per.items() if bb >= b)
        out[b] = (per[b][0], per[b][1], cn, cp, cp / cn, cp / total_pos)
    return out


def test_pr_curve_matches_python(spark):
    rows = [
        (0.95, 1), (0.9, 1), (0.85, 0), (0.7, 1), (0.65, 1), (0.6, 0),
        (0.4, 0), (0.35, 1), (0.2, 0), (0.05, 0), (1.2, 1), (-0.1, 0),
    ]
    df = spark.createDataFrame(rows, "score double, label int")
    got = {
        r["bucket"]: (r["n"], r["n_pos"], r["cum_n"], r["cum_pos"],
                      r["precision"], r["recall"])
        for r in pr_curve(df, "score", "label", buckets=10).collect()
    }
    # out-of-range scores clip into the edge buckets
    want = _py_pr([(min(max(s, 0.0), 0.999), y) for s, y in rows], 10)
    assert set(got) == set(want)
    for b in want:
        assert got[b][:4] == want[b][:4], b
        assert got[b][4] == pytest.approx(want[b][4])
        assert got[b][5] == pytest.approx(want[b][5])
    # monotonicity: recall never decreases as the threshold lowers
    by_thr = sorted(got.items(), key=lambda kv: -kv[0])
    recalls = [v[5] for _, v in by_thr]
    assert recalls == sorted(recalls)
    # the lowest bucket's cutoff keeps everything: recall 1.0
    assert recalls[-1] == pytest.approx(1.0)


def test_pr_curve_plan_no_window(spark):
    df = spark.range(1000).select(
        (F.col("id") / 1000).alias("score"), (F.col("id") % 2).alias("label")
    )
    plan = pr_curve(df, "score", "label")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # cumulative via triangular join, not a window


def test_pr_curve_null_scores_excluded_and_zero_positives(spark):
    df = spark.createDataFrame(
        [(0.9, 1), (None, 1), (0.1, 0)], "score double, label int"
    )
    rows = pr_curve(df, "score", "label", buckets=10).collect()
    # the NULL-score positive is excluded entirely (not bucket 0)
    assert sum(r["n"] for r in rows) == 2
    assert {r["bucket"] for r in rows} == {1, 9}
    # zero positive labels -> recall 0.0, never NULL
    z = spark.createDataFrame([(0.5, 0), (0.7, 0)], "score double, label int")
    zr = pr_curve(z, "score", "label", buckets=10).collect()
    assert all(r["recall"] == 0.0 for r in zr)


def test_pr_curve_null_labels_count_as_negatives(spark):
    # an all-NULL-label bucket must not poison n_pos/cum_pos/precision
    # with NULL: NULL labels coalesce to 0 (negative)
    rows = [(0.9, 1), (0.85, None), (0.8, None),   # bucket 8: all-NULL tail
            (0.3, 1), (0.2, 0)]
    df = spark.createDataFrame(rows, "score double, label int")
    got = {r["bucket"]: r for r in
           pr_curve(df, "score", F.col("label") == 1, buckets=10).collect()}
    for r in got.values():
        assert r["n_pos"] is not None and r["precision"] is not None
        assert r["recall"] is not None
    # bucket 8 holds only the two NULL-label rows -> 0 positives, and the
    # cumulative stats from bucket 9 still flow through it un-NULLed
    assert got[8]["n_pos"] == 0 and got[8]["cum_pos"] == 1
    assert got[8]["precision"] == pytest.approx(1 / 3)
    assert got[3]["cum_pos"] == 2 and got[3]["recall"] == 1.0


def test_choose_threshold(spark):
    from dqc_spark.evalmetrics import choose_threshold

    rows = [
        # (bucket, threshold, precision, recall, cum_n)
        (0, 0.00, 0.40, 1.00, 100),
        (1, 0.25, 0.50, 0.80, 70),
        (2, 0.50, 0.50, 0.80, 60),   # same PR point, tighter cut
        (3, 0.75, 0.90, 0.30, 20),
    ]
    curve = spark.createDataFrame(
        rows, "bucket int, threshold double, precision double, "
              "recall double, cum_n bigint")
    # max recall meeting the bound; tie -> LOWER threshold (more data)
    pick = choose_threshold(curve, 0.5).collect()
    assert len(pick) == 1
    assert pick[0]["threshold"] == 0.25 and pick[0]["recall"] == 0.80
    # tighter bound moves the cut up
    assert choose_threshold(curve, 0.9).collect()[0]["threshold"] == 0.75
    # impossible bound -> EMPTY, not NaN
    assert choose_threshold(curve, 0.99).count() == 0

"""Range-join and rollup-hierarchy semantics (dqc_spark.temporal)."""

import datetime as dt

from pyspark.sql import functions as F

from dqc_spark.temporal import range_join, rollup_hierarchy


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _mk(spark):
    pts = spark.createDataFrame(
        [(1, "u", _ts(10)), (2, "u", _ts(11, 30)), (3, "u", _ts(23)),
         (4, "v", _ts(10)), (5, "w", _ts(10))],
        "id long, k string, t timestamp",
    )
    iv = spark.createDataFrame(
        [("u", _ts(10), _ts(12), "a"),      # contains 1, 2 (boundary incl.)
         ("u", _ts(11), _ts(11, 45), "b"),  # contains 2 only
         ("u", _ts(23), _ts(22), "bad"),    # inverted -> matches nothing
         ("v", _ts(9), _ts(10), "c")],      # boundary end == point
        "k string, s timestamp, e timestamp, tag string",
    )
    return pts, iv


def test_range_join_inner_matches_model(spark):
    pts, iv = _mk(spark)
    got = sorted(
        (r.id, r.tag)
        for r in range_join(pts, iv, "t", "s", "e", by="k").collect()
    )
    assert got == [(1, "a"), (2, "a"), (2, "b"), (4, "c")]


def test_range_join_left_keeps_unmatched(spark):
    pts, iv = _mk(spark)
    got = sorted(
        (r.id, r.tag)
        for r in range_join(pts, iv, "t", "s", "e", by="k", how="left").collect()
    )
    assert got == [(1, "a"), (2, "a"), (2, "b"), (3, None), (4, "c"), (5, None)]


def test_range_join_interval_spanning_many_buckets(spark):
    # a 3-day interval with a tiny bucket must still match exactly once
    pts = spark.createDataFrame(
        [(1, "u", dt.datetime(2024, 1, 2, 5))], "id long, k string, t timestamp"
    )
    iv = spark.createDataFrame(
        [("u", dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 4), "long")],
        "k string, s timestamp, e timestamp, tag string",
    )
    out = range_join(pts, iv, "t", "s", "e", by="k", bucket_seconds=600)
    assert [(r.id, r.tag) for r in out.collect()] == [(1, "long")]


def test_rollup_hierarchy_composes(spark, sf_dir):
    import os

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    levels = rollup_hierarchy(ev, "ts", "value", dims=["event_type"])
    # every level must equal a direct groupBy of the raw data
    for grain in ("hour", "day", "month"):
        direct = ev.groupBy(
            F.date_trunc(grain, "ts").alias("bucket_ts"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        lvl = levels[grain].select(
            "bucket_ts", "event_type", "n",
            F.round("sum_value", 6).alias("sum_value"),
            "min_value", "max_value",
        )
        d = direct.select(
            "bucket_ts", "event_type", "n",
            F.round("sum_value", 6).alias("sum_value"),
            "min_value", "max_value",
        )
        assert lvl.exceptAll(d).count() == 0 and d.exceptAll(lvl).count() == 0


def test_range_join_no_nested_loop_plan(spark):
    pts, iv = _mk(spark)
    p = (
        range_join(pts, iv, "t", "s", "e", by="k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_range_join_left_null_payload_no_duplicates(spark):
    # regression: a matched point carrying a NULL non-key column must NOT
    # also reappear as a spurious unmatched row (the old anti-join used
    # null-unsafe equality)
    pts = spark.createDataFrame(
        [(1, "u", _ts(10), None), (2, "x", _ts(10), "n")],
        "id long, k string, t timestamp, note string",
    )
    iv = spark.createDataFrame(
        [("u", _ts(9), _ts(12), "a")],
        "k string, s timestamp, e timestamp, tag string",
    )
    got = sorted(
        (r.id, r.note, r.tag)
        for r in range_join(pts, iv, "t", "s", "e", by="k", how="left").collect()
    )
    assert got == [(1, None, "a"), (2, "n", None)]


def test_range_join_rejects_column_collision(spark):
    import pytest as _pytest

    pts = spark.createDataFrame([(1, "u", _ts(10), "x")],
                                "id long, k string, t timestamp, tag string")
    iv = spark.createDataFrame([("u", _ts(9), _ts(12), "a")],
                               "k string, s timestamp, e timestamp, tag string")
    with _pytest.raises(ValueError, match="collision"):
        range_join(pts, iv, "t", "s", "e", by="k")

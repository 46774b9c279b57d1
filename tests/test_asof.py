"""As-of join semantics (dqc_spark.asof) vs a pure-Python model."""

import datetime as dt

from pyspark.sql import functions as F

from dqc_spark.asof import asof_join


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10)), (2, "u", _ts(12)), (3, "u", _ts(9)),
         (4, "v", _ts(11)), (5, "w", _ts(11))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _ts(10), 100.0), ("u", _ts(11), 110.0), ("v", _ts(11), 200.0)],
        "k string, ts timestamp, px double",
    )
    got = {
        r.id: r.asof_px
        for r in asof_join(left, right, on="ts", by="k",
                           right_cols=["px"]).collect()
    }
    assert got == {
        1: 100.0,   # exact-ts match is inclusive
        2: 110.0,   # latest at-or-before wins
        3: None,    # nothing at-or-before
        4: 200.0,
        5: None,    # key never on the right
    }


def test_asof_forward_basic(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10)), (2, "u", _ts(12))], "id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", _ts(11), 1.0), ("u", _ts(13), 2.0)],
        "k string, ts timestamp, px double",
    )
    got = {
        r.id: r.asof_px
        for r in asof_join(left, right, on="ts", by="k", right_cols=["px"],
                           direction="forward").collect()
    }
    assert got == {1: 1.0, 2: 2.0}


def test_asof_matches_python_model_on_events(spark, sf_dir):
    import os

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts").agg(F.max("value").alias("value"))
    )
    got = {
        r.event_id: (r.asof_ts, r.asof_value)
        for r in asof_join(clicks, purch, on="ts", by="user_id",
                           right_cols=["ts", "value"]).collect()
    }
    # python model
    rights = {}
    for r in purch.collect():
        rights.setdefault(r.user_id, []).append((r.ts, r.value))
    for v in rights.values():
        v.sort()
    import bisect

    for c in clicks.collect():
        cand = rights.get(c.user_id, [])
        i = bisect.bisect_right([t for t, _ in cand], c.ts)
        want = cand[i - 1] if i else (None, None)
        assert got[c.event_id] == want, c.event_id


def test_asof_single_shuffle_plan(spark):
    left = spark.createDataFrame([(1, "u", _ts(10))], "id long, k string, ts timestamp")
    right = spark.createDataFrame([("u", _ts(9), 1.0)], "k string, ts timestamp, px double")
    p = (
        asof_join(left, right, on="ts", by="k", right_cols=["px"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one hash partition on the key for the window; union sides shuffle
    # into it — no range/cross join anywhere
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_asof_null_timestamps_never_match(spark):
    # NULL `on` values have no defined temporal position: a NULL-ts right
    # row must never be carried, and a NULL-ts left row gets no match
    # (DuckDB ASOF / pandas merge_asof semantics)
    left = spark.createDataFrame(
        [(1, "u", _ts(8)), (2, "u", None), (3, "u", _ts(12))],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", None, 999.0), ("u", _ts(10), 100.0)],
        "k string, ts timestamp, px double",
    )
    got = {
        r.id: r.asof_px
        for r in asof_join(left, right, on="ts", by="k",
                           right_cols=["px"]).collect()
    }
    assert got == {1: None, 2: None, 3: 100.0}
    gotf = {
        r.id: r.asof_px
        for r in asof_join(left, right, on="ts", by="k", right_cols=["px"],
                           direction="forward").collect()
    }
    assert gotf == {1: 100.0, 2: None, 3: None}

"""metric_anomalies / audit_anomalies: differential vs a pure-python
median/MAD model, NULL and constant-series edges, and the audit-table
composition (a planted regression run flags, healthy history doesn't)."""

import statistics

import pytest
from pyspark.sql import functions as F

from dqc_spark.monitor import audit_anomalies, metric_anomalies


def _model(rows, k=3):
    """Independent python model: rows = [(group, value)] ->
    {(group, value_index): (med, mad, score, flag)} keyed per row."""
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    out = []
    for g, v in rows:
        vals = [x for x in by_g[g] if x is not None]
        med = statistics.median(vals) if vals else None
        mad = (
            statistics.median([abs(x - med) for x in vals])
            if vals else None
        )
        if v is None or med is None:
            out.append((g, v, med, mad, None, False))
            continue
        dev = abs(v - med)
        score = dev / mad if mad else None
        out.append((g, v, med, mad, score, bool(mad is not None
                                                and dev > k * mad)))
    return out


def test_matches_python_model(spark):
    rows = [
        ("a", 10), ("a", 12), ("a", 11), ("a", 10), ("a", 900),
        ("b", 5), ("b", 5), ("b", 5), ("b", 5),          # constant
        ("c", 1), ("c", None), ("c", 2), ("c", 100),     # with NULL
    ]
    df = spark.createDataFrame(
        [(g, v) for g, v in rows], "g string, value long")
    got = metric_anomalies(df, ["g"], "value", k=3).collect()
    want = {(g, v): (med, mad, score, flag)
            for g, v, med, mad, score, flag in _model(rows)}
    assert len(got) == len(rows)
    for r in got:
        med, mad, score, flag = want[(r.g, r.value)]
        assert r.med == med and r.mad == mad
        if score is None:
            assert r.score is None
        else:
            assert r.score == pytest.approx(score)
        assert r.is_anomaly == flag


def test_constant_series_deviation_flags(spark):
    # mad = 0: any deviation at all is an anomaly (dev > 0 = k*0),
    # score is NULL (undefined ratio), the constant rows don't flag
    df = spark.createDataFrame(
        [("x", 7)] * 6 + [("x", 8)], "g string, value long")
    got = {r.value: r for r in
           metric_anomalies(df, ["g"], "value", k=3).collect()}
    assert got[8].is_anomaly and got[8].score is None
    assert not got[7].is_anomaly


def test_null_value_never_flags(spark):
    df = spark.createDataFrame(
        [("x", 1), ("x", 2), ("x", None)], "g string, value long")
    got = {(r.value,): r for r in
           metric_anomalies(df, ["g"], "value").collect()}
    assert got[(None,)].is_anomaly is False


def test_approx_path_agrees_on_small_groups(spark):
    # percentile_approx at accuracy 10000 is exact for tiny groups ->
    # identical flags; pins that the approx branch stays wired
    df = spark.createDataFrame(
        [("a", v) for v in (10, 11, 12, 10, 500)],
        "g string, value long")
    exact = metric_anomalies(df, ["g"], "value").collect()
    approx = metric_anomalies(df, ["g"], "value", approx=True).collect()
    assert ({(r.value, r.is_anomaly) for r in exact}
            == {(r.value, r.is_anomaly) for r in approx})


def test_float_k_not_truncated(spark):
    """The documented float-k escape hatch is honored as-is, never
    int-truncated: a row at 2.2 MADs flags at k=2 but NOT at k=2.5
    (int(2.5)==2 would flag it)."""
    # sorted: 9,9,10,10,11,11,12.2 -> med=10; devs sorted:
    # 0,0,1,1,1,1,2.2 -> mad=1; dev(12.2)=2.2 MADs
    vals = [10.0, 9.0, 11.0, 9.0, 11.0, 10.0, 12.2]
    df = spark.createDataFrame([("g", v) for v in vals],
                               "g string, value double")
    got2 = {r.value: r.is_anomaly for r in
            metric_anomalies(df, ["g"], "value", k=2).collect()}
    got25 = {r.value: r.is_anomaly for r in
             metric_anomalies(df, ["g"], "value", k=2.5).collect()}
    assert got2[12.2] is True       # 2.2 > 2*1
    assert got25[12.2] is False     # 2.2 < 2.5*1 — int(2.5) would flag


def test_requires_group_cols(spark):
    df = spark.createDataFrame([("a", 1)], "g string, value long")
    with pytest.raises(ValueError):
        metric_anomalies(df, [], "value")


def test_audit_anomalies_flags_regression_run(spark):
    # 6 healthy runs of two checks + one run where check-unique blows
    # up: exactly that (run, check) row flags
    rows = []
    for i in range(6):
        rows.append((f"r{i}", "check-unique", 200 + (i % 3)))
        rows.append((f"r{i}", "check-not-null", 0))
    rows.append(("r6", "check-unique", 40000))
    rows.append(("r6", "check-not-null", 0))
    audit = spark.createDataFrame(
        rows, "run_id string, check_type string, error_count long")
    got = audit_anomalies(audit, k=3)
    flagged = [(r.run_id, r.check_type)
               for r in got.filter("is_anomaly").collect()]
    assert flagged == [("r6", "check-unique")]
    # the all-zero not-null history never flags (constant series, 0 dev)
    nn = got.filter(F.col("check_type") == "check-not-null")
    assert nn.filter("is_anomaly").count() == 0


def test_metric_anomalies_rejects_stat_name_collision(spark):
    """Input columns named med/mad/score/is_anomaly would go ambiguous
    inside the stat joins — rejected loudly at the API boundary."""
    import pytest as _pytest

    from dqc_spark.monitor import metric_anomalies

    df = spark.createDataFrame([("a", 1.0, 2.0)], "g string, v double, med double")
    with _pytest.raises(ValueError, match="med"):
        metric_anomalies(df, ["g"], "v")

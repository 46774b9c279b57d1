"""Cross-run metric anomaly detection over audit/metric time-series.

The reference logs one row per check run into SQLite
(``internal/db/connector.go:67``) and stops there — a human reads
``show-logs``.  At 10^12-doc scale nobody reads per-run logs; the
useful operation is the one deequ calls *anomaly detection*: compare
each run's metric against the HISTORY of the same metric and flag runs
that deviate.  This module implements the robust (median/MAD) version
of that over any (group, value) series — audit ``error_count`` per
``check_type`` across runs, daily event volumes per type, per-source
keep-rates across snapshots.

Design for scale:

* The input is an already-aggregated metric frame (one row per
  group×run/day), so it is SMALL by construction — millions of rows at
  the very worst, never corpus-sized.  Exact ``F.median`` is therefore
  fine here even though it forces ObjectHashAggregate (the CLAUDE.md
  perf note); ``approx=True`` switches to ``percentile_approx`` for
  callers who feed genuinely huge series.
* Two grouped aggregates (median, then median-absolute-deviation —
  MAD needs the median first, so one pass cannot do both) and two
  joins back.  The per-group stats frames are one-row-per-group →
  always broadcast, so the series frame never shuffles at all.
* No window functions: a global/per-group window over run history
  would single-thread the hot group; grouped aggregates keep partial
  aggregation and AQE skew handling.

Cross-engine notes (for the SQL differential): medians of integer
series are exact binary fractions (x.0/x.5) in both Spark and DuckDB
(both interpolate, both return DOUBLE — verified), so ``dev > k*mad``
with integer ``k`` compares identical doubles and the flag is
engine-stable.  ``score = dev/mad`` is a quotient of identical doubles
(raw-comparable; entry queries still FLOOR-truncate per the repo's
rounding-mode rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["metric_anomalies", "audit_anomalies"]


def metric_anomalies(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 3,
    approx: bool = False,
) -> DataFrame:
    """Flag rows whose ``value_col`` deviates from its group's median
    by more than ``k`` median-absolute-deviations.

    Returns the input rows plus ``med`` (group median), ``mad``
    (median absolute deviation), ``score`` (dev/mad; NULL when the
    group's MAD is 0 — a constant series, where any deviation at all
    is already flagged) and ``is_anomaly``.  NULL values are never
    anomalies (their deviation is NULL → predicate NULL → false), and
    they are ignored by both medians (Spark and DuckDB medians skip
    NULLs identically).

    ``k`` is kept integer so the threshold product ``k * mad`` is
    bit-identical across engines (mad is an exact binary fraction for
    integer series); pass a float only if you accept engine-boundary
    wobble in a hand-run comparison (the float is honored as-is, never
    truncated).

    The input is consumed by four plan branches (median agg, join,
    MAD agg, final join), so it is persisted via ``cache.track()`` —
    without it a UDF-derived input's Python stage would re-run per
    branch (the repo's multi-consumer rule); call
    ``cache.release_all()`` when a batch of results is materialized.
    """
    if not group_cols:
        raise ValueError("metric_anomalies needs at least one group column")
    clash = {"med", "mad", "score", "is_anomaly"} & set(df.columns)
    if clash:
        # the joins below would make these ambiguous (silently wrong
        # pick or AnalysisException deep in the plan) — fail loudly at
        # the API boundary instead
        raise ValueError(
            "input columns collide with emitted stat names: "
            + ", ".join(sorted(clash))
        )

    from dqc_spark.cache import track

    def med_of(c) -> Column:
        if approx:
            return F.percentile_approx(c, 0.5, 10000)
        return F.median(c)

    df = track(df)
    v = F.col(value_col).cast("double")
    meds = df.groupBy(*group_cols).agg(med_of(v).alias("med"))
    with_med = df.join(F.broadcast(meds), on=group_cols, how="left")
    dev = F.abs(v - F.col("med"))
    mads = with_med.groupBy(*group_cols).agg(med_of(dev).alias("mad"))
    out = with_med.join(F.broadcast(mads), on=group_cols, how="left")
    thresh = F.lit(k if isinstance(k, int) else float(k))
    return out.select(
        *df.columns,
        "med",
        "mad",
        F.when(F.col("mad") != 0, dev / F.col("mad")).alias("score"),
        F.coalesce(dev > thresh * F.col("mad"), F.lit(False))
        .alias("is_anomaly"),
    )


def audit_anomalies(
    audit_df: DataFrame,
    k: int = 3,
    value_col: str = "error_count",
) -> DataFrame:
    """Anomalous audit rows: each check run's ``error_count`` vs the
    history of the SAME check type across runs.

    Input is the audit table (``dqc_spark.audit`` schema: run_id, seq,
    ts, check_type, result, error_count, params, …).  A check that
    suddenly reports 40k violations where its history hovers around
    200 flags here even though every individual run "worked" — the
    regression signal the reference's per-run SQLite log cannot
    express.  Output: (run_id, check_type, value, med, mad, score,
    is_anomaly) ordered nowhere — callers sort.
    """
    series = audit_df.select(
        "run_id",
        "check_type",
        F.col(value_col).cast("double").alias("value"),
    )
    return metric_anomalies(series, ["check_type"], "value", k=k)

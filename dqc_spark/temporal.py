"""Temporal operators Spark lacks native forms for: interval (range)
joins and multi-resolution time rollups (hypertable-style continuous
aggregates).

Range join
----------
``range_join(points, intervals)``: attach every interval containing a
point (same key, start <= t <= end).  Spark would plan the naive
``ON p.t BETWEEN i.start AND i.end`` as BroadcastNestedLoop/Cartesian —
O(|P|·|I|) per key.  The scale strategy is BUCKETIZATION: quantize time
into fixed buckets, explode each interval to the buckets it covers,
equi-join on (key, bucket), then apply the exact range filter.  Cost is
one hash join of |P| vs |I|·(avg_span/bucket) rows — linear, and
Catalyst plans an ordinary shuffled/broadcast hash join.  Pick
``bucket`` near the median interval length: too small explodes the
interval side, too large widens the candidate set the filter prunes.

Rollup hierarchy
----------------
``rollup_hierarchy``: hour -> day -> month aggregates where each level
re-aggregates the PREVIOUS level, not the raw data (sum/count/min/max
compose; avg is derived at read time as sum/count).  This is the
TimescaleDB/Druid continuous-aggregate shape: the raw scan happens once
for the finest grain, coarser grains cost only |hourly| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join", "rollup_hierarchy"]


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    by: str | list[str],
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """All (point, interval) pairs with equal ``by`` keys and
    ``start <= point_ts <= end`` (inclusive), via bucketized equi-join.

    ``how="inner"`` returns matching pairs (a point in k overlapping
    intervals yields k rows); ``how="left"`` keeps unmatched points with
    NULL interval columns."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner or left: {how!r}")
    by = [by] if isinstance(by, str) else list(by)
    ival_cols = [c for c in intervals.columns if c not in by]
    clash = set(points.columns) & set(ival_cols)
    if clash:
        raise ValueError(
            f"column name collision between points and intervals: {sorted(clash)}"
            " — rename one side before joining"
        )

    b = F.lit(bucket_seconds)
    i_first = F.floor(F.unix_timestamp(F.col(start_ts)) / b)
    i_last = F.floor(F.unix_timestamp(F.col(end_ts)) / b)

    # explode each interval to every bucket it covers; empty/inverted
    # intervals (end < start) produce no buckets and thus never match.
    # A point's own bucket meets exactly one exploded copy of any
    # containing interval, so the join emits no duplicates.
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.when(i_last >= i_first, F.sequence(i_first, i_last)).otherwise(
                F.array().cast("array<bigint>")
            )
        ),
    ).alias("iv")
    pts = points.withColumn(
        "__bucket", F.floor(F.unix_timestamp(F.col(point_ts)) / b)
    ).alias("pts")

    # ONE join with a mixed condition: Catalyst extracts the equi part
    # (keys + bucket) as hash-join keys and applies the range predicate
    # as the join residual — so "left" keeps unmatched points natively
    # (no anti-join second pass, no NULL-equality pitfalls)
    cond = F.lit(True)
    for k in by:
        cond = cond & (F.col(f"pts.{k}") == F.col(f"iv.{k}"))
    cond = (
        cond
        & (F.col("pts.__bucket") == F.col("iv.__bucket"))
        & (F.col(f"pts.{point_ts}") >= F.col(f"iv.{start_ts}"))
        & (F.col(f"pts.{point_ts}") <= F.col(f"iv.{end_ts}"))
    )
    joined = pts.join(iv, cond, how)
    return joined.select(
        *[F.col(f"pts.{c}") for c in points.columns],
        *[F.col(f"iv.{c}") for c in ival_cols],
    )


def rollup_hierarchy(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    dims: list[str] | None = None,
) -> dict[str, DataFrame]:
    """Hour/day/month continuous aggregates; each coarser level derives
    from the finer one (single raw scan).  Returns {"hour": df, "day":
    df, "month": df}, each with (bucket_ts, *dims, n, sum_value,
    min_value, max_value)."""
    dims = dims or []

    hourly = (
        events.groupBy(
            F.date_trunc("hour", ts_col).alias("bucket_ts"), *dims
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )

    def _reagg(src: DataFrame, grain: str) -> DataFrame:
        return src.groupBy(
            F.date_trunc(grain, "bucket_ts").alias("bucket_ts"), *dims
        ).agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )

    daily = _reagg(hourly, "day")
    monthly = _reagg(daily, "month")
    return {"hour": hourly, "day": daily, "month": monthly}

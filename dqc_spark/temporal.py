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

    b = F.lit(bucket_seconds)
    p_bucket = F.floor(F.unix_timestamp(F.col(point_ts)) / b)
    i_first = F.floor(F.unix_timestamp(F.col(start_ts)) / b)
    i_last = F.floor(F.unix_timestamp(F.col(end_ts)) / b)

    # explode each interval to every bucket it covers; empty/inverted
    # intervals (end < start) produce no buckets and thus never match
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.when(i_last >= i_first, F.sequence(i_first, i_last)).otherwise(
                F.array().cast("array<bigint>")
            )
        ),
    )
    pts = points.withColumn("__bucket", p_bucket)

    joined = pts.join(iv, on=[*by, "__bucket"], how="inner").filter(
        (F.col(point_ts) >= F.col(start_ts))
        & (F.col(point_ts) <= F.col(end_ts))
    )
    ival_cols = [c for c in intervals.columns if c not in by]
    out = joined.select(*points.columns, *ival_cols)
    if how == "inner":
        return out
    # left: re-attach points that matched nothing
    matched = out
    unmatched = points.join(
        matched.select(*points.columns).distinct(), on=points.columns,
        how="left_anti",
    )
    for c in ival_cols:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(dict(intervals.dtypes)[c])
        )
    return matched.unionByName(unmatched)


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

"""Skew-aware aggregation helpers.

AQE splits skewed JOIN partitions but NOT skewed aggregations; a
groupBy(url) where a few hot domains own half the rows sends those keys
to single reducers.  The standard fix is app-level two-phase (salted)
aggregation: groupBy(key, salt) -> partial counts -> groupBy(key) ->
final.  The salt spreads one hot key over ``buckets`` reducers in phase
1; phase 2 aggregates ``buckets`` rows per key, which is trivially
balanced.  (north_rule names this explicitly: "skew from hot domains is
handled via salted repartition".)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_group_count(df: DataFrame, key: str, buckets: int = 64) -> DataFrame:
    """count(*) per key via two-phase salted aggregation.  The salt is a
    deterministic hash of a per-row id, so identical keys scatter evenly
    across buckets regardless of input order."""
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(buckets))
    partial = (
        df.select(F.col(key), salt.alias("__salt"))
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias("n"))


def salted_duplicate_count(df: DataFrame, key: str, buckets: int = 64) -> int:
    """Number of KEY VALUES occurring more than once (reference
    is_column_unique semantics, checker.go:60-61) computed skew-safely."""
    counts = salted_group_count(df, key, buckets)
    return counts.filter(F.col("n") > 1).count()

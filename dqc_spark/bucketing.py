"""Bucketed-table helpers: pre-shuffle ONCE at write time so repeated
joins/aggregations on the bucket key run with NO exchange at read time.

At 10^12 documents the pages table is written bucketed by ``url`` hash
(BASELINE input_hint: "partitioned by days(warc_ts) + bucketed by url");
every later url-keyed operation — uniqueness checks, dedup winner joins,
incremental-crawl anti-joins — then co-locates for free.  Spark bucketing
is a catalog feature (``bucketBy`` requires ``saveAsTable``); tests pin
the no-Exchange plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_table"]


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally
    sorted) by ``bucket_col``.  Joins between tables bucketed on the
    same key with the same bucket count skip the shuffle entirely;
    adding ``sort_col`` also skips the sort for sort-merge joins."""
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)

"""Deterministic global ordering / enumeration for training runs.

Training jobs need a reproducible document order (content-hash order is
the standard 'deterministic shuffle': uncorrelated with crawl order,
stable across reruns and cluster sizes) and a contiguous 0-based global
index per document (shard assignment, resumable offsets).

The naive Spark spelling — ``row_number() OVER (ORDER BY ...)`` with no
partition — collapses to a SINGLE partition and is the classic
100-TB-killer.  The scalable plan used here:

  1. ``repartitionByRange`` on the order key: range-partitions the data
     so partition i holds keys strictly below partition i+1 (sampled
     boundaries; correctness never depends on where the cuts land).
  2. per-partition ``row_number`` over a window PARTITIONED BY the
     range-partition id — every partition numbers itself independently.
  3. per-partition counts (a few hundred longs) come back to the
     driver, cumulative offsets go back out as a broadcast map-side
     join; position = offset[pid] + local_rank - 1.

Three stages, no single-partition shuffle, and the expensive exchange
carries only (key, tiebreak) — not document text.  The order key
includes a unique tiebreak column so the total order (and therefore
every position) is fully deterministic regardless of sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def content_order_key(text_col: str = "text") -> "F.Column":
    """md5-of-content: the deterministic 'shuffle' order (engine-portable
    hex compares identically everywhere)."""
    return F.md5(F.col(text_col))


def global_order_index(
    df: DataFrame,
    order_cols: list[str],
    tiebreak_col: str,
    num_partitions: int | None = None,
    position_col: str = "position",
) -> DataFrame:
    """Add a 0-based ``position`` column: the row's rank in the total
    order (``order_cols``, ``tiebreak_col``).  Scalable — see module
    docstring for the 3-stage plan."""
    sort_cols = [F.col(c) for c in order_cols] + [F.col(tiebreak_col)]
    if num_partitions is None:
        ranged = df.repartitionByRange(*sort_cols)
    else:
        ranged = df.repartitionByRange(num_partitions, *sort_cols)
    ranged = ranged.withColumn("__pid", F.spark_partition_id())

    # Per-partition local ranks: window is partitioned (by __pid), so no
    # single-partition stage; rows are already range-clustered so the
    # sort is partition-local.
    w = W.partitionBy("__pid").orderBy(*sort_cols)
    local = ranged.withColumn("__rank", F.row_number().over(w))

    # Partition sizes -> cumulative offsets, all inside ONE query: the
    # counts branch and the main branch hang off the same range
    # exchange, so AQE's ReusedExchange computes the expensive shuffle
    # once (a driver-side collect here would force a second job that
    # re-runs it).  The offset window is single-partition BY DESIGN —
    # it sees num_partitions rows of (int, long) metadata, not data.
    counts = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    # Cumulative offsets via a triangular self-join instead of an
    # unpartitioned window: the counts frame holds num_partitions rows
    # of metadata, so the P^2/2 join is trivial, and it avoids
    # WindowExec's single-partition plan (and its log warning) entirely.
    lower = counts.select(
        F.col("__pid").alias("__lpid"), F.col("__n").alias("__ln")
    )
    offsets = (
        counts.join(lower, F.col("__lpid") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(F.coalesce(F.sum("__ln"), F.lit(0)).alias("__off"))
    )
    return (
        local.join(F.broadcast(offsets), on="__pid", how="inner")
        .withColumn(position_col, F.col("__off") + F.col("__rank") - 1)
        .drop("__pid", "__rank", "__off")
    )


def training_order(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """The standard deterministic-shuffle enumeration: order by
    (md5(text), key) and attach the global 0-based position."""
    with_key = df.withColumn("__okey", content_order_key(text_col))
    out = global_order_index(
        with_key, ["__okey"], key_col, num_partitions=num_partitions
    )
    return out.drop("__okey")

"""Quality-classifier calibration: bucketized precision/recall curve.

Choosing the keep/drop cutoff for a quality score is a calibration
problem: sweep the threshold, look at precision/recall against labels
(golden oracle labels, human ratings, a downstream-model signal).  The
textbook spelling sorts all rows by score — a global sort, the same
100-TB-killer ordering.py documents.  Here the score is quantized into
``buckets`` levels first:

  * one groupBy computes (bucket, n, n_pos) — a ``buckets``-row frame,
    metadata scale;
  * cumulative counts over descending buckets come from a triangular
    self-join on that tiny frame (same trick as ordering.py's offsets —
    no single-partition WindowExec on the data path);
  * precision/recall at each threshold are integer-count ratios, so the
    whole curve is engine-exact and differentially testable.

Resolution is 1/buckets of the score range — for threshold picking
that is the point (you want a stable curve, not per-row noise).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pr_curve(
    df: DataFrame,
    score: Column | str,
    label: Column | str,
    buckets: int = 100,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """(bucket, threshold, n, n_pos, cum_n, cum_pos, precision, recall)
    — one row per non-empty score bucket, descending cutoffs.

    ``threshold`` is the bucket's lower edge: the row describes the
    policy "keep every document scoring >= threshold".  ``precision`` =
    positives kept / kept; ``recall`` = positives kept / all positives.
    ``score`` is clipped into [lo, hi).
    """
    s = F.col(score) if isinstance(score, str) else score
    y = F.col(label) if isinstance(label, str) else label
    span = hi - lo
    b = F.least(
        F.lit(buckets - 1),
        F.greatest(
            F.lit(0), F.floor((s - F.lit(lo)) * buckets / F.lit(span))
        ),
    ).cast("int")
    from dqc_spark.cache import track

    # persisted: the bucket frame feeds THREE consumers (both sides of
    # the triangular join + the total-positives scalar); uncached, each
    # would re-aggregate the full corpus
    per = track(
        # NULL scores are EXCLUDED (an unscorable doc is not a lowest-
        # scoring doc): F.greatest ignores NULL operands, so without the
        # filter a NULL score would silently land in bucket 0
        # NULL labels count as negatives (coalesce to 0): an all-NULL
        # bucket would otherwise make F.sum return NULL for n_pos and
        # propagate NULL through cum_pos/precision/recall for every
        # threshold at or below it
        df.filter(s.isNotNull())
        .select(b.alias("bucket"),
                F.coalesce(y.cast("int"), F.lit(0)).alias("__y"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__y").alias("n_pos"),
        )
    )
    # cumulative-from-the-top via triangular join on the tiny frame
    upper = per.select(
        F.col("bucket").alias("__ub"),
        F.col("n").alias("__un"),
        F.col("n_pos").alias("__up"),
    )
    cum = (
        per.join(upper, F.col("__ub") >= F.col("bucket"), "inner")
        .groupBy("bucket", "n", "n_pos")
        .agg(
            F.sum("__un").alias("cum_n"),
            F.sum("__up").alias("cum_pos"),
        )
    )
    totals = per.agg(F.sum("n_pos").alias("__tp"))
    return cum.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (F.lit(lo) + F.col("bucket") * F.lit(span / buckets)).alias("threshold"),
        "n",
        "n_pos",
        "cum_n",
        "cum_pos",
        (F.col("cum_pos") / F.col("cum_n")).alias("precision"),
        # zero positives in the corpus -> recall 0.0 everywhere, not a
        # NULL column (Spark's non-ANSI x/0) that breaks threshold code
        F.when(F.col("__tp") > 0, F.col("cum_pos") / F.col("__tp"))
        .otherwise(F.lit(0.0))
        .alias("recall"),
    )


def choose_threshold(
    curve: DataFrame,
    min_precision: float,
) -> DataFrame:
    """The calibration decision a quality-gate deployment actually
    makes: among thresholds whose precision meets ``min_precision``,
    pick the one keeping the most documents (max recall; ties broken
    toward the LOWER threshold — equal recall at a looser cut means the
    extra kept docs are all negatives the precision bound already
    absorbed, and keeping more data never hurts recall).  One-row
    DataFrame (threshold, precision, recall, cum_n) — empty when no
    threshold qualifies, so callers must handle the no-solution case
    explicitly rather than silently gating at NaN.

    Pure Catalyst over the ~buckets-row curve frame; composes directly
    with ``pr_curve``."""
    return (
        curve.filter(F.col("precision") >= F.lit(float(min_precision)))
        .orderBy(F.desc("recall"), F.asc("threshold"))
        .limit(1)
        .select("threshold", "precision", "recall", "cum_n")
    )

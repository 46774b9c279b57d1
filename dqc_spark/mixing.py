"""Training-mix resampling: temperature-weighted source sampling.

LLM corpora are never trained at raw crawl proportions — hot sources
(one domain dominating the crawl) are downsampled and rare high-quality
sources kept whole.  The standard scheme reweights source s from raw
share p_s to p_s^alpha / sum(p^alpha) (temperature sampling, alpha<1
flattens the mix; alpha=1 is a no-op; alpha=0 is uniform-over-sources),
then takes each source at the rate that realizes the target mix under a
fixed output budget.

Scale shape: source statistics are a tiny aggregate (one row per
source); the actual sampling is a DETERMINISTIC per-row hash-bucket
filter (`sampling.portable_hash_bucket`) — a pure narrow map over the
corpus, no shuffle, reproducible across engines, cluster sizes, and
reruns.  Rates ride to executors broadcast inside the join against the
one-row-per-source rate table.

Rates are capped at 1.0 (this operator only *sub*samples; upsampling =
duplication is an epoch-count decision for the training loader, not a
corpus transform — emitting duplicate rows here would corrupt dedup
invariants downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dqc_spark.sampling import portable_hash_bucket

# bucket granularity for the rate filter: rates quantize to 1/BUCKETS
BUCKETS = 10_000


def source_mix_rates(
    df: DataFrame, source_col: str = "source", alpha: float = 0.5,
) -> DataFrame:
    """Per-source keep-rates realizing the temperature-alpha mix:
    (source, n_docs, raw_share, target_share, keep_rate).

    The output budget is chosen as the largest total under which no
    source needs upsampling: budget = min_s(n_s / target_s).  Every
    rate is then n_target / n_s <= 1, with equality for the binding
    (most-underrepresented) source.  A NULL source is a source (its
    rate row carries NULL; ``temperature_sample`` matches it
    null-safely).
    """
    from dqc_spark.cache import track

    # persisted: total / weight-sum / budget each aggregate this frame
    # again — uncached, every one of those tiny scalars would re-execute
    # the caller's ENTIRE upstream plan (curate: scoring + dedup joins)
    counts = track(
        df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    )
    total = counts.agg(F.sum("n_docs").alias("t")).select("t")
    c = counts.crossJoin(F.broadcast(total))
    c = c.withColumn("raw_share", F.col("n_docs") / F.col("t"))
    c = c.withColumn("__w", F.pow(F.col("raw_share"), F.lit(alpha)))
    wsum = c.agg(F.sum("__w").alias("ws")).select("ws")
    c = c.crossJoin(F.broadcast(wsum)).withColumn(
        "target_share", F.col("__w") / F.col("ws")
    )
    # budget = min over sources of n_s / target_s
    budget = c.agg(
        F.min(F.col("n_docs") / F.col("target_share")).alias("b")
    ).select("b")
    c = c.crossJoin(F.broadcast(budget))
    return c.select(
        source_col,
        "n_docs",
        "raw_share",
        "target_share",
        F.least(
            F.lit(1.0),
            F.col("target_share") * F.col("b") / F.col("n_docs"),
        ).alias("keep_rate"),
    )


def temperature_sample(
    df: DataFrame,
    source_col: str = "source",
    key_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Deterministically subsample ``df`` to the temperature-alpha
    source mix: keep a row iff its portable hash bucket falls below its
    source's keep-rate.  Selection depends only on (key, rates) — stable
    under repartitioning, re-runs, and engine choice."""
    rates = source_mix_rates(df, source_col, alpha).select(
        source_col, "keep_rate"
    )
    # null-safe equality: a NULL source grouped into its own rate row
    # must match back — a plain inner join would silently drop every
    # NULL-source document while its count still skewed the budget
    tagged = df.join(
        F.broadcast(rates.withColumnRenamed(source_col, "__mix_src")),
        on=df[source_col].eqNullSafe(F.col("__mix_src")),
        how="inner",
    ).drop("__mix_src")
    # threshold is ROUND-quantized to an integer bucket count: keep_rate
    # contains a cross-engine-order float sum (the alpha-weight total),
    # so engines can differ in the last ulp — rounding absorbs that;
    # comparing the raw double would flip rows at bucket boundaries
    keep = portable_hash_bucket(F.col(key_col), BUCKETS) < F.round(
        F.col("keep_rate") * BUCKETS, 0
    ).cast("bigint")
    return tagged.filter(keep).drop("keep_rate")

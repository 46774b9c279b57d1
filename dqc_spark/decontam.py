"""Benchmark decontamination: flag/drop corpus documents that overlap an
evaluation set's n-grams.

Standard training-pipeline step (the reference has no analogue — this is
part of the §2.5 training-data surface): any document sharing too many
word n-grams with a held-out benchmark is contaminated and must not
reach the training corpus, or downstream eval scores are inflated.

Scale shape (the part that matters at 100 TB):

  * the benchmark side is SMALL relative to the corpus (eval suites are
    thousands of documents, the corpus is billions) -> its distinct gram
    set is **broadcast**, so the corpus is scored with a map-side hash
    join: no shuffle of corpus text, no shuffle of corpus grams.
  * per-document gram sets are deduplicated with ``array_distinct``
    BEFORE the explode (gram arrays are ~1e2 elements, so the O(m^2)
    array_distinct on such short arrays is cheaper than a
    groupBy-distinct shuffle of every gram).
  * the only shuffle is the final groupBy on the document key, and it
    carries (key, two longs) — not text.

If the benchmark gram set ever outgrows broadcast range (~100s of MB),
drop the ``F.broadcast`` hint and let AQE pick a shuffle join; semantics
are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dqc_spark.textstats import ngrams_col


def benchmark_grams(bench: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-grams of the benchmark corpus: 1-column frame
    ``gram``.  Distinct is a real groupBy (benchmark-sized, cheap)."""
    return (
        bench.select(F.explode(ngrams_col(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def contamination_scores(
    docs: DataFrame,
    bench: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bench_text_col: str | None = None,
) -> DataFrame:
    """Per-document contamination: (key, n_grams, n_hit, contam_frac).

    ``n_grams`` counts the doc's DISTINCT n-grams, ``n_hit`` how many of
    them appear anywhere in the benchmark, ``contam_frac`` their ratio
    (0.0 for docs too short to have an n-gram — nothing to leak).
    """
    grams = docs.select(
        F.col(key_col),
        F.array_distinct(ngrams_col(F.col(text_col), n)).alias("__grams"),
    ).select(
        key_col,
        F.size("__grams").alias("__ng"),
        # explode_outer keeps gram-less (short) docs in the result
        F.explode_outer("__grams").alias("gram"),
    )
    bg = F.broadcast(
        benchmark_grams(bench, bench_text_col or text_col, n)
        .withColumn("__hit", F.lit(1))
    )
    scored = (
        grams.join(bg, on="gram", how="left")
        .groupBy(key_col)
        .agg(
            F.max("__ng").alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hit"),
        )
    )
    return scored.select(
        key_col,
        "n_grams",
        "n_hit",
        F.when(F.col("n_grams") > 0, F.col("n_hit") / F.col("n_grams"))
        .otherwise(F.lit(0.0))
        .alias("contam_frac"),
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_frac: float = 0.5,
    bench_text_col: str | None = None,
) -> DataFrame:
    """Drop documents whose benchmark n-gram overlap is >= ``max_frac``.

    ``bench_text_col`` names the benchmark frame's text column when it
    differs from the corpus's (e.g. scoring ``scrubbed_text`` against a
    raw-``text`` eval set).  Returns ``docs`` rows (all columns) that
    survive — a left-semi join against the surviving keys, so the text
    column is only scanned, never shuffled."""
    keep = contamination_scores(
        docs, bench, key_col, text_col, n, bench_text_col
    ).filter(F.col("contam_frac") < max_frac)
    return docs.join(keep.select(key_col), on=key_col, how="left_semi")

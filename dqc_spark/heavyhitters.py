"""Misra–Gries heavy hitters: boilerplate grams at 100 TB without
shuffling the gram table.

The exact top-k n-gram path (textstats.top_ngrams) shuffles one row per
DISTINCT gram — fine at test scale, but a web corpus has billions of
distinct grams and the interesting output is the few thousand heavy
ones (cookie banners, nav text, license boilerplate).  The
Misra–Gries summary (Misra & Gries 1982; mergeability per Agarwal et
al., PODS 2012) bounds that cost:

  * each partition keeps at most ``k`` counters, folding every Arrow
    batch in via an exact Counter update followed by a COMPRESS step
    (subtract the (k+1)-th largest count from all, drop ≤0) — the
    batched formulation of the classic decrement rule, C-speed instead
    of a per-token python loop;
  * each compress that removes mass removes ≥ k+1 units of it per
    decremented unit of any single gram, so per-item undercount is
    ≤ n/(k+1) tokens TOTAL — and the bound survives merging because the
    driver-side merge is the same sum+compress;
  * the shuffle/driver traffic is ≤ k rows per partition, independent
    of corpus size or gram cardinality.

Guarantees (pinned by tests/test_heavyhitters.py):
  est(x) ≤ true(x) ≤ est(x) + n/(k+1); every gram with
  true(x) > n/(k+1) is present in the summary.  Estimates DO depend on
  partition/batch layout (any MG does); the guarantee does not.

Two-pass exact mode (``rescore=True``): the summary is only used as a
CANDIDATE set — a second pass counts candidates exactly (broadcast
membership test inside the kernel, so the shuffle carries candidate
grams only).  Candidates ⊇ all true heavy hitters, so the exact top-m
over candidates equals the exact top-m over everything whenever the
m-th frequency exceeds n/(k+1) — the cheap way to an exact answer at
scale, and what the SQL-oracled entry query uses.

Reference parity: the reference (data_quality_checker) has no sketch
surface; §2.5 training-data scope (frequent-boilerplate detection).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dqc_spark.lmtrain import _oracle_tokens

__all__ = [
    "mg_compress",
    "heavy_hitters_py",
    "mg_summary",
    "heavy_hitters",
]


def mg_compress(c: Counter, k: int) -> None:
    """In-place Misra–Gries compress: keep at most ``k`` counters by
    subtracting the (k+1)-th largest count from every counter and
    dropping the non-positive ones.  Shared by the kernel, the driver
    merge and the pytest oracle."""
    if len(c) <= k:
        return
    thresh = sorted(c.values(), reverse=True)[k]
    dead = [g for g in c if c[g] <= thresh]
    for g in dead:
        del c[g]
    for g in c:
        c[g] -= thresh


def heavy_hitters_py(
    token_streams, k: int = 256,
) -> Counter:
    """Single-process reference: one exact-count + compress per stream
    (= per batch).  Property-oracle only — MG estimates are
    layout-dependent, the GUARANTEES are not."""
    summary: Counter = Counter()
    for toks in token_streams:
        summary.update(toks)
        mg_compress(summary, k)
    return summary


def mg_summary(
    df: DataFrame,
    text_col: str = "text",
    k: int = 256,
    tokenizer=_oracle_tokens,
) -> Counter:
    """Merged MG summary of word frequencies over the corpus: ≤ k rows
    per partition to the driver, sum + final compress there.  Returns
    the Counter (≤ k entries) — broadcast it, don't collect corpora."""
    out_schema = T.StructType([
        T.StructField("gram", T.StringType()),
        T.StructField("cnt", T.LongType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c: Counter = Counter()
        for pdf in batches:
            for text in pdf[text_col]:
                c.update(tokenizer(text))
            mg_compress(c, k)
        yield pd.DataFrame(
            {"gram": list(c.keys()),
             "cnt": pd.array(list(c.values()), dtype="int64")})

    rows = df.select(text_col).mapInPandas(kernel, out_schema).collect()
    merged: Counter = Counter()
    for r in rows:
        merged[r["gram"]] += r["cnt"]
    mg_compress(merged, k)
    return merged


def heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    k: int = 256,
    tokenizer=_oracle_tokens,
    rescore: bool = False,
) -> DataFrame:
    """(gram, n_occurrences) DataFrame of the summary.  With
    ``rescore=True`` the counts are EXACT: a second pass counts only
    the candidate grams (broadcast membership check inside the kernel
    — the shuffle carries candidates, never the gram universe)."""
    spark = df.sparkSession
    summary = mg_summary(df, text_col, k, tokenizer)
    if not summary:
        return spark.createDataFrame(
            [], "gram string, n_occurrences bigint")
    if not rescore:
        return spark.createDataFrame(
            [(g, int(n)) for g, n in sorted(summary.items())],
            "gram string, n_occurrences bigint")
    bc = spark.sparkContext.broadcast(frozenset(summary))
    out_schema = T.StructType([
        T.StructField("gram", T.StringType()),
        T.StructField("cnt", T.LongType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cand = bc.value
        for pdf in batches:
            c: Counter = Counter()
            for text in pdf[text_col]:
                c.update(t for t in tokenizer(text) if t in cand)
            yield pd.DataFrame(
                {"gram": list(c.keys()),
                 "cnt": pd.array(list(c.values()), dtype="int64")})

    return (
        df.select(text_col).mapInPandas(kernel, out_schema)
        .groupBy("gram")
        .agg(F.sum("cnt").alias("n_occurrences"))
    )

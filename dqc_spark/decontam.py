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
  * per-document distinct grams come out of ONE Arrow kernel as 64-bit
    HASHES (never gram strings).  The original all-Column form built
    grams with an interpreted ``F.transform`` lambda + O(m^2) string
    ``array_distinct`` — the exact hot-path trap this repo's perf notes
    measure at ~100x per core; the kernel rewrite cut the 20k-doc bench
    leg ~10x.  Joining on a long also shrinks the probe rows ~10x vs
    ~60-byte gram strings.
  * the only shuffle is the final groupBy on the document key, and it
    carries (key, two longs) — not text.

Gram identity is a 64-bit blake2b digest: a cross-doc collision makes
one false n-gram hit (a +1 in a count), never a false document drop by
itself; at eval-set sizes (~1e6-1e8 grams) collision odds are ~1e-11
per corpus gram.

If the benchmark gram set ever outgrows broadcast range (~100s of MB),
drop the ``F.broadcast`` hint and let AQE pick a shuffle join; semantics
are unchanged.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dqc_spark.textstats import ngrams_col
from dqc_spark.wordhash import fold_tokens


# memo cap for the gram-string -> hash cache: unlike the word-level md5
# memos (Zipf-bounded vocabulary), n>=3 gram strings are mostly UNIQUE
# across web text, so an unbounded per-task dict would grow with the
# partition's distinct-gram count (multi-GB on a large partition) for a
# memo that almost never hits past the boilerplate head.  The cap keeps
# the hot head cached and stops inserting once full.
_GRAM_CACHE_MAX = 1 << 18


def _gram_hashes_py(text: str, n: int, cache: dict) -> set[int]:
    """Distinct word-n-gram hashes of one document — the shared
    Unicode LM-family tokenization (``wordhash.fold_tokens``: case
    fold, CJK codepoint isolation, Unicode-whitespace split — so a
    space-free CJK benchmark decontaminates per character n-gram, the
    CCNet convention), matching the DuckDB differential oracle's
    ``fold_tokens_sql`` spelling; grams hashed to a signed 64-bit
    int."""
    toks = fold_tokens(text)
    if len(toks) < n:
        return set()
    out = set()
    for i in range(len(toks) - n + 1):
        g = " ".join(toks[i : i + n])
        h = cache.get(g)
        if h is None:
            d = hashlib.blake2b(g.encode("utf-8"), digest_size=8).digest()
            h = int.from_bytes(d, "little", signed=True)
            if len(cache) < _GRAM_CACHE_MAX:
                cache[g] = h
        out.add(h)
    return out


def _gram_hash_rows(
    df: DataFrame, key_col: str | None, text_col: str, n: int
) -> DataFrame:
    """Exploded (key, __ng, h) rows of per-doc DISTINCT gram hashes from
    one Arrow kernel; gram-less docs emit a single (key, 0, NULL) row
    (the explode_outer analogue).  ``key_col=None`` emits hashes only
    (benchmark side)."""
    fields = []
    if key_col is not None:
        fields.append(T.StructField("key", df.schema[key_col].dataType))
        fields.append(T.StructField("__ng", T.IntegerType()))
    fields.append(T.StructField("h", T.LongType()))
    out_schema = T.StructType(fields)
    cols = [key_col, text_col] if key_col is not None else [text_col]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            if key_col is None:
                hs: set[int] = set()
                for text in pdf[text_col]:
                    hs |= _gram_hashes_py(text, n, cache)
                yield pd.DataFrame({"h": pd.array(sorted(hs), dtype="int64")})
                continue
            # NULL keys cannot flow through this operator: the score
            # groupBy would collapse every NULL-key doc into one
            # garbage row AND decontaminate's left-semi join (NULL =
            # NULL is never TRUE) would then silently delete the docs.
            # Fail loudly at the first batch that carries one.  (Known
            # degenerate bypass: if EVERY key is NULL, Catalyst's
            # inferred isnotnull empties decontaminate's probe side
            # and AQE skips this kernel — the all-NULL corpus returns
            # empty instead of erroring; any mixed corpus errors here.)
            if pdf[key_col].isna().any():
                raise ValueError(
                    f"decontamination key column {key_col!r} contains "
                    "NULLs: scores would collapse and the semi-join "
                    "would silently drop those documents — filter or "
                    "coalesce the key first")
            keys, ngs, hs2 = [], [], []
            for key, text in zip(pdf[key_col], pdf[text_col]):
                g = _gram_hashes_py(text, n, cache)
                if not g:
                    keys.append(key)
                    ngs.append(0)
                    hs2.append(None)
                    continue
                keys.extend([key] * len(g))
                ngs.extend([len(g)] * len(g))
                hs2.extend(g)
            yield pd.DataFrame(
                {"key": keys, "__ng": pd.array(ngs, dtype="int32"),
                 "h": pd.array(hs2, dtype="Int64")}
            )

    return df.select(*cols).mapInPandas(kernel, schema=out_schema)


def benchmark_grams(bench: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-grams of the benchmark corpus as STRINGS (1-column
    frame ``gram``) — kept for inspection/debug surfaces; the scoring
    path uses the hash form below (which tokenizes with the Unicode
    ``fold_tokens`` family, while this debug view shares
    ``textstats.ngrams_col``'s gate-family split)."""
    return (
        bench.select(F.explode(ngrams_col(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def benchmark_gram_hashes(
    bench: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct benchmark gram HASHES: 1-column frame ``h`` (long)."""
    return _gram_hash_rows(bench, None, text_col, n).distinct()


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
    grams = _gram_hash_rows(docs, key_col, text_col, n)
    bg = F.broadcast(
        benchmark_gram_hashes(bench, bench_text_col or text_col, n)
        .withColumn("__hit", F.lit(1))
    )
    scored = (
        grams.join(bg, on="h", how="left")
        .groupBy("key")
        .agg(
            F.max("__ng").alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hit"),
        )
    )
    return scored.select(
        F.col("key").alias(key_col),
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


def split_leakage(
    df: DataFrame,
    key_col: str,
    split_col: str = "split",
    text_col: str = "text",
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Near-duplicate pairs STRADDLING a split boundary — the eval
    integrity check n-gram decontamination cannot do: ``decontaminate``
    needs the eval text's exact n-grams, while a paraphrased or
    lightly-edited copy of a training document sitting in the test
    slice shares few exact 13-grams but a high MinHash Jaccard.  Run it
    after ``split_corpus``/``curate(split_weights=)`` before trusting
    any eval number.

    Composition: the existing banded-LSH near-dup pass over the WHOLE
    corpus (capped buckets, persisted signatures — dedup.py's scale
    shape survives unchanged), then the tiny pair frame joins the
    (key, split) labels and keeps cross-split pairs only.  Cost is one
    near-dup pass; the label joins touch pair-count rows.

    Returns (key_a, split_a, key_b, split_b, est_jaccard).
    """
    from dqc_spark.dedup import minhash_near_dups

    pairs = minhash_near_dups(
        df, key_col, text_col=text_col, threshold=threshold,
        num_perm=num_perm, bands=bands)
    lab = df.select(F.col(key_col), F.col(split_col))
    la = lab.select(F.col(key_col).alias("key_a"),
                    F.col(split_col).alias("split_a"))
    lb = lab.select(F.col(key_col).alias("key_b"),
                    F.col(split_col).alias("split_b"))
    return (
        pairs.join(la, "key_a")
        .join(lb, "key_b")
        # null-SAFE inequality: a plain != goes three-valued on NULL
        # split labels and silently HIDES pairs involving unlabeled
        # docs — exactly the rows an integrity gate must surface (a
        # NULL-labeled near-dup of a train doc is potential leakage
        # until someone labels it)
        .filter(~F.col("split_a").eqNullSafe(F.col("split_b")))
        .select("key_a", "split_a", "key_b", "split_b", "est_jaccard")
    )

"""Model-free document vectors: feature-hashed TF-IDF embeddings.

Bridges the text surface to the vector surface: ``hashed_tfidf`` turns
(key, text) into the same ``(key, embedding array<float>)`` shape the
similarity/IVF stack consumes, so embedding near-dup detection, LSH
indexing, and ANN top-k all run WITHOUT any external embedding model —
the classic hashing-trick bag-of-words with IDF weighting (Weinberger
et al., ICML'09), which is what large-scale near-dup pipelines actually
use when a neural encoder is too expensive for 10^12 docs.

Scale shape:

  * DF (document-frequency) pass: one Arrow kernel emits each doc's
    DISTINCT feature buckets as (bucket:int) rows -> a single groupBy
    over at most ``dim`` distinct keys.  The aggregate output is tiny
    (dim rows) and collected to the driver as the IDF table — O(dim)
    floats, broadcast back.
  * Vector pass: one Arrow kernel builds the tf vector per doc,
    multiplies the broadcast IDF, L2-normalizes.  No shuffle at all in
    this pass; the output feeds similarity.py operators that are
    already bucketed.
  * Tokens hash with the same md5-derived 64-bit identity used across
    the repo (engine-portable, process-stable — never python ``hash``).

Signed hashing: each token also gets a +/-1 sign from its hash so
bucket collisions cancel in expectation instead of accumulating
(standard feature-hashing variance reduction).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dqc_spark.wordhash import fold_tokens, md5_word

__all__ = ["hashed_tfidf", "hashed_tfidf_weights", "hashed_tf_py"]


def _tok_bucket_sign(word: str, dim: int, cache: dict) -> tuple[int, float]:
    # cache the RAW hash, not the bucket: a cache reused across calls
    # with different dims would otherwise serve buckets computed for the
    # wrong dimensionality (silent wrong vectors / IndexError)
    h1, _, sign = md5_word(word, cache)
    return h1 % dim, sign


def hashed_tf_py(text: str | None, dim: int, cache: dict | None = None) -> np.ndarray:
    """Raw signed term-frequency vector of one document (un-normalized)
    — the scalar reference the kernels and tests share."""
    cache = {} if cache is None else cache
    vec = np.zeros(dim, dtype=np.float64)
    for w in fold_tokens(text):
        b, s = _tok_bucket_sign(w, dim, cache)
        vec[b] += s
    return vec


def _doc_buckets(df: DataFrame, text_col: str, dim: int) -> DataFrame:
    """(bucket) rows — one per DISTINCT feature bucket per document."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            out: list[int] = []
            for text in pdf[text_col]:
                seen = {
                    _tok_bucket_sign(w, dim, cache)[0]
                    for w in fold_tokens(text)
                }
                out.extend(seen)
                # sentinel -1 row per document: the SAME groupBy that
                # finishes the bucket frequencies also yields the doc
                # count, so the IDF denominator costs no extra df.count
                # scan (which would re-run an unpersisted upstream
                # pipeline end-to-end)
                out.append(-1)
            yield pd.DataFrame({"bucket": pd.array(out, dtype="int32")})

    return df.select(text_col).mapInPandas(
        kernel, schema=T.StructType([T.StructField("bucket", T.IntegerType())])
    )


def _idf_vector(df: DataFrame, text_col: str, dim: int) -> np.ndarray:
    """The broadcastable IDF table — shared by the vector and weights
    paths so the two can never drift."""
    dfreq = (
        _doc_buckets(df, text_col, dim)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()  # <= dim+1 rows — the IDF table is metadata-sized
    )
    # bucket -1 is the per-doc sentinel: its count IS n_docs (one
    # DF pass yields both — no separate df.count() action)
    n_docs = sum(r["df"] for r in dfreq if r["bucket"] == -1)
    idf_vec = np.ones(dim, dtype=np.float64)
    for r in dfreq:
        if r["bucket"] < 0:
            continue
        # smoothed idf: ln((1+N)/(1+df)) + 1  (sklearn convention)
        idf_vec[r["bucket"]] = np.log((1.0 + n_docs) / (1.0 + r["df"])) + 1.0
    return idf_vec


def hashed_tfidf(
    df: DataFrame,
    key_col: str,
    text_col: str = "text",
    dim: int = 256,
    idf: bool = True,
) -> DataFrame:
    """(key, embedding array<float>) — L2-normalized signed-hashed
    TF(-IDF) vectors, drop-in input for ``similarity.embedding_near_dups``
    / ``LshIndex`` / ``ivf``.  Empty/NULL docs get the zero vector."""
    spark = df.sparkSession
    idf_vec = (_idf_vector(df, text_col, dim) if idf
               else np.ones(dim, dtype=np.float64))
    bc_idf = spark.sparkContext.broadcast(idf_vec)

    out_schema = T.StructType(
        [
            T.StructField("key", df.schema[key_col].dataType),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        iv = bc_idf.value
        cache: dict = {}
        for pdf in batches:
            vecs = []
            for text in pdf[text_col]:
                v = hashed_tf_py(text, dim, cache) * iv
                n = np.linalg.norm(v)
                if n > 0:
                    v /= n
                vecs.append(v.astype(np.float32).tolist())
            yield pd.DataFrame({"key": pdf[key_col].to_numpy(), "embedding": vecs})

    return df.select(key_col, text_col).mapInPandas(kernel, schema=out_schema)


def hashed_tfidf_weights(
    df: DataFrame,
    key_col: str,
    text_col: str = "text",
    dim: int = 256,
    idf: bool = True,
) -> DataFrame:
    """(key, bucket, weight:double) — the NONZERO entries of the same
    L2-normalized vectors ``hashed_tfidf`` assembles, kept in float64.

    This sparse frame is the SQL-expressible face of the hashing trick
    (bucket = little-endian-md5 % dim, signed tf, smoothed IDF, L2
    norm are all plain aggregates), so it can be differentialed
    against a DuckDB oracle where the float32 array cannot; it shares
    ``hashed_tf_py`` and ``_idf_vector`` with the vector path, so the
    two can never drift — pinned by ``test_textvectors``'s
    assembly-parity test.  Empty/NULL docs emit no rows (their vector
    is all-zero)."""
    spark = df.sparkSession
    idf_vec = (_idf_vector(df, text_col, dim) if idf
               else np.ones(dim, dtype=np.float64))
    bc_idf = spark.sparkContext.broadcast(idf_vec)

    out_schema = T.StructType(
        [
            T.StructField("key", df.schema[key_col].dataType),
            T.StructField("bucket", T.IntegerType()),
            T.StructField("weight", T.DoubleType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        iv = bc_idf.value
        cache: dict = {}
        for pdf in batches:
            keys: list = []
            buckets: list[int] = []
            weights: list[float] = []
            for key, text in zip(pdf[key_col], pdf[text_col]):
                v = hashed_tf_py(text, dim, cache) * iv
                n = np.linalg.norm(v)
                if n > 0:
                    v /= n
                (nz,) = np.nonzero(v)
                keys.extend([key] * len(nz))
                buckets.extend(int(b) for b in nz)
                weights.extend(float(v[b]) for b in nz)
            yield pd.DataFrame(
                {"key": keys, "bucket": pd.array(buckets, dtype="int32"),
                 "weight": pd.array(weights, dtype="float64")}
            )

    return df.select(key_col, text_col).mapInPandas(kernel, schema=out_schema)

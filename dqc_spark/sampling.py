"""Deterministic sampling + sequence-packing operators for training-data
pipelines.

These generalize the reference's per-table validation scans (checker.go's
single-pass SELECTs) into the *selection* ops a 100 TB web-text corpus
needs before training: reproducible subsampling, per-stratum quota capping
(hot-domain downweighting), and token-budget packing of documents into
context-window bins.

Scale design notes
------------------
* ``hash_sample`` is a pure narrow ``filter`` — no shuffle, no RNG state,
  and the same rows are selected regardless of partitioning or executor
  count (unlike ``df.sample`` whose output depends on partition layout).
  The predicate is a Catalyst ``Column`` so it is pushed into the scan
  stage and fused with downstream projections by whole-stage codegen.
* ``stratified_sample`` is one hash-partitioned window per stratum
  (single shuffle on the stratum key).  For heavy skew (one stratum ≫
  the rest) the hash-order ``row_number`` is still O(stratum) at the
  shuffle; cap extreme strata first with ``hash_sample`` at a rate that
  overshoots ``k`` (e.g. 4k/|stratum|) so the window input stays small.
* ``pack_token_budget`` needs a running sum *within* each stratum in a
  deterministic order — one shuffle on the stratum key, then a
  per-partition cumulative window.  Bin ids are a pure function of the
  (stratum, order, token-count) triple, so re-running on different
  cluster sizes yields identical bins.

The portable hash is the first 8 hex chars of ``md5`` (uniform 32-bit),
chosen over ``xxhash64`` because every engine (DuckDB, Trino, Spark) can
reproduce it — sampling decisions survive an engine migration.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W

__all__ = [
    "portable_hash_bucket",
    "hash_sample",
    "split_corpus",
    "stratified_sample",
    "pack_token_budget",
    "first_fit_py",
    "pack_first_fit",
    "chunk_text",
    "rolling_window_hashes",
    "cdc_chunk_spans",
    "cdc_chunks",
]


def portable_hash_bucket(col: Column | str, buckets: int = 100) -> Column:
    """Uniform bucket in [0, buckets) from the md5 of ``col``'s string form.

    Engine-portable: DuckDB equivalent is
    ``('0x' || substring(md5(CAST(c AS VARCHAR)), 1, 8))::BIGINT % buckets``.
    """
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("bigint")
    return (h % F.lit(buckets)).alias("bucket")


def hash_sample(
    df: DataFrame, key_col: str, rate_pct: int, buckets: int = 100
) -> DataFrame:
    """Deterministic ``rate_pct``% sample: keep rows whose portable hash
    bucket < rate_pct.  Pure filter — no shuffle, reproducible across
    cluster sizes and engines."""
    return df.filter(portable_hash_bucket(key_col, buckets) < rate_pct)


def split_corpus(
    df: DataFrame,
    key_col: str,
    weights: dict | None = None,
    buckets: int = 1_000_000,
) -> DataFrame:
    """Deterministic disjoint train/val/test split: adds a ``split``
    column assigning every row to exactly one named slice with the
    given weights (default 80/10/10).  The decision is a pure function
    of the KEY — reproducible across runs, cluster sizes, engines, and
    corpus growth (a doc keeps its split when new docs arrive, so eval
    sets stay uncontaminated as the corpus is re-curated; the property
    hash-sampling has and random() never will).

    Scale shape: one codegen hash + a CASE chain, zero shuffle, zero
    python.  Thresholds are INTEGER-quantized cumulative weights over
    ``buckets`` (the CLAUDE.md cross-engine rule: comparing raw float
    thresholds flips rows at boundaries between engines); quantization
    error is < len(weights)/buckets of corpus mass.  Weights need not
    sum to 1 — they are normalized; order follows the dict (python 3.7+
    insertion order), with the LAST slice absorbing the rounding tail.
    """
    if weights is None:
        weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    if len(weights) < 2:
        raise ValueError("split_corpus needs at least two slices")
    total = float(sum(weights.values()))
    if total <= 0 or any(v < 0 for v in weights.values()):
        raise ValueError("split weights must be non-negative, sum > 0")
    names = list(weights)
    # integer cumulative thresholds; last slice takes the remainder
    cum, edges = 0.0, []
    for name in names[:-1]:
        cum += float(weights[name]) / total
        edges.append(int(round(cum * buckets)))
    b = portable_hash_bucket(key_col, buckets)
    expr = F.lit(names[-1])
    for name, edge in zip(reversed(names[:-1]), reversed(edges)):
        expr = F.when(b < F.lit(edge), F.lit(name)).otherwise(expr)
    # a NULL key would make every `b < edge` condition NULL and fall
    # through to the LAST slice — silently packing all malformed docs
    # into the eval/test split.  raise_error is lazy and per-row: no
    # extra job, fires only if a NULL actually flows through.
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    expr = F.when(
        key.isNull(),
        F.raise_error(F.lit(
            f"split_corpus: NULL {key_col!r} key — NULL hashes have no "
            "split; filter or coalesce the key first")).cast("string"),
    ).otherwise(expr)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    k: int,
    pre_cap_overshoot: int | None = 20,
) -> DataFrame:
    """At most ``k`` rows per stratum, chosen in portable-hash order of
    ``key_col`` (deterministic pseudo-random, engine-reproducible).

    This is the hot-domain quota cap: strata larger than ``k`` are
    downsampled, small strata pass through whole.

    Hot-stratum pre-cap: the row_number window shuffles EVERY row of a
    stratum into one task — O(|stratum|) at the shuffle, fatal when one
    domain holds 10^9 pages.  Because the window orders by the portable
    hash itself, the k winners are exactly the k smallest hash values —
    a PREFIX of the hash order — so rows can be pre-filtered to
    ``h < 2^32 * overshoot*k / |stratum|`` (expected ``overshoot*k``
    survivors) without changing the result whenever at least k rows
    survive; at overshoot 20 the shortfall probability is
    Chernoff-negligible (< e^-13k).  Strata smaller than
    ``2*overshoot*k`` skip the filter entirely, so small-stratum output
    is bit-identical by construction.  Cost: one extra count aggregate
    (map-side partial, shuffles only (stratum, count) rows) + a
    broadcast join — cheap next to an unbounded window input.  Pass
    ``pre_cap_overshoot=None`` to disable (exact single-shuffle plan).
    """
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    if pre_cap_overshoot is not None:
        keep_all_below = 2 * pre_cap_overshoot * k
        counts = (
            df.groupBy(stratum_col)
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .withColumnRenamed(stratum_col, "__stratum")
        )
        cutoff = (
            F.lit(float(1 << 32)) * pre_cap_overshoot * k / F.col("__cnt")
        ).cast("bigint")
        # null-safe join: a NULL stratum is a legitimate window partition
        # (the exact plan samples it), so it must survive the pre-cap —
        # a plain equi-join would silently drop every NULL-stratum row.
        # Likewise NULL keys: they sort FIRST in the window's hash order
        # (asc nulls-first), i.e. they are always among the k winners of
        # their stratum, so the h<cutoff prefix filter must keep them.
        df = (
            df.join(
                F.broadcast(counts),
                F.col(stratum_col).eqNullSafe(F.col("__stratum")),
                "left",
            )
            .filter(
                (F.col("__cnt") <= F.lit(keep_all_below))
                | h.isNull()
                | (h < cutoff)
            )
            .drop("__cnt", "__stratum")
        )
    w = W.partitionBy(stratum_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def pack_token_budget(
    df: DataFrame,
    stratum_col: str,
    order_col: str,
    tokens_col: Column | str,
    budget: int,
) -> DataFrame:
    """Assign each document to a context-window bin of ~``budget`` tokens.

    Within each stratum, documents are taken in ``order_col`` order and a
    running token total places each doc in bin
    ``floor(exclusive_cumsum / budget)`` — i.e. a doc starts a new bin
    when the budget before it is exhausted.  Deterministic: bins are a
    pure function of (stratum, order, token counts), independent of
    partitioning.

    Returns the input plus ``n_tokens`` and ``bin_id`` columns.
    """
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    # a NULL token count would get bin_id NULL (inclusive - NULL) AND
    # silently vanish from every later doc's running sum, shifting all
    # downstream bin boundaries in its stratum — reject loudly like
    # pack_first_fit does, lazily (per-row raise_error, no extra job)
    t = F.when(
        t.isNull(),
        F.raise_error(F.lit(
            "pack_token_budget: NULL token count (coalesce the tokens "
            "column before packing)")).cast("long"),
    ).otherwise(t)
    w = (
        W.partitionBy(stratum_col)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    inclusive = F.sum(t).over(w)
    exclusive = inclusive - t
    return df.withColumn("n_tokens", t).withColumn(
        "bin_id", F.floor(exclusive / F.lit(budget)).cast("bigint")
    )


def first_fit_py(
    items: list[tuple], budget: int,
) -> dict:
    """First-fit-decreasing over (key, tokens) pairs: sort by (tokens
    desc, key asc), place each item in the first bin with room, open a
    new bin otherwise.  Items larger than ``budget`` get a bin of their
    own (flagging beats dropping — the caller decides).  Returns
    {key: bin_id} with bin ids dense from 0 in opening order.  Shared
    verbatim by the Spark kernel and the pytest oracle; classic bound:
    bins <= 11/9 * OPT + 2/3."""
    bins: list[int] = []  # remaining capacity per bin
    out: dict = {}
    for key, t in sorted(items, key=lambda kt: (-kt[1], kt[0])):
        placed = None
        for i, rem in enumerate(bins):
            if rem >= t:
                placed = i
                break
        if placed is None:
            bins.append(budget)
            placed = len(bins) - 1
        bins[placed] -= t
        out[key] = placed
    return out


def pack_first_fit(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    tokens_col: Column | str,
    budget: int,
    n_subgroups: int = 64,
) -> DataFrame:
    """Bin documents into <= ``budget``-token bins WITHOUT splitting or
    overflowing (first-fit-decreasing) — the packer to use when a
    document must land whole inside one context window; contrast
    ``pack_token_budget``, whose running-sum bins let a document span
    the boundary (bins overflow by up to one document).

    Scale shape: FFD is inherently sequential, so each (stratum,
    subgroup) packs independently in one ``applyInPandas`` group — the
    portable md5 hash of the key salts documents into ``n_subgroups``
    per stratum, bounding both the per-group state (|stratum|/S docs)
    and the skew of a hot stratum.  One shuffle on (stratum, subgroup).
    Waste vs global FFD is the per-subgroup tail — at most one
    under-filled bin per subgroup, negligible when subgroups hold
    thousands of documents.  Deterministic and partition-invariant:
    group membership and the in-group order are pure functions of
    (key, tokens).

    Returns the input plus ``n_tokens``, ``pack_group`` and ``bin_id``
    (dense from 0 within each (stratum, pack_group))."""
    import pandas as pd

    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    src = df.withColumn("n_tokens", t.cast("long")).withColumn(
        "pack_group",
        portable_hash_bucket(key_col, n_subgroups).cast("int"))
    out_schema = T.StructType(
        list(src.schema.fields)
        + [T.StructField("bin_id", T.LongType())])
    kcol = key_col

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf["n_tokens"].isna().any():
            # NaN poisons the FFD sort (all comparisons False ->
            # partition-dependent order) and fails the Arrow long cast
            # downstream — reject loudly, the caller coalesces
            raise ValueError(
                "pack_first_fit: NULL token count (coalesce the "
                "tokens column before packing)")
        # the assignment dict is keyed by document key: a NULL key
        # crashes the lookup (NaN != NaN), and duplicate keys collapse
        # into ONE dict entry so several rows share a bin and overfill
        # it past budget — both violate the never-overflow contract
        if pdf[kcol].isna().any():
            raise ValueError(
                f"pack_first_fit: NULL {kcol!r} key (filter or "
                "coalesce the key before packing)")
        if pdf[kcol].duplicated().any():
            dup = pdf[kcol][pdf[kcol].duplicated()].iloc[0]
            raise ValueError(
                f"pack_first_fit: duplicate {kcol!r} key {dup!r} — "
                "keys must be unique (dedup first)")
        assign = first_fit_py(
            list(zip(pdf[kcol], pdf["n_tokens"])), budget)
        pdf = pdf.copy()
        pdf["bin_id"] = pd.array(
            [assign[k] for k in pdf[kcol]], dtype="int64")
        return pdf

    return src.groupBy(stratum_col, "pack_group").applyInPandas(
        pack, out_schema)


def chunk_text(
    df: DataFrame, key_col: str, text_col: str, chunk_chars: int
) -> DataFrame:
    """Split each document into fixed-width character chunks (the
    context-window chunking step before tokenization).

    Narrow op: ``sequence`` + ``posexplode`` generate chunk offsets
    JVM-side — no shuffle, no Python.  Rows with empty/NULL text yield no
    chunks (matching ``generate_series`` semantics in the SQL oracle).

    Returns (key, chunk_ix, chunk, chunk_len).
    """
    n_chunks = F.ceil(F.length(text_col) / F.lit(chunk_chars)).cast("int")
    offsets = F.sequence(
        F.lit(0), n_chunks - 1, F.lit(1)
    )  # empty when n_chunks == 0
    exploded = df.select(
        F.col(key_col).alias("key"),
        F.col(text_col).alias("_t"),
        F.posexplode(
            F.when(n_chunks > 0, offsets).otherwise(F.array().cast("array<int>"))
        ).alias("chunk_ix", "_off"),
    )
    chunk = F.substring(
        F.col("_t"), F.col("_off") * chunk_chars + 1, chunk_chars
    )
    return exploded.select(
        "key",
        "chunk_ix",
        chunk.alias("chunk"),
        F.length(chunk).alias("chunk_len"),
    )


# ---------------------------------------------------------------------------
# content-defined chunking (rolling hash)
# ---------------------------------------------------------------------------

_CDC_B = np.uint64(0x100000001B3)  # odd FNV-ish multiplier (invertible mod 2^64)
_CDC_W = 16  # rolling window, chars


def _uint64_inverse(b: "np.uint64") -> "np.uint64":
    """Modular inverse of an odd b mod 2^64 (Newton iteration)."""
    x = b
    with np.errstate(over="ignore"):
        for _ in range(6):
            x = x * (np.uint64(2) - b * x)
    return x


_CDC_BINV = _uint64_inverse(_CDC_B)


def rolling_window_hashes(text: str) -> "np.ndarray":
    """Rabin-style rolling hash of every ``_CDC_W``-char window, fully
    vectorized: with prefix sums A_i = sum c_j * B^-j (mod 2^64, B odd
    so B^-1 exists), the window hash ending at i is
    ``(A_i - A_{i-w}) * B^i`` — three cumulative ops and one multiply,
    no per-window Python.  uint64 wraparound IS the modulus."""
    c = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    n = len(c)
    if n < _CDC_W:
        return np.zeros(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        ipows = np.empty(n, dtype=np.uint64)
        ipows[0] = 1
        if n > 1:
            np.cumprod(np.full(n - 1, _CDC_BINV, dtype=np.uint64), out=ipows[1:])
        pows = np.empty(n, dtype=np.uint64)
        pows[0] = 1
        if n > 1:
            np.cumprod(np.full(n - 1, _CDC_B, dtype=np.uint64), out=pows[1:])
        acc = np.cumsum(c * ipows, dtype=np.uint64)
        shifted = np.empty_like(acc)
        shifted[_CDC_W:] = acc[:-_CDC_W]
        shifted[:_CDC_W] = 0
        h = (acc - shifted) * pows
    return h[_CDC_W - 1:]


def cdc_chunk_spans(
    text: str, mask_bits: int = 6, min_len: int = 32, max_len: int = 256
) -> list[tuple[int, int]]:
    """Content-defined chunk spans [(start, end), ...) over one document.

    A cut happens AFTER position i when the rolling hash of the window
    ending at i has its low ``mask_bits`` bits zero (expected chunk size
    ~2^mask_bits chars) and the current chunk is at least ``min_len``;
    ``max_len`` forces a cut regardless.  Because boundaries depend only
    on the local window content, an insertion re-chunks ONLY its
    neighborhood — downstream chunks keep their hashes (the property
    that makes chunk-level dedup robust to edits, unlike fixed-width
    chunking where one insert shifts every later chunk).
    """
    if min_len < 1:
        # min_len=0 would re-find the candidate that produced the
        # previous cut (cut == start) and never advance
        raise ValueError("min_len must be >= 1")
    n = len(text)
    if n == 0:
        return []
    h = rolling_window_hashes(text)
    mask = np.uint64((1 << mask_bits) - 1)
    # candidate cut positions: cut AFTER char (i + _CDC_W - 1)
    cand = (np.nonzero((h & mask) == 0)[0] + _CDC_W - 1).astype(np.int64)
    spans: list[tuple[int, int]] = []
    start = 0
    while start < n:
        lo = start + min_len
        hard = start + max_len
        ix = np.searchsorted(cand, lo - 1)
        cut = hard
        if ix < len(cand) and cand[ix] + 1 < hard:
            cut = int(cand[ix]) + 1
        cut = min(cut, n)
        spans.append((start, cut))
        start = cut
    return spans


def cdc_chunks(
    df: DataFrame,
    key_col: str,
    text_col: str,
    mask_bits: int = 6,
    min_len: int = 32,
    max_len: int = 256,
) -> DataFrame:
    """Distributed content-defined chunking: (key, chunk_ix, chunk_start,
    chunk_len, chunk_md5) per chunk, via a mapInPandas kernel (the
    rolling hash vectorizes per document; only the sparse boundary walk
    is Python).  Chunk md5s feed exact dedup at the CHUNK level — the
    storage/dedup granularity for boilerplate-heavy web text."""
    import hashlib
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("key", df.schema[key_col].dataType),
            T.StructField("chunk_ix", T.IntegerType()),
            T.StructField("chunk_start", T.IntegerType()),
            T.StructField("chunk_len", T.IntegerType()),
            T.StructField("chunk_md5", T.StringType()),
        ]
    )

    def kernel(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            keys, ixs, starts, lens, md5s = [], [], [], [], []
            for key, text in zip(pdf[key_col], pdf[text_col]):
                t = text or ""
                for ix, (s, e) in enumerate(
                    cdc_chunk_spans(t, mask_bits, min_len, max_len)
                ):
                    keys.append(key)
                    ixs.append(ix)
                    starts.append(s)
                    lens.append(e - s)
                    md5s.append(hashlib.md5(t[s:e].encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {
                    "key": keys,
                    "chunk_ix": pd.array(ixs, dtype="int32"),
                    "chunk_start": pd.array(starts, dtype="int32"),
                    "chunk_len": pd.array(lens, dtype="int32"),
                    "chunk_md5": md5s,
                }
            )

    return df.select(key_col, text_col).mapInPandas(kernel, schema=out_schema)

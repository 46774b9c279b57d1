"""Incremental (cross-snapshot) deduplication.

Web-scale corpora are rebuilt from rolling crawl snapshots: each new
snapshot must be deduplicated against everything already ingested, not
just against itself.  Two paths:

  * ``new_docs`` — EXACT: anti-join of content digests.  The prior
    corpus is represented by its 16-byte md5 digests (never the text),
    so at 10^12 documents the prior side is a digest table that Spark
    shuffle-joins (or broadcast-joins while it fits).  This is the
    correctness baseline and the right default.

  * ``BloomFilter`` — APPROXIMATE prefilter for the common case where
    the prior digest table is huge but the *new* snapshot is small
    relative to it.  A bloom bitmap over prior digests is built
    distributed (one partial bitmap per partition, OR-reduced — the
    bitmap is fixed-size, a few MiB, so the driver reduce is O(MiB),
    not O(rows)) and broadcast to filter the snapshot map-side:
    definitely-new rows skip the join entirely; only "maybe seen" rows
    (a small, FP-bounded fraction) go to the exact anti-join.  No false
    drops: bloom "no" is certain, bloom "yes" is re-checked exactly.

Hashing is md5-derived (engine-portable, deterministic across runs) —
the same digest feeds both the bloom probes and the exact join.
"""

from __future__ import annotations

import hashlib
import math
import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def content_digests(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct md5 digests of a corpus — the compact 'seen set'."""
    return df.select(F.md5(F.col(text_col)).alias("digest")).distinct()


def new_docs(
    snapshot: DataFrame,
    prior: DataFrame,
    text_col: str = "text",
    broadcast_prior: bool = False,
) -> DataFrame:
    """Snapshot rows whose text content was never seen in ``prior``.

    Anti-join on digests: the text column itself is scanned once to
    hash, never shuffled.  ``broadcast_prior=True`` when the prior
    digest set is known-small (bootstrap runs); default lets AQE decide
    from the digest table's actual size.
    """
    pd_ = content_digests(prior, text_col)
    if broadcast_prior:
        pd_ = F.broadcast(pd_)
    snap = snapshot.withColumn("__digest", F.md5(F.col(text_col)))
    return snap.join(
        pd_.withColumnRenamed("digest", "__digest"), on="__digest", how="left_anti"
    ).drop("__digest")


# ---------------------------------------------------------------------------
# Bloom prefilter
# ---------------------------------------------------------------------------


_U64 = 1 << 64
_HEX32 = re.compile(r"[0-9a-fA-F]{32}\Z")


def _digest_bytes(value: str) -> bytes:
    """16 hash bytes for a value.  A 32-char lowercase-hex string (the
    md5 digest format every caller in this repo feeds) is parsed
    DIRECTLY — it is already uniform 128-bit material, and skipping the
    second md5 is what lets the batch kernels run as pure numpy.  Any
    other string is md5'd first (general-purpose fallback)."""
    if len(value) == 32:
        try:
            d = bytes.fromhex(value)
            if len(d) == 16:  # fromhex IGNORES spaces — be strict
                return d
        except ValueError:
            pass
    return hashlib.md5(value.encode("utf-8")).digest()


def _probe_positions(value: str, n_bits: int, k: int) -> list[int]:
    """k bit positions via double hashing (h1 + i*h2): h1/h2 are the
    digest's two little-endian 8-byte words, h2 forced odd (full-period
    step).  The sum wraps mod 2^64 BEFORE the mod n_bits — that pins the
    scalar reference to the exact semantics of the vectorized uint64
    kernel (`_probe_matrix`), which wraps by construction."""
    d = _digest_bytes(value)
    h1 = int.from_bytes(d[0:8], "little")
    h2 = int.from_bytes(d[8:16], "little") | 1
    return [((h1 + i * h2) % _U64) % n_bits for i in range(k)]


def _probe_matrix(values, n_bits: int, k: int) -> np.ndarray:
    """(n, k) probe positions for a batch of md5 HEX digests — one
    ``bytes.fromhex`` + two uint64 views + one broadcasted multiply-add,
    no per-row python.  Non-digest strings take the scalar fallback
    (only reachable through the generic ``build_bloom(col=...)`` API;
    the snapshot path always feeds digests)."""
    vals = ["" if v is None else str(v) for v in values]
    # per-value strictness BEFORE the joined parse: bytes.fromhex skips
    # spaces, so a whitespace-bearing 32-char value could pass a joined
    # length check while misaligning every later value's 16-byte slice
    # (probe positions silently diverging from the scalar reference)
    if not all(len(v) == 32 and _HEX32.match(v) for v in vals):
        return np.array(
            [_probe_positions(v, n_bits, k) for v in vals], dtype=np.int64
        ).reshape(len(vals), k)
    raw = bytes.fromhex("".join(vals))
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 16)
    h1 = arr[:, :8].copy().view("<u8").ravel()
    h2 = arr[:, 8:].copy().view("<u8").ravel() | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(n_bits)).astype(
        np.int64
    )


class BloomFilter:
    """Fixed-size bloom bitmap, double-hashed straight off the md5
    digest words (see ``_probe_positions``); scalar driver-side API —
    the distributed paths use the vectorized ``_probe_matrix``."""

    def __init__(self, n_bits: int, k: int, bits: np.ndarray | None = None):
        if n_bits % 8:
            raise ValueError("n_bits must be a multiple of 8")
        self.n_bits = n_bits
        self.k = k
        self.bits = bits if bits is not None else np.zeros(n_bits // 8, dtype=np.uint8)

    @classmethod
    def sized_for(cls, n_items: int, fp_rate: float = 0.01) -> "BloomFilter":
        """Classic sizing: m = -n*ln(p)/ln(2)^2 bits, k = m/n*ln(2)."""
        m = max(64, int(-n_items * math.log(fp_rate) / (math.log(2) ** 2)))
        m = (m + 7) // 8 * 8
        k = max(1, round(m / max(1, n_items) * math.log(2)))
        return cls(m, k)

    def add(self, value: str) -> None:
        for p in _probe_positions(value, self.n_bits, self.k):
            self.bits[p >> 3] |= np.uint8(1 << (p & 7))

    def might_contain(self, value: str) -> bool:
        return all(
            self.bits[p >> 3] & (1 << (p & 7))
            for p in _probe_positions(value, self.n_bits, self.k)
        )


def build_bloom(
    df: DataFrame, col: str, n_bits: int = 1 << 23, k: int = 7
) -> BloomFilter:
    """Distributed bloom build: each Arrow batch sets bits into a
    process-local bitmap; every partition emits ONE row carrying its
    bitmap bytes; the driver ORs the (num_partitions × n_bits/8 B)
    partials.  Rows never leave their partition — the only driver
    traffic is the fixed-size bitmaps."""
    nb, kk = n_bits, k

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(nb // 8, dtype=np.uint8)
        seen = False
        for pdf in batches:
            seen = True
            vals = pdf[col].dropna()
            if len(vals) == 0:
                continue
            pos = _probe_matrix(vals.to_numpy(), nb, kk).ravel()
            # bitwise_or.at: unbuffered, so repeated byte indices all
            # land (plain fancy-index |= silently drops duplicates)
            np.bitwise_or.at(
                bits, pos >> 3, np.left_shift(1, pos & 7).astype(np.uint8)
            )
        if seen:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    partials = df.select(col).mapInPandas(
        kernel, schema=T.StructType([T.StructField("bits", T.BinaryType())])
    )
    out = np.zeros(n_bits // 8, dtype=np.uint8)
    for row in partials.collect():  # one fixed-size row per partition
        out |= np.frombuffer(row["bits"], dtype=np.uint8)
    return BloomFilter(n_bits, k, out)


# bytes of bitmap per artifact row: large enough that even a 10^10-item
# 1%-fp bitmap (~12 GiB) is a few thousand rows, small enough that a
# row never strains Arrow/parquet cell limits
_BLOOM_CHUNK = 8 << 20


def save_bloom(bloom: BloomFilter, spark, path: str) -> None:
    """Persist a bloom filter as a parquet artifact — the cross-run
    'seen set': build it once over snapshot N's digests, load it in
    run N+1 instead of re-scanning the whole prior corpus.  Layout is
    (chunk, n_bits, k, bits) rows so any reader can reassemble it and
    a multi-GiB bitmap never has to fit one parquet cell."""
    b = bloom.bits.tobytes()
    rows = [
        (i, bloom.n_bits, bloom.k,
         bytearray(b[off:off + _BLOOM_CHUNK]))
        for i, off in enumerate(range(0, len(b), _BLOOM_CHUNK))
    ]
    (spark.createDataFrame(
        rows, "chunk long, n_bits long, k int, bits binary")
     .coalesce(1).write.mode("overwrite").parquet(path))


def load_bloom(spark, path: str) -> BloomFilter:
    """Inverse of ``save_bloom`` — validates the reassembled size so a
    truncated artifact fails loudly instead of answering 'definitely
    new' for everything (a silent-false-negative disaster for a
    dedup prefilter)."""
    rows = sorted(spark.read.parquet(path).collect(),
                  key=lambda r: r["chunk"])
    if not rows:
        raise ValueError(f"empty bloom artifact at {path}")
    n_bits, k = int(rows[0]["n_bits"]), int(rows[0]["k"])
    raw = b"".join(bytes(r["bits"]) for r in rows)
    if len(raw) != n_bits // 8:
        raise ValueError(
            f"bloom artifact at {path} is corrupt: expected "
            f"{n_bits // 8} bitmap bytes, found {len(raw)}")
    return BloomFilter(n_bits, k,
                       np.frombuffer(raw, dtype=np.uint8).copy())


def bloom_partition(
    snapshot: DataFrame, bloom: BloomFilter, text_col: str = "text"
) -> DataFrame:
    """Tag snapshot rows: ``maybe_seen`` false => certainly new (skip
    the exact join), true => candidate for the exact anti-join.  The
    bitmap ships as a REAL Spark broadcast, not a closure capture — a
    closure is re-pickled into every task, which at production bloom
    sizes (2^30 bits = 128 MiB) multiplies the transfer by the task
    count; a broadcast moves it once per executor."""
    nb, kk = bloom.n_bits, bloom.k
    bc_bits = snapshot.sparkSession.sparkContext.broadcast(bloom.bits)

    def kernel(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        bits = bc_bits.value
        for s in it:
            if len(s) == 0:
                yield pd.Series([], dtype=bool)
                continue
            # the input is the JVM-computed md5 HEX digest of the text
            # (Spark md5 = lower hex = hashlib hexdigest), so both sides
            # probe the same value and the position derivation is the
            # SAME _probe_matrix the build side uses — a drifting copy
            # would turn bloom "no" answers into silent false drops.
            null_mask = s.isna().to_numpy()
            vals = s.fillna("0" * 32).to_numpy()
            pos = _probe_matrix(vals, nb, kk)  # (n, k)
            hit = bits[pos >> 3] & np.left_shift(1, pos & 7).astype(np.uint8)
            maybe = (hit != 0).all(axis=1)
            maybe[null_mask] = False
            yield pd.Series(maybe)

    probe = F.pandas_udf(kernel, T.BooleanType())
    # digest computed JVM-side (codegen md5), so the python stage never
    # touches the text — it probes 32-byte digests only
    return snapshot.withColumn(
        "maybe_seen", probe(F.md5(F.col(text_col)))
    )


def new_docs_bloom(
    snapshot: DataFrame,
    prior: DataFrame,
    text_col: str = "text",
    n_bits: int | None = None,
    k: int = 7,
    fp_rate: float = 0.01,
    bloom: BloomFilter | None = None,
) -> DataFrame:
    """Bloom-accelerated ``new_docs``: same answer, but only the
    bloom-maybe rows reach the exact anti-join.  Exactness: bloom has
    no false negatives, so every truly-seen row is in the maybe set and
    gets exactly re-checked; definitely-new rows bypass the join.

    ``n_bits=None`` sizes the bitmap from the prior's row count (a
    parquet-metadata-cheap upper bound on distinct digests) at
    ``fp_rate`` — a fixed default bitmap silently saturates on a large
    prior, making every row 'maybe seen' and the prefilter pure
    overhead.

    Pass ``bloom=`` (e.g. ``load_bloom`` of a ``save_bloom`` artifact
    from the run that WROTE the prior) to skip the build scan entirely.
    Exactness contract: the artifact must cover every prior digest — a
    SUPERSET is safe (stale entries only add maybes, which the exact
    join re-checks), a subset would let true duplicates bypass the
    join.  Covering-ness is the caller's lifecycle invariant: save the
    bloom in the same job that appends to the prior."""
    from dqc_spark.cache import track

    if bloom is not None:
        pass
    elif n_bits is None:
        bloom = BloomFilter.sized_for(max(1, prior.count()), fp_rate)
        bloom = build_bloom(
            content_digests(prior, text_col), "digest", bloom.n_bits, bloom.k
        )
    else:
        bloom = build_bloom(content_digests(prior, text_col), "digest", n_bits, k)
    # persisted: the tagged frame is a pandas-UDF stage with TWO
    # downstream consumers (certain-new filter + maybe filter) — without
    # a persist Spark re-runs the whole per-row probe per consumer
    tagged = track(bloom_partition(snapshot, bloom, text_col))
    certain_new = tagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybes = tagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    rechecked = new_docs(maybes, prior, text_col)
    return certain_new.unionByName(rechecked)


def snapshot_drift(
    cur: DataFrame,
    prev: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group drift report between two corpus snapshots: doc counts
    and char volumes side by side with deltas — the monitoring table an
    ops run reads before trusting a new crawl ("did source X collapse /
    explode since last month?").

    Scale shape: two partial-aggregatable groupBys (group cardinality
    rows each — sources/domains, ~5 orders below docs) + one full outer
    join of those tiny aggregates.  Corpus text never shuffles; the
    whole report is metadata-sized regardless of corpus size.

    NULL groups are folded to the literal ``<null>`` BEFORE
    aggregation: a full outer join never matches NULL keys to each
    other (both engines agree), which would otherwise split one group
    into two half-empty rows."""
    g = F.coalesce(F.col(group_col).cast("string"), F.lit("<null>"))

    def stats(df: DataFrame, suffix: str) -> DataFrame:
        return df.groupBy(g.alias(group_col)).agg(
            F.count(F.lit(1)).alias(f"n_docs_{suffix}"),
            F.coalesce(
                F.sum(F.length(text_col)), F.lit(0)
            ).cast("long").alias(f"n_chars_{suffix}"),
        )

    joined = stats(cur, "cur").join(
        stats(prev, "prev"), on=group_col, how="full_outer")
    z = F.lit(0).cast("long")
    out = joined.select(
        group_col,
        *[F.coalesce(F.col(c), z).alias(c)
          for c in ("n_docs_prev", "n_docs_cur",
                    "n_chars_prev", "n_chars_cur")],
    )
    return out.select(
        "*",
        (F.col("n_docs_cur") - F.col("n_docs_prev")).alias("docs_delta"),
        (F.col("n_chars_cur") - F.col("n_chars_prev")).alias("chars_delta"),
    )


def source_overlap(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Cross-source duplicate-overlap matrix: for every unordered pair
    of sources, how many distinct CONTENTS appear in both — the
    pre-mixing monitoring table ("is crawl B just a mirror of crawl A",
    "how much of the news slice is syndicated wire copy").  High
    overlap between two sources means their combined token budget
    double-counts the shared mass unless a dedup stage runs between
    them (`dedup_exact` / `dedup_soft_weights`).

    Scale shape: distinct (source, digest) pairs first — a
    partial-aggregatable dropDuplicates over 16-byte digests, shrinking
    every hot re-crawl to one row per source BEFORE the join — then a
    digest self-join restricted to ``source_a < source_b`` and one
    pair-count groupBy.  Per-digest join fanout is bounded by
    (#sources choose 2), not by copy counts; text never shuffles.  NULL
    sources fold to '<null>' pre-agg (same rule as ``snapshot_drift``)
    so the equi-join cannot drop them; NULL texts form one content
    group via the coalesced digest.

    Returns (source_a, source_b, n_shared) with source_a < source_b.
    """
    pairs = (
        df.select(
            F.coalesce(F.col(source_col).cast("string"),
                       F.lit("<null>")).alias("__src"),
            F.coalesce(F.md5(F.col(text_col)),
                       F.lit("__null__")).alias("__h"),
        )
        .dropDuplicates(["__src", "__h"])
    )
    a = pairs.select(F.col("__src").alias("source_a"), "__h")
    b = pairs.select(F.col("__src").alias("source_b"), "__h")
    return (
        a.join(b, "__h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def score_drift(
    cur: DataFrame,
    prev: DataFrame,
    value_col: str,
    edges: list,
) -> DataFrame:
    """Population-stability-index (PSI) drift report between two corpus
    snapshots for one numeric column — the monitoring table that says
    "did the quality-score / doc-length / perplexity DISTRIBUTION move"
    before anyone trusts a new crawl (counts alone miss a shift that
    keeps totals constant).  PSI = Σ_b (p_b − q_b)·ln(p_b/q_b); the
    usual reading: < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 act.

    Scale shape: one tiny bucket-count aggregate per snapshot
    (partial-aggregatable CASE chain over caller-fixed ``edges``; rows
    shuffled = #buckets), full-outer-joined on the bucket id so a
    bucket empty on either side still reports.  NULL values get their
    own bucket (-1) — a surge of NULL scores IS drift.  Proportions are
    Laplace-smoothed ((n+1)/(N+B)) so an empty bucket cannot produce
    ln(0); counts and proportions are int-ratio doubles (bit-identical
    cross-engine, raw-bit oracle compare), while psi_term carries an
    ln() — whose last ULP differs between JVM Math.log and libm — and
    is therefore ROUND-12 on both sides (the CLAUDE.md rule; measured
    divergent at sf0.001).

    Returns (bucket, lo, hi, n_cur, n_prev, p_cur, p_prev, psi_term)
    ordered by bucket; sum(psi_term) is the PSI.
    """
    if not edges or any(b <= a for a, b in zip(edges, edges[1:])):
        # STRICTLY increasing: a duplicate edge makes a zero-width
        # bucket that can never match, silently distorting every
        # smoothed proportion (review finding)
        raise ValueError(
            "edges must be a non-empty strictly-increasing list")
    ed = [float(e) for e in edges]
    nb = len(ed) + 1  # interior buckets; NULL bucket is extra

    def bucket_expr():
        v = F.col(value_col)
        expr = F.lit(len(ed))  # >= last edge
        for i in range(len(ed) - 1, -1, -1):
            expr = F.when(v < F.lit(ed[i]), F.lit(i)).otherwise(expr)
        return F.when(v.isNull(), F.lit(-1)).otherwise(expr)

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (df.select(bucket_expr().alias("bucket"))
                .groupBy("bucket")
                .agg(F.count(F.lit(1)).alias(name)))

    c = counts(cur, "n_cur")
    p = counts(prev, "n_prev")
    # FULL bucket spine (-1 .. len(edges)): a bucket empty in BOTH
    # snapshots must still report — its smoothed terms carry real PSI
    # mass, and the (n+1)/(N+B) proportions only sum to 1 with all B
    # buckets present (review finding: the observed-buckets-only outer
    # join silently dropped them)
    spark = cur.sparkSession
    spine = spark.createDataFrame(
        [(b,) for b in range(-1, len(ed) + 1)], "bucket int")
    joined = (
        spine.join(c, "bucket", "left")
        .join(p, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
            F.coalesce("n_prev", F.lit(0)).alias("n_prev"),
        )
    )
    # snapshot totals derived from the bucket counts themselves — one
    # tiny agg cross-joined back (broadcast 1-row, the mixing.py
    # pattern): fully LAZY and each input is scanned exactly once (an
    # eager .count() per input would re-run any upstream Arrow scoring
    # stage — the documented drift inputs — a second time)
    totals = joined.agg(
        F.sum("n_cur").cast("double").alias("__tc"),
        F.sum("n_prev").cast("double").alias("__tp"))
    smooth_b = nb + 1  # all possible buckets incl. NULL
    j = joined.crossJoin(F.broadcast(totals))
    p_cur = (F.col("n_cur") + F.lit(1.0)) / (
        F.col("__tc") + F.lit(float(smooth_b)))
    p_prev = (F.col("n_prev") + F.lit(1.0)) / (
        F.col("__tp") + F.lit(float(smooth_b)))
    lo = F.element_at(F.lit(ed), F.col("bucket"))  # 1-indexed: edges[b-1]
    out = j.select(
        "bucket",
        F.when(F.col("bucket") <= 0, F.lit(None).cast("double"))
        .otherwise(lo).alias("lo"),
        F.when((F.col("bucket") < 0) | (F.col("bucket") >= len(ed)),
               F.lit(None).cast("double"))
        .otherwise(F.element_at(F.lit(ed), F.col("bucket") + 1))
        .alias("hi"),
        "n_cur",
        "n_prev",
        p_cur.alias("p_cur"),
        p_prev.alias("p_prev"),
        # ROUND-12: p_cur/p_prev are bit-identical cross-engine
        # (int-ratio doubles) but ln() is NOT — JVM Math.log and libm
        # differ in the last ULP, so the product needs the rounding
        # rule engine-different doubles always need (CLAUDE.md; the
        # raw-bit claim was measured false at sf0.001)
        F.round((p_cur - p_prev) * F.log(p_cur / p_prev), 12)
        .alias("psi_term"),
    )
    return out.orderBy("bucket")

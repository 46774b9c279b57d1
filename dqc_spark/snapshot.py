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


def _probe_positions(value: str, n_bits: int, k: int) -> list[int]:
    """k bit positions from one md5: digest split into 4-byte words,
    combined pairwise (double hashing h1 + i*h2) — deterministic,
    engine-independent, and never needs more hash material than one md5."""
    d = hashlib.md5(value.encode("utf-8")).digest()
    h1 = int.from_bytes(d[0:8], "little")
    h2 = int.from_bytes(d[8:16], "little") | 1  # odd -> full-period step
    return [(h1 + i * h2) % n_bits for i in range(k)]


class BloomFilter:
    """Fixed-size bloom bitmap with portable md5 double-hashing."""

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
            for v in pdf[col]:
                if v is None:
                    continue
                for p in _probe_positions(str(v), nb, kk):
                    bits[p >> 3] |= np.uint8(1 << (p & 7))
        if seen:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    partials = df.select(col).mapInPandas(
        kernel, schema=T.StructType([T.StructField("bits", T.BinaryType())])
    )
    out = np.zeros(n_bits // 8, dtype=np.uint8)
    for row in partials.collect():  # one fixed-size row per partition
        out |= np.frombuffer(row["bits"], dtype=np.uint8)
    return BloomFilter(n_bits, k, out)


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
            out = []
            for v in s:
                if v is None:
                    out.append(False)
                    continue
                # probe with the HEX DIGEST of the text — the bloom was
                # built over content_digests() output (Spark md5 = lower
                # hex, same as hexdigest), so both sides hash the same
                # value; probing raw text would silently false-negative.
                # Positions come from the SAME helper the build side
                # uses — a drifting inline copy of the bit derivation
                # would turn bloom "no" answers into silent false drops.
                dg = hashlib.md5(str(v).encode("utf-8")).hexdigest()
                out.append(
                    all(
                        bits[p >> 3] & (1 << (p & 7))
                        for p in _probe_positions(dg, nb, kk)
                    )
                )
            yield pd.Series(out, dtype=bool)

    probe = F.pandas_udf(kernel, T.BooleanType())
    return snapshot.withColumn("maybe_seen", probe(F.col(text_col)))


def new_docs_bloom(
    snapshot: DataFrame,
    prior: DataFrame,
    text_col: str = "text",
    n_bits: int | None = None,
    k: int = 7,
    fp_rate: float = 0.01,
) -> DataFrame:
    """Bloom-accelerated ``new_docs``: same answer, but only the
    bloom-maybe rows reach the exact anti-join.  Exactness: bloom has
    no false negatives, so every truly-seen row is in the maybe set and
    gets exactly re-checked; definitely-new rows bypass the join.

    ``n_bits=None`` sizes the bitmap from the prior's row count (a
    parquet-metadata-cheap upper bound on distinct digests) at
    ``fp_rate`` — a fixed default bitmap silently saturates on a large
    prior, making every row 'maybe seen' and the prefilter pure
    overhead."""
    from dqc_spark.cache import track

    if n_bits is None:
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

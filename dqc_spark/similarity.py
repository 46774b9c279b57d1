"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute-force cosine top-k — exact baseline; dot products as JVM-side
    zip_with/aggregate expressions (no Python), broadcast of the query
    vector as a literal array.  O(n) per query: right answer for one-off
    queries at any scale because it's a single map + top-k reduce.
  * LSH-bucketed (random hyperplane signs -> band join) — the scale path
    for all-pairs / batch-query workloads where O(n) per query times many
    queries is the bottleneck.

Embedding near-duplicate detection (cosine > threshold over all pairs)
reuses the hyperplane-LSH candidates + exact re-scoring, mirroring the
MinHash design in dedup.py.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dqc_spark.cache import track


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(_dot(a, a))


def cosine_col(a, b) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.  The plan is a
    single projection + TakeOrderedAndProject (per-partition top-k then
    merge on the driver) — no full sort, no shuffle of the vectors."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_col(F.col(vec_col), q)
    if round_to is not None:
        sim = F.round(sim, round_to)
    return (
        df.select(F.col(key_col), sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(key_col))
        .limit(k)
    )


def brute_force_topk_arrow(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """Exact cosine top-k with the scoring in ONE Arrow kernel: each
    batch is stacked into a (n, d) matrix and scored with a BLAS matmul.

    Same answer as ``brute_force_topk``; the Catalyst-HOF version
    evaluates the zip_with/aggregate lambdas interpreted per element,
    this one does n*d work in vectorized C.  Measured ~1.5x at 2k x 64
    and the gap widens with rows x dim; prefer this for batch scoring of
    large corpora, the HOF form for oracle-parity paths."""
    import numpy as np
    import pandas as pd

    qv = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(qv))

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].values).astype(np.float64)
            sims = (m @ qv) / (np.linalg.norm(m, axis=1) * qn)
            if round_to is not None:
                sims = np.round(sims, round_to)
            yield pd.DataFrame({key_col: pdf[key_col], "cosine": sims})

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            df.schema[key_col],  # preserve the key type, whatever it is
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    scored = df.select(key_col, vec_col).mapInPandas(kernel, out_schema)
    # TakeOrderedAndProject: per-partition top-k, merge on driver
    return scored.orderBy(F.col("cosine").desc(), F.col(key_col)).limit(k)


def _hyperplanes(n_planes: int, dim: int, seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    return rng.standard_normal((n_planes, dim))


def hyperplane_signatures(
    df: DataFrame,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    dim: int = 64,
    seed: int = 11,
) -> DataFrame:
    """Random-hyperplane LSH: sign bits of <v, h_i> packed into a long.

    ONE Arrow kernel per batch: stack vectors into an (n, d) matrix, a
    single BLAS matmul against the (d, n_planes) plane matrix, pack the
    sign bits with a weighted sum.  The round-1/2 form built the same
    bits as Catalyst zip_with/aggregate lambdas — interpreted per
    element (n_planes x dim multiply-adds per row, 4096 at the 64x64
    default) and the measured 100x-per-core slow path of
    ``embedding_near_dups`` and every ``LshIndex`` build.  Hyperplanes
    are deterministic (seeded Philox) and broadcast inside the closure.
    """
    import pandas as pd

    planes_t = np.ascontiguousarray(_hyperplanes(n_planes, dim, seed).T)
    # bit i weight 2^i; at n_planes=64 the top bit wraps into the int64
    # sign bit — same packed value F.shiftleft produced, and band
    # extraction masks after shifting so the sign never leaks
    weights = np.left_shift(
        np.ones(n_planes, dtype=np.uint64), np.arange(n_planes, dtype=np.uint64)
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # NULL / wrong-length vectors (e.g. after a left join into a
            # vector table) get the zero vector -> sig 0, matching the
            # Column form this kernel replaced (NULL > 0 was false on
            # every plane); np.stack would crash the whole job instead.
            # Fast path stacks the whole batch; the row loop runs only
            # when a batch actually contains a bad row.
            vals = pdf[vec_col].values
            try:
                m = np.stack(vals).astype(np.float64)
                if m.ndim != 2 or m.shape[1] != dim:
                    raise ValueError("ragged or mis-sized batch")
            except (ValueError, TypeError):
                m = np.zeros((len(vals), dim), dtype=np.float64)
                for i, v in enumerate(vals):
                    if v is not None and len(v) == dim:
                        m[i] = v
            bits = (m @ planes_t) > 0
            sig = (bits.astype(np.uint64) * weights).sum(axis=1).astype(np.int64)
            yield pd.DataFrame(
                {"key": pdf[key_col], "vec": pdf[vec_col], "sig": sig}
            )

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("key", df.schema[key_col].dataType),
            T.StructField("vec", df.schema[vec_col].dataType),
            T.StructField("sig", T.LongType()),
        ]
    )
    return df.select(key_col, vec_col).mapInPandas(kernel, out_schema)


class LshIndex:
    """Reusable hyperplane-LSH index for BATCH query workloads.

    ``lsh_topk`` recomputes every signature per query — fine for a
    one-off, wasteful for a query stream.  This wrapper computes the
    signature frame once (persisted via the cache registry; at cluster
    scale, ``save`` it to storage instead) and serves each query as a
    codegen'd bit_count filter + exact re-score over the candidates.
    Call ``close()`` (or ``dqc_spark.release_all()``) when done."""

    def __init__(
        self,
        df: DataFrame,
        key_col: str = "vec_id",
        vec_col: str = "embedding",
        n_planes: int = 16,
        dim: int = 64,
        seed: int = 11,
    ):
        from dqc_spark.cache import track

        # SAME derivation as the signature kernel — a drifting inline
        # copy would silently empty every candidate set
        self._planes = _hyperplanes(n_planes, dim, seed)
        self._key_col = key_col
        self._n_planes = n_planes
        self.sigs = track(
            hyperplane_signatures(df, key_col, vec_col, n_planes, dim, seed)
        )

    def query_sig(self, query_vec: list[float]) -> int:
        qv = np.asarray(query_vec)
        qsig = 0
        for i in range(self._n_planes):
            if float(self._planes[i] @ qv) > 0:
                qsig |= 1 << i
        return qsig

    def topk(
        self, query_vec: list[float], k: int = 10, max_hamming: int = 2
    ) -> DataFrame:
        qsig = self.query_sig(query_vec)
        cand = self.sigs.filter(
            F.bit_count(F.col("sig").bitwiseXOR(F.lit(qsig))) <= max_hamming
        )
        q = F.array(*[F.lit(float(x)) for x in query_vec])
        return (
            cand.select(
                F.col("key").alias(self._key_col),
                cosine_col(F.col("vec"), q).alias("cosine"),
            )
            .orderBy(F.col("cosine").desc(), F.col(self._key_col))
            .limit(k)
        )

    def close(self) -> None:
        self.sigs.unpersist()


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    dim: int = 64,
    max_hamming: int = 2,
) -> DataFrame:
    """Approximate top-k: restrict exact scoring to vectors whose
    hyperplane signature is within ``max_hamming`` bits of the query's —
    the candidate filter is a bit_count over a packed long (codegen).

    One-off form: recomputes signatures per call.  For repeated queries
    build an ``LshIndex`` once and call ``.topk`` per query."""
    planes = _hyperplanes(n_planes, dim, 11)  # same seed as the kernel default
    qsig = 0
    qv = np.asarray(query_vec)
    for i in range(n_planes):
        if float(planes[i] @ qv) > 0:
            qsig |= 1 << i
    sigs = hyperplane_signatures(df, key_col, vec_col, n_planes, dim)
    cand = sigs.filter(
        F.bit_count(F.col("sig").bitwiseXOR(F.lit(qsig))) <= max_hamming
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cand.select(F.col("key").alias(key_col),
                    cosine_col(F.col("vec"), q).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(key_col))
        .limit(k)
    )


def hyperplane_lsh_candidate_pairs(
    sigs: DataFrame,
    n_planes: int = 64,
    bands: int = 8,
    max_bucket: int | None = 500,
) -> DataFrame:
    """Banded-LSH candidate pairs (key_a < key_b, with both vecs) from a
    ``hyperplane_signatures`` frame.

    The ``n_planes``-bit signature is split into ``bands`` chunks of
    ``n_planes/bands`` bits; pairs agreeing on at least one chunk value
    meet in a (band_id, band_val) bucket equi-join.  Bucket population
    is capped via ``dedup._cap_buckets`` BEFORE the self-join, so the
    join fanout is bounded by ``max_bucket^2/2`` per bucket — i.e.
    O(n * max_bucket) candidates total instead of the ~n^2/2^width
    degeneration an uncapped narrow-chunk join suffers (the round-1
    16-plane/4-bit-chunk version).  Band width is the recall/selectivity
    dial: 8x8 bits gives >0.93 recall at cosine>=0.9 while keeping 256
    distinct bucket values per band.
    """
    from dqc_spark.dedup import _cap_buckets

    if n_planes % bands:
        raise ValueError(f"bands={bands} must divide n_planes={n_planes}")
    width = n_planes // bands
    mask = (1 << width) - 1
    chunks = sigs.select(
        "key",
        "vec",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sig"), c * width).bitwiseAND(F.lit(mask))
                    for c in range(bands)
                ]
            )
        ).alias("band_id", "band_val"),
    )
    chunks = _cap_buckets(chunks, ["band_id", "band_val"], max_bucket)
    # persisted: feeds both sides of the self-join (and the cap counts
    # already consumed it once) — without this the signature projection
    # and explode re-run per consumer
    chunks = track(chunks)
    l, r = chunks.alias("l"), chunks.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_val") == F.col("r.band_val"))
            & (F.col("l.key") < F.col("r.key")),
        )
        .select(
            F.col("l.key").alias("key_a"),
            F.col("r.key").alias("key_b"),
            F.col("l.vec").alias("vec_a"),
            F.col("r.vec").alias("vec_b"),
        )
        .dropDuplicates(["key_a", "key_b"])
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.9,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 64,
    bands: int = 8,
    dim: int = 64,
    max_bucket: int | None = 500,
) -> DataFrame:
    """All-pairs cosine near-duplicates: 64-plane banded-LSH candidates
    + exact cosine re-score.  Avoids the O(n^2) cross join brute force
    needs; the bucket cap bounds total candidates to O(n * max_bucket)
    (see ``hyperplane_lsh_candidate_pairs``).

    Approximate by design: recall at ``threshold`` is set by the band
    geometry — with the 8x8 default, >=0.93 for cosine>=0.9 (pinned by
    tests/test_dedup_similarity.py against the exact-pairs oracle on
    planted near-dups).  For LOW thresholds (<~0.7) banded hyperplane
    LSH is the wrong tool at scale — collision probability per band is
    near-uniform, so buckets degenerate; use brute_force_topk_arrow per
    query or an IVF-style partition instead.
    """
    # signatures come out of a Python (Arrow) stage and feed the cap
    # counts, the cap join, and both sides of the band self-join — must
    # be persisted or the Python stage recomputes per consumer
    sigs = track(hyperplane_signatures(df, key_col, vec_col, n_planes, dim))
    cand = hyperplane_lsh_candidate_pairs(sigs, n_planes, bands, max_bucket)
    return cand.select(
        "key_a", "key_b", cosine_col("vec_a", "vec_b").alias("cosine")
    ).filter(F.col("cosine") >= threshold)

"""IVF (inverted-file) approximate nearest-neighbor search over an
embedding column — the learned-partition counterpart to the
data-independent hyperplane LSH in similarity.py.

Scale story (the reason IVF exists at 100 TB): LSH buckets are fixed by
random planes, so every query still has to scan every bucket's band
join.  IVF instead *partitions the corpus by learned centroids*: train
k-means on a hash-sample, assign every vector a cluster id once, store
the corpus partitioned/bucketed by that id, and a query only scans the
``nprobe`` clusters nearest its vector — with the corpus written
``partitionBy("cluster")``, Spark's partition pruning turns that into
reading nprobe/k of the files.  Candidates are re-scored with the exact
Arrow matmul kernel, so precision is exact and recall is the only
approximation (pinned by tests against brute force).

Components:
  * ``train_centroids``  — seeded Spark-ML k-means over L2-normalized
    vectors (normalized L2 ordering == cosine ordering).
  * ``build_ivf_index``  — one Arrow pass assigning cluster ids.
  * ``ivf_topk``         — probe nprobe centroids, exact cosine top-k
    over only those clusters' rows.
With ``nprobe == k_clusters`` the result equals brute force exactly
(every cluster scanned) — used as the oracle in tests.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dqc_spark.similarity import stack_embeddings

__all__ = ["train_centroids", "build_ivf_index", "ivf_topk"]


def train_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    max_iter: int = 20,
    seed: int = 7,
    sample_pct: int | None = None,
    key_col: str = "vec_id",
) -> np.ndarray:
    """(k, dim) float64 centroid matrix from seeded Spark-ML k-means on
    L2-normalized vectors.  At corpus scale pass ``sample_pct`` — the
    deterministic hash sample (sampling.py) is plenty for centroids and
    keeps the driver-side model fit bounded."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    src = df
    if sample_pct is not None:
        from dqc_spark.sampling import hash_sample

        src = hash_sample(df, key_col, sample_pct)
    # normalize JVM-side so k-means L2 geometry matches cosine ordering;
    # zero vectors (padding rows, failed embeds) keep norm 1 instead of
    # producing 0/0 = NaN features that poison the k-means fit — same
    # guard the assignment kernel in build_ivf_index applies
    v = F.col(vec_col).cast("array<double>")
    raw_norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    norm = F.when(raw_norm == 0.0, F.lit(1.0)).otherwise(raw_norm)
    normed = src.select(
        array_to_vector(
            F.transform(v, lambda x: x / norm)
        ).alias("features")
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(normed)
    return np.asarray(model.clusterCenters(), dtype=np.float64)


def _center_order(centroids: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Cluster ids ordered nearest-first for a (normalized) query:
    argmin ||q - c||^2 == argmax (q.c - ||c||^2 / 2)."""
    qn = q / (np.linalg.norm(q) or 1.0)
    score = centroids @ qn - 0.5 * (centroids * centroids).sum(axis=1)
    return np.argsort(-score)


def build_ivf_index(
    df: DataFrame,
    centroids: np.ndarray,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Input plus a ``cluster`` column (nearest centroid of the
    L2-normalized vector), assigned in ONE Arrow matmul pass.

    At cluster scale, write this frame ``partitionBy("cluster")`` (or
    bucketed on it) so ``ivf_topk``'s probe filter becomes partition
    pruning instead of a full scan."""
    cent = np.ascontiguousarray(centroids, dtype=np.float64)
    half_c2 = 0.5 * (cent * cent).sum(axis=1)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # NULL/ragged rows salvage to zero vectors (zero norm is
            # already guarded below) instead of crashing np.stack
            m = stack_embeddings(pdf[vec_col].values)
            n = np.linalg.norm(m, axis=1, keepdims=True)
            n[n == 0] = 1.0
            mn = m / n
            cl = np.argmax(mn @ cent.T - half_c2, axis=1).astype(np.int32)
            out = pdf.copy()
            out["cluster"] = cl
            yield out

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("cluster", T.IntegerType())]
    )
    return df.mapInPandas(kernel, out_schema)


def ivf_topk(
    index: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k: scan only the ``nprobe`` clusters whose
    centroids are nearest the query, exact-score those candidates with
    the Arrow matmul kernel.  ``nprobe == len(centroids)`` degenerates
    to exact brute force (the test oracle)."""
    from dqc_spark.similarity import stack_embeddings, brute_force_topk_arrow

    q = np.asarray(query_vec, dtype=np.float64)
    probes = [int(c) for c in _center_order(centroids, q)[:nprobe]]
    cand = index.filter(F.col("cluster").isin(probes))
    return brute_force_topk_arrow(
        cand, query_vec, k=k, key_col=key_col, vec_col=vec_col,
        round_to=round_to,
    )

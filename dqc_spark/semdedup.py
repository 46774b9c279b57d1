"""SemDeDup — semantic deduplication via cluster-local cosine pruning.

Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" (arXiv 2303.09540): exact/near dedup misses
*semantically* redundant pairs (same content re-phrased, boilerplate
translations, templated rewrites).  The published recipe — and the one
thing that makes all-pairs cosine tractable at corpus scale — is:

  1. k-means the embeddings into k clusters (k chosen so a cluster is
     thousands of points, not millions);
  2. WITHIN each cluster only, prune documents whose cosine to an
     already-kept cluster-mate exceeds ``threshold``.

Cross-cluster pairs are never compared: the clustering is the blocking
step, exactly like LSH bands block the minhash pass (`dedup.py`).  Work
is O(sum c_i^2 · d) instead of O(n^2 · d), and each cluster prunes
independently — embarrassingly parallel.

Spark shape: reuses the IVF machinery (`ivf.py`) — seeded Spark-ML
k-means on a hash sample for centroids, ONE Arrow matmul pass to assign
clusters — then one ``applyInPandas`` group per cluster runs the greedy
keep.  The shuffle carries (key, vector, cluster) once; the greedy is a
single BLAS gram matrix + an O(c^2) scan per group.  At 10^12 docs the
knobs are k (bounds c = n/k per group, the paper uses ~0.1% of n) and
writing the assigned frame ``partitionBy("cluster")`` so re-runs with a
new threshold skip the assign pass.

Determinism: the keep set is a pure function of (centroids, vectors) —
greedy order is sorted key, cluster assignment is argmax (first-max tie
rule), so the result is partition-invariant (pinned by pytest along
with a python-model parity differential and planted-near-dup recall).

Reference parity: no vector surface in data_quality_checker; §2.5
training-data scope (dedup family, alongside minhash/simhash/LSH).
"""

from __future__ import annotations

import numpy as np

from dqc_spark.similarity import stack_embeddings
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["semdedup_prune_py", "semantic_dedup", "semantic_dedup_text"]


def semdedup_prune_py(items: list[tuple], threshold: float) -> dict:
    """Greedy cluster-local prune, the shared reference: iterate keys in
    sorted order, keep a doc iff its max cosine to every already-KEPT
    doc is below ``threshold``.  (Comparing against kept docs only —
    not all earlier docs — is the SemDeDup rule: a dropped duplicate
    must not shadow later documents.)  Returns {key: bool}."""
    items = sorted(items, key=lambda kv: kv[0])
    kept: list[np.ndarray] = []
    out: dict = {}
    for key, vec in items:
        v = np.asarray(vec, dtype=np.float64)
        n = np.linalg.norm(v)
        vn = v / (n if n else 1.0)
        dup = any(float(k @ vn) >= threshold for k in kept)
        out[key] = not dup
        if not dup:
            kept.append(vn)
    return out


def semantic_dedup(
    df: DataFrame,
    centroids: np.ndarray,
    key_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """(key, cluster, keep) for EVERY input row — keep=False marks a
    semantic duplicate of a kept cluster-mate.  Row count always equals
    the input count (the decision column form, like ``gates.py``), so
    callers filter or weight as they choose.

    ``centroids``: a (k, dim) matrix from ``ivf.train_centroids`` (pass
    ``sample_pct`` there at scale).  Vectors are compared L2-normalized;
    zero vectors keep norm 1 (duplicate of each other only if threshold
    <= 0 — they sit at the origin, cosine 0).
    """
    from dqc_spark.ivf import build_ivf_index

    assigned = build_ivf_index(
        df.select(key_col, vec_col), centroids, key_col=key_col,
        vec_col=vec_col)

    out_schema = T.StructType([
        df.schema[key_col],
        T.StructField("cluster", T.IntegerType()),
        T.StructField("keep", T.BooleanType()),
    ])
    thr = float(threshold)

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(key_col, kind="mergesort")
        # NULL/ragged rows salvage to zero vectors (zero norm is
        # already guarded below) instead of crashing np.stack
        m = stack_embeddings(pdf[vec_col].values)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        mn = m / norms
        c = len(pdf)
        keep = np.zeros(c, dtype=bool)
        kept_ix: list[int] = []
        # BLOCKED greedy: a full c x c gram matrix is O(c^2) memory —
        # 20 GB for a 50k-vector mega-cluster (junk/zero vectors DO
        # collapse into one cluster at corpus scale).  Per block of B
        # rows: one BLAS matmul against the kept-so-far matrix (the
        # cross-block dependencies) + the block's own B x B gram (the
        # intra-block ones).  Memory O(c*d + B*c), identical keep set
        # to the one-gram form (the greedy consumes the same numbers
        # in the same order — pinned by the python-parity test).
        B = 2048
        for lo in range(0, c, B):
            hi = min(lo + B, c)
            blk = mn[lo:hi]
            # only the MAX cosine vs earlier-kept matters, so the
            # (block x kept) product reduces chunk-by-chunk into one
            # running-max vector — peak extra memory O(B * chunk)
            prior_max = np.full(hi - lo, -np.inf)
            for klo in range(0, len(kept_ix), 8192):
                sub = mn[kept_ix[klo:klo + 8192]]
                np.maximum(prior_max, (blk @ sub.T).max(axis=1),
                           out=prior_max)
            g_blk = blk @ blk.T
            blk_kept: list[int] = []  # block-local indices kept
            for j in range(hi - lo):
                dup = prior_max[j] >= thr or (
                    bool(blk_kept)
                    and float(g_blk[j, blk_kept].max()) >= thr)
                if not dup:
                    keep[lo + j] = True
                    blk_kept.append(j)
                    kept_ix.append(lo + j)
        return pd.DataFrame({
            key_col: pdf[key_col].values,
            "cluster": pdf["cluster"].values,
            "keep": keep,
        })

    return assigned.groupBy("cluster").applyInPandas(prune, out_schema)


def semantic_dedup_text(
    df: DataFrame,
    key_col: str,
    text_col: str = "text",
    dim: int = 256,
    n_clusters: int = 16,
    threshold: float = 0.9,
    max_iter: int = 5,
    seed: int = 7,
    sample_pct: int | None = None,
) -> DataFrame:
    """Model-free SemDeDup over raw TEXT: no embedding model required.
    Signed hashed-TF-IDF vectors (`textvectors.hashed_tfidf` — the
    hashing trick, unit-norm) stand in for learned embeddings; the
    k-means blocking + cluster-local greedy prune is byte-identical to
    ``semantic_dedup``.  TF-IDF cosine catches template/boilerplate
    rewrites and shuffled near-copies that exact/minhash dedup miss at
    high thresholds, without shipping a model to executors.

    One extra persist: the vector frame embeds an Arrow kernel and
    feeds THREE consumers (k-means fit, assign pass, prune) — the
    CLAUDE.md multi-consumer rule.

    Returns (key, cluster, keep) — same decision-column contract.
    """
    from dqc_spark.cache import track
    from dqc_spark.ivf import train_centroids
    from dqc_spark.textvectors import hashed_tfidf

    # hashed_tfidf emits a fixed ("key", "embedding") schema — restore
    # the caller's key name so the decision frame joins back naturally
    vecs = track(
        hashed_tfidf(df, key_col, text_col=text_col, dim=dim)
        .withColumnRenamed("key", key_col))
    cent = train_centroids(
        vecs, vec_col="embedding", k=n_clusters, max_iter=max_iter,
        seed=seed, sample_pct=sample_pct, key_col=key_col)
    return semantic_dedup(
        vecs, cent, key_col=key_col, vec_col="embedding",
        threshold=threshold)

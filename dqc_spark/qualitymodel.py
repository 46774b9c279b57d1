"""Quality-classifier training IN Spark: distributed IRLS logistic
regression over the gate features.

The heuristic gates (gates.py) are hand-thresholded; production corpus
filters are usually a small linear model trained on labeled pages
(fastText-style).  This module trains that model distributed and scores
with a pure-Column expression:

  * TRAIN: iteratively reweighted least squares (Newton).  Each
    iteration is ONE pass: an Arrow kernel emits per-batch partials
    (X'WX, X'Wz, loss) — a (d+1)x(d+1) matrix + vector per batch,
    d ~ 10 features — which are summed by a tiny driver reduce (the
    collect traffic is O(partitions * d^2) floats, metadata-sized, the
    same policy as ordering.py's per-partition counts).  The corpus is
    never shuffled; weights broadcast each round.  IRLS converges in
    ~5-10 iterations regardless of row count, so a 10^12-doc fit is
    ~10 corpus scans — and in practice you fit on a hash_sample.
  * SCORE: ``score_col(weights, feature_cols)`` builds
    sigmoid(w.x) as a plain Catalyst expression — whole-stage codegen,
    no Python anywhere in the scoring path.  This is the part that runs
    over 100 TB; training cost is amortized to nothing.

Features are standardized internally (one agg pass for mean/std) for
conditioning; returned weights are UN-standardized back to raw feature
space so ``score_col`` needs no stats at serving time.

Determinism: batch partials are float64 sums; the driver accumulates
them in sorted order. Across different partitionings the result can
differ by float round-off only (~1e-12 relative) — the convergence
test pins distributed == local-numpy reference to that tolerance.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["LogRegModel", "train_logreg", "score_col", "train_logreg_local"]


@dataclass
class LogRegModel:
    feature_cols: list[str]
    weights: np.ndarray  # (d,) raw-space
    intercept: float
    n_iters: int
    converged: bool
    final_loss: float

    def predict_col(self, threshold: float = 0.5) -> Column:
        return (score_col(self) > F.lit(threshold)).alias("keep_pred")


def score_col(model: "LogRegModel") -> Column:
    """sigmoid(w.x + b) as a pure Catalyst expression (codegen, no UDF)."""
    z = F.lit(float(model.intercept))
    for c, w in zip(model.feature_cols, model.weights):
        z = z + F.coalesce(F.col(c).cast("double"), F.lit(0.0)) * float(w)
    return (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("quality_score")


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def _irls_partial(X: np.ndarray, y: np.ndarray, beta: np.ndarray):
    """One batch's Newton partials for standardized design X (with
    leading 1s column): (X'WX, X'(Wz), sum log-loss, n)."""
    eta = X @ beta
    p = _sigmoid(eta)
    w = np.maximum(p * (1.0 - p), 1e-10)
    # working response: z = eta + (y - p) / w ; X'W z = X'W eta + X'(y-p)
    XtWX = (X * w[:, None]).T @ X
    XtWz = X.T @ (w * eta + (y - p))
    pc = np.clip(p, 1e-12, 1 - 1e-12)
    loss = float(-np.sum(y * np.log(pc) + (1 - y) * np.log(1 - pc)))
    return XtWX, XtWz, loss, len(y)


def _feature_stats(df: DataFrame, feature_cols: list[str]):
    aggs = []
    for c in feature_cols:
        aggs.append(F.avg(F.col(c).cast("double")).alias(f"m_{c}"))
        aggs.append(F.stddev_pop(F.col(c).cast("double")).alias(f"s_{c}"))
    row = df.agg(*aggs).first()
    mu = np.array([row[f"m_{c}"] or 0.0 for c in feature_cols])
    sd = np.array([row[f"s_{c}"] or 0.0 for c in feature_cols])
    sd[sd < 1e-12] = 1.0  # constant feature -> weight 0, not a div-by-0
    return mu, sd


def train_logreg(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    max_iter: int = 25,
    tol: float = 1e-8,
    l2: float = 1e-6,
) -> LogRegModel:
    """Distributed IRLS fit of P(label=1 | features).  See module
    docstring for the pass structure; NULL features are treated as 0
    (matching ``score_col``), NULL labels are dropped."""
    d = len(feature_cols)
    mu, sd = _feature_stats(df, feature_cols)

    src = df.select(
        *[F.coalesce(F.col(c).cast("double"), F.lit(0.0)).alias(c)
          for c in feature_cols],
        F.col(label_col).cast("double").alias("__y"),
    ).filter(F.col("__y").isNotNull())

    out_schema = T.StructType(
        [
            T.StructField("xtwx", T.ArrayType(T.DoubleType())),
            T.StructField("xtwz", T.ArrayType(T.DoubleType())),
            T.StructField("loss", T.DoubleType()),
            T.StructField("n", T.LongType()),
        ]
    )

    beta = np.zeros(d + 1)
    spark = df.sparkSession
    converged = False
    loss_prev = np.inf
    it = 0
    loss_total = float("nan")
    for it in range(1, max_iter + 1):
        bc = spark.sparkContext.broadcast((beta, mu, sd))

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            b, m, s = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                Xr = pdf[feature_cols].to_numpy(dtype=np.float64)
                Xs = (Xr - m) / s
                X = np.hstack([np.ones((len(Xs), 1)), Xs])
                y = pdf["__y"].to_numpy(dtype=np.float64)
                XtWX, XtWz, loss, n = _irls_partial(X, y, b)
                yield pd.DataFrame(
                    {
                        "xtwx": [XtWX.ravel().tolist()],
                        "xtwz": [XtWz.tolist()],
                        "loss": [loss],
                        "n": [n],
                    }
                )

        parts = src.mapInPandas(kernel, schema=out_schema).collect()
        if not parts:
            raise ValueError("no labeled rows to fit")
        # deterministic driver reduce: sort partials before summing
        parts = sorted(parts, key=lambda r: (r["n"], r["loss"]))
        A = np.zeros((d + 1, d + 1))
        v = np.zeros(d + 1)
        loss_total = 0.0
        n_total = 0
        for r in parts:
            A += np.array(r["xtwx"]).reshape(d + 1, d + 1)
            v += np.array(r["xtwz"])
            loss_total += r["loss"]
            n_total += r["n"]
        A += l2 * np.eye(d + 1)
        beta_new = np.linalg.solve(A, v)
        bc.destroy()
        if not np.all(np.isfinite(beta_new)):
            break
        step = np.max(np.abs(beta_new - beta))
        beta = beta_new
        if step < tol or abs(loss_prev - loss_total) < tol * max(1.0, n_total):
            converged = True
            break
        loss_prev = loss_total

    # un-standardize: w_raw = w_std / sd ; b_raw = b - sum(w_std*mu/sd)
    w_raw = beta[1:] / sd
    b_raw = float(beta[0] - np.sum(beta[1:] * mu / sd))
    return LogRegModel(
        feature_cols=list(feature_cols),
        weights=w_raw,
        intercept=b_raw,
        n_iters=it,
        converged=converged,
        final_loss=float(loss_total),
    )


def train_logreg_local(
    X: np.ndarray,
    y: np.ndarray,
    max_iter: int = 25,
    tol: float = 1e-8,
    l2: float = 1e-6,
):
    """Pure-numpy reference: IDENTICAL algorithm on one matrix — the
    pytest differential oracle for the distributed fit."""
    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    sd = np.where(sd < 1e-12, 1.0, sd)
    Xs = np.hstack([np.ones((len(X), 1)), (X - mu) / sd])
    beta = np.zeros(Xs.shape[1])
    loss_prev = np.inf
    for _ in range(max_iter):
        XtWX, XtWz, loss, n = _irls_partial(Xs, y, beta)
        A = XtWX + l2 * np.eye(Xs.shape[1])
        beta_new = np.linalg.solve(A, XtWz)
        step = np.max(np.abs(beta_new - beta))
        beta = beta_new
        if step < tol or abs(loss_prev - loss) < tol * max(1.0, n):
            break
        loss_prev = loss
    return beta[1:] / sd, float(beta[0] - np.sum(beta[1:] * mu / sd))

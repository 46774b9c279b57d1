"""DSIR-style importance resampling: pick raw documents that *look like*
a trusted target corpus, using the ratio of two n-gram language models.

Method (Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023 — the LM-ratio variant, as in CCNet/LLaMA
data prep):

  1. train a bigram LM on the TARGET slice (wiki/books/trusted pages)
     and one on the RAW pool — both via ``lmtrain.train_bigram_lm``
     (distributed counting, driver receives only the capped model);
  2. per-document importance weight
     ``log w(x) = log ppl_raw(x) − log ppl_target(x)``
     (equivalently the per-token LM log-likelihood ratio — documents the
     target model likes and the raw model finds surprising score high);
  3. sample ``k`` documents *without replacement* with probability
     proportional to ``w(x)`` via the Gumbel-max / Efraimidis–Spirakis
     trick: per-row key ``log w + Gumbel(u)`` with ``u`` a deterministic
     per-(row, seed) uniform, then global top-k.

Scale shape (the 10^12-doc lens):

  * both LMs are vocab/bigram-capped broadcasts (``max_vocab`` +
    ``max_bigrams`` rows, ~MBs) — executors never see corpus-sized
    model state;
  * the weight stage is ONE Arrow pandas UDF over ``text`` —
    embarrassingly parallel, no shuffle, one Arrow transfer (the
    repo-wide fused-kernel rule; both perplexities share one batch-level
    bigram-log memo per model);
  * Gumbel keys are pure narrow Column math on ``xxhash64`` — no RNG
    state, reproducible under retries/speculation, invariant to
    partitioning; selection is ``orderBy(desc).limit(k)`` which Spark
    plans as TakeOrderedAndProject (per-partition top-k + driver merge
    of k-row heaps — no global sort materializes; pinned by
    tests/test_dsir.py).

Oracle strategy: importance weights reuse ``textmodels.perplexity``
VERBATIM (the oracle-shared kernel — never forked, CLAUDE.md), so
Spark-vs-python weight parity is exact; the sampler is pinned by a
brute-force top-k differential over the same Gumbel-keyed frame plus a
partition-count-invariance test.  Driver entry ``dsir_select`` is
rows-only (LM training is iterative/engine-specific).

Reference parity: the reference (data_quality_checker,
internal/checker/checker.go) has no corpus-selection surface; this is
§2.5 training-data-pipeline scope per the web-corpus north rule.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dqc_spark.textmodels import perplexity

__all__ = [
    "importance_weight_py",
    "importance_weights",
    "gumbel_keyed",
    "weighted_sample",
]


def importance_weight_py(
    text: str | None,
    target_lm: dict,
    raw_lm: dict,
    logcaches: tuple[dict, dict] | None = None,
) -> float:
    """``log ppl_raw − log ppl_target`` for one document — shared
    verbatim by the Spark kernel and the pytest oracle.  Empty/None text
    scores 0.0 (both perplexities hit the same 1e9 floor)."""
    if logcaches is None:
        c_t, c_r = None, None
    else:
        c_t, c_r = logcaches
    return math.log(perplexity(text or "", raw_lm, c_r)) - math.log(
        perplexity(text or "", target_lm, c_t)
    )


def importance_weights(
    df: DataFrame,
    target_lm: dict,
    raw_lm: dict,
    text_col: str = "text",
    out_col: str = "logw",
) -> DataFrame:
    """Append the DSIR log-importance-weight column.  Both models ride
    ONE broadcast (a 2-tuple) owned by this call; the UDF computes both
    perplexities from one batch, each with its own batch-level log memo
    (bit-exact per the perplexity cache contract)."""
    bc = df.sparkSession.sparkContext.broadcast((target_lm, raw_lm))

    @F.pandas_udf("double")
    def logw_udf(texts: pd.Series) -> pd.Series:
        t_lm, r_lm = bc.value
        caches: tuple[dict, dict] = ({}, {})
        return pd.Series(
            [importance_weight_py(t, t_lm, r_lm, caches) for t in texts]
        )

    return df.withColumn(out_col, logw_udf(F.col(text_col)))


# 53 uniform bits -> (0, 1): shift the signed xxhash64 into the mantissa
# range (shiftrightunsigned keeps it non-negative), +0.5 centers each
# bucket so u is never exactly 0 or 1 (log(-log(u)) stays finite)
_U53 = float(1 << 53)


def _uniform01(*cols: Column | str, seed: int) -> Column:
    return (
        F.shiftrightunsigned(F.xxhash64(*cols, F.lit(int(seed))), 11)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(_U53)


def gumbel_keyed(
    df: DataFrame,
    weight_col: str = "logw",
    key_cols: list[str] | None = None,
    seed: int = 0,
    out_col: str = "__gk",
) -> DataFrame:
    """Append the Gumbel sort key ``w − log(−log(u))`` with ``u``
    deterministic from ``xxhash64(key_cols, seed)``.  Exposed separately
    so tests can brute-force the top-k over the identical keyed frame.
    NULL weights get NULL keys (sort last under ``desc``), so unscored
    rows can never displace scored ones.

    ``key_cols`` MUST identify rows uniquely: hashing the weight itself
    would give every equal-weight row the same uniform (a degenerate,
    layout-dependent sample), so there is deliberately no default."""
    if not key_cols:
        raise ValueError(
            "key_cols must name unique row key column(s); seeding the "
            "Gumbel draw from the weight would collapse ties")
    u = _uniform01(*key_cols, seed=seed)
    gk = F.col(weight_col) - F.log(-F.log(u))
    return df.withColumn(out_col, gk)


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str = "logw",
    key_cols: list[str] | None = None,
    seed: int = 0,
) -> DataFrame:
    """``k`` rows without replacement, P(row) ∝ exp(weight_col), exact
    Efraimidis–Spirakis via Gumbel top-k.  ``key_cols`` seed the per-row
    uniform (REQUIRED: the unique document key — see ``gumbel_keyed``;
    they also tie-break so the result is fully deterministic).  One
    TakeOrderedAndProject — no global sort, no RNG state,
    partition-count invariant."""
    keyed = gumbel_keyed(df, weight_col, key_cols, seed=seed)
    return (
        keyed.orderBy(F.desc("__gk"), *key_cols)
        .limit(int(k))
        .drop("__gk")
    )

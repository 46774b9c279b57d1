"""KenLM-style n-gram perplexity scoring as a broadcast-model pandas UDF.

Same production shape as langid.py: bigram count tables built once
(textmodels.build_lm — a real KenLM binary drops in the same slot),
broadcast to executors, applied inside Arrow batches.  High perplexity
= text unlike natural language -> drop gate.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dqc_spark.textmodels import perplexity

DEFAULT_MAX_PPL = 100.0


def make_perplexity_udf(spark: SparkSession, lm: dict | None = None):
    """Scoring UDF over the default in-repo LM, or — CCNet-style — over
    a caller-supplied model dict (e.g. one trained IN Spark on a
    trusted slice via ``lmtrain.train_bigram_lm``).  A custom ``lm`` is
    broadcast once here; the caller owns its lifetime."""
    if lm is None:
        from dqc_spark.scoring import _broadcast_models

        _, bc = _broadcast_models(spark)
    else:
        bc = spark.sparkContext.broadcast(lm)

    @F.pandas_udf(T.DoubleType())
    def ppl_udf(texts: pd.Series) -> pd.Series:
        m = bc.value
        return texts.map(lambda t: perplexity(t, m))

    return ppl_udf


def with_perplexity(
    df: DataFrame, text_col: str = "text", lm: dict | None = None
) -> DataFrame:
    udf = make_perplexity_udf(df.sparkSession, lm=lm)
    return df.withColumn("ppl", udf(F.col(text_col)))


def high_ppl_pred(max_ppl: float = DEFAULT_MAX_PPL) -> Column:
    return F.col("ppl") > max_ppl

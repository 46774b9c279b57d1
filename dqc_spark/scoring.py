"""Combined model-scoring UDF: language ID + perplexity in one pass.

langid.py and perplexity.py expose the standalone operators; the
pipeline uses this fused variant because each pandas UDF ships the full
``text`` column through Arrow — two UDFs means paying that transfer
twice.  One UDF, one transfer, both scores.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dqc_spark.textmodels import build_langid_model, build_lm, langid_score, perplexity

_SCORE_TYPE = T.StructType(
    [
        T.StructField("lang_pred", T.StringType()),
        T.StructField("lang_conf", T.DoubleType()),
        T.StructField("ppl", T.DoubleType()),
    ]
)


def make_score_udf(spark: SparkSession):
    bc_model = spark.sparkContext.broadcast(build_langid_model())
    bc_lm = spark.sparkContext.broadcast(build_lm())

    @F.pandas_udf(_SCORE_TYPE)
    def score_udf(texts: pd.Series) -> pd.DataFrame:
        model, lm = bc_model.value, bc_lm.value
        preds, confs, ppls = [], [], []
        for t in texts:
            lang, conf = langid_score(t, model)
            preds.append(lang)
            confs.append(conf)
            ppls.append(perplexity(t, lm))
        return pd.DataFrame(
            {"lang_pred": preds, "lang_conf": confs, "ppl": ppls}
        )

    return score_udf


def with_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    udf = make_score_udf(df.sparkSession)
    return (
        df.withColumn("__sc", udf(F.col(text_col)))
        .withColumn("lang_pred", F.col("__sc.lang_pred"))
        .withColumn("lang_conf", F.col("__sc.lang_conf"))
        .withColumn("ppl", F.col("__sc.ppl"))
        .drop("__sc")
    )

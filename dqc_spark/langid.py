"""fastText-style language identification as a broadcast-model pandas UDF.

Production shape: load the model once on the driver, ``sc.broadcast`` it,
score inside Arrow-batched pandas UDFs — executors deserialize the model
once per worker, not per row or per task closure (the model would
otherwise be re-pickled into every task).  The in-repo model is a
deterministic char-trigram profile (textmodels.build_langid_model); a
real fastText .bin drops in by replacing ``_score_batch``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dqc_spark.textmodels import langid_score

_RESULT_TYPE = T.StructType(
    [
        T.StructField("lang_pred", T.StringType()),
        T.StructField("lang_conf", T.DoubleType()),
    ]
)


def make_langid_udf(spark: SparkSession):
    """Build the UDF with the model broadcast to executors (broadcast
    reused across calls via scoring._broadcast_models)."""
    from dqc_spark.scoring import _broadcast_models

    bc, _ = _broadcast_models(spark)

    @F.pandas_udf(_RESULT_TYPE)
    def langid_udf(texts: pd.Series) -> pd.DataFrame:
        model = bc.value
        preds, confs = [], []
        for t in texts:
            lang, conf = langid_score(t, model)
            preds.append(lang)
            confs.append(conf)
        return pd.DataFrame({"lang_pred": preds, "lang_conf": confs})

    return langid_udf


def with_langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append lang_pred/lang_conf columns in one projection."""
    udf = make_langid_udf(df.sparkSession)
    tagged = df.withColumn("__lid", udf(F.col(text_col)))
    return tagged.select(
        *[F.col(c) for c in df.columns],
        F.col("__lid.lang_pred").alias("lang_pred"),
        F.col("__lid.lang_conf").alias("lang_conf"),
    )


def lang_mismatch_pred(claimed: str = "lang", min_conf: float = 0.2) -> Column:
    """Gate: predicted language disagrees with the claimed ``lang``
    column with confidence — the per-document generalization of the
    reference's enum check (#3) on the lang column."""
    return (F.col("lang_pred") != F.col(claimed)) & (F.col("lang_conf") >= min_conf)

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


def make_langid_udf(spark: SparkSession, model: dict | None = None):
    """Build the UDF with the model broadcast to executors (broadcast
    reused across calls via scoring._broadcast_models).  ``model``
    swaps in a caller-supplied profile dict — e.g. one trained IN
    Spark via ``train_langid_model`` — broadcast here and owned by
    the caller."""
    from dqc_spark.scoring import _broadcast_models

    if model is not None:
        bc = spark.sparkContext.broadcast(model)
    else:
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


def with_langid(
    df: DataFrame, text_col: str = "text", model: dict | None = None
) -> DataFrame:
    """Append lang_pred/lang_conf columns in one projection."""
    udf = make_langid_udf(df.sparkSession, model=model)
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


# ---------------------------------------------------------------------------
# distributed langid TRAINING (fastText-style: learn the profiles from a
# labeled corpus instead of shipping them in the repo)
# ---------------------------------------------------------------------------
#
# Same scale shape as lmtrain.py: ONE Arrow combiner kernel emits
# per-batch pre-aggregated (lang, gram, cnt) partials (the corpus text
# never shuffles), a (lang, gram) groupBy-sum finishes the counts, and
# the per-language profile cap runs two-phase (per-partition head, then
# a row_number window whose input is bounded by cap x n_partitions per
# language — never the raw gram table).  The driver collects only the
# finished capped profile: <= max_trigrams_per_lang x n_langs rows.
#
# The trained dict is bit-compatible with textmodels.build_langid_model
# output, so langid_score / the fused scoring UDF / the golden pipeline
# oracle consume it unchanged.  Gram hashes are uint64; they travel
# through Spark as their int64 reinterpretation (signed view) and are
# viewed back on the driver — the cap tie-break orders on the SIGNED
# value, mirrored exactly by the python twin.

import math
from collections import Counter
from typing import Iterator

import numpy as np
from pyspark.sql import Window as W
from pyspark.sql import types as TT

from dqc_spark.textmodels import LANGID_SAMPLE_CHARS, _trigram_hashes

_TRI_SCHEMA = TT.StructType(
    [
        TT.StructField("lang", TT.StringType()),
        TT.StructField("gram", TT.LongType()),
        TT.StructField("cnt", TT.LongType()),
    ]
)


def trigram_counts(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    sample_chars: int = LANGID_SAMPLE_CHARS,
) -> DataFrame:
    """(lang, gram, n) char-trigram counts per language — gram is the
    int64 view of the uint64 trigram hash.  Combiner kernel: one
    pre-aggregated row per distinct (lang, gram) per batch."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # gram arrays pooled per language, ONE np.unique per
            # (lang, batch) — a per-gram python dict loop here is the
            # CLAUDE.md pandas-UDF trap (millions of dict ops per
            # batch); the hashing itself stays the shared per-doc
            # kernel (_trigram_hashes)
            per_lang: dict[str, list[np.ndarray]] = {}
            for lang, text in zip(pdf[lang_col], pdf[text_col]):
                if lang is None:
                    continue
                h = _trigram_hashes((text or "")[:sample_chars])
                if len(h):
                    per_lang.setdefault(lang, []).append(h)
            langs: list[str] = []
            grams: list[np.ndarray] = []
            cnts: list[np.ndarray] = []
            for lang, arrs in per_lang.items():
                u, c = np.unique(np.concatenate(arrs), return_counts=True)
                langs += [lang] * len(u)
                grams.append(u.view(np.int64))
                cnts.append(c.astype(np.int64))
            yield pd.DataFrame(
                {
                    "lang": langs,
                    "gram": np.concatenate(grams) if grams
                    else np.array([], dtype=np.int64),
                    "cnt": np.concatenate(cnts) if cnts
                    else np.array([], dtype=np.int64),
                }
            )

    return (
        df.select(lang_col, text_col)
        .mapInPandas(kernel, schema=_TRI_SCHEMA)
        .groupBy("lang", "gram")
        .agg(F.sum("cnt").alias("n"))
    )


def _cap_per_lang(agg: DataFrame, cap: int) -> DataFrame:
    """Top-``cap`` grams per language by (n desc, gram asc): a
    per-partition head bounds the window input, then one row_number
    window finishes — window input <= cap x n_partitions per lang."""

    def precap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield (
                    pdf.sort_values(["lang", "n", "gram"],
                                    ascending=[True, False, True])
                    .groupby("lang", sort=False).head(cap)
                )

    pre = agg.mapInPandas(precap, schema=agg.schema)
    w = W.partitionBy("lang").orderBy(F.desc("n"), F.asc("gram"))
    return (
        pre.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= cap)
        .drop("__r")
    )


def _profile_to_model(rows: list[tuple]) -> dict:
    """(lang, gram_i64, n) rows -> the build_langid_model dict shape.
    Integer norm accumulation keeps the result exactly reproducible
    regardless of row order."""
    if not rows:
        # fail HERE, loudly: an empty model (every training row had a
        # NULL lang or sub-trigram text) would otherwise crash with an
        # opaque IndexError deep inside the first scoring UDF batch
        raise ValueError(
            "no usable training rows: every row had a NULL label or "
            "text shorter than one trigram — check lang_col/text_col")
    per_lang: dict[str, dict[int, int]] = {}
    for lang, gram, n in rows:
        per_lang.setdefault(lang, {})[int(gram)] = int(n)
    langs = sorted(per_lang)
    profiles = []
    for lang in langs:
        d = per_lang[lang]
        norm = math.sqrt(float(sum(v * v for v in d.values()))) or 1.0
        profiles.append(
            {np.int64(k).view(np.uint64).item(): v / norm
             for k, v in d.items()}
        )
    all_keys = sorted(set().union(*[set(d) for d in profiles]) if profiles else [])
    keys = np.array(all_keys, dtype=np.uint64)
    weights = np.zeros((len(all_keys), len(langs)), dtype=np.float64)
    pos = {k: i for i, k in enumerate(all_keys)}
    for li, d in enumerate(profiles):
        for k, w in d.items():
            weights[pos[k], li] = w
    return {"langs": langs, "keys": keys, "weights": weights}


def train_langid_model(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    max_trigrams_per_lang: int = 20_000,
    sample_chars: int = LANGID_SAMPLE_CHARS,
) -> dict:
    """Train the fastText-style trigram profile model IN Spark from a
    labeled corpus (e.g. a vetted slice with trusted ``lang`` tags).
    Drop-in replacement for the in-repo synthetic model: feed the
    result to ``with_langid(df, model=...)``."""
    agg = trigram_counts(df, lang_col, text_col, sample_chars)
    top = _cap_per_lang(agg, max_trigrams_per_lang)
    rows = [(r["lang"], r["gram"], r["n"]) for r in top.collect()]
    return _profile_to_model(rows)


def train_langid_py(
    rows,
    lang_col: str = "lang",
    text_col: str = "text",
    max_trigrams_per_lang: int = 20_000,
    sample_chars: int = LANGID_SAMPLE_CHARS,
) -> dict:
    """Single-process twin of train_langid_model (exact, not
    approximate): same counts, same (n desc, gram asc) cap tie-break
    on the signed gram view, same integer-norm profile build."""
    counts: dict[str, Counter] = {}
    for r in rows:
        lang, text = r[lang_col], r[text_col]
        if lang is None:
            continue
        h = _trigram_hashes((text or "")[:sample_chars])
        if len(h) == 0:
            continue
        c = counts.setdefault(lang, Counter())
        uniq, n = np.unique(h, return_counts=True)
        for g, k in zip(uniq.view(np.int64), n):
            c[int(g)] += int(k)
    out = []
    for lang, c in counts.items():
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        out += [(lang, g, n) for g, n in top[:max_trigrams_per_lang]]
    return _profile_to_model(out)


def model_to_df(spark: SparkSession, model: dict) -> DataFrame:
    """Serialize a langid model to a (lang, gram, weight) frame — the
    persistence shape (write it as parquet next to the corpus)."""
    rows = []
    keys_i64 = model["keys"].view(np.int64)
    for li, lang in enumerate(model["langs"]):
        col = model["weights"][:, li]
        nz = np.nonzero(col)[0]
        rows += [(lang, int(keys_i64[i]), float(col[i])) for i in nz]
    return spark.createDataFrame(rows, "lang string, gram bigint, weight double")


def model_from_df(df: DataFrame) -> dict:
    """Inverse of model_to_df (weights pass through verbatim — no
    re-normalization, so the round trip is bit-exact)."""
    per_lang: dict[str, dict[int, float]] = {}
    for r in df.collect():
        per_lang.setdefault(r["lang"], {})[r["gram"]] = r["weight"]
    langs = sorted(per_lang)
    all_keys = sorted(
        {np.int64(g).view(np.uint64).item()
         for d in per_lang.values() for g in d})
    keys = np.array(all_keys, dtype=np.uint64)
    weights = np.zeros((len(all_keys), len(langs)), dtype=np.float64)
    pos = {k: i for i, k in enumerate(all_keys)}
    for li, lang in enumerate(langs):
        for g, w in per_lang[lang].items():
            weights[pos[np.int64(g).view(np.uint64).item()], li] = w
    return {"langs": langs, "keys": keys, "weights": weights}

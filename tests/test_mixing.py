"""Temperature-weighted source mixing: rate math vs a pure-Python model,
determinism, and the no-upsampling invariant."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from dqc_spark.mixing import BUCKETS, source_mix_rates, temperature_sample


@pytest.fixture(scope="module")
def skewed_docs(spark):
    # heavily skewed: src_hot 800 docs, src_mid 150, src_rare 50
    rows = []
    i = 0
    for src, n in [("src_hot", 800), ("src_mid", 150), ("src_rare", 50)]:
        for _ in range(n):
            rows.append((i, src, f"doc {i} body"))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _py_rates(counts: dict, alpha: float) -> dict:
    total = sum(counts.values())
    w = {s: (n / total) ** alpha for s, n in counts.items()}
    ws = sum(w.values())
    tgt = {s: x / ws for s, x in w.items()}
    budget = min(counts[s] / tgt[s] for s in counts)
    return {s: min(1.0, tgt[s] * budget / counts[s]) for s in counts}


def test_source_mix_rates_match_python(spark, skewed_docs):
    counts = {"src_hot": 800, "src_mid": 150, "src_rare": 50}
    for alpha in (0.0, 0.5, 1.0):
        got = {
            r["source"]: r["keep_rate"]
            for r in source_mix_rates(skewed_docs, alpha=alpha).collect()
        }
        want = _py_rates(counts, alpha)
        for s in counts:
            assert got[s] == pytest.approx(want[s], rel=1e-12), (alpha, s)
    # alpha=1 is a no-op mix: every source kept whole
    got1 = {
        r["source"]: r["keep_rate"]
        for r in source_mix_rates(skewed_docs, alpha=1.0).collect()
    }
    assert all(v == pytest.approx(1.0) for v in got1.values())


def test_temperature_sample_realizes_flatter_mix(spark, skewed_docs):
    out = temperature_sample(skewed_docs, alpha=0.5)
    kept = {r["source"]: 0 for r in out.select("source").distinct().collect()}
    for r in out.groupBy("source").count().collect():
        kept[r["source"]] = r["count"]
    # rare source kept whole (it is the binding source), hot source cut
    assert kept["src_rare"] == 50
    assert kept["src_hot"] < 800
    # realized shares approach the sqrt-flattened targets (hash noise
    # is ~1/sqrt(n); allow generous slack)
    total = sum(kept.values())
    want = _py_rates({"src_hot": 800, "src_mid": 150, "src_rare": 50}, 0.5)
    exp_hot = 800 * want["src_hot"]
    assert abs(kept["src_hot"] - exp_hot) / exp_hot < 0.15


def test_temperature_sample_keeps_null_source_rows(spark):
    rows = [(i, "hot", "t") for i in range(90)] + [
        (100 + i, None, "t") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = temperature_sample(df, alpha=0.5)
    # NULL is its own (rare, binding) source: kept whole, never dropped
    n_null = out.filter(F.col("source").isNull()).count()
    assert n_null == 10
    rates = {
        r["source"]: r["keep_rate"]
        for r in source_mix_rates(df, alpha=0.5).collect()
    }
    assert rates[None] == pytest.approx(1.0)


def test_temperature_sample_deterministic_and_no_duplicates(spark, skewed_docs):
    a = sorted(r["doc_id"] for r in temperature_sample(skewed_docs).collect())
    b = sorted(
        r["doc_id"]
        for r in temperature_sample(skewed_docs.repartition(7)).collect()
    )
    assert a == b  # layout-independent
    assert len(a) == len(set(a))  # subsample only, never duplicates

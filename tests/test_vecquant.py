"""Int8 embedding quantization (vecquant.py): round-trip error bound,
kernel-vs-python parity, candidate recall, and exact equality of the
rescored top-k with full-precision brute force."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dqc_spark.similarity import brute_force_topk_arrow
from dqc_spark.vecquant import (
    ann_topk_quantized,
    dequantize_py,
    quantize_embeddings,
    quantize_py,
    quantized_topk,
)


def _vecs(n=200, dim=16, seed=7):
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    return rng.normal(size=(n, dim))


def test_roundtrip_error_bound():
    for vec in _vecs(20):
        scale, norm, qb = quantize_py(vec)
        back = dequantize_py(scale, qb)
        assert np.all(np.abs(back - vec) <= scale / 2 + 1e-12)
        assert norm == pytest.approx(float(np.linalg.norm(vec)))
    # zero vector: scale stays 1.0, bytes all zero
    scale, norm, qb = quantize_py(np.zeros(8))
    assert scale == 1.0 and norm == 0.0
    assert np.all(dequantize_py(scale, qb) == 0.0)


def test_spark_quantize_matches_python(spark):
    vecs = _vecs(50)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>")
    got = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    for i, v in enumerate(vecs):
        scale, norm, qb = quantize_py(v)
        assert got[i]["scale"] == pytest.approx(scale, rel=1e-12)
        assert got[i]["norm"] == pytest.approx(norm, rel=1e-12)
        assert bytes(got[i]["qvec"]) == qb, i


def test_candidates_contain_exact_topk(spark):
    vecs = _vecs(300)
    q = vecs[0].tolist()
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>")
    exact = [r["vec_id"] for r in
             brute_force_topk_arrow(df, q, k=10).collect()]
    cand = [r["vec_id"] for r in
            quantized_topk(quantize_embeddings(df), q, m=50).collect()]
    assert set(exact) <= set(cand)


def test_rescored_topk_equals_brute_force(spark):
    vecs = _vecs(300, seed=11)
    q = vecs[3].tolist()
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>")
    want = [(r["vec_id"], r["cosine"]) for r in
            brute_force_topk_arrow(df, q, k=10, round_to=4).collect()]
    got = [(r["vec_id"], r["cosine"]) for r in
           ann_topk_quantized(df, q, k=10, rescore_m=50,
                              round_to=4).collect()]
    assert got == want


def test_reused_index(spark):
    vecs = _vecs(100, seed=3)
    q = vecs[5].tolist()
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>")
    idx = quantize_embeddings(df).persist()
    a = ann_topk_quantized(df, q, k=5, quantized=idx).collect()
    b = ann_topk_quantized(df, q, k=5).collect()
    assert [r["vec_id"] for r in a] == [r["vec_id"] for r in b]
    idx.unpersist()

"""Hashed TF-IDF document vectors: determinism, normalization, IDF
downweighting, python-reference parity, and end-to-end integration with
the embedding near-dup stack."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dqc_spark.textvectors import hashed_tf_py, hashed_tfidf


@pytest.fixture(scope="module")
def vec_docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog today"),  # near-dup of 1
        (3, "spark shuffles partition data across executors for joins"),
        (4, ""),
        (5, None),
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_unit_norm_and_python_parity(spark, vec_docs):
    rows, df = vec_docs
    out = {r["key"]: np.array(r["embedding"])
           for r in hashed_tfidf(df, "doc_id", dim=64, idf=False).collect()}
    for key, text in rows:
        want = hashed_tf_py(text, 64)
        n = np.linalg.norm(want)
        want = want / n if n > 0 else want
        np.testing.assert_allclose(out[key], want, atol=1e-6)
    # non-empty docs are unit vectors; empty/NULL are zero vectors
    assert np.linalg.norm(out[1]) == pytest.approx(1.0, abs=1e-6)
    assert np.linalg.norm(out[4]) == 0.0 and np.linalg.norm(out[5]) == 0.0


def test_deterministic_across_runs_and_partitioning(spark, vec_docs):
    _, df = vec_docs
    a = {r["key"]: tuple(r["embedding"])
         for r in hashed_tfidf(df.repartition(4), "doc_id", dim=64).collect()}
    b = {r["key"]: tuple(r["embedding"])
         for r in hashed_tfidf(df.coalesce(1), "doc_id", dim=64).collect()}
    assert a == b


def test_near_dups_have_high_cosine(spark, vec_docs):
    _, df = vec_docs
    vecs = {r["key"]: np.array(r["embedding"])
            for r in hashed_tfidf(df, "doc_id", dim=128).collect()}
    cos_dup = float(vecs[1] @ vecs[2])
    cos_diff = float(vecs[1] @ vecs[3])
    assert cos_dup > 0.85
    assert abs(cos_diff) < 0.4


def test_idf_downweights_ubiquitous_tokens(spark):
    # 'common' appears in every doc, 'rare' in one: with IDF the rare
    # token's bucket dominates that doc's vector
    rows = [(i, f"common filler w{i}") for i in range(20)] + [(99, "common rare")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vecs = {r["key"]: np.array(r["embedding"])
            for r in hashed_tfidf(df, "doc_id", dim=256).collect()}
    from dqc_spark.textvectors import _tok_bucket_sign

    cache = {}
    b_common, _ = _tok_bucket_sign("common", 256, cache)
    b_rare, _ = _tok_bucket_sign("rare", 256, cache)
    v = vecs[99]
    assert abs(v[b_rare]) > abs(v[b_common])


def test_feeds_embedding_near_dup_stack(spark, vec_docs):
    # the whole point: hashed vectors drop straight into the
    # similarity operators' (key, embedding) contract
    _, df = vec_docs
    from dqc_spark.similarity import brute_force_topk_arrow

    vecs = hashed_tfidf(df.filter(F.col("text").isNotNull()), "doc_id", dim=128)
    q = {r["key"]: list(r["embedding"]) for r in vecs.collect()}[1]
    top = brute_force_topk_arrow(
        vecs, q, k=2, key_col="key", vec_col="embedding"
    ).collect()
    assert [r["key"] for r in top][:2] == [1, 2]  # self, then the near-dup


def test_weights_frame_assembles_to_the_vector_path(spark, vec_docs):
    # hashed_tfidf_weights is the SQL-oracled sparse face of
    # hashed_tfidf: scattering its float64 (key, bucket, weight) rows
    # into a dense float32 vector must reproduce the vector path
    # bit-for-bit (both share hashed_tf_py + _idf_vector), and
    # empty/NULL docs emit no rows (their vector is all-zero)
    from dqc_spark.textvectors import hashed_tfidf_weights

    rows, df = vec_docs
    dim = 64
    dense = {r["key"]: np.array(r["embedding"], dtype=np.float32)
             for r in hashed_tfidf(df, "doc_id", dim=dim).collect()}
    sparse: dict[int, np.ndarray] = {
        key: np.zeros(dim, dtype=np.float64) for key, _ in rows}
    for r in hashed_tfidf_weights(df, "doc_id", dim=dim).collect():
        assert r["weight"] != 0.0
        sparse[r["key"]][r["bucket"]] = r["weight"]
    for key, _ in rows:
        np.testing.assert_array_equal(
            sparse[key].astype(np.float32), dense[key])
    assert not np.any(sparse[4]) and not np.any(sparse[5])

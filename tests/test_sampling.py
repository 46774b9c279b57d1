"""Sampling / packing / chunking operator semantics (dqc_spark.sampling).

Pins the properties that matter at scale: determinism across partition
layouts, per-stratum quota enforcement, budget-bin invariants, and
lossless chunk reassembly.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from dqc_spark.sampling import (
    chunk_text,
    hash_sample,
    pack_token_budget,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def test_hash_sample_deterministic_across_partitioning(spark, docs):
    ids_a = {r.doc_id for r in hash_sample(docs, "doc_id", 20).select("doc_id").collect()}
    ids_b = {
        r.doc_id
        for r in hash_sample(docs.repartition(13), "doc_id", 20)
        .select("doc_id")
        .collect()
    }
    assert ids_a == ids_b
    # monotone: a bigger rate strictly contains a smaller one
    ids_small = {
        r.doc_id for r in hash_sample(docs, "doc_id", 5).select("doc_id").collect()
    }
    assert ids_small <= ids_a


def test_hash_sample_rate_roughly_holds(docs):
    n = docs.count()
    k = hash_sample(docs, "doc_id", 50).count()
    assert 0.3 * n <= k <= 0.7 * n  # 50% +- slack on small data


def test_stratified_sample_quota_and_determinism(docs):
    out = stratified_sample(docs, "source", "doc_id", 3)
    per = out.groupBy("source").count().collect()
    assert all(r["count"] <= 3 for r in per)
    # strata with >=3 docs are filled exactly
    sizes = {r["source"]: r["count"] for r in docs.groupBy("source").count().collect()}
    got = {r["source"]: r["count"] for r in per}
    for s, n in sizes.items():
        assert got.get(s, 0) == min(n, 3)
    # deterministic under repartition
    a = sorted((r.doc_id, r.source) for r in out.select("doc_id", "source").collect())
    b = sorted(
        (r.doc_id, r.source)
        for r in stratified_sample(docs.repartition(7), "source", "doc_id", 3)
        .select("doc_id", "source")
        .collect()
    )
    assert a == b


def test_pack_token_budget_invariants(docs):
    budget = 1500
    packed = pack_token_budget(docs, "lang", "doc_id", F.col("n_chars"), budget)
    rows = packed.select("lang", "doc_id", "n_tokens", "bin_id").collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rs:
            assert r.bin_id == cum // budget, (lang, r.doc_id)
            cum += r.n_tokens
        # bin ids are dense from 0
        bins = sorted({r.bin_id for r in rs})
        assert bins[0] == 0
        # every doc assigned exactly once
    assert sum(len(v) for v in by_lang.values()) == docs.count()


def test_chunk_text_reassembles_exactly(spark, docs):
    sample = docs.limit(50)
    chunks = chunk_text(sample, "doc_id", "text", 177)
    joined = (
        chunks.groupBy("key")
        .agg(
            F.concat_ws(
                "", F.transform(F.array_sort(F.collect_list(F.struct("chunk_ix", "chunk"))), lambda s: s.chunk)
            ).alias("rebuilt"),
            F.sum("chunk_len").alias("total_len"),
        )
    )
    orig = sample.select(F.col("doc_id").alias("key"), "text")
    cmp = orig.join(joined, "key", "left").select(
        "key",
        (F.coalesce(F.col("rebuilt"), F.lit("")) == F.coalesce(F.col("text"), F.lit(""))).alias("same"),
        (F.coalesce(F.col("total_len"), F.lit(0)) == F.coalesce(F.length("text"), F.lit(0))).alias("len_ok"),
    )
    bad = cmp.filter(~F.col("same") | ~F.col("len_ok")).count()
    assert bad == 0
    # every chunk except a doc's last is exactly chunk_chars wide
    w_bad = (
        chunks.withColumn(
            "last_ix",
            F.max("chunk_ix").over(W.partitionBy("key")),
        )
        .filter((F.col("chunk_ix") < F.col("last_ix")) & (F.col("chunk_len") != 177))
        .count()
    )
    assert w_bad == 0


def test_chunk_text_narrow_plan(docs):
    # the chunker must stay shuffle-free (generate + explode only)
    plan = chunk_text(docs, "doc_id", "text", 500)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_text_codepoint_semantics_unicode(spark):
    # chunks must slice by CODE POINT (matching Python str slicing),
    # not UTF-8 bytes or UTF-16 units — pinned incl. astral-plane chars
    texts = [
        "héllo wörld ünïcode",
        "日本語のテキストです、長さのテスト",
        "emoji 😀😃😄😁 astral 𝔘𝔫𝔦 chars",
        "a" * 7 + "😀" + "b" * 7,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = chunk_text(df, "doc_id", "text", 5).collect()
    for r in got:
        assert r.chunk == texts[r.key][r.chunk_ix * 5:(r.chunk_ix + 1) * 5]
    n_expect = sum((len(t) + 4) // 5 for t in texts)
    assert len(got) == n_expect

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


# ---------------------------------------------------------------------------
# content-defined chunking
# ---------------------------------------------------------------------------


def _cdc_ref_spans(text, mask_bits=6, min_len=32, max_len=256):
    """Sequential reference: per-window polynomial rolling hash computed
    the slow way, then the same greedy boundary walk."""
    import numpy as np

    B = np.uint64(0x100000001B3)
    W = 16
    n = len(text)
    cands = []
    mask = (1 << mask_bits) - 1
    with np.errstate(over="ignore"):
        for i in range(W - 1, n):
            h = np.uint64(0)
            for j in range(i - W + 1, i + 1):
                h += np.uint64(ord(text[j])) * (B ** np.uint64(i - j))
            if int(h) & mask == 0:
                cands.append(i)
    spans, start = [], 0
    while start < n:
        nxt = [c + 1 for c in cands if c + 1 >= start + min_len
               and c + 1 < start + max_len]
        cut = min(nxt[0] if nxt else start + max_len, n)
        spans.append((start, cut))
        start = cut
    return spans


def test_cdc_spans_match_sequential_reference():
    from dqc_spark.pagesgen import make_page
    from dqc_spark.sampling import cdc_chunk_spans

    for i in (0, 3, 17):
        t = make_page(i)["text"]
        assert cdc_chunk_spans(t) == _cdc_ref_spans(t), i
    assert cdc_chunk_spans("") == []
    assert cdc_chunk_spans("short") == [(0, 5)]


def test_cdc_chunks_reconstruct_and_bound():
    from dqc_spark.pagesgen import make_page
    from dqc_spark.sampling import cdc_chunk_spans

    t = make_page(5)["text"]
    spans = cdc_chunk_spans(t, mask_bits=5, min_len=16, max_len=128)
    assert "".join(t[s:e] for s, e in spans) == t
    assert all(e - s <= 128 for s, e in spans)
    assert all(e - s >= 16 for s, e in spans[:-1])  # last chunk may be short


def test_cdc_boundaries_resist_insertion():
    """The property fixed-width chunking lacks: inserting text near the
    START re-chunks only the local neighborhood — chunks after the edit
    keep their identity, so chunk-level dedup still matches them."""
    import hashlib

    from dqc_spark.pagesgen import make_page
    from dqc_spark.sampling import cdc_chunk_spans

    t = make_page(9)["text"]
    edited = t[:40] + " INSERTED SPAN " + t[40:]

    def chunk_hashes(text):
        return {
            hashlib.md5(text[s:e].encode()).hexdigest()
            for s, e in cdc_chunk_spans(text)
        }

    a, b = chunk_hashes(t), chunk_hashes(edited)
    shared = len(a & b) / max(len(a), 1)
    assert shared >= 0.7, f"only {shared:.0%} of chunks survived the edit"

    # fixed-width chunking loses (nearly) everything after the edit
    fixed_a = {t[i:i + 200] for i in range(0, len(t), 200)}
    fixed_b = {edited[i:i + 200] for i in range(0, len(edited), 200)}
    assert len(fixed_a & fixed_b) <= 1


def test_cdc_chunks_spark_matches_local(spark):
    from dqc_spark.pagesgen import make_page
    from dqc_spark.sampling import cdc_chunk_spans, cdc_chunks

    rows = [(i, make_page(i)["text"]) for i in range(20)] + [(99, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.key, r.chunk_ix, r.chunk_start, r.chunk_len, r.chunk_md5)
        for r in cdc_chunks(df, "doc_id", "text").collect()
    }
    import hashlib

    want = set()
    for i, t in rows:
        t = t or ""
        for ix, (s, e) in enumerate(cdc_chunk_spans(t)):
            want.add((i, ix, s, e - s,
                      hashlib.md5(t[s:e].encode("utf-8")).hexdigest()))
    assert got == want


def test_cdc_min_len_zero_rejected():
    import pytest as _pytest

    from dqc_spark.sampling import cdc_chunk_spans

    with _pytest.raises(ValueError, match="min_len"):
        cdc_chunk_spans("abc " * 100, min_len=0)


# ---------------------------------------------------------------------------
# first-fit packing
# ---------------------------------------------------------------------------

def test_first_fit_py_model():
    from dqc_spark.sampling import first_fit_py

    items = [("a", 6), ("b", 5), ("c", 4), ("d", 3), ("e", 2)]
    got = first_fit_py(items, budget=10)
    # FFD order: a(6) b(5) c(4) d(3) e(2)
    # a->bin0(rem 4), b->bin1(rem 5), c->bin0(rem 0), d->bin1(rem 2),
    # e->bin1(rem 0)
    assert got == {"a": 0, "b": 1, "c": 0, "d": 1, "e": 1}
    # oversize item gets its own bin rather than being dropped
    over = first_fit_py([("x", 99), ("y", 1)], budget=10)
    assert over["x"] != over["y"]


def test_pack_first_fit_never_overflows(spark):
    from dqc_spark.sampling import pack_first_fit

    rows = [(f"d{i}", "en" if i % 2 else "de", 50 + (i * 37) % 400)
            for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id string, lang string, "
                               "n_tok bigint")
    out = pack_first_fit(df, "lang", "doc_id", "n_tok", budget=512,
                         n_subgroups=4).persist()
    assert out.count() == 300
    from pyspark.sql import functions as F
    per_bin = (out.groupBy("lang", "pack_group", "bin_id")
               .agg(F.sum("n_tokens").alias("tot")).collect())
    assert all(r["tot"] <= 512 for r in per_bin)
    out.unpersist()


def test_pack_first_fit_matches_python_per_group(spark):
    from dqc_spark.sampling import first_fit_py, pack_first_fit

    rows = [(f"d{i}", "en", 30 + (i * 53) % 200) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id string, lang string, "
                               "n_tok bigint")
    out = pack_first_fit(df, "lang", "doc_id", "n_tok", budget=256,
                         n_subgroups=3).persist()
    groups = {}
    for r in out.collect():
        groups.setdefault(r["pack_group"], []).append(r)
    for pg, members in groups.items():
        want = first_fit_py(
            [(r["doc_id"], r["n_tokens"]) for r in members], 256)
        for r in members:
            assert r["bin_id"] == want[r["doc_id"]], (pg, r["doc_id"])
    # partition-count invariance
    out2 = {(r["doc_id"]): (r["pack_group"], r["bin_id"])
            for r in pack_first_fit(df.repartition(7), "lang", "doc_id",
                                    "n_tok", budget=256,
                                    n_subgroups=3).collect()}
    for r in out.collect():
        assert out2[r["doc_id"]] == (r["pack_group"], r["bin_id"])
    out.unpersist()


# ---------------------------------------------------------------------------
# deterministic corpus splits
# ---------------------------------------------------------------------------


def test_split_corpus_disjoint_exhaustive_and_proportional(spark):
    from dqc_spark.sampling import split_corpus

    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    out = split_corpus(df, "doc_id")
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 5000  # every row in exactly one slice
    assert set(counts) == {"train", "val", "test"}
    # hash-uniformity: within a few percent of the nominal weights
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.02
    assert abs(counts["test"] / 5000 - 0.1) < 0.02


def test_split_corpus_stable_under_growth_and_partitioning(spark):
    from dqc_spark.sampling import split_corpus

    small = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 3000).withColumnRenamed("id", "doc_id")
    s = {r["doc_id"]: r["split"]
         for r in split_corpus(small, "doc_id").collect()}
    b = {r["doc_id"]: r["split"]
         for r in split_corpus(big.repartition(13), "doc_id").collect()}
    # a doc keeps its split when the corpus grows — eval stays eval
    assert all(b[k] == v for k, v in s.items())


def test_split_corpus_custom_weights_and_validation(spark):
    import pytest as _pytest

    from dqc_spark.sampling import split_corpus

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = split_corpus(df, "doc_id", {"a": 3, "b": 1})  # unnormalized
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert abs(counts["a"] / 2000 - 0.75) < 0.04
    with _pytest.raises(ValueError):
        split_corpus(df, "doc_id", {"only": 1.0})
    with _pytest.raises(ValueError):
        split_corpus(df, "doc_id", {"a": -1, "b": 2})


def test_pack_first_fit_rejects_null_and_duplicate_keys(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    from dqc_spark.sampling import pack_first_fit

    nulls = spark.createDataFrame(
        [("s", None, 3), ("s", "b", 4)],
        "stratum string, doc_id string, n_tok long")
    with pytest.raises((PythonException, Py4JJavaError), match="NULL"):
        pack_first_fit(nulls, "stratum", "doc_id", "n_tok", 10).collect()
    dups = spark.createDataFrame(
        [("s", "a", 6), ("s", "a", 6)],
        "stratum string, doc_id string, n_tok long")
    with pytest.raises((PythonException, Py4JJavaError), match="duplicate"):
        pack_first_fit(dups, "stratum", "doc_id", "n_tok", 10).collect()


def test_split_corpus_rejects_null_keys_lazily(spark):
    from dqc_spark.sampling import split_corpus

    ok = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    assert split_corpus(ok, "doc_id").count() == 1  # no NULL -> no error
    bad = spark.createDataFrame(
        [(1, "x"), (None, "y")], "doc_id long, text string")
    with pytest.raises(Exception, match="NULL"):
        split_corpus(bad, "doc_id").collect()


def test_pack_token_budget_rejects_null_tokens(spark):
    from dqc_spark.sampling import pack_token_budget

    df = spark.createDataFrame(
        [("s", 1, 5), ("s", 2, None)],
        "stratum string, doc_id long, n_tok long")
    with pytest.raises(Exception, match="NULL token count"):
        pack_token_budget(df, "stratum", "doc_id", "n_tok", 10).collect()

"""BM25 ranked retrieval (retrieval.py): python-model parity, scoring
properties (tf saturation, idf rarity ordering, length normalization),
determinism across partitioning, and edge cases."""

import math

import pytest
from pyspark.sql import functions as F

from dqc_spark.retrieval import bm25_score_py, bm25_topk

DOCS = [
    (0, "hash join hash join hash partition"),
    (1, "sort merge join window window"),
    (2, "hash"),
    (3, "the quick brown fox jumps over the lazy dog"),
    (4, "hash hash hash hash hash hash hash hash hash hash"),
    (5, ""),
    (6, None),
    (7, "JOIN Hash, punctuation; separated—tokens!"),
    (8, "window scan filter scan window scan"),
]


def _df(spark, docs=DOCS):
    return spark.createDataFrame(docs, "doc_id bigint, text string")


def test_matches_python_model(spark):
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(_df(spark), ["hash", "join"], k=100,
                           round_to=None).collect()
    }
    want = bm25_score_py(DOCS, ["hash", "join"])
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-12), k


def test_nonmatching_docs_absent_and_topk_order(spark):
    rows = bm25_topk(_df(spark), ["hash"], k=3).collect()
    ids = [r["doc_id"] for r in rows]
    # docs 3, 5, 6, 8 contain no 'hash' and must not appear at any k
    assert not {3, 5, 6, 8} & set(ids)
    # scores non-increasing, key-ascending within equal scores
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_tf_saturation_and_idf(spark):
    # doc 4 is pure 'hash' spam: its per-term score saturates near
    # (k1+1)*idf, so a doc matching BOTH query terms outranks it
    rows = bm25_topk(_df(spark), ["hash", "join"], k=9).collect()
    by_id = {r["doc_id"]: r["score"] for r in rows}
    assert by_id[0] > by_id[4]
    # rarer term scores higher at EQUAL tf and dl (idf is the only
    # varying factor): 'rare' df=1 vs 'common' df=3, both tf=1 in doc 0
    docs = [(0, "rare common"), (1, "common filler"), (2, "common stuff")]
    mini = _df(spark, docs)
    s_rare = bm25_topk(mini, ["rare"], k=3).collect()[0]["score"]
    s_common = {r["doc_id"]: r["score"]
                for r in bm25_topk(mini, ["common"], k=3).collect()}[0]
    assert s_rare > s_common


def test_case_and_punctuation_tokenization(spark):
    # doc 7's 'JOIN Hash,' must match the lowercase query terms
    got = {r["doc_id"]
           for r in bm25_topk(_df(spark), ["join", "hash"], k=9).collect()}
    assert 7 in got


def test_partition_invariance_and_rounding(spark):
    base = _df(spark)
    a = bm25_topk(base, ["hash", "join"], k=5, round_to=4).collect()
    b = bm25_topk(base.repartition(7), ["hash", "join"], k=5,
                  round_to=4).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_empty_query_raises_and_empty_corpus(spark):
    with pytest.raises(ValueError):
        bm25_topk(_df(spark), [])
    empty = _df(spark).filter(F.lit(False))
    assert bm25_topk(empty, ["hash"], k=5).count() == 0


def test_python_model_self_consistency():
    # idf of a term present in every doc stays positive (the +1 form)
    docs = [(i, "common word") for i in range(4)]
    scores = bm25_score_py(docs, ["common"])
    assert all(v > 0 for v in scores.values())
    n, df_t = 4, 4
    idf = math.log(1 + (n - df_t + 0.5) / (df_t + 0.5))
    assert idf > 0


# ---------------------------------------------------------------------------
# batch BM25
# ---------------------------------------------------------------------------


def test_batch_equals_single_query(spark):
    from dqc_spark.retrieval import bm25_topk_batch

    queries = {"qa": ["hash", "join"], "qb": ["window"]}
    batch = bm25_topk_batch(_df(spark), queries, k=9, round_to=6)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score"], r["rank"]))
    for qid, terms in queries.items():
        single = bm25_topk(_df(spark), terms, k=9, round_to=6).collect()
        want = [(r["doc_id"], r["score"], i + 1)
                for i, r in enumerate(single)]
        assert sorted(got[qid], key=lambda x: x[2]) == want, qid


def test_batch_rank_contract_and_k(spark):
    from dqc_spark.retrieval import bm25_topk_batch

    rows = bm25_topk_batch(
        _df(spark), {"q": ["hash"]}, k=2).collect()
    assert len(rows) == 2
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2]


def test_batch_validation_and_partition_invariance(spark):
    import pytest as _pytest

    from dqc_spark.retrieval import bm25_topk_batch

    with _pytest.raises(ValueError):
        bm25_topk_batch(_df(spark), {})
    with _pytest.raises(ValueError):
        bm25_topk_batch(_df(spark), {"q": []})
    a = sorted(map(tuple, bm25_topk_batch(
        _df(spark), {"q1": ["hash"], "q2": ["join", "window"]},
        k=5, round_to=4).collect()))
    b = sorted(map(tuple, bm25_topk_batch(
        _df(spark).repartition(7), {"q1": ["hash"], "q2": ["join", "window"]},
        k=5, round_to=4).collect()))
    assert a == b


MULTILINGUAL_DOCS = [
    (0, "распределённые системы и обработка данных"),
    (1, "Распределённые СИСТЕМЫ масштабируются"),
    (2, "база данных хранит таблицы"),
    (3, "これは日本語の文書です検索できます"),
    (4, "中文文档没有空格也要能检索"),
    (5, "plain english document about search engines"),
    (6, "naïve café résumé straße"),
    (7, "日本語 検索 with latin mixed in"),
]


def test_cjk_query_retrieves_spacefree_docs(spark):
    # a CJK query term expands to codepoint tokens and must retrieve
    # the space-free documents containing them
    df = _df(spark, MULTILINGUAL_DOCS)
    ids = {r["doc_id"] for r in bm25_topk(df, ["日本語"], k=5).collect()}
    assert 3 in ids and 7 in ids
    assert 5 not in ids
    zh = {r["doc_id"] for r in bm25_topk(df, ["中文"], k=5).collect()}
    assert 4 in zh


def test_cyrillic_and_case_folded_retrieval(spark):
    df = _df(spark, MULTILINGUAL_DOCS)
    # uppercase Cyrillic query matches lowercase corpus and vice versa
    ids = {r["doc_id"] for r in
           bm25_topk(df, ["РАСПРЕДЕЛЁННЫЕ"], k=5).collect()}
    assert ids == {0, 1}
    # accented Latin survives as whole tokens
    acc = {r["doc_id"] for r in bm25_topk(df, ["café"], k=5).collect()}
    assert acc == {6}


def test_multilingual_matches_python_model(spark):
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(_df(spark, MULTILINGUAL_DOCS),
                           ["данных", "検索"], k=100,
                           round_to=None).collect()
    }
    want = bm25_score_py(MULTILINGUAL_DOCS, ["данных", "検索"])
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-12), k


def test_batch_rejects_non_string_query_ids(spark):
    from dqc_spark.retrieval import bm25_topk_batch

    docs = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    with pytest.raises(ValueError, match="strings"):
        bm25_topk_batch(docs, {1: ["hello"]})


def test_thai_query_retrieves_thai_doc(spark):
    """SEA cluster segmentation end-to-end: before the wordhash
    SEA_GROUP fallback, an unbroken Thai phrase was ONE token and no
    query could match inside it.  A raw Thai query now expands to the
    same clusters the index tokenized, and BM25 ranks the Thai doc
    first."""
    docs = [
        (0, "ภาษาไทยเขียนติดกันไม่มีช่องว่าง"),
        (1, "plain english document about spark joins"),
        (2, "another english document about hash tables"),
        (3, "ພາສາລາວຂຽນຕິດກັນ"),  # Lao: related script, disjoint clusters
    ]
    out = bm25_topk(_df(spark, docs), ["ภาษาไทย"], k=4).collect()
    assert out, "Thai query matched nothing — SEA segmentation broken"
    assert out[0]["doc_id"] == 0
    # English docs share no cluster with the query
    assert {r["doc_id"] for r in out} <= {0, 3}

"""Property-based checks for the round-2 curation operators: the Spark
implementation vs a pure-Python model over randomized inputs (unicode,
NULLs, pathological line structure).  Each example batches all rows into
one DataFrame so a property costs one Spark job, not one per row."""

import hashlib
import unicodedata

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from dqc_spark.normalize import normalize_text_py


# unicode-heavy text: ascii words, combining marks, controls, NBSP, CJK
weird_text = st.text(
    alphabet=st.sampled_from(
        list("ab \t\n") + ["́", "é", "\x07", "\xa0", "中"]
    ),
    max_size=40,
)
docs_strategy = st.lists(
    st.one_of(st.none(), weird_text), min_size=1, max_size=12
)


@settings(max_examples=15, deadline=None)
@given(docs_strategy)
def test_normalize_udf_matches_python_model(spark, texts):
    from dqc_spark.normalize import normalized_col

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select("i", normalized_col(F.col("text")).alias("n")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == normalize_text_py(t), repr(t)


@settings(max_examples=15, deadline=None)
@given(docs_strategy)
def test_normalize_idempotent_and_nfc(spark, texts):
    for t in texts:
        n = normalize_text_py(t)
        if n is None:
            continue
        assert normalize_text_py(n) == n  # fixpoint
        assert unicodedata.is_normalized("NFC", n)


lines_strategy = st.lists(
    st.lists(
        st.sampled_from(
            ["", "x", "shared boilerplate line", "another repeated liner",
             "unique padding %d", "abc def ghi jkl"]
        ),
        min_size=0,
        max_size=6,
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=15, deadline=None)
@given(lines_strategy)
def test_dedup_lines_matches_python_model(spark, docs):
    from dqc_spark.linededup import dedup_lines

    # make "unique padding %d" lines actually unique per position
    rows = []
    for key, lns in enumerate(docs):
        rendered = [
            ln % (key * 100 + i) if "%d" in ln else ln for i, ln in enumerate(lns)
        ]
        rows.append((key, "\n".join(rendered)))

    min_len = 5
    first: dict = {}
    for key, text in rows:
        for i, ln in enumerate(text.split("\n")):
            if len(ln) >= min_len and ln not in first:
                first[ln] = (key, i)
    want = {}
    for key, text in rows:
        lns = text.split("\n")
        kept = [
            ln for i, ln in enumerate(lns)
            if len(ln) < min_len or first[ln] == (key, i)
        ]
        want[key] = ("\n".join(kept), len(lns), len(kept))

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_dedup"], r["n_lines"], r["n_lines_kept"])
        for r in dedup_lines(df, "doc_id", min_dup_len=min_len).collect()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.text(alphabet="abcd ", max_size=20), min_size=1, max_size=30),
    st.integers(2, 6),
)
def test_training_order_is_total_and_partition_invariant(spark, texts, nparts):
    from dqc_spark.ordering import training_order

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["position"]
        for r in training_order(df, num_partitions=nparts).collect()
    }
    keyed = sorted((hashlib.md5(t.encode()).hexdigest(), i) for i, t in rows)
    want = {doc_id: pos for pos, (_, doc_id) in enumerate(keyed)}
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="abc ", min_size=1, max_size=15),
                min_size=1, max_size=25))
def test_bloom_never_false_negative(spark, texts):
    from dqc_spark.snapshot import BloomFilter

    bloom = BloomFilter(1 << 12, 4)
    digests = [hashlib.md5(t.encode()).hexdigest() for t in texts]
    for d in digests:
        bloom.add(d)
    assert all(bloom.might_contain(d) for d in digests)

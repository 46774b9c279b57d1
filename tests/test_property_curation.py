"""Property-based checks for the round-2 curation operators: the Spark
implementation vs a pure-Python model over randomized inputs (unicode,
NULLs, pathological line structure).  Each example batches all rows into
one DataFrame so a property costs one Spark job, not one per row."""

import hashlib
import unicodedata

import pytest
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


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c", "d"]), st.integers(1, 40)),
        min_size=1,
        max_size=4,
        unique_by=lambda t: t[0],
    ),
    st.sampled_from([0.0, 0.3, 0.5, 0.7, 1.0]),
)
def test_mix_rates_match_python_model(spark, dist, alpha):
    from dqc_spark.mixing import source_mix_rates

    rows, i = [], 0
    counts = dict(dist)
    for src, n in dist:
        for _ in range(n):
            rows.append((i, src))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {
        r["source"]: r["keep_rate"]
        for r in source_mix_rates(df, alpha=alpha).collect()
    }
    total = sum(counts.values())
    w = {s: (n / total) ** alpha for s, n in counts.items()}
    ws = sum(w.values())
    tgt = {s: x / ws for s, x in w.items()}
    budget = min(counts[s] / tgt[s] for s in counts)
    for s, n in counts.items():
        want = min(1.0, tgt[s] * budget / n)
        assert got[s] == pytest.approx(want, rel=1e-9), (s, alpha)
    # the binding source is kept whole; nothing upsamples
    assert max(got.values()) == pytest.approx(1.0)
    assert all(v <= 1.0 + 1e-12 for v in got.values())


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.text(alphabet="ab ", min_size=0, max_size=30),
             min_size=2, max_size=8),
)
def test_contamination_matches_python_model(spark, texts):
    from dqc_spark.decontam import contamination_scores

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(999, texts[0])], "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_hit"])
        for r in contamination_scores(docs, bench, n=2).collect()
    }

    def grams(t):
        toks = [x for x in t.lower().split() if x]
        return {" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)} \
            if len(toks) >= 2 else set()

    bg = grams(texts[0])
    for i, t in enumerate(texts):
        g = grams(t)
        assert got[i] == (len(g), len(g & bg)), (i, t)

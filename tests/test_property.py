"""Property-based checks: Spark predicate semantics vs a pure-Python
model over randomized data with NULLs (hypothesis).  One Spark job per
example is slow, so each property batches many generated rows into one
DataFrame and checks all predicates in one fused agg."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from dqc_spark.checks import (
    between_pred,
    enum_pred,
    length_pred,
    not_in_set_pred,
    not_null_pred,
    pair_not_equal_pred,
    unique_violations,
)

vals = st.lists(st.one_of(st.none(), st.integers(-5, 5)), min_size=1, max_size=30)
strs = st.lists(
    st.one_of(st.none(), st.text(alphabet="abcN", max_size=4)),
    min_size=1,
    max_size=30,
)


@settings(max_examples=12, deadline=None)
@given(vals)
def test_unique_counts_duplicated_values(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], "c int")
    got = unique_violations(df, "c").count()
    from collections import Counter

    # NULLs group together (two NULLs = one duplicated value)
    want = sum(1 for v in Counter(xs).values() if v > 1)
    assert got == want


@settings(max_examples=12, deadline=None)
@given(vals, st.integers(-3, 0), st.integers(0, 3))
def test_between_and_not_null_null_semantics(spark, xs, lo, hi):
    df = spark.createDataFrame([(x,) for x in xs], "c int")
    row = df.agg(
        F.sum(F.when(between_pred("c", lo, hi), 1).otherwise(0)).alias("b"),
        F.sum(F.when(not_null_pred("c"), 1).otherwise(0)).alias("n"),
    ).first()
    want_b = sum(1 for x in xs if x is not None and (x < lo or x > hi))
    want_n = sum(1 for x in xs if x is None)
    assert (row["b"], row["n"]) == (want_b, want_n)


@settings(max_examples=12, deadline=None)
@given(strs)
def test_enum_and_set_null_semantics(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], "c string")
    allowed = ["a", "ab"]
    row = df.agg(
        F.sum(F.when(enum_pred("c", allowed), 1).otherwise(0)).alias("e"),
        F.sum(F.when(not_in_set_pred("c", allowed), 1).otherwise(0)).alias("s"),
        F.sum(F.when(length_pred("c", 1, 2), 1).otherwise(0)).alias("l"),
    ).first()
    want_e = sum(1 for x in xs if x is not None and x not in allowed)
    want_s = sum(1 for x in xs if x is not None and x in allowed)
    want_l = sum(1 for x in xs if x is not None and not (1 <= len(x) <= 2))
    assert (row["e"], row["s"], row["l"]) == (want_e, want_s, want_l)


@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(st.one_of(st.none(), st.integers(0, 3)),
                          st.one_of(st.none(), st.integers(0, 3))),
                min_size=1, max_size=30))
def test_pair_equal_null_safe(spark, pairs):
    df = spark.createDataFrame(pairs, "a int, b int")
    got = df.agg(
        F.sum(F.when(pair_not_equal_pred("a", "b"), 1).otherwise(0))
    ).first()[0]
    # both-NULL counts as equal; one-sided NULL as unequal
    want = sum(1 for a, b in pairs if a != b)
    assert got == want


@settings(max_examples=8, deadline=None)
@given(st.lists(st.text(max_size=24), min_size=1, max_size=40, unique=True))
def test_portable_hash_bucket_matches_python_md5(spark, keys):
    """sampling.portable_hash_bucket is the cross-engine contract:
    bucket = int(md5(str)[:8], 16) % B must match a pure-Python model
    for arbitrary unicode key strings (it's what DuckDB/Trino compute)."""
    import hashlib

    from dqc_spark.sampling import portable_hash_bucket

    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r.k: r.bucket
        for r in df.select(
            "k", portable_hash_bucket("k", 100).alias("bucket")
        ).collect()
    }
    for k in keys:
        want = int(hashlib.md5(k.encode("utf-8")).hexdigest()[:8], 16) % 100
        assert got[k] == want, k


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(1, 500)),
        min_size=1,
        max_size=40,
    )
)
def test_pack_token_budget_matches_python_model(spark, items):
    """Budget-bin assignment equals the sequential python fold for
    arbitrary (stratum, token) streams — partitioning must not leak into
    bin ids."""
    from dqc_spark.sampling import pack_token_budget

    budget = 600
    rows = [(i, s, t) for i, (s, t) in enumerate(items)]
    df = spark.createDataFrame(rows, "id long, s string, toks long").repartition(3)
    got = {
        r.id: r.bin_id
        for r in pack_token_budget(df, "s", "id", F.col("toks"), budget).collect()
    }
    want = {}
    run = {}
    for i, s, t in sorted(rows):
        prior = run.get(s, 0)
        want[i] = prior // budget
        run[s] = prior + t
    assert got == want


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.text(max_size=60),  # full unicode incl astral/combining
            st.text(
                alphabet=" \t\n.#abcdef你好\U0001d49ć",
                max_size=80,
            ),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_features_batch_equals_features_py_property(texts):
    # the vectorized batch kernel must be EXACTLY features_py on any
    # batch, including pathological orderings (trailing None/empty) and
    # arbitrary unicode — this is the dual-implementation invariant the
    # scoring UDF rides on; the comparison logic is single-sourced in
    # tests/test_pipeline.py so the two pins can't drift apart
    from tests.test_pipeline import assert_features_match

    assert_features_match(texts)

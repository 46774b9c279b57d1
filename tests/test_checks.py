"""Parity unit tests: every pass/fail pair from the reference's
internal/checker/checker_test.go:43-299, on the same fixture contents,
plus the edge cases the reference repo ships fixtures for but never
tests (null_enum, empty_data, corrupt_data.parquet)."""

import os

import pytest

from dqc_spark.audit import MemoryAuditSink
from dqc_spark.checks import DataQualityChecker
from dqc_spark.sources import DataPathError, load_table
from tests.conftest import fixture_path


@pytest.fixture()
def checker(spark):
    return DataQualityChecker(spark, audit_sink=MemoryAuditSink())


def csv_df(spark, cols, rows):
    """Inline fixture helper, mirroring writeTempCSV
    (checker_test.go:327-334) without the tempfile."""
    return spark.createDataFrame(rows, cols)


# -- unique (checker_test.go:46-66) -----------------------------------------
def test_unique_pass(checker):
    r = checker.is_column_unique(fixture_path("unique_data.csv"), "id")
    assert r.passed and r.error_count == 0


def test_unique_fail(checker):
    r = checker.is_column_unique(fixture_path("duplicate_data.csv"), "id")
    assert not r.passed and r.error_count == 1  # one duplicated VALUE (id=1)


def test_unique_two_nulls_are_duplicate(checker, spark):
    # NULLs group together (DuckDB parity, SURVEY §2.1 #1)
    df = spark.createDataFrame([(None,), (None,), (1,)], "id int")
    r = checker.is_column_unique(df, "id")
    assert not r.passed and r.error_count == 1


# -- not-null (checker_test.go:68-88) ----------------------------------------
def test_not_null_pass(checker):
    r = checker.is_column_not_null(fixture_path("no_nulls.csv"), "name")
    assert r.passed and r.error_count == 0


def test_not_null_fail(checker, spark):
    df = spark.createDataFrame([("Alice",), (None,), ("Charlie",)], "name string")
    r = checker.is_column_not_null(df, "name")
    assert not r.passed and r.error_count == 1


# -- enum (checker_test.go:90-112) -------------------------------------------
def test_enum_pass(checker):
    r = checker.is_column_enum(fixture_path("valid_enum.csv"), "status",
                               ["active", "inactive", "pending"])
    assert r.passed


def test_enum_fail(checker):
    r = checker.is_column_enum(fixture_path("invalid_enum.csv"), "status",
                               ["active", "inactive", "pending"])
    assert not r.passed and r.error_count == 1


def test_enum_nulls_pass(checker, spark):
    # null_enum.csv semantics: NULLs pass the enum check (IN on NULL is NULL)
    df = spark.createDataFrame([("active",), (None,), ("pending",)],
                               "status string")
    r = checker.is_column_enum(df, "status", ["active", "pending"])
    assert r.passed and r.error_count == 0


# -- referential (checker_test.go:114-137) ------------------------------------
def test_referential_pass(checker):
    r = checker.are_tables_referential_integral(
        fixture_path("orders.csv"), fixture_path("users.csv"), ["user_id"])
    assert r.passed and r.error_count == 0


def test_referential_fail(checker):
    r = checker.are_tables_referential_integral(
        fixture_path("orphaned_orders.csv"), fixture_path("users.csv"),
        ["user_id"])
    assert not r.passed and r.error_count == 1


def test_referential_null_left_key_is_violation(checker, spark):
    left = spark.createDataFrame([(1, 1), (2, None)], "order_id int, user_id int")
    right = spark.createDataFrame([(1,)], "user_id int")
    r = checker.are_tables_referential_integral(left, right, ["user_id"])
    assert not r.passed and r.error_count == 1


# -- column exists (checker_test.go:139-159) -----------------------------------
def test_column_exists_pass(checker):
    assert checker.is_column_in_data(fixture_path("unique_data.csv"), "id").passed


def test_column_exists_fail(checker):
    assert not checker.is_column_in_data(
        fixture_path("unique_data.csv"), "nope").passed


# -- between (checker_test.go:161-173) -----------------------------------------
def test_between_pass(checker, spark):
    df = csv_df(spark, "age: int", [(20,), (30,), (40,)])
    assert checker.is_column_between(df, "age", 18, 50).passed


def test_between_fail(checker, spark):
    df = csv_df(spark, "age: int", [(20,), (30,), (40,)])
    r = checker.is_column_between(df, "age", 25, 50)
    assert not r.passed and r.error_count == 1


def test_between_nulls_pass(checker, spark):
    df = spark.createDataFrame([(20,), (None,)], "age int")
    assert checker.is_column_between(df, "age", 18, 50).passed


# -- regex (checker_test.go:175-187) --------------------------------------------
def test_regex_pass(checker, spark):
    df = csv_df(spark, "email: string", [("a@b.com",), ("c@d.com",)])
    assert checker.is_column_regex_match(df, "email", r"^[a-z]+@[a-z]+\.com$").passed


def test_regex_fail(checker, spark):
    df = csv_df(spark, "email: string", [("a@b.com",), ("c@d.com",)])
    r = checker.is_column_regex_match(df, "email", r"^[0-9]+$")
    assert not r.passed and r.error_count == 2


def test_regex_partial_match_semantics(checker, spark):
    # regexp_matches is search, not fullmatch (README.md:33)
    df = csv_df(spark, "s: string", [("xx123yy",)])
    assert checker.is_column_regex_match(df, "s", "[0-9]+").passed


# -- type (checker_test.go:189-201) ----------------------------------------------
def test_type_pass(checker, spark):
    df = csv_df(spark, "val: string", [("1",), ("2",), ("3",)])
    assert checker.is_column_of_type(df, "val", "INTEGER").passed


def test_type_fail(checker, spark):
    df = csv_df(spark, "val: string", [("1",), ("2",), ("abc",)])
    r = checker.is_column_of_type(df, "val", "INTEGER")
    assert not r.passed and r.error_count == 1


def test_type_exotic_names_pass_through(checker, spark):
    # reference hands ANY type name to the engine (main.go:732) —
    # exotic/DuckDB-only names must be accepted, not rejected up front
    uu = csv_df(
        spark,
        "val: string",
        [
            ("123e4567-e89b-12d3-a456-426614174000",),
            ("not-a-uuid",),
            (None,),
        ],
    )
    r = checker.is_column_of_type(uu, "val", "UUID")
    assert not r.passed and r.error_count == 1  # NULL passes, bad uuid fails

    arr = csv_df(spark, "val: string", [("[1, 2]",), ("oops",)])
    # DuckDB list shorthand INTEGER[] -> Spark array<int> try_cast:
    # '[1, 2]' parses, 'oops' does not
    r = checker.is_column_of_type(arr, "val", "INTEGER[]")
    assert not r.passed and r.error_count == 1

    dec = csv_df(spark, "val: string", [("12.345",), ("x",)])
    r = checker.is_column_of_type(dec, "val", "DECIMAL(10,3)")
    assert not r.passed and r.error_count == 1


def test_type_unknown_name_raises_clearly(checker, spark):
    from dqc_spark.checks import spark_type_name

    with pytest.raises(ValueError, match="not recognized"):
        spark_type_name("TOTALLY_MADE_UP_TYPE")


# -- regex dialect guard -----------------------------------------------------
@pytest.mark.parametrize(
    "bad",
    [r"(a)\1", r"foo(?=bar)", r"foo(?!bar)", r"(?<=a)b", r"(?<!a)b",
     r"a*+b", r"a++", r"(ab)\k<g>"],
)
def test_regex_java_only_constructs_rejected(bad):
    # Java rlike would silently ACCEPT these; RE2 (the reference's
    # engine) rejects them — so must we, loudly
    from dqc_spark.checks import to_re2_compatible

    with pytest.raises(ValueError, match="not valid RE2"):
        to_re2_compatible(bad)


@pytest.mark.parametrize(
    "ok",
    [r"^[A-Z]{6,}$", r"\d+\.\d+", r"a|b", r"[+*?]", r"\\1", r"x\+\+y",
     r"(?i)hello", r"colou?r",
     # unmatched '}' is a LITERAL in both RE2 and Java — 'x}+' must not
     # trip the possessive-quantifier rejection
     r"x}+", r"a{b}+"],
)
def test_regex_common_subset_passes_unchanged(ok):
    from dqc_spark.checks import to_re2_compatible

    assert to_re2_compatible(ok) == ok


def test_regex_re2_named_group_translated(checker, spark):
    # RE2 spells named groups (?P<name>...); Java wants (?<name>...)
    from dqc_spark.checks import to_re2_compatible

    assert to_re2_compatible(r"(?P<word>[a-z]+)-\d") == r"(?<word>[a-z]+)-\d"
    df = csv_df(spark, "val: string", [("abc-1",), ("ABC-1",)])
    r = checker.is_column_regex_match(df, "val", r"(?P<word>[a-z]+)-\d")
    assert not r.passed and r.error_count == 1


# -- length (checker_test.go:203-214) ---------------------------------------------
def test_length_pass(checker, spark):
    df = csv_df(spark, "name: string", [("Alice",), ("Bob",)])
    assert checker.is_column_length_between(df, "name", 3, 5).passed


def test_length_fail(checker, spark):
    df = csv_df(spark, "name: string", [("Alice",), ("Bob",)])
    r = checker.is_column_length_between(df, "name", 4, 5)
    assert not r.passed and r.error_count == 1


# -- aggregates (checker_test.go:216-235) --------------------------------------------
@pytest.fixture()
def vals_df(spark):
    return csv_df(spark, "val: int", [(10,), (20,), (30,)])


def test_max_between(checker, vals_df):
    r = checker.is_column_max_between(vals_df, "val", 25, 35)
    assert r.passed and r.observed == 30.0
    assert not checker.is_column_max_between(vals_df, "val", 5, 15).passed


def test_min_between(checker, vals_df):
    r = checker.is_column_min_between(vals_df, "val", 5, 15)
    assert r.passed and r.observed == 10.0


def test_mean_between(checker, vals_df):
    r = checker.is_column_mean_between(vals_df, "val", 15, 25)
    assert r.passed and r.observed == 20.0


def test_median_between(checker, vals_df):
    r = checker.is_column_median_between(vals_df, "val", 15, 25)
    assert r.passed and r.observed == 20.0


def test_median_interpolates(checker, spark):
    # DuckDB MEDIAN(1,2,3,4) = 2.5 (SURVEY §2.1 #13)
    df = csv_df(spark, "val: int", [(1,), (2,), (3,), (4,)])
    r = checker.is_column_median_between(df, "val", 2.5, 2.5)
    assert r.passed and r.observed == 2.5


def test_aggregate_on_empty_fails(checker, spark):
    df = spark.createDataFrame([], "val int")
    r = checker.is_column_max_between(df, "val", 0, 10)
    assert not r.passed and r.observed is None


# -- row / col count (checker_test.go:237-248) ------------------------------------------
def test_row_count(checker, vals_df):
    assert checker.is_table_row_count_between(vals_df, 1, 3).passed
    assert not checker.is_table_row_count_between(vals_df, 4, 9).passed


def test_col_count(checker, spark):
    df = csv_df(spark, "a: int, b: int, c: int", [(1, 2, 3), (4, 5, 6)])
    assert checker.is_table_column_count_between(df, 2, 4).passed
    assert not checker.is_table_column_count_between(df, 4, 9).passed


# -- set membership (checker_test.go:250-266) ---------------------------------------------
@pytest.fixture()
def colors_df(spark):
    return csv_df(spark, "color: string", [("red",), ("blue",), ("green",)])


def test_not_in_set(checker, colors_df):
    assert checker.is_column_not_in_set(colors_df, "color",
                                        ["yellow", "black"]).passed
    r = checker.is_column_not_in_set(colors_df, "color", ["red"])
    assert not r.passed and r.error_count == 1


def test_distinct_in_set(checker, colors_df):
    assert checker.are_distinct_values_in_set(
        colors_df, "color", ["red", "blue", "green", "yellow"]).passed


def test_distinct_in_set_counts_values_not_rows(checker, spark):
    df = csv_df(spark, "c: string", [("x",), ("x",), ("x",), ("y",)])
    r = checker.are_distinct_values_in_set(df, "c", ["y"])
    assert not r.passed and r.error_count == 1  # one distinct bad VALUE


# -- increasing / dates (checker_test.go:268-284) --------------------------------------------
def test_increasing_pass(checker, spark):
    df = spark.createDataFrame([(i, v) for i, v in enumerate([1, 2, 3])],
                               "ord int, val int")
    assert checker.is_column_increasing(df, "val", order_column="ord").passed


def test_increasing_ties_fail(checker, spark):
    df = spark.createDataFrame([(i, v) for i, v in enumerate([1, 2, 2, 3])],
                               "ord int, val int")
    r = checker.is_column_increasing(df, "val", order_column="ord")
    assert not r.passed and r.error_count == 1


def test_increasing_scan_order_fallback(checker, spark):
    df = spark.createDataFrame([(3,), (1,), (2,)], "val int").coalesce(1)
    r = checker.is_column_increasing(df, "val")
    assert not r.passed


def test_date_parseable(checker, spark):
    ok = csv_df(spark, "dt: string", [("2023-01-01",), ("2023-05-01",)])
    assert checker.is_column_date_parseable(ok, "dt").passed
    bad = csv_df(spark, "dt: string", [("01/02/2023",)])
    assert not checker.is_column_date_parseable(bad, "dt").passed


def test_date_format(checker, spark):
    ok = csv_df(spark, "dt: string", [("2023-01-01",), ("2023-05-01",)])
    assert checker.is_column_date_format(ok, "dt", "%Y-%m-%d").passed
    # documented-intent behavior on bad values (reference raises; SURVEY #14)
    bad = csv_df(spark, "dt: string", [("2023-01-01",), ("nope",)])
    r = checker.is_column_date_format(bad, "dt", "%Y-%m-%d")
    assert not r.passed and r.error_count == 1


# -- pair equal (checker_test.go:286-298) ------------------------------------------------------
def test_pair_equal(checker, spark):
    ok = csv_df(spark, "a: int, b: int", [(1, 1), (2, 2)])
    assert checker.are_column_pairs_equal(ok, "a", "b").passed
    bad = csv_df(spark, "a: int, b: int", [(1, 1), (2, 3)])
    r = checker.are_column_pairs_equal(bad, "a", "b")
    assert not r.passed and r.error_count == 1


def test_pair_equal_both_null_is_equal(checker, spark):
    df = spark.createDataFrame([(None, None), (1, None)], "a int, b int")
    r = checker.are_column_pairs_equal(df, "a", "b")
    assert not r.passed and r.error_count == 1  # only (1, NULL) violates


# -- path validation (validatePathExists, checker.go:24-43) ------------------------------------
def test_missing_path_raises(spark):
    with pytest.raises(DataPathError):
        load_table(spark, "/nonexistent/file.csv")


def test_corrupt_file_raises(spark):
    with pytest.raises(DataPathError):
        load_table(spark, fixture_path("corrupt_data.parquet"))


# -- audit side effect (TestLogsAreWritten, checker_test.go:301-325) ----------------------------
def test_logs_are_written(spark):
    sink = MemoryAuditSink()
    checker = DataQualityChecker(spark, audit_sink=sink)
    checker.is_column_unique(fixture_path("unique_data.csv"), "id")
    assert len(sink.rows) == 1
    row = sink.rows[0]
    assert row["check_type"] == "is_column_unique"
    assert row["result"] is True
    assert row["params"]["column"] == "id"


def test_profile_table_single_pass(spark):
    from dqc_spark.profile import profile_table

    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, None, 10.0), (3, "a", None), (None, "b", 9.0)],
        "k long, s string, v double",
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["k"]["n_nulls"] == 1 and prof["k"]["n_distinct"] == 3
    assert prof["s"]["n_nulls"] == 1 and prof["s"]["n_distinct"] == 2
    # min/max aggregate on the NATIVE type (9.0 < 10.0, not "10" < "9")
    assert prof["v"]["min_str"] == "2.5" and prof["v"]["max_str"] == "10.0"
    assert prof["k"]["min_str"] == "1" and prof["k"]["max_str"] == "3"
    # one scan: all per-column aggregates fold into a single source read
    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") == 1
    # approx path returns the same shape
    papprox = {r["column"]: r for r in profile_table(df, approx=True).collect()}
    assert set(papprox) == set(prof)


def test_numeric_histogram(spark):
    from dqc_spark.profile import numeric_histogram

    df = spark.createDataFrame(
        [(float(v),) for v in [0, 1, 2, 3, 4, 5, 5, 5, 9, 10]] + [(None,)],
        "v double",
    )
    h = {r["bucket"]: r for r in numeric_histogram(df, "v", buckets=5).collect()}
    # width 2: [0,2) [2,4) [4,6) [6,8) [8,10]; max lands in the last bucket
    assert {b: r["n"] for b, r in h.items()} == {0: 2, 1: 2, 2: 4, 4: 2}
    assert h[0]["lo"] == 0.0 and h[0]["hi"] == 2.0
    assert sum(r["n"] for r in h.values()) == 10  # NULL excluded
    # degenerate: constant column -> single bucket
    one = spark.createDataFrame([(7.0,), (7.0,)], "v double")
    rows = numeric_histogram(one, "v").collect()
    assert len(rows) == 1 and rows[0]["n"] == 2 and rows[0]["bucket"] == 0


def test_profile_weird_column_names_and_empty_histogram(spark):
    from dqc_spark.profile import numeric_histogram, profile_table

    df = spark.createDataFrame([(1, "x")], ["my col", "it's"])
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["my col"]["n_distinct"] == 1 and prof["it's"]["min_str"] == "x"
    # all-NULL column -> EMPTY histogram, no phantom row
    nulls = spark.createDataFrame([(None,), (None,)], "v double")
    assert numeric_histogram(nulls, "v").count() == 0


def test_profile_dotted_column_names(spark):
    # F.col("a.b") parses '.' as nested-field access; profile_table and
    # numeric_histogram must resolve positionally (df[c]) so a header
    # literally named "a.b" profiles the right column
    from dqc_spark.profile import numeric_histogram, profile_table

    df = spark.createDataFrame([(1.0, 9.0), (2.0, 9.0), (None, 9.0)],
                               ["a.b", "a"])
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["a.b"]["n_nulls"] == 1 and prof["a.b"]["n_distinct"] == 2
    assert prof["a.b"]["min_str"] == "1.0" and prof["a"]["min_str"] == "9.0"
    h = numeric_histogram(df, "a.b", buckets=2).collect()
    assert sum(r["n"] for r in h) == 2


# ---------------------------------------------------------------------------
# deequ-style extensions: completeness budget + freshness
# ---------------------------------------------------------------------------


def test_null_fraction_check(spark):
    from dqc_spark.suite import Check, CheckSuite

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "d")], "id long, v string")
    res = CheckSuite([
        Check.null_fraction_max("v", 0.5),   # 0.5 observed, passes
        Check.null_fraction_max("v", 0.25),  # fails
        Check.null_fraction_max("id", 0.0),  # no NULLs, passes
    ]).run(df)
    assert [r.passed for r in res] == [True, False, True]
    assert res[0].observed == 0.5 and res[2].observed == 0.0
    # empty input: no evidence of completeness -> fail, observed None
    empty = df.limit(0)
    r = CheckSuite([Check.null_fraction_max("v", 1.0)]).run(empty)[0]
    assert not r.passed and r.observed is None


def test_freshness_check(spark):
    import datetime as dt

    from dqc_spark.suite import Check, CheckSuite

    rows = [(dt.datetime(2024, 1, 10, 12, 0, 0),),
            (dt.datetime(2024, 1, 20, 6, 30, 0),)]
    df = spark.createDataFrame(rows, "ts timestamp")
    res = CheckSuite([
        Check.freshness("ts", "2024-01-15T00:00:00"),  # newest is later
        Check.freshness("ts", "2024-01-21T00:00:00"),  # stale
    ]).run(df)
    assert [r.passed for r in res] == [True, False]
    # observed = epoch seconds of the max (UTC session tz)
    want = dt.datetime(2024, 1, 20, 6, 30, 0,
                       tzinfo=dt.timezone.utc).timestamp()
    assert res[0].observed == want
    # all-NULL column: staleness, not success
    nulls = spark.createDataFrame(
        [(None,), (None,)], "ts timestamp")
    r = CheckSuite([Check.freshness("ts", "2024-01-01T00:00:00")]
                   ).run(nulls)[0]
    assert not r.passed and r.observed is None


def test_new_checks_fuse_into_single_scan(spark):
    import datetime as dt

    from dqc_spark.suite import Check, CheckSuite

    df = spark.createDataFrame(
        [(1, "a", dt.datetime(2024, 1, 1))], "id long, v string, ts timestamp")
    suite = CheckSuite([
        Check.not_null("id"),
        Check.null_fraction_max("v", 0.5),
        Check.freshness("ts", "2023-01-01T00:00:00"),
    ])
    plan = suite.fused_agg_frame(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan") <= 2  # one logical scan (plus reuse)


# -- round-4 review sweep: type-generic scalable increasing + quoted idents --
def test_increasing_scalable_timestamp_order(checker, spark):
    """The natural production shape: order by warc_ts (timestamp).
    Previously the seam kernel float()-cast the order column and
    crashed; now the seam frame carries the input types verbatim."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [(base + dt.timedelta(hours=i), v)
            for i, v in enumerate([1, 2, 5, 4, 9])]
    df = spark.createDataFrame(rows, "ts timestamp, val int").repartition(3)
    r = checker.is_column_increasing(df, "val", order_column="ts")
    assert not r.passed and r.error_count == 1  # 4 after 5


def test_increasing_scalable_string_values(checker, spark):
    """String value column: compared with the column's own ordering,
    like the window path / DuckDB `c <= LAG(c)` on VARCHAR."""
    df = spark.createDataFrame(
        [(0, "apple"), (1, "banana"), (2, "banana"), (3, "cherry")],
        "ord int, w string",
    ).repartition(2)
    r = checker.is_column_increasing(df, "w", order_column="ord")
    assert not r.passed and r.error_count == 1  # the tie


def test_increasing_scalable_nulls_pass(checker, spark):
    """NULL on either side of the lag pair -> predicate NULL -> pass,
    matching the reference's SQL semantics and the window path."""
    from dqc_spark.checks import count_increasing_violations_scalable

    df = spark.createDataFrame(
        [(0, 1), (1, None), (2, 2), (3, 2)], "ord int, val int"
    ).repartition(2)
    n = count_increasing_violations_scalable(df, "val", "ord")
    assert n == 1  # only the 2<=2 tie; NULL pairs never violate


def test_increasing_scalable_matches_window_path(spark):
    """Differential: scalable seam count == single-window count on a
    shuffled mixed corpus (incl. ties, dips, NULLs)."""
    from dqc_spark.checks import (
        count_increasing_violations_scalable,
        increasing_violations,
    )

    vals = [1, 3, 2, 2, None, 7, 6, None, 6, 10, 4, 4]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "ord int, val int"
    ).repartition(5)
    scal = count_increasing_violations_scalable(df, "val", "ord")
    win = increasing_violations(df, "val", order_column="ord").count()
    assert scal == win


def test_type_check_dotted_column_name(checker, spark):
    """A CSV header containing '.' must resolve as ONE identifier in
    the try_cast expression, not as nested-field access."""
    df = spark.createDataFrame([("12",), ("x",)], ["a.b"])
    r = checker.is_column_of_type(df, "a.b", "INTEGER")
    assert not r.passed and r.error_count == 1


def test_date_parseable_dotted_column_name(checker, spark):
    df = spark.createDataFrame([("2023-01-01",), ("nope",)], ["d.t"])
    r = checker.is_column_date_parseable(df, "d.t")
    assert not r.passed and r.error_count == 1


def test_increasing_scalable_null_order_keys_keep_their_seam(spark):
    """NULL order keys all land in the lowest range partition (sorted
    nulls-first), whose first_ord is NULL — that partition must still
    join the seam chain, or the comparison into the next partition is
    silently skipped.  Differential vs the window path, which orders
    nulls first natively."""
    from dqc_spark.checks import (
        count_increasing_violations_scalable,
        increasing_violations,
    )

    # null-ord rows carry values 9,9 (one internal tie) and the last of
    # them (9) >= the first real-ord value (5): the null-partition seam
    # itself violates — the case the chain used to drop
    rows = [(None, 9), (None, 9), (0, 5), (1, 6), (2, 3), (3, 7)]
    df = spark.createDataFrame(rows, "ord int, val int").repartition(4)
    scal = count_increasing_violations_scalable(df, "val", "ord")
    win = increasing_violations(df, "val", order_column="ord").count()
    assert scal == win == 3  # 9<=9, 5<=9 (the rescued seam), 3<=6

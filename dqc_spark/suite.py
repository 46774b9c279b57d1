"""CheckSuite — fuse an entire suite of checks into one scan.

The reference runs one fresh DuckDB connection + one full file scan per
check (checker.go:52 et al., 21 sites; see SURVEY §1.2) — so a 10-check
suite reads the data 10 times.  Here every row-predicate check
contributes ``sum(case when <violation> then 1 else 0)`` and every
aggregate check contributes its aggregate to a SINGLE ``df.agg(...)``
pass: one scan, one partial+final aggregate, regardless of suite size.
This is the core architectural win at 100 TB — the scan (IO) dominates,
and we pay it once.

Checks that need their own shuffle topology (unique → groupBy on the
checked column; referential → anti-join; increasing → order seams) run
as separate jobs but share the cached input.

The same predicates double as per-document gates:
``CheckSuite.keep_column()`` returns ``NOT (p1 OR p2 OR ...)`` so the
keep/drop decision and the table-level zero-row-success booleans
(README.md:10) come out of one fused pass (SURVEY §2.4).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dqc_spark import checks as C
from dqc_spark.checks import CheckResult


@dataclass
class Check:
    """One declarative check. Build via the class-method constructors."""

    check_type: str
    params: dict[str, str] = field(default_factory=dict)
    # violation predicate for row-level checks (fusable)
    pred: Column | None = None
    # (agg fn name, column, lo, hi) for scalar-aggregate checks (fusable)
    agg: tuple[str, str, float, float] | None = None
    # count distinct violating values instead of rows (#21; fusable)
    distinct_on: str | None = None
    # fully custom runner: fn(df) -> CheckResult (non-fusable)
    runner: Callable[[DataFrame], CheckResult] | None = None

    # -- row-predicate checks (all fuse) ---------------------------------
    @classmethod
    def not_null(cls, column: str) -> "Check":
        return cls("is_column_not_null", {"column": column},
                   pred=C.not_null_pred(column))

    @classmethod
    def enum(cls, column: str, allowed: Sequence) -> "Check":
        return cls("is_column_enum",
                   {"column": column, "enum_values": ",".join(map(str, allowed))},
                   pred=C.enum_pred(column, allowed))

    @classmethod
    def between(cls, column: str, lo: float, hi: float) -> "Check":
        return cls("is_column_between",
                   {"column": column, "min_value": str(lo), "max_value": str(hi)},
                   pred=C.between_pred(column, lo, hi))

    @classmethod
    def regex(cls, column: str, pattern: str) -> "Check":
        return cls("is_column_regex_match", {"column": column, "regex": pattern},
                   pred=C.regex_pred(column, pattern))

    @classmethod
    def of_type(cls, column: str, duckdb_type: str) -> "Check":
        return cls("is_column_of_type", {"column": column, "type": duckdb_type},
                   pred=C.type_pred(column, duckdb_type))

    @classmethod
    def length(cls, column: str, lo: int, hi: int) -> "Check":
        return cls("is_column_length_between",
                   {"column": column, "min_length": str(lo), "max_length": str(hi)},
                   pred=C.length_pred(column, lo, hi))

    @classmethod
    def not_in_set(cls, column: str, blacklist: Sequence) -> "Check":
        return cls("is_column_not_in_set",
                   {"column": column, "set_values": ",".join(map(str, blacklist))},
                   pred=C.not_in_set_pred(column, blacklist))

    @classmethod
    def date_parseable(cls, column: str) -> "Check":
        return cls("is_column_date_parseable", {"column": column},
                   pred=C.date_parseable_pred(column))

    @classmethod
    def pair_equal(cls, col_a: str, col_b: str) -> "Check":
        return cls("are_column_pairs_equal", {"column_a": col_a, "column_b": col_b},
                   pred=C.pair_not_equal_pred(col_a, col_b))

    @classmethod
    def custom_pred(cls, name: str, pred: Column, params: dict | None = None) -> "Check":
        """Any per-row gate (Gopher/C4 heuristics, langid score, PII hit)
        as a first-class check — the generalization hook (SURVEY §2.4)."""
        return cls(name, {k: str(v) for k, v in (params or {}).items()}, pred=pred)

    # -- aggregate checks (fuse into the same pass) -----------------------
    @classmethod
    def max_between(cls, column: str, lo: float, hi: float) -> "Check":
        return cls("is_column_max_between",
                   {"column": column, "min_value": str(lo), "max_value": str(hi)},
                   agg=("max", column, lo, hi))

    @classmethod
    def min_between(cls, column: str, lo: float, hi: float) -> "Check":
        return cls("is_column_min_between",
                   {"column": column, "min_value": str(lo), "max_value": str(hi)},
                   agg=("min", column, lo, hi))

    @classmethod
    def mean_between(cls, column: str, lo: float, hi: float) -> "Check":
        return cls("is_column_mean_between",
                   {"column": column, "min_value": str(lo), "max_value": str(hi)},
                   agg=("mean", column, lo, hi))

    @classmethod
    def median_between(cls, column: str, lo: float, hi: float,
                       approx: bool = False) -> "Check":
        """Exact median matches DuckDB MEDIAN (interpolated); at scale
        pass approx=True — percentile_approx keeps the whole fused agg
        on the fast hash-agg path (exact median drags it onto
        ObjectHashAggregate: measured 4.1s vs 0.4s for a 10-check suite
        on 600k rows) at ~0.03% observed error (accuracy=10000)."""
        agg_fn = "median_approx" if approx else "median"
        return cls("is_column_median_between",
                   {"column": column, "min_value": str(lo), "max_value": str(hi),
                    "approx": str(approx)},
                   agg=(agg_fn, column, lo, hi))

    @classmethod
    def row_count_between(cls, lo: int, hi: int) -> "Check":
        return cls("is_table_row_count_between",
                   {"min_count": str(lo), "max_count": str(hi)},
                   agg=("count", "*", lo, hi))

    @classmethod
    def null_fraction_max(cls, column: str, max_fraction: float) -> "Check":
        """Deequ-style COMPLETENESS: fraction of NULLs in ``column``
        must not exceed ``max_fraction`` (not_null is the 0.0 special
        case; real feeds tolerate a budget).  Fuses: one avg over a 0/1
        cast, exact int-ratio double.  Empty input → observed None →
        fail (no evidence of completeness)."""
        return cls("is_column_null_fraction_max",
                   {"column": column, "max_fraction": str(max_fraction)},
                   agg=("null_frac", column, 0.0, float(max_fraction)))

    @classmethod
    def freshness(cls, column: str, newer_than: str) -> "Check":
        """FRESHNESS: the newest value of timestamp ``column`` must be
        at or after ``newer_than`` (ISO-8601, interpreted as UTC — the
        engine's session timezone, session.py).  The check a scheduled
        ingest runs before trusting a feed ("did yesterday's partition
        actually arrive").  Fuses as max(epoch-seconds); an empty or
        all-NULL column → observed None → fail (absence of data is
        staleness, not success)."""
        from datetime import datetime, timezone

        dt = datetime.fromisoformat(newer_than)
        if dt.tzinfo is None:
            # naive timestamps default to UTC; an EXPLICIT offset is
            # respected (a blind replace() would silently shift the
            # cutoff by the offset — review finding)
            dt = dt.replace(tzinfo=timezone.utc)
        cutoff = dt.timestamp()
        return cls("is_column_fresh",
                   {"column": column, "newer_than": newer_than},
                   agg=("max_epoch", column, cutoff, float("inf")))

    # -- distinct-values check (#21, fuses via count_distinct) ------------
    @classmethod
    def distinct_in_set(cls, column: str, allowed: Sequence) -> "Check":
        c = cls("are_distinct_values_in_set",
                {"column": column, "set_values": ",".join(map(str, allowed))},
                pred=C.enum_pred(column, allowed))
        c.distinct_on = column
        return c

    # -- non-fusable checks (own topology / no scan) -----------------------
    @classmethod
    def unique(cls, column: str) -> "Check":
        def run(df: DataFrame) -> CheckResult:
            n = C.unique_violations(df, column).count()
            return CheckResult("is_column_unique", passed=(n == 0),
                               error_count=n, params={"column": column})
        return cls("is_column_unique", {"column": column}, runner=run)

    @classmethod
    def references(cls, ref_df: DataFrame, keys: Sequence[str],
                   broadcast: bool = True) -> "Check":
        def run(df: DataFrame) -> CheckResult:
            n = C.referential_violations(df, ref_df, keys, broadcast).count()
            return CheckResult("are_tables_referential_integral", passed=(n == 0),
                               error_count=n, params={"columns": ",".join(keys)})
        return cls("are_tables_referential_integral",
                   {"columns": ",".join(keys)}, runner=run)

    @classmethod
    def increasing(cls, column: str, order_column: str | None = None) -> "Check":
        def run(df: DataFrame) -> CheckResult:
            if order_column is not None:
                n = C.count_increasing_violations_scalable(df, column, order_column)
            else:
                n = C.increasing_violations(df, column).count()
            return CheckResult("is_column_increasing", passed=(n == 0),
                               error_count=n, params={"column": column})
        return cls("is_column_increasing", {"column": column}, runner=run)

    @classmethod
    def date_format(cls, column: str, fmt: str) -> "Check":
        def run(df: DataFrame) -> CheckResult:
            n = C.date_format_violation_count(df, column, fmt)
            return CheckResult("is_column_date_format", passed=(n == 0),
                               error_count=n,
                               params={"column": column, "date_format": fmt})
        return cls("is_column_date_format", {"column": column, "date_format": fmt},
                   runner=run)

    @classmethod
    def column_exists(cls, column: str) -> "Check":
        def run(df: DataFrame) -> CheckResult:
            return CheckResult("is_column_in_data",
                               passed=C.column_exists(df, column),
                               params={"column": column})
        return cls("is_column_in_data", {"column": column}, runner=run)

    @classmethod
    def column_count_between(cls, lo: int, hi: int) -> "Check":
        def run(df: DataFrame) -> CheckResult:
            passed, n = C.column_count_between(df, lo, hi)
            return CheckResult("is_table_column_count_between", passed=passed,
                               observed=float(n),
                               params={"min_count": str(lo), "max_count": str(hi),
                                       "column_count": str(n)})
        return cls("is_table_column_count_between",
                   {"min_count": str(lo), "max_count": str(hi)}, runner=run)


class CheckSuite:
    """Run many checks over one table in (at most) one scan + K extra
    jobs for checks with their own shuffle topology."""

    def __init__(self, checks: Sequence[Check]):
        self.checks = list(checks)

    # -- fused execution ---------------------------------------------------
    def run(self, df: DataFrame, audit=None, input_snapshot: str | None = None
            ) -> list[CheckResult]:
        fused: list[tuple[int, Check]] = []
        standalone: list[tuple[int, Check]] = []
        for i, ch in enumerate(self.checks):
            if ch.runner is not None:
                standalone.append((i, ch))
            else:
                fused.append((i, ch))

        results: dict[int, CheckResult] = {}

        if fused:
            row = self.fused_agg_frame(df, fused).first()
            for i, ch in fused:
                v = row[f"c{i}"]
                if ch.agg is not None:
                    fn, col, lo, hi = ch.agg
                    if v is None:
                        res = CheckResult(ch.check_type, passed=False,
                                          observed=None, params=dict(ch.params))
                    else:
                        res = CheckResult(ch.check_type,
                                          passed=(lo <= float(v) <= hi),
                                          observed=float(v), params=dict(ch.params))
                else:
                    n = int(v or 0)
                    res = CheckResult(ch.check_type, passed=(n == 0),
                                      error_count=n, params=dict(ch.params))
                results[i] = res

        for i, ch in standalone:
            results[i] = ch.runner(df)

        ordered = [results[i] for i in range(len(self.checks))]
        if audit is not None:
            for res in ordered:
                audit.log(res.check_type, res.passed, res.params,
                          error_count=res.error_count,
                          input_snapshot=input_snapshot)
        return ordered

    def fused_agg_frame(self, df: DataFrame,
                        fused: Sequence[tuple[int, "Check"]] | None = None
                        ) -> DataFrame:
        """The single-pass aggregate frame for every fusable check:
        one scan, one partial+final hash aggregate, one single-row
        exchange — regardless of how many checks the suite holds.
        Exposed so plan-regression tests can pin that shape."""
        if fused is None:
            fused = [(i, ch) for i, ch in enumerate(self.checks)
                     if ch.runner is None]
        aggs: list[Column] = []
        for i, ch in fused:
            a = f"c{i}"
            if ch.distinct_on is not None:
                # distinct violating VALUES (#21): count_distinct over
                # a predicated projection — still one pass
                aggs.append(
                    F.count_distinct(
                        F.when(ch.pred, F.col(ch.distinct_on))
                    ).alias(a)
                )
            elif ch.pred is not None:
                aggs.append(
                    F.sum(F.when(ch.pred, 1).otherwise(0)).alias(a)
                )
            else:
                fn, col, _, _ = ch.agg
                if fn == "count":
                    aggs.append(F.count(F.lit(1)).alias(a))
                elif fn == "null_frac":
                    # avg of a 0/1 cast: exact integer sum / count, so
                    # the observed fraction is an int-ratio double
                    aggs.append(F.avg(
                        F.col(col).isNull().cast("double")).alias(a))
                elif fn == "max_epoch":
                    # NTZ columns (parquet default) can't cast straight
                    # to double — go through TIMESTAMP first (a no-op
                    # for tz-aware columns); the UTC session tz
                    # (session.py) makes the wall-time interpretation
                    # and the epoch seconds match the python cutoff
                    aggs.append(F.max(
                        F.col(col).cast("timestamp").cast("double")
                    ).alias(a))
                elif fn == "median_approx":
                    aggs.append(
                        F.percentile_approx(col, 0.5, 10000).alias(a))
                else:
                    fns = {"max": F.max, "min": F.min,
                           "mean": F.avg, "median": F.median}
                    aggs.append(fns[fn](col).alias(a))
        return df.agg(*aggs)

    # -- per-document gate view (SURVEY §2.4) ------------------------------
    def gate_columns(self) -> list[tuple[str, Column]]:
        """(name, violation predicate) for every row-level check."""
        out = []
        for i, ch in enumerate(self.checks):
            if ch.pred is not None and ch.distinct_on is None:
                out.append((f"{ch.check_type}_{i}", ch.pred))
        return out

    def keep_column(self) -> Column:
        """keep = NOT (p1 OR p2 OR ...): a document survives iff it
        violates no gate."""
        gates = self.gate_columns()
        if not gates:
            return F.lit(True)
        acc = gates[0][1]
        for _, p in gates[1:]:
            acc = acc | p
        # violation predicates are NULL-passing by construction; coalesce
        # so keep is never NULL
        return ~F.coalesce(acc, F.lit(False))

"""Column profiling: per-column null / distinct / min / max in ONE scan.

The deequ-style companion to the check suite — before writing checks
against a new table you profile it.  The reference has no profiler
(each check re-derives its own aggregate); here every column's four
statistics fold into a single ``df.agg`` pass, then one ``stack``
unpivots the 1-row result into (column, stats) rows — no second scan,
no per-column job.

Scale notes:

  * ``approx=False`` uses exact ``count_distinct``; multiple exact
    distincts in one agg plan through Spark's Expand operator (input
    multiplied by ``len(columns)+1``) — fine for profiling runs, but at
    100 TB set ``approx=True`` (HLL++ sketches, single pass, no Expand).
  * min/max aggregate on the NATIVE column type and cast to string
    afterwards, so numeric columns profile numerically ("9" < "10").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _qcol(name: str) -> F.Column:
    """Resolve a column by its LITERAL name: backtick-quoted (with
    embedded backticks doubled) so '.' in a CSV header is not parsed as
    nested-field access.  (``df[c]`` dot-parses too in Spark 4 — only
    quoting resolves 'a.b' as one identifier.)"""
    return F.col("`" + name.replace("`", "``") + "`")



def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """(column, n_nulls, n_distinct, min_str, max_str) — one row per
    profiled column, computed in a single pass over ``df``."""
    cols = columns or df.columns
    aggs = []
    # positional agg aliases: CSV headers routinely contain spaces /
    # hyphens / quotes, which would break (or inject into) a generated
    # selectExpr that embeds raw column names — the stack expression
    # only ever sees __c{i} identifiers and an escaped name literal
    # _qcol: F.col(c) parses '.' as nested-field access, so a header
    # literally named "a.b" would fail (or profile the wrong field)
    for i, c in enumerate(cols):
        distinct = (
            F.approx_count_distinct(_qcol(c)) if approx else F.count_distinct(_qcol(c))
        )
        aggs += [
            (F.count(F.lit(1)) - F.count(_qcol(c))).alias(f"__nn_{i}"),
            distinct.alias(f"__nd_{i}"),
            F.min(_qcol(c)).cast("string").alias(f"__mn_{i}"),
            F.max(_qcol(c)).cast("string").alias(f"__mx_{i}"),
        ]
    row = df.agg(*aggs)
    stack_args = ", ".join(
        "'{}', __nn_{i}, __nd_{i}, __mn_{i}, __mx_{i}".format(
            c.replace("\\", "\\\\").replace("'", "\\'"), i=i
        )
        for i, c in enumerate(cols)
    )
    return row.selectExpr(
        f"stack({len(cols)}, {stack_args}) "
        "as (column, n_nulls, n_distinct, min_str, max_str)"
    )


def numeric_histogram(
    df: DataFrame, col: str, buckets: int = 20
) -> DataFrame:
    """Equi-width histogram: (bucket, lo, hi, n) over ``col``.

    Two passes by design: an exact min/max aggregate (a scalar job —
    metadata-cheap, often satisfied by parquet footer stats), then one
    bucketed groupBy.  The bucket expression floors the SAME double in
    any engine (per-row arithmetic on exact inputs — no
    aggregation-order drift), so the histogram is differentially
    testable.  All values equal -> one bucket holding everything.
    """
    lohi = df.agg(
        F.min(_qcol(col)).alias("__lo"), F.max(_qcol(col)).alias("__hi")
    ).first()
    lo, hi = lohi["__lo"], lohi["__hi"]
    if lo is None or hi is None:
        # empty / all-NULL column: an EMPTY frame, not a phantom
        # (bucket=0, NULL, NULL, 0) row consumers would trip over
        return df.sparkSession.createDataFrame(
            [], "bucket int, lo double, hi double, n long"
        )
    if lo == hi:
        return df.filter(_qcol(col).isNotNull()).agg(
            F.lit(0).alias("bucket"),
            F.lit(lo).cast("double").alias("lo"),
            F.lit(hi).cast("double").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
    width = (hi - lo) / buckets
    b = F.least(
        F.lit(buckets - 1),
        F.floor((_qcol(col) - F.lit(lo)) * buckets / F.lit(hi - lo)),
    ).cast("int")
    return (
        df.filter(_qcol(col).isNotNull())
        .groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("lo"),
            (F.lit(lo) + (F.col("bucket") + 1) * F.lit(width)).alias("hi"),
            "n",
        )
    )

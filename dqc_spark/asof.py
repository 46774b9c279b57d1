"""As-of (temporal nearest) join — an operator Spark has no native form
for (SPARK-22947 was never merged), expressed as a composition of
existing DataFrame ops rather than a UDF.

Semantics (direction="backward", the common case): for every left row,
attach the payload of the single right row with the same ``by`` key and
the greatest ``on`` not exceeding the left row's ``on`` (DuckDB/pandas
``merge_asof`` semantics, inclusive).  "forward" picks the smallest
``on`` at-or-after instead.

Implementation: union-tag + one window —

    tag left rows side=1, right rows side=0 (payload in a struct)
    partitionBy(by).orderBy(on, side) ; carry = last(struct, ignorenulls)
    keep side=1 rows, expand the carried struct

Cost: ONE shuffle on the key + a per-partition sort — the same price as
a sort-merge join, with no range-explosion.  This beats the naive
``left join on l.ts >= r.ts`` + row_number (which materializes the full
O(|L|·|R|/keys) range join before pruning).  Skewed keys behave like any
window: AQE cannot split a single partitionBy key, so pre-bucket
pathological keys if one entity owns a large share of rows.

Ties: right rows sort before left rows at equal ``on`` (inclusive
bound).  Multiple right rows at the same (by, on) are resolved by the
LAST one in the window order — pre-aggregate the right side if you need
a specific winner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    right_cols: list[str] | None = None,
    direction: str = "backward",
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join; returns every left row plus ``prefix``-named
    payload columns from the matched right row (NULL when no match)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward or forward: {direction!r}")
    by = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by]
    payload = F.struct(*[F.col(c).alias(c) for c in right_cols])

    lhs = left.withColumn("__side", F.lit(1)).withColumn(
        "__payload", F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType
        )
    )
    # NULL-ts right rows can never satisfy l.on >= r.on / <= (ASOF
    # semantics): drop them, or they sort nulls-first and get carried
    # into left rows that have no true match
    right = right.filter(F.col(on).isNotNull())
    rhs = right.select(
        *by,
        F.col(on).alias(on),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
    )
    # align columns: right side carries NULL for left-only columns
    for c in lhs.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(dict(lhs.dtypes)[c]))
    rhs = rhs.select(*lhs.columns)

    if direction == "backward":
        # right first at equal ts -> inclusive l.on >= r.on
        w = W.partitionBy(*by).orderBy(F.col(on).asc(), F.col("__side").asc())
    else:
        w = W.partitionBy(*by).orderBy(F.col(on).desc(), F.col("__side").asc())
    carried = F.last(
        F.when(F.col("__side") == 0, F.col("__payload")), ignorenulls=True
    ).over(w.rowsBetween(W.unboundedPreceding, W.currentRow))

    # a left row with NULL `on` has no defined match either — mask it
    # (desc ordering would otherwise sort it last and pick up a payload)
    out = (
        lhs.unionByName(rhs)
        .withColumn(
            "__carried", F.when(F.col(on).isNotNull(), carried)
        )
        .filter(F.col("__side") == 1)
    )
    keep = [c for c in left.columns]
    return out.select(
        *keep,
        *[
            F.col(f"__carried.{c}").alias(f"{prefix}{c}")
            for c in right_cols
        ],
    )

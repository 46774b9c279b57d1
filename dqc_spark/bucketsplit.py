"""CCNet-style per-group quantile buckets (head / middle / tail).

CCNet (Wenzek et al., LREC 2020) organizes each language's documents
into perplexity tertiles — "head" (lowest perplexity, most natural
text), "middle", "tail" — and downstream recipes sample the splits at
different rates.  ``score_buckets`` is that operator generalized: per
``group_col`` (language, source, ...) assign each row the quantile
bucket of its ``score_col``.

Bucket assignment is RANK-based, not threshold-based, on purpose:

  * exact and engine-portable — bucket = ``(n_buckets * rank) div n``
    is pure integer math over a deterministic total order
    (group, score, tiebreak), so the DuckDB differential compares
    integers, never interpolated float thresholds (the cross-engine
    rounding trap CLAUDE.md documents);
  * balanced by construction — bucket sizes differ by at most 1 even
    when the score distribution has heavy ties (a threshold split puts
    every tied value in one bucket).

Scale shape (the ordering.py plan, reused): ranks come from ONE
``repartitionByRange`` of a NARROW (group, score, tiebreak) projection
— document text never moves — followed by per-partition row_numbers and
a metadata-sized offsets join; group sizes/starts are a tiny aggregate
on the persisted narrow frame; the only full-width operation is the
final hash join of (tiebreak, bucket) back to the caller's frame.  No
corpus-wide window, no per-group hot partition beyond the range
exchange every global sort already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dqc_spark.cache import track
from dqc_spark.ordering import global_order_index

__all__ = ["score_buckets", "perplexity_buckets", "CCNET_LABELS"]

CCNET_LABELS = ["head", "middle", "tail"]


def score_buckets(
    df: DataFrame,
    group_col: str,
    score_col: str,
    tiebreak_cols: str | list[str],
    n_buckets: int = 3,
    labels: list[str] | None = None,
    bucket_col: str = "bucket",
    num_partitions: int | None = None,
    validate: bool = True,
) -> DataFrame:
    """Per-``group_col`` quantile bucket of ``score_col``.

    Adds ``bucket_col``: LONG in [0, n_buckets) when ``labels`` is
    None, else the label string (``labels[i]``; len must equal
    ``n_buckets``).  Bucket 0 holds the LOWEST scores (for perplexity
    that is CCNet's "head").

    ``tiebreak_cols`` must be UNIQUE per row and, like group/score,
    non-NULL — uniqueness completes the total order (deterministic
    buckets across partition layouts) and keys the join back (a
    duplicate fans the join out and attaches other rows' ranks); NULLs
    order engine-dependently (Spark NULLS FIRST vs DuckDB NULLS LAST)
    and fall out of the equi-join.  ``validate=True`` (default) checks
    both in one extra column-pruned scan and raises; callers that
    guarantee the contract pass ``validate=False`` to skip it.
    """
    if labels is not None and len(labels) != n_buckets:
        raise ValueError(
            f"labels has {len(labels)} entries for {n_buckets} buckets")
    tiebreak_cols = (
        [tiebreak_cols] if isinstance(tiebreak_cols, str) else
        list(tiebreak_cols)
    )
    tb = F.struct(*tiebreak_cols).alias("__tb")
    narrow = df.select(F.col(group_col), F.col(score_col), tb)
    if validate:
        # count the RAW tiebreak columns, not the struct: F.struct
        # wraps NULL fields into a non-NULL struct, so count("__tb")
        # never drops below n and a NULL tiebreak would pass the very
        # check that promises to reject it (then order
        # engine-dependently in the oracle differential)
        tb_counts = [F.count(F.col(f"__tb.{c}")) for c in tiebreak_cols]
        n_t = tb_counts[0] if len(tb_counts) == 1 else F.least(*tb_counts)
        chk = narrow.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(group_col).alias("n_g"),
            F.count(score_col).alias("n_s"),
            n_t.alias("n_t"),
            F.countDistinct("__tb").alias("n_td"),
        ).collect()[0]
        if chk["n_g"] < chk["n"] or chk["n_s"] < chk["n"]:
            raise ValueError(
                f"NULL {group_col}/{score_col} rows: NULL ordering is "
                "engine-dependent — coalesce or filter first")
        if chk["n_td"] < chk["n"] or chk["n_t"] < chk["n"]:
            raise ValueError(
                f"tiebreak {tiebreak_cols} is not unique/non-NULL "
                f"({chk['n_td']} distinct of {chk['n']} rows): ranks "
                "would fan out through the join-back")
    ranked = track(
        global_order_index(
            narrow, [group_col, score_col], "__tb",
            num_partitions=num_partitions, position_col="__gpos",
        ).select(group_col, "__tb", "__gpos")
    )
    # group starts/sizes: a tiny agg on the persisted narrow frame
    stats = ranked.groupBy(group_col).agg(
        F.min("__gpos").alias("__start"),
        F.count(F.lit(1)).alias("__n"),
    )
    bucket = F.expr(
        f"({n_buckets} * (__gpos - __start)) div __n").cast("long")
    if labels is not None:
        bucket = F.element_at(
            F.array(*[F.lit(s) for s in labels]), (bucket + 1).cast("int"))
    assign = (
        ranked.join(F.broadcast(stats), on=group_col, how="inner")
        .select(F.col("__tb"), bucket.alias(bucket_col))
    )
    return (
        df.withColumn("__tb", F.struct(*tiebreak_cols))
        .join(assign, on="__tb", how="inner")
        .drop("__tb")
    )


def perplexity_buckets(
    df: DataFrame,
    group_col: str = "lang",
    tiebreak_cols: str | list[str] = ("url", "warc_ts"),
    text_col: str = "text",
    labels: list[str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """The CCNet split itself: score every document with the broadcast
    LM (perplexity.with_perplexity), then head/middle/tail per
    language.  ``labels`` defaults to CCNET_LABELS.  The default
    tiebreak (url, warc_ts) is the crawl's natural unique key — a url
    alone recurs across snapshots."""
    from dqc_spark.perplexity import with_perplexity

    # persisted: the scored frame is a pandas-UDF frame with three
    # consumers (validation scan, ranking scan, final join) — without
    # the persist Spark re-runs the LM over the corpus per consumer
    scored = track(with_perplexity(df, text_col=text_col))
    return score_buckets(
        scored, group_col, "ppl", tiebreak_cols,
        n_buckets=3, labels=labels or CCNET_LABELS,
        bucket_col="ppl_bucket", num_partitions=num_partitions,
    )

"""Corpus data-card report: the per-slice summary table every released
training corpus ships with (docs, chars, tokens, length mix, corpus
share per language/source) computed in ONE fused aggregation pass.

The reference's closest surface is per-check summary printing; this is
the corpus-level generalization: after a curation run, "what is in the
corpus" should be one cheap job and one artifact, not a notebook of
ad-hoc queries.

Scale shape (the 100 TB contract):
  * one ``groupBy(group_col)`` over the corpus — partial-aggregatable
    (map-side combine), shuffle carries one row per (partition, group);
    the grouped frame (rows = distinct groups) is persisted before the
    corpus-share total is derived from it, so the corpus is scanned
    ONCE even though two branches consume the aggregate;
  * token counts via the shared Unicode tokenizer's CATALYST leg
    (``wordhash.unicode_tokens_col`` — split/array_remove/size, whole-
    stage codegen, no Python, no HOF lambda);
  * the corpus total for ``doc_share`` is a broadcast 1-row aggregate
    (the scalar-literal crossJoin pattern, not a cartesian);
  * length-mix columns are fixed CASE buckets, not percentiles — exact,
    engine-portable and partial-aggregatable where an exact median
    would force ObjectHashAggregate (CLAUDE.md).

The ``corpus_report_by_lang`` driver entry differentials this module
against a DuckDB oracle spelled from the same tokenizer SQL leg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dqc_spark.wordhash import unicode_tokens_col

__all__ = ["corpus_report", "report_markdown"]


def corpus_report(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    short_max_chars: int = 200,
    long_min_chars: int = 2000,
) -> DataFrame:
    """Per-``group_col`` corpus summary: doc/char/token counts, NULL
    and length mix, averages, and each group's share of the corpus.

    Returns one row per distinct group value (NULL group is its own
    row, surfacing unlabeled docs instead of hiding them) with:
    ``n_docs, n_null_text, total_chars, total_tokens, avg_chars,
    avg_tokens, n_short, n_medium, n_long, doc_share``.  Lengths are
    in characters of the non-NULL text (NULL counts 0 chars and lands
    in ``n_short`` alongside empty docs — it is separately visible in
    ``n_null_text``).
    """
    if not (0 < short_max_chars < long_min_chars):
        raise ValueError(
            "need 0 < short_max_chars < long_min_chars, got "
            f"{short_max_chars} / {long_min_chars}")
    from dqc_spark.cache import track

    text = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(text)
    n_tokens = F.size(unicode_tokens_col(F.col(text_col)))
    grouped = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col(text_col).isNull(), 1).otherwise(0))
        .alias("n_null_text"),
        F.sum(n_chars).alias("total_chars"),
        F.sum(n_tokens).alias("total_tokens"),
        F.sum(F.when(n_chars < short_max_chars, 1).otherwise(0))
        .alias("n_short"),
        F.sum(
            F.when(
                (n_chars >= short_max_chars) & (n_chars < long_min_chars), 1
            ).otherwise(0)
        ).alias("n_medium"),
        F.sum(F.when(n_chars >= long_min_chars, 1).otherwise(0))
        .alias("n_long"),
    )
    # persisted: the doc_share total is a SECOND consumer of the
    # grouped frame — unpersisted, each branch plans its own full
    # corpus scan (column pruning specializes the exchanges so AQE
    # ReusedExchange never fires; the CLAUDE.md multi-consumer rule).
    # The cached frame is one row per group — tens of rows.
    grouped = track(grouped)
    total = grouped.agg(F.sum("n_docs").alias("__corpus_docs"))
    return grouped.crossJoin(F.broadcast(total)).select(
        group_col,
        "n_docs",
        "n_null_text",
        "total_chars",
        "total_tokens",
        # int-ratio doubles: identical expression both engines (the
        # driver entry truncates to 4dp per the repo rounding rule)
        (F.col("total_chars") / F.col("n_docs")).alias("avg_chars"),
        (F.col("total_tokens") / F.col("n_docs")).alias("avg_tokens"),
        "n_short",
        "n_medium",
        "n_long",
        (F.col("n_docs") / F.col("__corpus_docs")).alias("doc_share"),
    )


def report_markdown(report: DataFrame, group_col: str = "lang") -> str:
    """Render a ``corpus_report`` frame as a markdown data card.

    Collect is bounded by the number of distinct groups (languages /
    sources — tens, not corpus-sized).  Groups sort by ``n_docs``
    descending, NULL group last at equal counts, and a TOTAL row is
    recomputed from the collected counts (no second Spark job).
    """
    rows = sorted(
        report.collect(),
        key=lambda r: (-r["n_docs"], r[group_col] is None,
                       str(r[group_col])),
    )
    head = (
        f"| {group_col} | docs | share | tokens | chars/doc | "
        "short/med/long |\n|---|---|---|---|---|---|"
    )
    lines = [head]
    for r in rows:
        name = "(null)" if r[group_col] is None else str(r[group_col])
        lines.append(
            f"| {name} | {r['n_docs']} | {r['doc_share'] * 100:.1f}% | "
            f"{r['total_tokens']} | {r['avg_chars']:.0f} | "
            f"{r['n_short']}/{r['n_medium']}/{r['n_long']} |"
        )
    n_docs = sum(r["n_docs"] for r in rows)
    n_tokens = sum(r["total_tokens"] for r in rows)
    n_chars = sum(r["total_chars"] for r in rows)
    lines.append(
        f"| **TOTAL** | {n_docs} | 100.0% | {n_tokens} | "
        f"{(n_chars / n_docs if n_docs else 0):.0f} | "
        f"{sum(r['n_short'] for r in rows)}/"
        f"{sum(r['n_medium'] for r in rows)}/"
        f"{sum(r['n_long'] for r in rows)} |"
    )
    return "\n".join(lines)

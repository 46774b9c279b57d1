"""C4-style within-document line cleaning (Raffel et al. 2020, §2.2).

The C4 cleaning pass is LINE-level, upstream of every document-level
gate this repo already has (gates.py scores whole documents;
linededup.py dedups lines ACROSS documents — neither edits a document's
own lines).  The rules, as published:

  line-level (a line survives iff ALL hold, on the whitespace-stripped
  line, and survivors are rejoined in order):
    * at least ``min_words`` words (C4 uses 5);
    * ends in a terminal punctuation mark: ``. ! ? "``;
    * does not contain the word "javascript" (case-insensitive).
  page-level (the cleaned page is dropped iff ANY hold):
    * fewer than ``min_sentences`` sentences remain (C4 uses 3;
      sentence count approximated as terminal ``.!?`` marks in the
      cleaned text — the same approximation list-based ports use);
    * the ORIGINAL page contains "lorem ipsum" (case-insensitive);
    * the ORIGINAL page contains a curly bracket ``{`` (code leak).

Engine shape: the line pass is ONE Arrow pandas UDF sharing
``clean_text_py`` verbatim with the pytest/DuckDB oracle (the repo's
golden-kernel rule); the page-level predicates are pure Catalyst
columns (``regexp_count`` / ``contains``) — zero python at gate time,
and the whole operator is shuffle-free (narrow select), so it
parallelizes embarrassingly at any corpus size.

Cross-engine notes (the oracle SQL mirrors these exactly):
  * stripping uses the explicit charset ``" \\t\\r\\x0b\\x0c"`` — NOT
    python's default ``strip()`` — so DuckDB ``trim(l, <same set>)``
    is identical (``\\n`` can't occur inside a split line);
  * word counting is ``s.split()`` on the stripped line, which equals
    the engine ``\\s+`` split for every character in the corpora (the
    wordhash.py precedent: they differ only on exotic unicode spaces).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "keep_line_py",
    "clean_text_py",
    "cleaned_lines_col",
    "n_sentences_col",
    "page_keep_pred",
    "c4_clean",
]

TERMINAL_PUNCT = (".", "!", "?", '"')
_STRIP_SET = " \t\r\x0b\x0c"


def keep_line_py(line: str, min_words: int = 5) -> bool:
    """C4 line rule on one already-stripped line."""
    if len(line.split()) < min_words:
        return False
    if not line.endswith(TERMINAL_PUNCT):
        return False
    return "javascript" not in line.lower()


def clean_text_py(text: str | None, min_words: int = 5) -> str | None:
    """One document's cleaned text — shared verbatim by the Spark
    kernel and the pytest/DuckDB oracle.  Survivors are the STRIPPED
    lines (C4 keeps the stripped form), rejoined with ``\\n``."""
    if text is None:
        return None
    kept = []
    for raw in text.split("\n"):
        s = raw.strip(_STRIP_SET)
        if keep_line_py(s, min_words):
            kept.append(s)
    return "\n".join(kept)


def cleaned_lines_col(text: Column, min_words: int = 5) -> Column:
    """The line pass as a Column: one Arrow UDF around the shared
    kernel (python ``re``-free — plain string ops vectorize fine at
    batch level and byte parity with the oracle is the contract)."""

    @F.pandas_udf(T.StringType())
    def clean_udf(s: pd.Series) -> pd.Series:
        return pd.Series([clean_text_py(t, min_words) for t in s])

    return clean_udf(text)


def n_sentences_col(clean_text: Column) -> Column:
    """Sentence-count approximation: terminal marks in the cleaned
    text.  Pure Catalyst (codegen), no python."""
    return F.regexp_count(clean_text, F.lit(r"[.!?]")).cast("long")


def page_keep_pred(
    clean_text: Column, orig_text: Column, min_sentences: int = 3,
) -> Column:
    """C4 page gate: enough sentences survive AND the ORIGINAL page has
    no boilerplate/code markers.  NULL original → NULL predicate
    (filters drop it, matching every other gate in gates.py)."""
    lower = F.lower(orig_text)
    return (
        (n_sentences_col(clean_text) >= F.lit(min_sentences))
        & ~lower.contains("lorem ipsum")
        & ~orig_text.contains("{")
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    min_sentences: int = 3,
    out_col: str = "clean_text",
    keep_col: str = "keep",
) -> DataFrame:
    """Append ``clean_text``, ``n_sentences`` and the page-level
    ``keep`` flag.  Narrow (shuffle-free); callers filter on
    ``keep_col`` and drop the original column themselves."""
    cleaned = df.withColumn(out_col, cleaned_lines_col(F.col(text_col), min_words))
    return cleaned.withColumn(
        "n_sentences", n_sentences_col(F.col(out_col))
    ).withColumn(
        keep_col,
        page_keep_pred(F.col(out_col), F.col(text_col), min_sentences),
    )

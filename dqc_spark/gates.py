"""Gopher/C4-style heuristic quality gates as pure Catalyst Columns.

Every gate is a whole-stage-codegen'd expression over ``text`` — no
Python in the hot path, no shuffle, fully fused into the single
pipeline scan.  Each returns a *feature* Column; thresholded gates are
built with ``Check.custom_pred`` (suite.py) or gate_columns() below so
they participate in both the per-document keep decision and the
table-level zero-row-success audit (SURVEY §2.4).

Gate set (public heuristics from the Gopher and C4 papers):
  * doc length in words / chars
  * mean word length
  * stop-word ratio
  * alpha-character ratio
  * symbol-to-word ratio (# and ellipsis)
  * max / mean line length, duplicate-line fraction
  * repetition: duplicate word-bigram fraction
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dqc_spark.textmodels import STOPWORDS

# union of per-language stopword lists; small → constant-folded IN set
ALL_STOPWORDS = sorted(set().union(*STOPWORDS.values()))


def words_col(text: Column) -> Column:
    """Whitespace tokenization; empty text -> empty array (split of ''
    yields [''] which we filter)."""
    return F.filter(F.split(text, r"\s+"), lambda w: w != F.lit(""))


def n_words(text: Column) -> Column:
    return F.size(words_col(text))


def n_chars(text: Column) -> Column:
    return F.length(text)


def mean_word_length(text: Column) -> Column:
    w = words_col(text)
    return F.when(F.size(w) > 0,
                  F.aggregate(w, F.lit(0.0), lambda acc, x: acc + F.length(x))
                  / F.size(w))


def stopword_ratio(text: Column) -> Column:
    w = words_col(F.lower(text))
    hits = F.size(F.filter(w, lambda x: x.isin(ALL_STOPWORDS)))
    return F.when(F.size(w) > 0, hits / F.size(w)).otherwise(F.lit(0.0))


def alpha_ratio(text: Column) -> Column:
    """Fraction of NON-WHITESPACE characters that are letters (unicode
    letter class) — whitespace excluded so single-character-token
    languages (zh) aren't penalized for their space density."""
    total = F.length(F.regexp_replace(text, r"\s", ""))
    alpha = F.length(F.regexp_replace(text, r"[^\p{L}]", ""))
    return F.when(total > 0, alpha / total).otherwise(F.lit(0.0))


def symbol_word_ratio(text: Column) -> Column:
    """Gopher: ratio of '#' or '...' symbols to words."""
    syms = (
        F.length(text) - F.length(F.regexp_replace(text, r"#", ""))
        + (F.length(text) - F.length(F.regexp_replace(text, r"\.\.\.", ""))) / 3
    )
    nw = n_words(text)
    return F.when(nw > 0, syms / nw).otherwise(F.lit(0.0))


def lines_col(text: Column) -> Column:
    return F.filter(F.split(text, r"\n"), lambda l: l != F.lit(""))


def max_line_length(text: Column) -> Column:
    return F.coalesce(
        F.array_max(F.transform(lines_col(text), F.length)), F.lit(0)
    )


def mean_line_length(text: Column) -> Column:
    l = lines_col(text)
    return F.when(
        F.size(l) > 0,
        F.aggregate(l, F.lit(0.0), lambda acc, x: acc + F.length(x)) / F.size(l),
    ).otherwise(F.lit(0.0))


def dup_line_fraction(text: Column) -> Column:
    l = lines_col(text)
    return F.when(
        F.size(l) > 0,
        1.0 - F.size(F.array_distinct(l)) / F.size(l),
    ).otherwise(F.lit(0.0))


def dup_bigram_fraction(text: Column) -> Column:
    """Repetition gate: fraction of duplicate word bigrams — boilerplate
    and SEO spam repeat phrase patterns.

    Implementation note: ``array_distinct`` over string arrays is O(n^2)
    with per-element string equality (66s for 20k docs measured); instead
    hash each bigram (tokens are space-free, so the pair<->hash mapping
    is faithful), sort the hash array, and count adjacent equals:
    duplicates = n - distinct.  O(n log n) with long comparisons.
    """
    w = words_col(F.lower(text))
    n_b = F.size(w) - 1
    hashes = F.transform(
        F.sequence(F.lit(0), F.size(w) - 2),
        lambda i: F.xxhash64(F.element_at(w, i + 1), F.element_at(w, i + 2)),
    )
    s = F.array_sort(hashes)
    dups = F.aggregate(
        F.zip_with(
            F.slice(s, 1, n_b - 1),
            F.slice(s, 2, n_b - 1),
            lambda a, b: (a == b).cast("int"),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    # size>=3 so the slice lengths stay positive; a 2-word doc has one
    # bigram and therefore duplicate fraction 0 by definition
    return F.when(F.size(w) >= 3, dups.cast("double") / n_b).otherwise(F.lit(0.0))


# ---------------------------------------------------------------------------
# default thresholds (Gopher-flavored, tuned for the synthetic corpus)
# ---------------------------------------------------------------------------

DEFAULT_THRESHOLDS = {
    "min_words": 20,
    "max_words": 50_000,
    "min_mean_word_length": 1.0,
    "max_mean_word_length": 12.0,
    "min_stopword_ratio": 0.05,
    "min_alpha_ratio": 0.55,
    "max_symbol_word_ratio": 0.1,
    "max_dup_line_fraction": 0.30,
    "max_dup_bigram_fraction": 0.40,
}


def feature_columns(text: Column) -> dict[str, Column]:
    """All gate features — computed once, shared by every threshold."""
    return {
        "n_words": n_words(text),
        "mean_word_len": mean_word_length(text),
        "stopword_ratio": stopword_ratio(text),
        "alpha_ratio": alpha_ratio(text),
        "symbol_word_ratio": symbol_word_ratio(text),
        "dup_line_fraction": dup_line_fraction(text),
        "dup_bigram_fraction": dup_bigram_fraction(text),
    }


def gate_predicates(
    feats: dict[str, Column], th: dict | None = None
) -> dict[str, Column]:
    """Violation predicates (True = drop reason) over feature columns.
    Mirrors the reference's range-check semantics (#6 between, #9
    length): a gate is 'value outside [lo, hi]'."""
    t = dict(DEFAULT_THRESHOLDS)
    if th:
        t.update(th)
    return {
        "gate_too_few_words": feats["n_words"] < t["min_words"],
        "gate_too_many_words": feats["n_words"] > t["max_words"],
        "gate_word_length": (feats["mean_word_len"] < t["min_mean_word_length"])
        | (feats["mean_word_len"] > t["max_mean_word_length"]),
        "gate_stopword": feats["stopword_ratio"] < t["min_stopword_ratio"],
        "gate_alpha": feats["alpha_ratio"] < t["min_alpha_ratio"],
        "gate_symbol": feats["symbol_word_ratio"] > t["max_symbol_word_ratio"],
        "gate_dup_lines": feats["dup_line_fraction"] > t["max_dup_line_fraction"],
        "gate_repetition": feats["dup_bigram_fraction"] > t["max_dup_bigram_fraction"],
    }


def calibrate_thresholds(
    trusted: DataFrame,
    text_col: str = "text",
    quantile: float = 0.02,
    accuracy: int = 10_000,
) -> dict:
    """Derive the gate thresholds FROM a trusted corpus (the CCNet /
    Gopher practice: bounds come from a reference distribution — e.g.
    a Wikipedia slice — not hand-picked constants).  Each lower bound
    is the ``quantile`` tail of the trusted feature distribution and
    each upper bound the ``1-quantile`` tail, so per gate at most
    ~``quantile`` of trusted-like documents would be dropped; the
    returned dict is ``DEFAULT_THRESHOLDS``-shaped and feeds straight
    into ``annotate``/``curate(thresholds=...)``.

    Scale shape: ONE scan — all seven feature columns are pure
    Catalyst expressions and all thirteen percentiles fuse into a
    single ``percentile_approx`` aggregate (mergeable sketch; exact
    percentiles would force ObjectHashAggregate per the repo's
    measured rule).  At the default accuracy the approximation error
    is <= 1/accuracy of rank, exact on corpora smaller than it.

    NULL handling: NULL/empty text produces NULL ``mean_word_len``
    (skipped by the percentile — empties must not drag the word-length
    band down) and zeros elsewhere, matching the gate features
    themselves."""
    if not (0.0 < quantile < 0.5):
        raise ValueError(
            f"quantile must be in (0, 0.5), got {quantile}")
    text = F.coalesce(F.col(text_col), F.lit(""))
    feats = feature_columns(text)
    proj = trusted.select(
        *[c.alias(k) for k, c in feats.items()])
    lo, hi = float(quantile), float(1.0 - quantile)
    qq = F.array(F.lit(lo), F.lit(hi))
    row = proj.agg(
        F.percentile_approx("n_words", qq, accuracy).alias("w"),
        F.percentile_approx("mean_word_len", qq, accuracy).alias("m"),
        F.percentile_approx("stopword_ratio", F.lit(lo), accuracy)
        .alias("sw"),
        F.percentile_approx("alpha_ratio", F.lit(lo), accuracy)
        .alias("al"),
        F.percentile_approx("symbol_word_ratio", F.lit(hi), accuracy)
        .alias("sy"),
        F.percentile_approx("dup_line_fraction", F.lit(hi), accuracy)
        .alias("dl"),
        F.percentile_approx("dup_bigram_fraction", F.lit(hi), accuracy)
        .alias("db"),
    ).first()
    if row["w"] is None:
        raise ValueError("calibrate_thresholds: trusted corpus is empty")
    if row["m"] is None:
        # n_words is 0 (not NULL) for empty texts, so the guard above
        # passes — but mean_word_len is NULL everywhere and its
        # percentile comes back NULL (review finding: this surfaced
        # as a raw TypeError instead of the designed error)
        raise ValueError(
            "calibrate_thresholds: trusted corpus has no words "
            "(every text empty/whitespace/NULL)")
    return {
        "min_words": int(row["w"][0]),
        "max_words": int(row["w"][1]),
        "min_mean_word_length": float(row["m"][0]),
        "max_mean_word_length": float(row["m"][1]),
        "min_stopword_ratio": float(row["sw"]),
        "min_alpha_ratio": float(row["al"]),
        "max_symbol_word_ratio": float(row["sy"]),
        "max_dup_line_fraction": float(row["dl"]),
        "max_dup_bigram_fraction": float(row["db"]),
    }
